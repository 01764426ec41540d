"""Multimodal binary-column plumbing tests (decode is stubbed; the
Spark-side schema/batching contract is what's under test)."""

import hashlib

from pyspark.sql import Row

from overpaint_spark.operators import multimodal as MM


def test_attach_and_extract_metadata(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello"), Row(doc_id=2, text="x" * 2000)])
    assets = MM.attach_payload(df, "doc_id", "text")
    assert dict(assets.dtypes)["payload"] == "binary"

    meta = {r.asset_id: r for r in MM.extract_metadata(assets).collect()}
    assert meta[1].byte_len == 5
    assert meta[1].sha256 == hashlib.sha256(b"hello").hexdigest()
    assert meta[1].width == 6 and meta[1].height == 1
    assert meta[2].byte_len == 2000
    assert meta[2].width == 1 + 2000 % 1024 and meta[2].height == 2


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a" * 25)])
    assets = MM.attach_payload(df, "doc_id", "text")
    frames = MM.frame_sample_plan(assets, every_n=10).collect()
    # fake n_frames = 25 % 100 + 1 = 26 → indices 0,10,20
    assert [r.frame_idx for r in frames] == [0, 10, 20]
