"""Partition-scoped upsert (operators/upsert.py)."""

import os

import pytest
from pyspark.sql import functions as F

from overpaint_spark.operators.upsert import merge_latest, upsert_partitioned

SCHEMA = "k long, day string, v string, ts long"


def _base(spark):
    return spark.createDataFrame(
        [
            (1, "d1", "a", 10),
            (2, "d1", "b", 10),
            (3, "d2", "c", 10),
            (4, "d3", "d", 10),
        ],
        SCHEMA,
    )


def test_merge_latest_semantics(spark):
    existing = _base(spark)
    updates = spark.createDataFrame(
        [
            (2, "d1", "b2", 20),   # newer → wins
            (3, "d2", "c0", 5),    # older → loses
            (4, "d3", "d-tie", 10),  # tie → update wins
            (9, "d1", "new", 15),  # insert
        ],
        SCHEMA,
    )
    got = {
        r.k: (r.v, r.ts)
        for r in merge_latest(existing, updates, ["k"], "ts").collect()
    }
    assert got == {
        1: ("a", 10),
        2: ("b2", 20),
        3: ("c", 10),
        4: ("d-tie", 10),
        9: ("new", 15),
    }


def test_merge_latest_schema_mismatch(spark):
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_latest(
            _base(spark),
            _base(spark).drop("v"),
            ["k"],
            "ts",
        )


def test_upsert_rewrites_only_affected_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _base(spark).write.partitionBy("day").parquet(path)
    untouched_files = {
        f: os.path.getmtime(os.path.join(path, "day=d3", f))
        for f in os.listdir(os.path.join(path, "day=d3"))
        if f.endswith(".parquet")
    }

    updates = spark.createDataFrame(
        [(2, "d1", "b2", 20), (9, "d2", "new", 15)], SCHEMA
    )
    affected = upsert_partitioned(
        spark, path, updates, ["k"], "day", "ts"
    )
    assert sorted(affected) == ["d1", "d2"]

    got = {
        r.k: (r.day, r.v)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        1: ("d1", "a"),
        2: ("d1", "b2"),
        3: ("d2", "c"),
        4: ("d3", "d"),
        9: ("d2", "new"),
    }
    # the untouched partition's files were not rewritten
    after = {
        f: os.path.getmtime(os.path.join(path, "day=d3", f))
        for f in os.listdir(os.path.join(path, "day=d3"))
        if f.endswith(".parquet")
    }
    assert after == untouched_files


def test_upsert_empty_batch_is_noop(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _base(spark).write.partitionBy("day").parquet(path)
    empty = spark.createDataFrame([], SCHEMA)
    assert upsert_partitioned(spark, path, empty, ["k"], "day", "ts") == []
    assert spark.read.parquet(path).count() == 4


@pytest.mark.slow
def test_streaming_upsert_applies_batches_in_order(spark, tmp_path):
    """Two change-file drops processed as separate micro-batches keep the
    table current: later batches override earlier ones per key, and only
    touched partitions rewrite."""
    import time as _time

    from overpaint_spark.streaming.upsert import write_upsert_stream

    path = str(tmp_path / "tbl")
    changes_dir = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    _base(spark).write.partitionBy("day").parquet(path)

    drops = [
        [(2, "d1", "b2", 20), (9, "d2", "new", 15)],
        [(2, "d1", "b3", 30), (1, "d1", "a2", 30)],
    ]
    for rows in drops:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(changes_dir)
        _time.sleep(1.2)  # distinct mtimes → stable file order

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(changes_dir)
    )
    q = write_upsert_stream(
        stream, path, ["k"], "day", "ts", ckpt, trigger_available_now=True
    )
    q.awaitTermination(120)

    got = {r.k: (r.day, r.v, r.ts) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("d1", "a2", 30),
        2: ("d1", "b3", 30),
        3: ("d2", "c", 10),
        4: ("d3", "d", 10),
        9: ("d2", "new", 15),
    }
