"""Training-shard writer: deterministic materialization of the
dataset_shuffle plan — one directory per shard, in-shard position
order, partition-pruned single-shard reads, bit-identical re-runs."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def shard_dir(spark, tmp_path_factory):
    from overpaint_spark.queries import q_dataset_shuffle
    from overpaint_spark.sources.shards import write_training_shards

    out = str(tmp_path_factory.mktemp("shards") / "corpus")
    plan = q_dataset_shuffle(spark, SF)
    write_training_shards(plan, out)
    return out


def test_every_shard_written_and_disjoint(spark, shard_dir):
    from overpaint_spark.queries import q_dataset_shuffle

    back = spark.read.parquet(shard_dir)
    plan = q_dataset_shuffle(spark, SF)
    assert back.count() == plan.count()
    assert back.select("doc_id").distinct().count() == plan.count()
    got = {r.shard for r in back.select("shard").distinct().collect()}
    assert got == set(range(8))


def test_shard_read_is_partition_pruned_and_ordered(spark, shard_dir):
    from overpaint_spark.sources.shards import read_training_shard

    one = read_training_shard(spark, shard_dir, 3)
    rows = one.orderBy("position").collect()
    assert rows and all(r.shard == 3 for r in rows)
    # shard = position mod 8: membership is exactly the residue class
    assert all(r.position % 8 == 3 for r in rows)
    # partition pruning visible in the plan: shard is a partition column
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan


def test_rerun_bit_identical(spark, shard_dir, tmp_path):
    from overpaint_spark.queries import q_dataset_shuffle
    from overpaint_spark.sources.shards import write_training_shards

    out2 = str(tmp_path / "corpus2")
    write_training_shards(q_dataset_shuffle(spark, SF), out2)
    a = {(r.doc_id, r.position, r.shard)
         for r in spark.read.parquet(shard_dir).collect()}
    b = {(r.doc_id, r.position, r.shard)
         for r in spark.read.parquet(out2).collect()}
    assert a == b


def test_jsonl_shards_mirror_parquet_shards(spark, shard_dir, tmp_path):
    """The interchange sink: same rows, same shard membership as the
    parquet twin; files are gzipped JSON lines readable without Spark."""
    import glob
    import gzip
    import json

    from overpaint_spark.queries import q_dataset_shuffle
    from overpaint_spark.sources.shards import (
        read_jsonl_shard,
        write_jsonl_shards,
    )

    out = str(tmp_path / "jsonl")
    write_jsonl_shards(q_dataset_shuffle(spark, SF), out)
    a = {(r.doc_id, r.position, r.shard)
         for r in spark.read.parquet(shard_dir).collect()}
    b = {(int(r.doc_id), int(r.position), int(r.shard))
         for r in spark.read.json(out).collect()}
    assert a == b
    one = read_jsonl_shard(spark, out, 3)
    assert {int(r.shard) for r in one.collect()} == {3}
    # plain-gzip readable outside any engine — the handoff contract
    files = glob.glob(f"{out}/shard=5/*.json.gz")
    assert files
    with gzip.open(files[0], "rt") as fh:
        rec = json.loads(fh.readline())
    assert "doc_id" in rec and "position" in rec
