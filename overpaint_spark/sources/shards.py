"""Training-shard writer — the sink end of the training-data pipeline.

A trainer consumes the corpus as N equal-ish shards in a deterministic
global order (`queries.q_dataset_shuffle` provides (doc_id, position,
shard)); this module materializes that plan: one parquet directory per
shard, rows sorted by position within each shard, so a data-loader
reads shard k as one sequential scan and the concatenation of shards in
round-robin order replays the exact global permutation.

Scale shape: ONE shuffle (repartition by shard id — the write-side
twin of bucketing.write_bucketed), per-shard ORDER comes from
``sortWithinPartitions`` (no global sort; position is already the
two-phase rank), and each shard lands via ``partitionBy`` as its own
directory in a single job. Re-runs are bit-identical because the
permutation is seeded — the writer adds no RNG of its own.

The reference (a Postgres profiler) has no storage layer; this is
north-star pipeline surface, same family as sources/bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    ordered: DataFrame,
    path: str,
    shard_col: str = "shard",
    order_col: str = "position",
) -> None:
    """Materialize a (…, position, shard) relation as one parquet
    directory per shard (``shard=<k>/``), rows sorted by ``order_col``
    within each shard file."""
    (
        ordered.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, order_col)
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(path)
    )


def read_training_shard(
    spark: SparkSession, path: str, shard: int, shard_col: str = "shard"
) -> DataFrame:
    """One shard back, partition-pruned: the ``shard=<k>`` directory
    filter never touches other shards' files."""
    return spark.read.parquet(path).filter(F.col(shard_col) == shard)


def write_jsonl_shards(
    ordered: DataFrame,
    path: str,
    shard_col: str = "shard",
    order_col: str = "position",
    compression: str = "gzip",
) -> None:
    """The interchange twin of :func:`write_training_shards`: the same
    one-shuffle sharded layout, written as gzipped JSON-lines — the
    lingua-franca handoff to tokenizer trainers and non-Spark loaders
    that don't read parquet. Identical plan shape (repartition on the
    shard id, ``sortWithinPartitions`` for in-shard order, one job);
    only the sink format differs, so the parquet writer's determinism
    argument carries over verbatim."""
    (
        ordered.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, order_col)
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .option("compression", compression)
        .json(path)
    )


def read_jsonl_shard(
    spark: SparkSession, path: str, shard: int, shard_col: str = "shard"
) -> DataFrame:
    """One JSONL shard back, partition-pruned like the parquet twin.
    JSON carries no file-level ordering metadata, so callers needing
    the in-shard order must sort by ``position`` (cheap: one shard)."""
    return spark.read.json(path).filter(F.col(shard_col) == shard)
