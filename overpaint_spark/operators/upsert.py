"""Partition-scoped upsert (merge) into a partitioned Parquet table.

Plain Parquet has no MERGE; the scalable substitute is rewriting ONLY
the partitions an update batch touches (the reference never writes at
all — this is sink-side capability the north star's monitoring loop
needs for mutable state like latest-profile tables).

Cost model at 100 TB: reading is pruned to the affected partitions
(partition filter on the scan), the merge window shuffles only those
partitions' rows, and Spark's dynamic partition overwrite
(``partitionOverwriteMode=dynamic``) replaces just the rewritten
directories — untouched partitions are never read, shuffled, or
rewritten. Cost ∝ updated data, not table size.

Merge semantics: one surviving row per key, the greatest ``order_col``
wins, update rows beating existing rows on ties (the CDC convention).
Keys new to the table insert; existing keys not in the batch survive
untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from overpaint_spark.localrel import local_df


def merge_latest(
    existing: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    order_col: str,
) -> DataFrame:
    """The pure merge: union both sides, keep the winning row per key.

    Deterministic total order per key: (order_col, is_update) descending
    — equal-timestamp conflicts resolve to the update, never to a
    partition-layout accident. One shuffle on the key.
    """
    cols = existing.columns
    if set(cols) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: {sorted(cols)} vs {sorted(updates.columns)}"
        )
    tagged = existing.select(*cols).withColumn("_src", F.lit(0)).unionByName(
        updates.select(*cols).withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), F.col("_src").desc()
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def upsert_partitioned(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    order_col: str,
) -> list:
    """Merge ``updates`` into the Parquet table at ``table_path``.

    Returns the list of partition values rewritten. The affected-
    partition list is collected first (tiny — one distinct over the
    batch), the existing side reads with a partition-pruned scan, and
    the write uses dynamic partition overwrite so only those
    directories are replaced.
    """
    affected = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    if not affected:
        return []
    # bootstrap: the first batch of a change feed may CREATE the table
    # (the CLI cdc gate's cold start) — merge against an empty relation
    # instead of failing on the missing path. Underscore/dot entries
    # (checkpoints, markers) don't count as data. Local-fs listing, the
    # same deployment assumption the dynamic-overwrite staging makes.
    import os

    has_data = os.path.isdir(table_path) and any(
        not e.startswith(("_", ".")) for e in os.listdir(table_path)
    )
    existing = (
        spark.read.parquet(table_path).filter(
            F.col(partition_col).isin(affected)
        )
        if has_data
        else local_df(spark, [], updates.schema)
    )
    merged = merge_latest(existing, updates, key_cols, order_col)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(table_path)
    )
    return affected
