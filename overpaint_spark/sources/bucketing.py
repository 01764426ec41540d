"""Bucketed table layout — pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact⋈fact join (lineitem⋈orders on
orderkey, events⋈events self-joins) is the shuffle: both sides exchange
on the join key every query. Bucketing moves that shuffle to WRITE time,
once: rows are hash-partitioned into a fixed number of buckets by the
join key and each bucket is sorted, so any later equi-join or
aggregation on that key reads co-located, pre-sorted buckets — zero
Exchange in the plan (SortMergeJoin with both shuffles elided; the sort
may be elided too).

This is Spark's native bucketing (``DataFrameWriter.bucketBy`` +
``saveAsTable``) — metadata lives in the session catalog; on a real
deployment the metastore makes the layout durable and shared. The
reference (a Postgres profiler) has no storage layer at all; this module
exists for the north-star scale posture.

The companion :func:`write_sorted` covers the *scan-pruning* axis:
writing files range-partitioned and sorted by a filter key (e.g. event
time) tightens parquet row-group min/max stats, so predicate pushdown
skips whole row groups/files — the lakehouse analog of an index.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str] | str,
    n_buckets: int,
    sort_cols: Sequence[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``n_buckets`` should be sized so one bucket of the LARGER table fits
    an executor's memory comfortably (buckets are the unit of read
    parallelism for co-located plans; too few buckets caps parallelism,
    too many makes small files). Join partners must use the SAME bucket
    count and columns — Spark only elides the shuffle when the bucket
    specs line up.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *cols)
    if sort_cols is not None:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sc)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog; a plain ``spark.read.parquet(path)`` on the same files
    would NOT know the layout and would shuffle again)."""
    return spark.table(table_name)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str] | str,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-partitioned + sorted by ``sort_cols``.

    Globally range-partitioning before the write gives each output file
    a disjoint key range, and sorting within files tightens row-group
    min/max statistics — selective filters on the sort key then skip
    files and row groups entirely (visible as tiny scan row counts, not
    in the logical plan). Use for the dominant filter column: event
    time for logs, id for point lookups.
    """
    sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    out = df.repartitionByRange(*sc) if n_files is None else df.repartitionByRange(n_files, *sc)
    out.sortWithinPartitions(*sc).write.mode(mode).parquet(path)
