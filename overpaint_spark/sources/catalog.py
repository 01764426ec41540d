"""Table discovery + metadata-only statistics over a Parquet data root.

Reference parity (``/root/reference/src/listTables.tsx``):

- ``fetchEstimatedTables`` (:329-348) joins pg_class⋈pg_namespace and reads
  the planner estimate ``GREATEST(reltuples::bigint, 0)``. Here the
  "catalog" is a directory of ``<table>.parquet`` files (or the Spark
  catalog) and the estimate is the *exact* sum of row-group ``num_rows``
  from the Parquet footers — metadata-only, no Spark job, no data scan.
- the system-schema exclusion (:226, :265, :300, :344 — ``table_schema NOT
  IN ('pg_catalog','information_schema')``) maps to skipping hidden/
  non-parquet entries; the ``relkind = 'r'`` filter (:343) maps to
  "ordinary data files only".

At 100 TB a "table" is a directory of many files; ``footer_row_count``
therefore walks directories and sums per-file footer counts, which is
O(#files) metadata reads and zero data IO — the same cost profile as the
reference's single catalog query.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SYSTEM_PREFIXES = (".", "_")  # analog of pg_catalog/information_schema


# extension → spark.read format for file-per-table sources
_FORMATS = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".orc": "orc",
}


@dataclass(frozen=True)
class TableHandle:
    """A discovered table: schema-qualified name + physical path."""

    schema: str
    name: str
    path: str
    fmt: str = "parquet"

    @property
    def qualified(self) -> str:
        return f"{self.schema}.{self.name}"


def discover_tables(data_root: str, schema: str = "public") -> list[TableHandle]:
    """Enumerate tables under ``data_root`` (one ``<name>.<ext>`` file or
    one directory per table; parquet/csv/json — whatever ``spark.read``
    takes), sorted by name — the ORDER BY table_schema, table_name of the
    reference's catalog queries (listTables.tsx:345). Directory tables
    are parquet (the multi-file layout every writer produces)."""
    if not os.path.isdir(data_root):
        return []
    out: list[TableHandle] = []
    for entry in sorted(os.listdir(data_root)):
        if entry.startswith(_SYSTEM_PREFIXES):
            continue
        full = os.path.join(data_root, entry)
        stem, ext = os.path.splitext(entry)
        if ext in _FORMATS and os.path.isfile(full):
            out.append(TableHandle(schema, stem, full, _FORMATS[ext]))
        elif os.path.isdir(full):
            out.append(TableHandle(schema, entry, full))
    return out


def _parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    files: list[str] = []
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet") and not n.startswith(_SYSTEM_PREFIXES):
                files.append(os.path.join(root, n))
    return sorted(files)


def _mtime_key(path: str) -> float:
    """Cheap invalidation token: the MAX mtime over the table path and
    every directory beneath it. The root's own mtime alone is not
    enough for partitioned tables — appending a file inside an existing
    ``date=.../`` subdirectory bumps that subdirectory's mtime, not the
    root's, and a root-only key would serve stale footer counts and
    cached DataFrames for the rest of the process. Walking directory
    entries only (never stat-ing data files) keeps this proportional to
    partition count, not file count.

    Known limitation (immutable-file assumption): an IN-PLACE rewrite
    of an existing data file changes no directory entry, so no mtime
    in this key moves and cached counts stay stale until process
    restart. Every parquet writer this engine supports (Spark, arrow,
    duckdb) writes NEW files and deletes old ones — both of which bump
    the containing directory — so the key is sound for append,
    overwrite-as-replace, and partition-add; only an external tool
    truncating bytes inside an existing ``.parquet`` file escapes it,
    and guarding that would mean stat-ing every data file on every
    lookup (the exact cost this cache exists to avoid)."""
    try:
        newest = os.stat(path).st_mtime
    except OSError:
        return -1.0
    if os.path.isdir(path):
        for root, dirs, _names in os.walk(path):
            for d in dirs:
                try:
                    newest = max(newest, os.stat(os.path.join(root, d)).st_mtime)
                except OSError:
                    pass
    return newest


@lru_cache(maxsize=4096)
def _footer_row_count_cached(path: str, _mtime: float) -> int:
    import pyarrow.parquet as pq

    total = 0
    for f in _parquet_files(path):
        total += pq.ParquetFile(f).metadata.num_rows
    return max(total, 0)


@lru_cache(maxsize=4096)
def _orc_row_count_cached(path: str, _mtime: float) -> int:
    import pyarrow.orc as po

    return max(po.ORCFile(path).nrows, 0)


def footer_row_count(path: str) -> int:
    """Exact row count from Parquet footer metadata — no data scan.

    This replaces the reference's planner estimate
    ``GREATEST(c.reltuples::bigint, 0)`` (listTables.tsx:339): same O(1)
    cost class (metadata only), better accuracy (footer counts are exact).
    The ``GREATEST(..., 0)`` clamp is kept for parity — footer counts are
    never negative, but a corrupt footer should not produce one either.
    Cached per (path, mtime) — the catalog-statistics cache every engine
    keeps. Non-parquet sources carry no row metadata → raises, and the
    profiler records estimated_rows = None (rendered blank), matching a
    never-ANALYZEd table in the reference.
    """
    if os.path.isfile(path) and path.endswith(".orc"):
        # ORC carries the same footer-level count (file + stripe metadata)
        return _orc_row_count_cached(path, _mtime_key(path))
    if not _parquet_files(path):
        raise ValueError(f"no parquet footers under {path}")
    return _footer_row_count_cached(path, _mtime_key(path))


@lru_cache(maxsize=4096)
def _nanos_timestamp_cols_cached(
    path: str, _mtime: float, all_footers: bool
) -> tuple[str, ...]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = _parquet_files(path)
    if not files:
        return ()
    if not all_footers:
        files = files[:1]
    seen: set[str] = set()
    out: list[str] = []
    for fpath in files:
        for f in pq.ParquetFile(fpath).schema_arrow:
            if (
                f.name not in seen
                and pa.types.is_timestamp(f.type)
                and f.type.unit == "ns"
            ):
                seen.add(f.name)
                out.append(f.name)
    return tuple(out)


@lru_cache(maxsize=4096)
def _utc_adjusted_time_cols_cached(
    path: str, _mtime: float, all_footers: bool = False
) -> tuple[str, ...]:
    import pyarrow.parquet as pq

    files = _parquet_files(path)
    if not files:
        return ()
    if not all_footers:
        files = files[:1]
    seen: set[str] = set()
    out: list[str] = []
    for fpath in files:
        schema = pq.ParquetFile(fpath).schema
        for i in range(len(schema)):
            lt = str(schema.column(i).logical_type)
            name = schema.column(i).name
            if (
                name not in seen
                and lt.startswith("Time(")
                and "isAdjustedToUTC=true" in lt
            ):
                seen.add(name)
                out.append(name)
    return tuple(out)


def _check_utc_adjusted_time(path: str, all_footers: bool = False) -> None:
    """Spark 4 reads Parquet TIME only with isAdjustedToUTC=false (the
    form Postgres/DuckDB exports write); the UTC-adjusted form (Arrow's
    default for ``time64``) fails deep in scan planning with an opaque
    PARQUET_TYPE_ILLEGAL. Surface a clear, per-table error naming the
    columns and the rewrite instead — TimeType cannot be constructed
    from raw values in Spark 4.1, so there is no nanosAsLong-style
    escape hatch to apply. ``all_footers`` mirrors the nanos-timestamp
    sniff's mergeSchema scope: a UTC-adjusted TIME column ADDED by
    schema evolution in a later file must hit the friendly error too."""
    bad = _utc_adjusted_time_cols_cached(path, _mtime_key(path), all_footers)
    if bad:
        raise ValueError(
            f"columns {list(bad)} are Parquet TIME with isAdjustedToUTC=true, "
            "which Spark cannot read; rewrite with isAdjustedToUTC=false "
            "(e.g. COPY through DuckDB) to profile this table"
        )


def _nanos_timestamp_cols(path: str, all_footers: bool = False) -> list[str]:
    """Column names stored as Parquet TIMESTAMP(NANOS), cached per
    (path, mtime, scope) — schema sniffing is per-query driver work
    otherwise. Default scope is the first file's footer (one metadata
    read, matching the default single-schema read); ``all_footers``
    unions every file's footer so a nanos column ADDED by schema
    evolution in a later file is still caught — mergeSchema reads every
    footer anyway, so the scan pays nothing extra."""
    return list(_nanos_timestamp_cols_cached(path, _mtime_key(path), all_footers))


def load_table(
    spark: SparkSession,
    handle: TableHandle | str,
    merge_schema: bool = False,
) -> DataFrame:
    """Read one table as a DataFrame (columnar, lazy).

    Spark 4 rejects Parquet ``TIMESTAMP(NANOS)`` outright
    (PARQUET_TYPE_ILLEGAL); those columns are read via the public
    ``spark.sql.legacy.parquet.nanosAsLong`` escape hatch as raw
    nanosecond longs and converted to ``timestamp_ntz`` (truncating
    ns→µs, the same truncation DuckDB/pandas apply).

    ``merge_schema`` unions the schemas of every file in a directory
    table (columns added by schema evolution appear, NULL for older
    files) instead of trusting one footer. Off by default: merging
    reads every footer, which matters on a 100 TB many-file table —
    turn it on for evolved tables, or after schema_drift flags one.
    """
    path = handle.path if isinstance(handle, TableHandle) else handle
    fmt = handle.fmt if isinstance(handle, TableHandle) else "parquet"
    # Per-session DataFrame cache: a DataFrame is an immutable lazy plan,
    # so handing the same object to every query saves a JVM analyze
    # round-trip per (query × table) — the catalog cache of a real engine.
    cache: dict[str, DataFrame] = getattr(spark, "_overpaint_df_cache", None) or {}
    if not hasattr(spark, "_overpaint_df_cache"):
        spark._overpaint_df_cache = cache
    key = f"{path}@{_mtime_key(path)}@{merge_schema}"
    if key in cache:
        return cache[key]
    if fmt == "csv":
        df = spark.read.csv(path, header=True, inferSchema=True)
        cache[key] = df
        return df
    if fmt == "json":
        df = spark.read.json(path)
        cache[key] = df
        return df
    # only pass mergeSchema when requested — an explicit False would
    # override a user-set session default (spark.sql.parquet.mergeSchema
    # / spark.sql.orc.mergeSchema) for embedded callers
    opts: dict[str, bool] = {"mergeSchema": True} if merge_schema else {}
    if fmt == "orc":
        df = spark.read.orc(path, **opts)
        cache[key] = df
        return df
    _check_utc_adjusted_time(path, all_footers=merge_schema)
    nanos = _nanos_timestamp_cols(path, all_footers=merge_schema)
    if not nanos:
        df = spark.read.parquet(path, **opts)
    else:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path, **opts)
        for c in nanos:
            df = df.withColumn(
                c,
                # integer `div` — float division would lose precision above 2^53 ns
                F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz"),
            )
    cache[key] = df
    return df


def load_all(spark: SparkSession, data_root: str) -> dict[str, DataFrame]:
    """Read every discovered table; keys are bare table names."""
    return {h.name: load_table(spark, h) for h in discover_tables(data_root)}
