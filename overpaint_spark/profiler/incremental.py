"""Incremental, partition-parallel profiling with mergeable per-file stats.

The reference profiles a live database, so every run re-reads every table
(one query per column — ``/root/reference/src/listTables.tsx:236-251``) and
its only cheap path is the planner's stale row estimate
(``pg_class.reltuples``, listTables.tsx:339). On an append-mostly data lake
at 100 TB, re-scanning unchanged data every monitoring run is the dominant
cost — and unnecessary: all of the profiler's statistics are **mergeable**.

This module keeps a *profile state* relation with one row per
``(file, column)`` holding only mergeable accumulators:

- ``n_rows`` / ``n_nonnull``            → merge by SUM
- ``min_d``/``max_d`` (numeric, double) → merge by MIN / MAX
- ``min_us``/``max_us`` (temporal, epoch microseconds) → MIN / MAX
- ``min_s``/``max_s`` (string, binary collation)       → MIN / MAX
- ``n_true``/``n_false`` (boolean, 3VL ``count_if``)   → SUM
- ``hll`` — a DataSketches HLL sketch (``hll_sketch_agg``) → merge by
  ``hll_union_agg`` → ``hll_sketch_estimate`` for distinct-count estimates

A monitoring run then:

1. lists the table's current data files (driver-side, metadata only),
2. profiles **only files not yet in the state** — one Spark job whose scan
   reads just the new files (partial aggregation collapses each file's
   rows map-side; the shuffle carries one row per (file, column)),
3. appends the new rows to the state (parquet),
4. folds the state into a full-table profile with a tiny all-metadata
   aggregation (thousands of rows, not terabytes).

So steady-state profiling cost is proportional to *new data*, not table
size — the correct analog of the reference's "single, fast catalog query"
posture (README.md:8) for an object-store lake.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from overpaint_spark.functions import typeclass

#: lg_2 of the HLL register count — 4 KiB sketches, ~1.6% relative error.
DEFAULT_LG_K = 12

STATE_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("file_size", T.LongType()),
        T.StructField("column_name", T.StringType()),
        T.StructField("col_kind", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_nonnull", T.LongType()),
        T.StructField("min_d", T.DoubleType()),
        T.StructField("max_d", T.DoubleType()),
        T.StructField("min_us", T.LongType()),
        T.StructField("max_us", T.LongType()),
        T.StructField("min_s", T.StringType()),
        T.StructField("max_s", T.StringType()),
        T.StructField("n_true", T.LongType()),
        T.StructField("n_false", T.LongType()),
        T.StructField("hll", T.BinaryType()),
    ]
)


def column_kind(dt: T.DataType) -> str:
    if typeclass.is_numeric(dt):
        return "numeric"
    # before the general temporal test: TimeType has no MIN/MAX support
    # in Spark 4.1 and its range is carried in the mergeable STRING
    # channel (zero-padded HH:MM:SS[.f] is order-preserving)
    if typeclass.is_time(dt):
        return "time"
    if typeclass.is_temporal(dt):
        return "temporal"
    if typeclass.is_boolean(dt):
        return "boolean"
    if isinstance(dt, T.StringType):
        return "string"
    return "other"


def _sketch_input(c, dt: T.DataType):
    """HLL input: the value's 64-bit xxhash (any type, JVM codegen) —
    ~6× cheaper than casting to string, and a 64-bit hash adds no
    measurable error below ~billions of distincts. NULL-guarded because
    ``xxhash64(NULL)`` is the seed constant, not NULL — without the guard
    every null column value would count as one extra distinct."""
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType, T.StringType)):
        return c  # natively supported sketch inputs — no hashing needed
    if typeclass.is_time(dt):
        # xxhash64 rejects TimeType (Spark 4.1) — hash the string form
        return F.when(c.isNotNull(), F.xxhash64(c.cast("string")))
    return F.when(c.isNotNull(), F.xxhash64(c))


def _strip_scheme(p: str) -> str:
    """``file:/x`` / ``file:///x`` → ``/x`` (Hadoop URI → local path)."""
    return re.sub(r"^file:/+", "/", p)


def list_data_files(path: str) -> list[tuple[str, int]]:
    """Driver-side listing of a table's parquet data files (path, size).

    Accepts a single ``.parquet`` file or a directory of them. On a real
    lake this is one object-store LIST call — no Spark job.
    """
    if os.path.isfile(path):
        return [(os.path.abspath(path), os.path.getsize(path))]
    out = []
    for root, _dirs, names in os.walk(path):
        for n in sorted(names):
            if n.endswith(".parquet") and not n.startswith(("_", ".")):
                p = os.path.join(root, n)
                out.append((os.path.abspath(p), os.path.getsize(p)))
    return sorted(out)


def profile_files_df(
    spark: SparkSession,
    table_name: str,
    path: str,
    files: list[str] | None = None,
    lg_k: int = DEFAULT_LG_K,
    with_hll: bool = True,
) -> DataFrame:
    """Per-(file, column) mergeable stats in ONE job over the given files.

    ``files=None`` profiles every data file under ``path``; passing an
    explicit list restricts the scan to exactly those files (the
    incremental path — unchanged files are never read).

    ``with_hll=False`` skips the distinct-count sketches (NULL channel):
    the sketch updates are the single most expensive accumulator
    (~per-value hashing into 4 KiB registers for every column), and
    Catalyst does NOT prune them through the ``stack`` generator when a
    downstream reader discards the channel — measured ~2× on the
    min/max-only profile at sf0.1.
    """
    if files is None:
        files = [p for p, _sz in list_data_files(path)]
    if not files:
        return spark.createDataFrame([], STATE_SCHEMA)
    sizes = dict(list_data_files(path))
    # same TIMESTAMP(NANOS) escape hatch as sources.catalog.load_table:
    # Spark 4 rejects nanos parquet timestamps; read as raw ns longs and
    # truncate to timestamp_ntz micros (what DuckDB/pandas do too)
    from overpaint_spark.sources.catalog import _nanos_timestamp_cols

    nanos = _nanos_timestamp_cols(files[0])
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(*files)
    for c in nanos:
        df = df.withColumn(
            c, F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz")
        )
    # kinds are driven by the ORIGINAL types; TimeType columns are then
    # projected to their order-preserving string form because Spark 4.1
    # cannot plan an aggregate over a scan containing TimeType
    schema = [f_ for f_ in df.schema.fields]
    for f_ in schema:
        if typeclass.is_time(f_.dataType):
            df = df.withColumn(f_.name, F.col(f_.name).cast("string"))
    df = df.select("*", F.input_file_name().alias("__file"))

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, f_ in enumerate(schema):
        c = F.col(f_.name)
        kind = column_kind(f_.dataType)
        aggs.append(F.count(c).alias(f"nn_{i}"))
        if kind == "numeric":
            aggs.append(F.min(c).cast("double").alias(f"mnd_{i}"))
            aggs.append(F.max(c).cast("double").alias(f"mxd_{i}"))
        elif kind == "temporal":
            aggs.append(F.unix_micros(F.min(c).cast("timestamp")).alias(f"mnu_{i}"))
            aggs.append(F.unix_micros(F.max(c).cast("timestamp")).alias(f"mxu_{i}"))
        elif kind == "string":
            aggs.append(F.min(c).alias(f"mns_{i}"))
            aggs.append(F.max(c).alias(f"mxs_{i}"))
        elif kind == "time":
            # column already projected to string above
            aggs.append(F.min(c).alias(f"mns_{i}"))
            aggs.append(F.max(c).alias(f"mxs_{i}"))
        elif kind == "boolean":
            aggs.append(F.count_if(c).alias(f"nt_{i}"))
            aggs.append(F.count_if(~c).alias(f"nf_{i}"))
        if with_hll:
            aggs.append(
                F.hll_sketch_agg(_sketch_input(c, f_.dataType), F.lit(lg_k)).alias(f"hll_{i}")
            )
    wide = df.groupBy(F.col("__file").alias("file_path")).agg(*aggs)

    def ch(i: int, pref: str, typ: str, kinds: set[str], kind: str):
        name = f"{pref}_{i}"
        if kind in kinds:
            return f"`{name}`"
        return f"cast(null as {typ})"

    tuples = []
    for i, f_ in enumerate(schema):
        kind = column_kind(f_.dataType)
        hll = f"`hll_{i}`" if with_hll else "cast(null as binary)"
        tuples.append(
            ", ".join(
                [
                    f"'{f_.name}'",
                    f"'{kind}'",
                    f"`nn_{i}`",
                    ch(i, "mnd", "double", {"numeric"}, kind),
                    ch(i, "mxd", "double", {"numeric"}, kind),
                    ch(i, "mnu", "bigint", {"temporal"}, kind),
                    ch(i, "mxu", "bigint", {"temporal"}, kind),
                    ch(i, "mns", "string", {"string", "time"}, kind),
                    ch(i, "mxs", "string", {"string", "time"}, kind),
                    ch(i, "nt", "bigint", {"boolean"}, kind),
                    ch(i, "nf", "bigint", {"boolean"}, kind),
                    hll,
                ]
            )
        )
    stack = (
        f"stack({len(schema)}, " + ", ".join(tuples) + ") as (column_name, col_kind, "
        "n_nonnull, min_d, max_d, min_us, max_us, min_s, max_s, n_true, n_false, hll)"
    )
    size_map = F.create_map(
        *[F.lit(x) for kv in sizes.items() for x in kv]
    )
    return wide.select(
        F.lit(table_name).alias("table_name"),
        F.col("file_path"),
        size_map[F.regexp_replace("file_path", "^file:/+", "/")].alias("file_size"),
        F.col("n_rows"),
        F.expr(stack),
    ).select([f_.name for f_ in STATE_SCHEMA.fields])


@dataclass
class IncrementalResult:
    new_files: list[str]
    state: DataFrame


def incremental_update(
    spark: SparkSession,
    table_name: str,
    path: str,
    state_dir: str,
    lg_k: int = DEFAULT_LG_K,
) -> IncrementalResult:
    """Profile only files absent from the state, append, return full state.

    File identity is (absolute path, size): an in-place rewrite with a
    different size re-profiles; immutable lake files (the norm) never do.
    """
    current = list_data_files(path)
    seen: set[tuple[str, int]] = set()
    have_state = os.path.isdir(state_dir) and any(
        n.endswith(".parquet") for n in os.listdir(state_dir)
    )
    if have_state:
        prior = spark.read.parquet(state_dir)
        seen = {
            (os.path.abspath(_strip_scheme(r["file_path"])), r["file_size"])
            for r in prior.select("file_path", "file_size")
            .where(F.col("table_name") == table_name)
            .distinct()
            .collect()
        }
    new = [p for p, sz in current if (p, sz) not in seen]
    if new:
        profile_files_df(spark, table_name, path, files=new, lg_k=lg_k).write.mode(
            "append"
        ).parquet(state_dir)
    return IncrementalResult(new, spark.read.parquet(state_dir))


COMPACTED_MARKER = "_compacted"


def compact_state(state: DataFrame) -> DataFrame:
    """Fold a per-file state relation into ONE row per (table, column)
    without losing incrementality.

    The state grows by one row per (new file × column) forever; on a
    lake ingesting thousands of files a day the fold in
    :func:`merged_column_profile` eventually reads more state than it
    saves. Every accumulator merges losslessly — counts by SUM, min/max
    by MIN/MAX, and the HLL registers by ``hll_union_agg`` which returns
    a *sketch*, not an estimate — so periodically rewriting the state as
    its own aggregate is exact: profiles and distinct estimates after
    compaction are bit-identical to the uncompacted fold, and NEW files
    keep appending next to the compacted row (checked in tests).

    Two row kinds come back:

    - one ``_compacted`` stats row per (table, column) holding the merged
      accumulators;
    - one zero-stat **tombstone** row per real file (column ``_file``)
      preserving the (path, size) identity set, so
      ``incremental_update`` still knows which files are already
      profiled and only scans genuinely new ones after compaction.
    """
    tombstones = (
        state.filter(F.col("file_path") != COMPACTED_MARKER)
        .select("table_name", "file_path", "file_size")
        .distinct()
        .select(
            "table_name",
            "file_path",
            "file_size",
            F.lit("_file").alias("column_name"),
            F.lit("file").alias("col_kind"),
            F.lit(0).cast("long").alias("n_rows"),
            F.lit(0).cast("long").alias("n_nonnull"),
            F.lit(None).cast("double").alias("min_d"),
            F.lit(None).cast("double").alias("max_d"),
            F.lit(None).cast("long").alias("min_us"),
            F.lit(None).cast("long").alias("max_us"),
            F.lit(None).cast("string").alias("min_s"),
            F.lit(None).cast("string").alias("max_s"),
            F.lit(None).cast("long").alias("n_true"),
            F.lit(None).cast("long").alias("n_false"),
            F.lit(None).cast("binary").alias("hll"),
        )
        .select([f_.name for f_ in STATE_SCHEMA.fields])
    )
    stats = (
        state.filter(F.col("column_name") != "_file")
        .groupBy("table_name", "column_name", "col_kind")
        .agg(
            F.lit(COMPACTED_MARKER).alias("file_path"),
            F.sum("file_size").alias("file_size"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_nonnull").alias("n_nonnull"),
            F.min("min_d").alias("min_d"),
            F.max("max_d").alias("max_d"),
            F.min("min_us").alias("min_us"),
            F.max("max_us").alias("max_us"),
            F.min("min_s").alias("min_s"),
            F.max("max_s").alias("max_s"),
            F.sum("n_true").alias("n_true"),
            F.sum("n_false").alias("n_false"),
            F.when(
                F.count("hll") > 0, F.hll_union_agg("hll", F.lit(True))
            ).otherwise(F.lit(None).cast("binary")).alias("hll"),
        )
        .select([f_.name for f_ in STATE_SCHEMA.fields])
    )
    return stats.unionByName(tombstones)


def merged_column_profile(state: DataFrame, approx_distinct: bool = True) -> DataFrame:
    """Fold the per-file state into a per-(table, column) profile.

    Pure metadata aggregation — input is one row per (file, column).
    ``approx_distinct`` unions the per-file HLL sketches; the estimate is
    identical to sketching the whole table in one pass (sketch union is
    lossless), which is what makes distinct counts incrementally
    maintainable at all.
    """
    aggs = [
        F.sum("n_rows").alias("n_rows"),
        (F.sum("n_rows") - F.sum("n_nonnull")).alias("null_count"),
        F.min("min_d").alias("min_d"),
        F.max("max_d").alias("max_d"),
        F.min("min_us").alias("min_us"),
        F.max("max_us").alias("max_us"),
        F.min("min_s").alias("min_s"),
        F.max("max_s").alias("max_s"),
        F.sum("n_true").alias("n_true"),
        F.sum("n_false").alias("n_false"),
    ]
    if approx_distinct:
        aggs.append(
            F.when(
                F.count("hll") > 0,
                F.hll_sketch_estimate(F.hll_union_agg("hll", F.lit(True))),
            )
            .otherwise(F.lit(None).cast("long"))
            .alias("approx_distinct")
        )
    return (
        state.filter(F.col("column_name") != "_file")  # compaction tombstones
        .groupBy("table_name", "column_name", "col_kind")
        .agg(*aggs)
        .orderBy("table_name", "column_name")
    )
