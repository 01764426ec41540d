"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in :mod:`overpaint_spark.queries`; this
module is the thin adapter the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from overpaint_spark import queries as _Q

_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the single-pass profiler's min/max relation over
    every numeric column of every sf0.001 table (one aggregate job per
    table — the reference needs one full scan per column for this)."""
    return _Q.q_profile_minmax_numeric(spark, _SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + the
    LLM-pipeline extensions."""
    return dict(_Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    approximate operators whose output depends on float bucketing —
    the driver records a rows-only check for those)."""
    return _Q.oracles()
