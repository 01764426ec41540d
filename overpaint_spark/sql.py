"""The Spark SQL surface: fixture tables as temp views + ad-hoc SQL.

The north star names "Spark SQL + DataFrame validation rules"; the
DataFrame half is queries.py / rules/. This module is the SQL half for
interactive use: register every table under a data root as a temp view
(through :func:`load_table`, so TIMESTAMP(NANOS) events and CSV/JSON
tables resolve identically to the DataFrame path) and run arbitrary
``spark.sql`` text against them. Catalyst applies the same pushdown /
pruning / broadcast planning either way — the two surfaces produce the
same physical plans for the same logical query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from overpaint_spark.sources.catalog import discover_tables, load_table


def register_tables(spark: SparkSession, data_root: str) -> list[str]:
    """Create/replace one temp view per discovered table; returns the
    view names (driver-side listing + schema reads — no jobs)."""
    names = []
    for h in discover_tables(data_root):
        load_table(spark, h).createOrReplaceTempView(h.name)
        names.append(h.name)
    return names


def sql(spark: SparkSession, data_root: str, query: str) -> DataFrame:
    """Run SQL text over a data root's tables."""
    register_tables(spark, data_root)
    return spark.sql(query)
