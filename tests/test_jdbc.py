"""JDBC source construction — the connection-free surface.

No Postgres server or JDBC driver exists in this environment, so these
tests pin everything that happens BEFORE a connection: the env contract
(listTables.tsx:184-201 parity), identifier quoting (:43-45), the
discovery subquery text (:330-346), and the reader option plumbing
(partitioned parallel reads). Loading against a live server is the only
untested step, and it is pure `spark.read.format("jdbc").load()`.
"""

import pytest

from overpaint_spark.sources.jdbc import (
    DISCOVERY_SQL,
    JdbcConfig,
    config_from_env,
    quote_ident,
    table_options,
)


def test_config_from_env_pg_vars():
    cfg = config_from_env(
        {
            "PGHOST": "db.internal",
            "PGPORT": "5433",
            "PGDATABASE": "warehouse",
            "PGUSER": "metrics",
            "PGPASSWORD": "s3cret",
            "PGSSL": "true",
        }
    )
    assert cfg == JdbcConfig("db.internal", 5433, "warehouse", "metrics", "s3cret", True)
    assert cfg.url == "jdbc:postgresql://db.internal:5433/warehouse?sslmode=require"


def test_config_from_env_defaults():
    cfg = config_from_env({})
    assert cfg == JdbcConfig()
    assert cfg.url == "jdbc:postgresql://localhost:5432/postgres"


def test_database_url_wins_over_pg_vars():
    cfg = config_from_env(
        {
            "DATABASE_URL": "postgres://u:p%40ss@h1:6543/appdb?sslmode=require",
            "PGHOST": "ignored",
            "PGDATABASE": "ignored",
        }
    )
    assert cfg.host == "h1" and cfg.port == 6543 and cfg.database == "appdb"
    assert cfg.user == "u" and cfg.password == "p@ss"  # %-decoded
    assert cfg.ssl


def test_quote_ident_doubles_embedded_quotes():
    assert quote_ident("plain") == '"plain"'
    assert quote_ident('we"ird') == '"we""ird"'


def test_discovery_sql_matches_reference_semantics():
    # the A1 query's load-bearing clauses (listTables.tsx:330-346)
    assert "pg_class" in DISCOVERY_SQL and "pg_namespace" in DISCOVERY_SQL
    assert "relkind = 'r'" in DISCOVERY_SQL
    assert "GREATEST(c.reltuples::bigint, 0)" in DISCOVERY_SQL
    assert "COALESCE(cols.column_count, 0)" in DISCOVERY_SQL
    assert DISCOVERY_SQL.count("'pg_catalog', 'information_schema'") == 2


def test_table_options():
    opts = table_options(
        JdbcConfig(),
        "public",
        "orders",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=64,
    )
    assert opts["dbtable"] == '"public"."orders"'
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "64"
    assert opts["driver"] == "org.postgresql.Driver"


def test_table_options_partition_bounds_required():
    with pytest.raises(ValueError, match="lower_bound"):
        table_options(JdbcConfig(), "public", "orders",
                      partition_column="o_orderkey")


def test_jdbc_live_roundtrip_embedded_derby(spark, tmp_path):
    """LIVE JDBC path: write + partitioned parallel read against the
    embedded Derby database whose driver ships with Spark. This drives
    the exact ``spark.read.format("jdbc")`` machinery ``read_jdbc_table``
    configures (partitionColumn stride slicing, predicate pushdown into
    remote SQL) — only the url/driver pair differs from the Postgres
    deployment, which needs the org.postgresql jar on the classpath
    (unavailable offline; this test is the connection-ful complement to
    the option-map unit tests above)."""
    url = f"jdbc:derby:{tmp_path}/livedb;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    try:
        spark.createDataFrame(
            [(i, f"name_{i}") for i in range(100)], "id int, name string"
        ).write.format("jdbc").option("url", url).option(
            "dbtable", "people"
        ).option("driver", "org.apache.derby.jdbc.EmbeddedDriver").save()
    except Exception as exc:  # pragma: no cover - driver absent elsewhere
        pytest.skip(f"embedded Derby driver unavailable: {exc}")
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "people")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .option("partitionColumn", "id")
        .option("lowerBound", "0")
        .option("upperBound", "100")
        .option("numPartitions", "4")
        .load()
    )
    assert back.rdd.getNumPartitions() == 4      # stride-sliced parallel read
    assert back.count() == 100
    assert back.filter("id < 10").count() == 10  # predicate pushes to remote SQL
