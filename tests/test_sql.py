"""Spark SQL surface (overpaint_spark/sql.py)."""

from pyspark.sql import functions as F

from overpaint_spark.sql import register_tables, sql

SF = "/root/testdata/sf0.001"


def test_register_tables_covers_data_root(spark):
    names = register_tables(spark, SF)
    assert set(names) >= {
        "customer", "documents", "embeddings", "events", "lineitem",
        "nation", "orders", "part", "region", "supplier",
    }
    # the nanos-timestamp table resolves through the same loader as the
    # DataFrame path (plain spark.read.parquet would throw)
    assert spark.sql("SELECT MIN(ts) FROM events").collect()[0][0] is not None


def test_sql_matches_dataframe_result(spark):
    got = {
        (r.l_returnflag, r.n)
        for r in sql(
            spark, SF,
            "SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
            "GROUP BY l_returnflag",
        ).collect()
    }
    from overpaint_spark.sources.catalog import load_table

    want = {
        (r.l_returnflag, r.n)
        for r in load_table(spark, f"{SF}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_sql_join_gets_broadcast_plan(spark):
    import contextlib
    import io

    df = sql(
        spark, SF,
        "SELECT n_name, COUNT(*) AS n FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    # Catalyst plans the tiny dimension as a broadcast join for SQL text
    # exactly as it does for the DataFrame API
    assert "BroadcastHashJoin" in buf.getvalue()


def test_cli_standalone_modes_reject_monitoring_flags(tmp_path):
    """--incremental-state combined with --snapshot-dir must error, not
    silently skip the requested snapshot (a hole in monitoring history
    no scheduler would alert on)."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "overpaint_spark.cli", "/root/testdata/sf0.001",
         "--incremental-state", str(tmp_path / "st"),
         "--snapshot-dir", str(tmp_path / "snaps"), "--run-id", "r1"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 2
    assert "standalone mode" in proc.stderr
