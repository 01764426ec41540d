"""Incremental profiler: only new files scanned; merge == full recompute.

The reference re-reads every table on every run (one query per column,
listTables.tsx:236-251); the incremental state makes steady-state profiling
cost proportional to NEW data only — the 100 TB monitoring posture.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from overpaint_spark.sources.catalog import load_table
from overpaint_spark.profiler.incremental import (
    incremental_update,
    list_data_files,
    merged_column_profile,
    profile_files_df,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def multi_file_table(spark, tmp_path_factory):
    """events split into 3 parquet files under one directory-table."""
    root = str(tmp_path_factory.mktemp("inc") / "events_dir")
    ev = load_table(spark, f"{SF}/events.parquet")
    ev.repartition(3).write.parquet(root)
    return root


def test_profile_files_one_row_per_file_and_column(spark, multi_file_table):
    st = profile_files_df(spark, "events", multi_file_table)
    files = {p for p, _ in list_data_files(multi_file_table)}
    n_cols = len(spark.read.parquet(multi_file_table).columns)
    rows = st.collect()
    assert len(rows) == len(files) * n_cols
    assert {r["file_size"] for r in rows} == {s for _, s in list_data_files(multi_file_table)}
    # every file's n_rows is consistent across its column rows
    per_file = st.groupBy("file_path").agg(F.count_distinct("n_rows").alias("k")).collect()
    assert all(r["k"] == 1 for r in per_file)


def test_merge_matches_full_recompute(spark, multi_file_table):
    st = profile_files_df(spark, "events", multi_file_table)
    merged = {
        r["column_name"]: r for r in merged_column_profile(st).collect()
    }
    ev = spark.read.parquet(multi_file_table)
    n = ev.count()
    direct = ev.agg(
        F.min("value"), F.max("value"),
        F.unix_micros(F.min("ts").cast("timestamp")),
        F.unix_micros(F.max("ts").cast("timestamp")),
        F.min("event_type"), F.max("event_type"),
        F.count("props"),
        F.count_distinct("user_id"),
    ).collect()[0]
    v = merged["value"]
    assert v["n_rows"] == n
    assert v["min_d"] == direct[0] and v["max_d"] == direct[1]
    ts = merged["ts"]
    assert ts["min_us"] == direct[2] and ts["max_us"] == direct[3]
    et = merged["event_type"]
    assert et["min_s"] == direct[4] and et["max_s"] == direct[5]
    assert merged["props"]["null_count"] == n - direct[6]
    # HLL union estimate within 5% of exact distinct
    exact = direct[7]
    est = merged["user_id"]["approx_distinct"]
    assert est is not None and abs(est - exact) / exact < 0.05


def test_incremental_update_scans_only_new_files(spark, multi_file_table, tmp_path):
    state_dir = str(tmp_path / "state")
    r1 = incremental_update(spark, "events", multi_file_table, state_dir)
    assert len(r1.new_files) == 3
    # idempotent: second run profiles nothing
    r2 = incremental_update(spark, "events", multi_file_table, state_dir)
    assert r2.new_files == []
    n_before = r2.state.count()

    # append one new file → exactly that file is profiled
    extra = load_table(spark, f"{SF}/events.parquet").limit(100)
    extra.coalesce(1).write.mode("append").parquet(multi_file_table)
    r3 = incremental_update(spark, "events", multi_file_table, state_dir)
    assert len(r3.new_files) == 1
    assert r3.state.count() > n_before

    # merged profile over the grown state == full recompute on all files
    merged = {r["column_name"]: r for r in merged_column_profile(r3.state).collect()}
    ev = spark.read.parquet(multi_file_table)
    assert merged["event_id"]["n_rows"] == ev.count()
    direct_min = ev.agg(F.min("value")).collect()[0][0]
    assert merged["value"]["min_d"] == direct_min


def test_boolean_and_array_channels(spark, tmp_path):
    import pyspark.sql.types as T

    data = [(1, True, [1.0, 2.0]), (2, False, None), (3, None, [3.0, 4.0]),
            (4, True, [5.0, 6.0])]
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("vec", T.ArrayType(T.DoubleType())),
    ])
    p = str(tmp_path / "t")
    spark.createDataFrame(data, schema).coalesce(1).write.parquet(p)
    merged = {r["column_name"]: r for r in
              merged_column_profile(profile_files_df(spark, "t", p)).collect()}
    fl = merged["flag"]
    # 3VL: NULL in neither bucket (listTables.tsx:314-315 parity)
    assert fl["n_true"] == 2 and fl["n_false"] == 1 and fl["null_count"] == 1
    assert merged["vec"]["null_count"] == 1
    assert merged["vec"]["approx_distinct"] == 3


def test_compaction_exact_and_preserves_incrementality(spark, tmp_path):
    """compact_state folds N per-file rows into one per column without
    changing any profile value or distinct estimate, keeps file identity
    (new runs scan only NEW files), and composes (compact twice = once)."""
    import os

    from overpaint_spark.profiler.incremental import (
        COMPACTED_MARKER,
        compact_state,
        incremental_update,
        merged_column_profile,
    )

    table_dir = str(tmp_path / "t")
    state_dir = str(tmp_path / "state")

    def add_files(lo, hi):
        spark.range(lo, hi).selectExpr(
            "id AS k", "CAST(id % 17 AS DOUBLE) AS v"
        ).coalesce(1).write.mode("append").parquet(table_dir)

    add_files(0, 500)
    add_files(500, 900)
    r1 = incremental_update(spark, "t", table_dir, state_dir)
    assert len(r1.new_files) == 2

    def norm(df):
        rows = merged_column_profile(df).collect()
        return sorted((r.table_name, r.column_name, r.n_rows, r.null_count,
                       r.min_d, r.max_d, r.approx_distinct) for r in rows)

    uncompacted = norm(r1.state)
    compacted_df = compact_state(r1.state)
    assert norm(compacted_df) == uncompacted  # lossless (incl. HLL estimate)
    # idempotent under re-compaction
    assert norm(compact_state(compacted_df)) == uncompacted

    # rewrite the state compacted (fresh dir: the plan is lazy over the
    # old one); a new file must be the ONLY new scan afterwards
    state_dir2 = str(tmp_path / "state2")
    compacted_df.write.mode("append").parquet(state_dir2)
    add_files(900, 1000)
    r2 = incremental_update(spark, "t", table_dir, state_dir2)
    assert len(r2.new_files) == 1  # the two old files stayed "seen"
    got = {(r.column_name): (r.n_rows, r.min_d, r.max_d)
           for r in merged_column_profile(r2.state).collect()}
    assert got["k"] == (1000, 0.0, 999.0)
    assert got["v"] == (1000, 0.0, 16.0)


def test_cli_incremental_mode_renders_from_state(spark, tmp_path, capsys):
    """--incremental-state: first run profiles every file, second run
    profiles zero new files, and both render the standard exact-mode
    display (ranges included) from the merged state."""
    from overpaint_spark import cli

    state = str(tmp_path / "state")
    rc = cli.main(["/root/testdata/sf0.001", "--incremental-state", state])
    out1 = capsys.readouterr().out
    assert rc == 0
    assert "rows (exact)" in out1
    assert "public.orders — 1500 rows" in out1
    assert "0-149" in out1                        # numeric range from state
    assert "Jan 2024-Jan 2024" in out1            # temporal range from state
    rc = cli.main(["/root/testdata/sf0.001", "--incremental-state", state])
    out2 = capsys.readouterr().out
    assert rc == 0
    assert "Incremental state: 0 new file(s)" in out2
    # display identical once state is warm
    assert out1.split("Incremental state:")[0] == out2.split("Incremental state:")[0]
