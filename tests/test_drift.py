"""Profile snapshot persistence + drift detection."""

from overpaint_spark.rules.drift import (
    read_profile_snapshot,
    snapshot_drift,
    write_profile_snapshot,
)

SF1 = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


def test_snapshot_roundtrip_and_drift(spark, tmp_path):
    out = str(tmp_path / "snapshots")
    write_profile_snapshot(spark, SF1, out, run_id="r1")
    write_profile_snapshot(spark, SF2, out, run_id="r2")

    s1 = read_profile_snapshot(spark, out, "r1")
    s2 = read_profile_snapshot(spark, out, "r2")
    assert s1.count() > 0 and s2.count() > 0
    assert set(s1.columns) == {
        "run_id", "table_name", "column_name", "metric", "value_str", "value_num"
    }

    drift = snapshot_drift(s2, s1, tolerance=0.2).collect()
    by_key = {(r.table_name, r.column_name, r.metric): r for r in drift}

    # sf0.001 → sf0.01 is a 10× row-count jump → alert
    rc = by_key[("lineitem", None, "estimated_rows")]
    assert rc.drift_alert and rc.pct_change > 5
    # column_count is stable across scale factors → no alert
    cc = by_key[("lineitem", None, "column_count")]
    assert not cc.drift_alert and cc.pct_change == 0.0


def test_drift_presence_change_alerts(spark):
    cur = spark.createDataFrame(
        [("t", "c", "min", "1", 1.0)],
        "table_name string, column_name string, metric string, value_str string, value_num double",
    )
    prev = spark.createDataFrame(
        [("t", "c", "min", "1", 1.0), ("t", "d", "min", "9", 9.0)],
        "table_name string, column_name string, metric string, value_str string, value_num double",
    )
    rows = {(r.table_name, r.column_name, r.metric): r
            for r in snapshot_drift(cur, prev).collect()}
    assert rows[("t", "d", "min")].drift_alert         # column disappeared
    assert not rows[("t", "c", "min")].drift_alert     # unchanged
