"""As-of join operator: backward inclusive semantics, NULL path, ties."""

import datetime as dt

from pyspark.sql import functions as F

from overpaint_spark.operators.asof import asof_join_backward


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 10:00:00")),   # after two quotes
            (2, "a", _ts("2024-01-01 09:00:00")),   # exactly at a quote (tie)
            (3, "a", _ts("2024-01-01 07:00:00")),   # before any quote → NULL
            (4, "b", _ts("2024-01-01 12:00:00")),   # other key
            (5, "c", _ts("2024-01-01 12:00:00")),   # key absent on right → NULL
        ],
        "trade_id long, sym string, trade_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 08:00:00"), 100.0),
            ("a", _ts("2024-01-01 09:00:00"), 101.0),
            ("b", _ts("2024-01-01 11:30:00"), 55.0),
            ("b", _ts("2024-01-01 12:30:00"), 56.0),  # in the future → ignored
        ],
        "sym string, quote_ts timestamp, px double",
    )
    return left, right


def test_backward_inclusive_and_null(spark):
    left, right = _frames(spark)
    out = asof_join_backward(
        left, right, on="sym", left_ts="trade_ts", right_ts="quote_ts",
        payload_cols=["px"],
    )
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got == {1: 101.0, 2: 101.0, 3: None, 4: 55.0, 5: None}
    # all left rows and columns survive
    assert out.count() == left.count()
    assert set(left.columns) <= set(out.columns)


def test_payload_ts_column(spark):
    left, right = _frames(spark)
    out = asof_join_backward(
        left, right, on="sym", left_ts="trade_ts", right_ts="quote_ts",
        payload_cols=["px", "quote_ts"],
    )
    row = {r["trade_id"]: r for r in out.collect()}
    assert row[1]["quote_ts"] == _ts("2024-01-01 09:00:00")
    assert row[3]["quote_ts"] is None


def test_matches_sql_correlated_oracle(spark):
    """Cross-check against the O(n^2) correlated-subquery definition."""
    left, right = _frames(spark)
    out = asof_join_backward(
        left, right, on="sym", left_ts="trade_ts", right_ts="quote_ts",
        payload_cols=["px"],
    ).orderBy("trade_id")
    left.createOrReplaceTempView("trades")
    right.createOrReplaceTempView("quotes")
    naive = spark.sql(
        """
        SELECT t.*, (
          SELECT MAX_BY(q.px, q.quote_ts) FROM quotes q
          WHERE q.sym = t.sym AND q.quote_ts <= t.trade_ts
        ) AS px
        FROM trades t ORDER BY trade_id
        """
    )
    assert [r.asDict() for r in out.collect()] == [r.asDict() for r in naive.collect()]


def test_sessionize_agrees_with_native_session_window(spark):
    """Our lag/window sessionization matches Spark's built-in
    session_window aggregation on the fixture (same gap, same
    session row counts and bounds) — evidence the custom formulation is
    the same operator, kept because its session_id is oracle-checkable
    while session_window's struct key is engine-specific."""
    from pyspark.sql import functions as F

    from overpaint_spark import queries as Q
    from overpaint_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    ours = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in Q.q_events_sessionize(spark, sf).collect()
    }
    e = load_table(spark, f"{sf}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    native = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in (
            e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
            )
            .select("user_id", "session_start", "session_end", "n_events")
        ).collect()
    }
    norm_ours = {
        (u, s.isoformat(), e_.isoformat()): n for (u, s, e_), n in ours.items()
    }
    norm_native = {
        (u, s.isoformat(), e_.isoformat()): n for (u, s, e_), n in native.items()
    }
    assert norm_ours == norm_native


def test_null_payload_in_latest_right_row_not_resurrected(spark):
    """A NULL field in the matched right row must come through as NULL —
    per-column carry-forward would resurrect the older row's value and
    emit a (px, qty) combination that never existed on the right."""
    from pyspark.sql import functions as F

    from overpaint_spark.operators.asof import asof_join_backward

    right = spark.createDataFrame(
        [("a", 1, 5.0, 10), ("a", 2, None, 20)],
        "k string, ts int, px double, qty int",
    )
    left = spark.createDataFrame([("a", 3)], "k string, ts int")
    out = asof_join_backward(left, right, "k", "ts", "ts", ["px", "qty"]).collect()
    assert len(out) == 1
    assert out[0].px is None and out[0].qty == 20
