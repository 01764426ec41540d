"""Binned range join: boundary inclusivity, bin crossing, left semantics."""

import datetime as dt

from pyspark.sql import Row

from overpaint_spark.operators.rangejoin import range_join_binned


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    events = spark.createDataFrame(
        [
            Row(k=1, eid=1, ts=_ts("2024-01-01 10:00:00")),  # == start (inclusive)
            Row(k=1, eid=2, ts=_ts("2024-01-01 11:30:00")),  # inside, crosses hour bin
            Row(k=1, eid=3, ts=_ts("2024-01-01 12:00:00")),  # == end (inclusive)
            Row(k=1, eid=4, ts=_ts("2024-01-01 12:00:01")),  # just outside
            Row(k=2, eid=5, ts=_ts("2024-01-01 10:30:00")),  # other key, no interval
        ]
    )
    intervals = spark.createDataFrame(
        [Row(k=1, iv="A", lo=_ts("2024-01-01 10:00:00"), hi=_ts("2024-01-01 12:00:00"))]
    )
    return events, intervals


def test_inner_inclusive_bounds(spark):
    events, intervals = _frames(spark)
    out = range_join_binned(events, intervals, on="k", ts_col="ts",
                            start_col="lo", end_col="hi")
    assert sorted(r.eid for r in out.collect()) == [1, 2, 3]
    # no duplicate matches despite the interval spanning 3 hour-bins
    assert out.count() == 3


def test_left_keeps_unmatched(spark):
    events, intervals = _frames(spark)
    out = range_join_binned(events, intervals, on="k", ts_col="ts",
                            start_col="lo", end_col="hi", how="left")
    rows = {r.eid: r.iv for r in out.collect()}
    assert rows[1] == "A" and rows[2] == "A" and rows[3] == "A"
    assert rows[4] is None and rows[5] is None
    assert out.count() == 5


def test_matches_naive_range_join(spark):
    events, intervals = _frames(spark)
    naive = events.join(
        intervals,
        (events.k == intervals.k)
        & (events.ts >= intervals.lo)
        & (events.ts <= intervals.hi),
    ).select(events.eid, intervals.iv)
    binned = range_join_binned(events, intervals, on="k", ts_col="ts",
                               start_col="lo", end_col="hi").select("eid", "iv")
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, binned.collect()))
