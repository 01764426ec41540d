"""Binned range (interval) join — a custom operator Spark lacks natively.

A naive ``events JOIN intervals ON key = key AND ts BETWEEN start AND
end`` gives Catalyst only one equi-key; the range predicate becomes a
post-join filter over every (event × interval-of-same-key) pair — at
100 TB a hot key degenerates to a per-key cross product.

The classic fix: quantize time into fixed-width bins. Each event lands
in exactly ONE bin; each interval explodes to the bins it covers
(typically 1-2 for short intervals). The join becomes a pure equi-join
on (key, bin) — shuffle-partitioned, AQE/skew-eligible, broadcast-able —
followed by the exact range filter. An event matches an interval through
exactly one bin (its own), so no dedup pass is needed.

Pick ``bin_width_s`` near the typical interval length: wider bins mean
fewer interval replicas but more false candidates per bin; narrower the
reverse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    events: DataFrame,
    intervals: DataFrame,
    on: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_width_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join events to intervals of the same key with
    ``start <= ts <= end`` (inclusive both ends).

    Output: all event columns + all interval columns (minus the
    duplicated key). ``how`` supports "inner" and "left_outer"-style
    semantics via "left" (events with no covering interval keep NULL
    interval columns).
    """
    bin_us = int(bin_width_s) * 1_000_000

    def to_bin(col):
        return F.floor(F.unix_micros(col.cast("timestamp")) / F.lit(bin_us)).cast("long")

    ev = events.withColumn("_bin", to_bin(F.col(ts_col)))
    iv = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(to_bin(F.col(start_col)), to_bin(F.col(end_col)))),
    )
    in_range = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    if how == "inner":
        out = ev.join(iv, [on, "_bin"], "inner").filter(in_range)
        return out.drop("_bin")
    if how == "left":
        matched = ev.join(iv, [on, "_bin"], "inner").filter(in_range).drop("_bin")
        iv_cols = [c for c in intervals.columns if c != on]
        missing = ev.drop("_bin").join(
            matched.select(on, ts_col).distinct(), [on, ts_col], "left_anti"
        )
        for c in iv_cols:
            missing = missing.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
        return matched.unionByName(missing)
    raise ValueError(f"unsupported how={how!r}")
