"""As-of (point-in-time) join — a custom operator Spark lacks natively
(SURVEY §7 custom-operator guidance: compose from existing DataFrame ops
when semantics allow).

Backward as-of join: for each left row, the right row with the greatest
``right_ts <= left_ts`` within the same key group. Implemented as the
classic union + sort + last-ignore-nulls window carry-forward:

1. tag both sides, union on (key, ts) with the right side's payload,
2. one window sort per key, right rows ordered before left rows at
   equal ts (so ties are inclusive, matching SQL ASOF semantics),
3. ``last(payload, ignorenulls=True)`` carries the most recent right
   row forward; filter back to left rows.

Cost: ONE shuffle of |L|+|R| rows on the key — no range explosion, no
per-row binary search, skew-safe under AQE. This is the shape that
survives 100 TB; a broadcast-range variant only wins when R is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row, enriched with the latest right
    payload at-or-before its timestamp (NULLs when none). Output keeps
    all left columns plus ``payload_cols`` from the right side.
    """
    l_tagged = left.withColumn("_is_left", F.lit(1)).withColumn("_ts", F.col(left_ts))
    for c in payload_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    r_tagged = (
        right.select(on, F.col(right_ts).alias("_ts"), *payload_cols)
        .withColumn("_is_left", F.lit(0))
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    combined = l_tagged.select(*l_tagged.columns).unionByName(
        r_tagged.select(*l_tagged.columns)
    )
    # right rows sort before left rows at equal _ts → inclusive (<=) match
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the payload carries forward as ONE struct per right row, not as
    # independent per-column lasts: column-wise last(ignorenulls) cannot
    # represent a NULL field in the latest right row — it would resurrect
    # that field's value from an OLDER row and emit a blended row that
    # never existed on the right side. The struct is non-NULL exactly
    # for right rows, so ignorenulls selects the latest right ROW whole,
    # NULL fields included.
    payload_struct = F.when(
        F.col("_is_left") == 0,
        F.struct(*[F.col(c).alias(c) for c in payload_cols]),
    )
    filled = combined.select(
        *[c for c in left.columns],
        F.col("_is_left"),
        F.last(payload_struct, ignorenulls=True).over(w).alias("_asof"),
    )
    out = filled.filter(F.col("_is_left") == 1).drop("_is_left")
    for c in payload_cols:
        out = out.drop(c).withColumn(c, F.col("_asof")[c])
    return out.drop("_asof")
