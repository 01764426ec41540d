"""Stream-stream interval join: real-time click→purchase attribution.

The batch engine answers attribution with a backward as-of join
(operators/asof.py — latest click at-or-before each purchase). The
streaming twin cannot wait forever for "the latest" click, so the
streaming formulation is the standard one for unbounded inputs: an
**event-time interval join** — every (purchase, click) pair of the same
user where the click happened within ``max_lag`` BEFORE the purchase.

Both sides carry watermarks, which is what makes the state bounded and
is *required* by Spark for stream-stream joins with an outer side:

- the click state for a user can be dropped once the purchase-side
  watermark passes ``click_ts + max_lag`` (no future purchase can match);
- the purchase state can be dropped once the click-side watermark
  passes ``purchase_ts`` (no older click will arrive).

State size is therefore O(arrival rate × (watermark + max_lag)),
independent of stream history — the only shape that survives an
unbounded feed. Spark derives exactly these eviction bounds from the
join's time-range predicate (docs: "Stream-stream Joins" in the
Structured Streaming guide).

Semantic note vs the batch as-of: a purchase preceded by k clicks
inside the lag window emits k rows here (all-candidates attribution);
the batch as-of emits 1 (last-touch). Last-touch on a stream needs a
stateful argmax after this join (applyInPandasWithState) — downstream
aggregation usually wants all candidates anyway (multi-touch models).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    on: str = "user_id",
    purchase_ts: str = "purchase_ts",
    click_ts: str = "click_ts",
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each streaming purchase to every same-user click within
    ``max_lag`` before it (inclusive on both ends).

    ``purchases`` and ``clicks`` are streaming DataFrames whose time
    columns are named ``purchase_ts`` / ``click_ts`` (distinct names —
    a stream-stream join of one source with itself must not collide).
    The equality key shuffles both sides; the range condition bounds
    state per key.
    """
    p = purchases.withWatermark(purchase_ts, watermark)
    c = clicks.withWatermark(click_ts, watermark)
    cond = (
        (p[on] == c[on])
        & (F.col(click_ts) <= F.col(purchase_ts))
        & (F.col(click_ts) >= F.col(purchase_ts) - F.expr(f"INTERVAL {max_lag}"))
    )
    # pass-through columns resolve against their OWN side (p[...] /
    # c[...]): selecting by bare name would raise AMBIGUOUS_REFERENCE
    # the moment both streams share any non-key column name; a name
    # shared by both sides is carried once per side with a _click
    # suffix on the click copy
    p_extra = [f.name for f in purchases.schema.fields
               if f.name not in (on, purchase_ts)]
    c_extra = [f.name for f in clicks.schema.fields
               if f.name not in (on, click_ts)]
    shared = set(p_extra) & set(c_extra)
    return p.join(c, cond, "inner").select(
        p[on].alias(on),
        F.col(purchase_ts),
        F.col(click_ts),
        (
            F.unix_micros(F.col(purchase_ts)) - F.unix_micros(F.col(click_ts))
        ).alias("lag_us"),
        *[p[n] for n in p_extra],
        *[c[n].alias(f"{n}_click" if n in shared else n) for n in c_extra],
    )
