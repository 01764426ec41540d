"""Skew mitigation — salting for hot keys (SURVEY §7.5 "100 TB posture").

AQE's skew-join handling (enabled in :mod:`overpaint_spark.session`)
splits oversized sort-merge partitions at runtime, but two shapes still
need explicit salting at scale:

- **aggregation hot keys**: one key holding 1% of a 100 TB table lands
  ~1 TB on a single reducer. Two-phase salted aggregation bounds every
  reducer at |partition|/n_salt for reassociable aggregates.
- **joins where the skewed side can't be broadcast** and AQE's split
  granularity is too coarse: replicate the small side ``n_salt``×, salt
  the big side, join on (key, salt).

Salts are derived deterministically (hash of a row-unique column), so
results are reproducible run to run — never ``rand()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial-phase expr, final-phase expr) per reassociable aggregate
_REASSOC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output name → (input column, fn) with fn in
    {sum, count, min, max} (the reassociable set — avg decomposes into
    sum+count by the caller). ``salt_col`` is any row-unique-ish column
    used to derive a deterministic salt. Phase 1 aggregates on
    (keys, salt) — at most ``n_salt`` partial rows per key — and phase 2
    combines partials; the hot key's reducer load drops by ``n_salt``×.
    """
    for name, (col, fn) in aggs.items():
        if fn not in _REASSOC:
            raise ValueError(f"{name}: '{fn}' is not reassociable; use sum/count/min/max")
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salt)).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[_REASSOC[fn][0](F.col(col)).alias(name) for name, (col, fn) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[_REASSOC[fn][1](F.col(name)).alias(name) for name, (col, fn) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_col: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed big side to a small side with salt fan-out.

    The big side gets a deterministic salt in [0, n_salt); the small
    side is replicated once per salt value (an ``explode`` of a literal
    range — n_salt× |small| rows, the price of splitting the hot key
    across n_salt reducers). Join keys become (on, salt), so one hot
    key's rows spread over ``n_salt`` partitions instead of one.

    Only big-side-preserving join types are valid: under right/full
    (or anti/semi FROM the small side) an unmatched small-side key has
    ``n_salt`` unmatched replicas and the output would carry n_salt
    copies of that row — silently wrong, so it is rejected here.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "cross"):
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, got how={how!r}: "
            "the replicated small side would emit n_salt copies of every "
            "unmatched small-side row under right/full/semi/anti semantics"
        )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salt))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>"))
    )
    out = salted_big.join(salted_small, [on, "_salt"], how)
    return out.drop("_salt")
