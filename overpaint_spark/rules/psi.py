"""Distribution drift: fixed-bin histograms + Population Stability Index.

Count drift (rules/drift.py) answers "did the volume change"; PSI
answers "did the *distribution* change" — the standard monitoring metric
for a numeric column between a baseline window and a current window:

    PSI = Σ_bins (p_cur - p_base) · ln(p_cur / p_base)

with the usual operating bands: < 0.1 stable, 0.1-0.25 shifted, > 0.25
action. Empty bins get a small floor (no ln(0)); the bin edges are FIXED
(lo/hi/n_bins declared up front, two overflow buckets), because a drift
metric whose buckets move with the data can't be compared across runs.

Scale shape: one ``groupBy(bucket).count()`` per side — a shuffle of
n_bins rows regardless of input size — then a driver-side fold over the
(tiny) histogram. The histogram relation is also the thing to persist
per run_id next to the profile snapshot, so PSI between ANY two runs is
a metadata-only computation later.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: probability floor for empty bins (standard PSI practice; keeps the
#: metric finite while still heavily penalizing mass appearing in a
#: previously-empty region)
EPS = 1e-6


def bucket_expr(col: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Fixed-width bucket index in [0, n_bins+1]: 0 = underflow
    (x < lo), n_bins+1 = overflow (x >= hi), NULLs excluded upstream.
    Pure arithmetic (no width_bucket) so the same expression runs in any
    engine."""
    w = (hi - lo) / n_bins
    raw = F.floor((col - F.lit(lo)) / F.lit(w)).cast("int") + F.lit(1)
    return (
        F.when(col < F.lit(lo), F.lit(0))
        .when(col >= F.lit(hi), F.lit(n_bins + 1))
        .otherwise(raw)
    )


def histogram(
    df: DataFrame,
    column: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """(bucket, n) fixed-bin histogram of a numeric column (NULLs
    dropped; under/overflow in buckets 0 and n_bins+1)."""
    c = F.col(column)
    return (
        df.filter(c.isNotNull())
        .select(bucket_expr(c, lo, hi, n_bins).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_from_histograms(
    base: list[tuple[int, int]],
    cur: list[tuple[int, int]],
    n_bins: int = 10,
) -> float:
    """Driver-side PSI fold over two collected (bucket, count) lists.

    Deterministic: buckets are iterated in index order and the floor is
    applied to proportions, so the same inputs give the same float on
    any platform."""
    nb = dict(base)
    nc = dict(cur)
    tb = sum(nb.values())
    tc = sum(nc.values())
    if tb == 0 or tc == 0:
        raise ValueError("PSI needs non-empty base and current windows")
    out = 0.0
    for b in range(n_bins + 2):
        pb = max(nb.get(b, 0) / tb, EPS)
        pc = max(nc.get(b, 0) / tc, EPS)
        out += (pc - pb) * math.log(pc / pb)
    return out


def psi(
    base_df: DataFrame,
    cur_df: DataFrame,
    column: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> float:
    """PSI of ``column`` between two DataFrames (two n_bins-row
    aggregations + a driver fold)."""
    b = [(r.bucket, r.n) for r in histogram(base_df, column, lo, hi, n_bins).collect()]
    c = [(r.bucket, r.n) for r in histogram(cur_df, column, lo, hi, n_bins).collect()]
    return psi_from_histograms(b, c, n_bins)


def psi_band(value: float) -> str:
    """Operating band: stable / shifted / action."""
    if value < 0.1:
        return "stable"
    if value <= 0.25:
        return "shifted"
    return "action"
