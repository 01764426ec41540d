"""Mergeable quantile sketches for the incremental profiler — DDSketch
(Masson, Rim & Lee, "DDSketch: a fast and fully-mergeable quantile
sketch with relative-error guarantees", VLDB 2019).

The incremental profile (profiler/incremental.py) merges counts,
min/max and HLL per file, but percentiles were whole-table-only
(approx_percentile needs the raw rows). DDSketch closes that: values
bucket into log-scaled bins (γ = (1+α)/(1−α); bucket i covers
(γ^{i−1}, γ^i]), so a bucket-count relation is

- EXACTLY mergeable: the same row always lands in the same bucket, so
  sketch(A ∪ B) literally equals the bucket-count sum of sketch(A) and
  sketch(B) — merging never re-approximates (pinned in tests);
- relative-error bounded: any quantile estimate is within α of the true
  value's magnitude (also pinned);
- bounded: #buckets grows with the LOG of the value range (the double
  range caps it at ~2·⌈log_γ(1.8e308)⌉ + 1 ≈ a few thousand for
  α = 0.01), independent of row count.

Signs are handled as two mirrored sketches plus a zero bucket, per the
paper; the quantile walk runs negatives in descending bucket order.
Everything row-ward is built-in JVM expressions (sign/log/ceil/groupBy
— one map-side-combined aggregate per file); only the final walk over
the bounded bucket relation touches the driver.

The declared query (``profile_ddsketch_quantiles``) is rows-only BY
DESIGN: bucket indexes come from float log(), which is deterministic
per platform but not a cross-engine bit-contract DuckDB SQL can
guarantee at bucket boundaries; value-level evidence is the accuracy
bound + exact-merge tests instead (tests/test_quantiles.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_ALPHA = 0.01


def _gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def ddsketch_buckets(
    df: DataFrame,
    cols: list[str],
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """(column, sign, bucket, n): one log-bucket count relation for the
    given numeric columns — ONE pass, one map-side-combined aggregate.
    sign ∈ {−1, 0, 1}; bucket = ⌈log_γ |x|⌉ (0 for the zero bucket).
    NULL and NaN rows are excluded (they have no quantile)."""
    gamma = _gamma(alpha)
    x = F.col("x")
    sign = F.when(x > 0, 1).when(x < 0, -1).otherwise(0)
    bucket = F.when(x == 0, F.lit(0)).otherwise(
        F.ceil(F.log(F.abs(x)) / math.log(gamma))
    )
    parts = []
    for c in cols:
        parts.append(
            df.select(F.col(c).cast("double").alias("x"))
            # non-finite values have no log bucket: NULL/NaN carry no
            # rank; ±Inf would crash the long cast under ANSI mode —
            # DDSketch stores them out-of-band (min/max channels in the
            # incremental profile already track extremes)
            .filter(
                x.isNotNull()
                & ~F.isnan(x)
                & (F.abs(x) != float("inf"))
            )
            .select(
                F.lit(c).alias("column"),
                sign.cast("int").alias("sign"),
                bucket.cast("long").alias("bucket"),
            )
        )
    allb = parts[0]
    for p in parts[1:]:
        allb = allb.unionByName(p)
    return allb.groupBy("column", "sign", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def merge_sketches(*sketches: DataFrame) -> DataFrame:
    """Sum bucket counts — the whole merge operation. Associative,
    commutative, and EXACT (no re-approximation): this is what makes
    per-file sketches composable into any partition of the data."""
    allb = sketches[0]
    for s in sketches[1:]:
        allb = allb.unionByName(s)
    return allb.groupBy("column", "sign", "bucket").agg(
        F.sum("n").cast("bigint").alias("n")
    )


def _bucket_estimate(sign: int, bucket: int, gamma: float) -> float:
    if sign == 0:
        return 0.0
    mag = 2.0 * (gamma ** bucket) / (gamma + 1.0)
    return mag if sign > 0 else -mag


def sketch_quantiles(
    sketch: DataFrame,
    qs: list[float],
    alpha: float = DEFAULT_ALPHA,
) -> list[tuple]:
    """[(column, q, estimate, n_total)] — the rank walk over the
    bounded bucket relation (the one driver-side step). Global value
    order is (sign=−1 buckets in DESCENDING bucket order) → zero →
    (sign=+1 ascending); the q-quantile is the bucket containing rank
    ⌊q·(n−1)⌋ of that order, estimated at the bucket's γ-midpoint."""
    gamma = _gamma(alpha)
    rows = sketch.collect()
    by_col: dict = {}
    for r in rows:
        by_col.setdefault(r.column, []).append((r.sign, r.bucket, r.n))
    out = []
    for col in sorted(by_col):
        entries = by_col[col]
        # negatives: most-negative first = descending |bucket| index
        order = sorted(
            entries,
            key=lambda e: (e[0], -e[1] if e[0] < 0 else e[1]),
        )
        n_total = sum(e[2] for e in entries)
        for q in qs:
            rank = math.floor(q * (n_total - 1)) if n_total > 1 else 0
            acc = 0
            est = 0.0
            for sign, bucket, n in order:
                acc += n
                if acc > rank:
                    est = _bucket_estimate(sign, bucket, gamma)
                    break
            out.append((col, float(q), est, n_total))
    return out
