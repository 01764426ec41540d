"""Deterministic hash-based sampling — reproducible subsets at any scale.

``df.sample()`` / ``sampleBy()`` draw from a per-partition RNG: the
subset changes with partitioning, retries, and cluster layout, which
poisons experiment reproducibility and incremental pipelines (yesterday's
sample ≠ today's sample of the same rows). Hash sampling decides each
row from its KEY alone:

    keep  ⇔  md5(salt:key) mod 2^16  <  floor(fraction · 2^16)

so membership is a pure function of (key, salt, fraction) — stable
across runs, engines, partitionings, and corpus growth (a row's fate
never depends on other rows), and refinable: lowering the fraction
yields a strict subset of the larger sample. The ``salt`` gives
independent draws for independent experiments.

Pure codegen expressions (md5 + integer arithmetic), no shuffle, no RNG
state; the same predicate runs verbatim in any SQL engine, which is what
makes the declared sample queries oracle-checkable (md5, unlike
rand(seed), has no engine-specific stream).

Resolution is 1/65536 ≈ 0.0015% — far below any practical sampling
noise; fractions are floored to it (documented, exact in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 16


def sample_bucket(key: Column, salt: str = "") -> Column:
    """16-bit bucket from the first 4 hex chars of md5(salt:key)."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")


def threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * _BUCKETS)


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-row by key hash."""
    return df.filter(sample_bucket(F.col(key_col), salt) < F.lit(threshold(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum sampling rates (e.g. downsample the dominant language,
    keep all of a rare one) with the same per-key determinism.

    One CASE expression picks the stratum's integer threshold — still
    zero-shuffle, still a pure row predicate.
    """
    thr: Column = F.lit(threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(threshold(frac))).otherwise(thr)
    return df.filter(sample_bucket(F.col(key_col), salt) < thr)
