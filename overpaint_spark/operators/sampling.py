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


def mixture_thresholds(
    counts: dict[str, int],
    weights: dict[str, int],
    budget: int | None = None,
) -> dict[str, int]:
    """Bucket thresholds realizing a target corpus mixture.

    ``weights`` are INTEGER mixture parts (e.g. ``{"en": 3, "de": 2}``
    targets a 3:2 blend); strata not listed are dropped. The largest
    feasible total T satisfies ``T·w_s/W ≤ count_s`` for every stratum
    (the scarcest stratum binds); ``budget`` optionally caps T. Each
    stratum's keep-threshold is then

        thr_s = (2^16 · T · w_s) // (W · count_s)

    ALL integer arithmetic — floor division end-to-end, no float in the
    path — so the identical formula runs in any SQL engine and selects
    the identical rows (the declared `dataset_mixture` query is
    value-hash-checked against DuckDB on exactly this).
    """
    missing = [s for s in weights if s not in counts]
    if missing:
        raise ValueError(f"weights name strata absent from counts: {missing}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative integers")
    total_w = sum(weights.values())
    if total_w == 0:
        raise ValueError("at least one weight must be positive")
    t_max = min(
        counts[s] * total_w // w for s, w in weights.items() if w > 0
    )
    if budget is not None:
        t_max = min(t_max, budget)
    return {
        s: (_BUCKETS * t_max * w) // (total_w * counts[s]) if counts[s] else 0
        for s, w in weights.items()
        if w > 0
    }


def mixture_resample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, int],
    key_col: str,
    salt: str = "",
    budget: int | None = None,
) -> DataFrame:
    """Resample a corpus to a target mixture (domain/language blending —
    the "data recipe" step of a training pipeline).

    One tiny count aggregate per call (collected: #strata rows), then the
    same zero-shuffle hash predicate as :func:`stratified_hash_sample`
    with per-stratum integer thresholds from :func:`mixture_thresholds`.
    Rows in strata without a weight are dropped. Membership stays a pure
    function of (key, salt, weights, counts) — reruns and engine changes
    keep the exact same corpus.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).count().collect()
        if r[0] in weights
    }
    thresholds = mixture_thresholds(counts, weights, budget)
    thr: Column = F.lit(-1)  # unweighted strata never match (bucket ≥ 0)
    for value, t in sorted(thresholds.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(t)).otherwise(thr)
    return df.filter(sample_bucket(F.col(key_col), salt) < thr)


def weighted_hash_sample(
    df: DataFrame,
    weight: Column,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Importance sampling: each row's keep probability IS its weight
    (clamped to [0, 1]) — e.g. quality-weighted corpus subsampling,
    where a 0.9-quality document survives 9× as often as a 0.1 one.

    Same determinism contract as the uniform sampler: membership is a
    pure function of (key, salt, weight expression), zero shuffle. The
    per-row threshold floor(weight · 2^16) keeps the comparison in
    integers once the weight itself is engine-exact.
    """
    thr = F.floor(
        F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0)) * F.lit(float(_BUCKETS))
    )
    return df.filter(sample_bucket(F.col(key_col), salt) < thr)
