"""Deterministic hash sampling (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from overpaint_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    threshold,
)
from overpaint_spark.sources.catalog import load_table


def test_threshold_validation():
    assert threshold(0.0) == 0
    assert threshold(1.0) == 65536
    assert threshold(0.5) == 32768
    with pytest.raises(ValueError):
        threshold(1.5)


def test_hash_sample_deterministic_and_near_fraction(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    a = hash_sample(df, 0.25, "k").collect()
    b = hash_sample(df, 0.25, "k").collect()
    assert sorted(r.k for r in a) == sorted(r.k for r in b)
    # md5 is uniform: observed rate within ±2% absolute of 25%
    assert abs(len(a) / 20_000 - 0.25) < 0.02


def test_smaller_fraction_is_subset(spark):
    df = spark.range(5_000).withColumnRenamed("id", "k")
    small = {r.k for r in hash_sample(df, 0.1, "k").collect()}
    large = {r.k for r in hash_sample(df, 0.3, "k").collect()}
    assert small <= large  # refinement property


def test_salt_gives_independent_draw(spark):
    df = spark.range(5_000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_sample(df, 0.2, "k", salt="x").collect()}
    b = {r.k for r in hash_sample(df, 0.2, "k", salt="y").collect()}
    assert a != b
    # independence: overlap ≈ 4% of rows (0.2 * 0.2), not 20%
    assert len(a & b) < 5_000 * 0.2 * 0.2 * 2


def test_stratified_rates(spark, sf_dir):
    d = load_table(spark, f"{sf_dir}/documents.parquet")
    out = stratified_hash_sample(
        d, "lang", {"en": 0.5, "de": 0.25}, key_col="doc_id",
        default_fraction=0.0,
    )
    rates = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r.lang: r.n
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # default 0.0: strata outside the dict are dropped entirely
    assert set(rates) <= {"en", "de"}
    assert abs(rates["en"] / totals["en"] - 0.5) < 0.15
    assert abs(rates["de"] / totals["de"] - 0.25) < 0.15


def test_mixture_thresholds_binding_stratum():
    from overpaint_spark.operators.sampling import mixture_thresholds

    counts = {"en": 1000, "de": 100, "fr": 50}
    # 5:2:1 target → fr binds: T = 50*8//1 = 400
    thr = mixture_thresholds(counts, {"en": 5, "de": 2, "fr": 1})
    # en keeps 400*5/8 = 250 of 1000 → threshold 25% of bucket space
    assert thr["en"] == (65536 * 400 * 5) // (8 * 1000) == 16384
    # de keeps 400*2/8 = 100 of 100 → keep everything
    assert thr["de"] == 65536
    assert thr["fr"] == (65536 * 400 * 1) // (8 * 50) == 65536


def test_mixture_thresholds_budget_and_validation():
    import pytest

    from overpaint_spark.operators.sampling import mixture_thresholds

    counts = {"en": 1000, "de": 100}
    capped = mixture_thresholds(counts, {"en": 1, "de": 1}, budget=50)
    # T capped at 50 → each stratum contributes 25
    assert capped["en"] == (65536 * 50) // (2 * 1000)
    assert capped["de"] == (65536 * 50) // (2 * 100)
    with pytest.raises(ValueError, match="absent"):
        mixture_thresholds({"en": 10}, {"xx": 1})
    with pytest.raises(ValueError, match="positive"):
        mixture_thresholds(counts, {"en": 0, "de": 0})


def test_mixture_resample_achieves_blend(spark, sf_dir):
    from overpaint_spark.operators.sampling import mixture_resample

    d = load_table(spark, f"{sf_dir}/documents.parquet")
    out = mixture_resample(d, "lang", {"en": 2, "de": 1}, key_col="doc_id")
    got = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert set(got) == {"en", "de"}
    # hash granularity wobbles counts slightly; the 2:1 recipe must hold
    assert abs(got["en"] / got["de"] - 2.0) < 0.4


def test_weighted_sample_rates_scale_with_weight(spark):
    from overpaint_spark.operators.sampling import weighted_hash_sample

    df = spark.range(20_000).withColumnRenamed("id", "k").withColumn(
        "w", F.when(F.col("k") % 2 == 0, F.lit(0.8)).otherwise(F.lit(0.2))
    )
    kept = weighted_hash_sample(df, F.col("w"), "k").groupBy("w").count()
    rates = {round(r.w, 1): r["count"] / 10_000 for r in kept.collect()}
    assert abs(rates[0.8] - 0.8) < 0.05
    assert abs(rates[0.2] - 0.2) < 0.05
    # weights outside [0,1] clamp rather than misbehave
    all_kept = weighted_hash_sample(
        spark.range(100).withColumnRenamed("id", "k"), F.lit(5.0), "k"
    ).count()
    assert all_kept == 100
