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
