"""Sequence packing: concat-and-cut invariants."""

import pytest
from pyspark.sql import functions as F

from overpaint_spark.functions import text as TX
from overpaint_spark.operators.packing import concat_pack_plan, pack_budget_check
from overpaint_spark.sources.catalog import load_table

BUDGET = 256


@pytest.fixture(scope="module")
def plan(spark, sf_dir):
    docs = load_table(spark, f"{sf_dir}/documents.parquet")
    return concat_pack_plan(
        docs, TX.n_words(F.col("text")), budget=BUDGET, n_buckets=8
    ).cache()


def test_every_doc_packed_once(spark, sf_dir, plan):
    docs = load_table(spark, f"{sf_dir}/documents.parquet")
    assert plan.count() == docs.count()
    assert plan.select("doc_id").distinct().count() == docs.count()


def test_offsets_within_budget(plan):
    assert plan.filter((F.col("tok_offset") < 0) | (F.col("tok_offset") >= BUDGET)).count() == 0
    assert plan.filter(F.col("pack_id") < 0).count() == 0


def test_offset_matches_bucket_running_sum(plan):
    """start offset = pack_id * budget + tok_offset must equal the
    running token sum of all earlier docs in the bucket."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("bucket").orderBy("doc_id")
    chk = plan.withColumn(
        "expect_start", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).filter(
        F.col("pack_id") * BUDGET + F.col("tok_offset") != F.col("expect_start")
    )
    assert chk.count() == 0


def test_overflow_bounded_by_longest_doc(plan):
    """A pack overflows only by the tail of one straddling doc —
    strictly less than the longest doc's token count."""
    max_tokens = plan.agg(F.max("n_tokens")).collect()[0][0]
    worst = (
        pack_budget_check(plan, BUDGET)
        .agg(F.max("overflow").alias("o"))
        .collect()[0]["o"]
    )
    assert worst < max_tokens


def test_deterministic(spark, sf_dir):
    docs = load_table(spark, f"{sf_dir}/documents.parquet")
    a = concat_pack_plan(docs, TX.n_words(F.col("text")), budget=BUDGET, n_buckets=8)
    b = concat_pack_plan(docs, TX.n_words(F.col("text")), budget=BUDGET, n_buckets=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
