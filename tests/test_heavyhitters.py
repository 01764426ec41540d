"""Approximate heavy hitters (operators/heavyhitters.py)."""

from pyspark.sql import functions as F

from overpaint_spark.operators.heavyhitters import approx_top_tokens
from overpaint_spark.sources.catalog import load_table


def test_matches_exact_top_tokens(spark, sf_dir):
    """With a sane per-partition budget the approximate result equals
    the exact explode→groupBy→top-k, counts included."""
    from overpaint_spark import queries as Q

    exact = [
        (r.token, r.n) for r in Q.q_text_top_tokens(spark, sf_dir).collect()
    ]
    docs = load_table(spark, f"{sf_dir}/documents.parquet")
    approx = [
        (r.token, r.n)
        for r in approx_top_tokens(docs, k=25, per_partition=1000).collect()
    ]
    assert approx == exact


def test_tiny_budget_still_returns_k_and_superset_counts(spark, sf_dir):
    """Degraded mode: a deliberately tiny candidate budget still yields k
    rows and never OVERcounts (truncation only loses counts)."""
    docs = load_table(spark, f"{sf_dir}/documents.parquet").repartition(8)
    approx = {
        r.token: r.n
        for r in approx_top_tokens(docs, k=10, per_partition=5).collect()
    }
    assert len(approx) == 10
    exact = {
        r.t: r.n
        for r in docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t").agg(F.count("*").alias("n")).collect()
    }
    for tok, n in approx.items():
        assert n <= exact[tok]


def test_null_text_rows_skipped_not_crashed(spark):
    """A NULL document must behave like the exact twin's
    explode(split(...)) — contribute nothing — not raise AttributeError
    inside the Arrow batch and kill the job."""
    from overpaint_spark.operators.heavyhitters import approx_top_tokens

    df = spark.createDataFrame(
        [(0, "a b a"), (1, None), (2, "b")], "doc_id long, text string"
    )
    out = {r.token: r.n for r in approx_top_tokens(df, k=5).collect()}
    assert out == {"a": 2, "b": 2}
