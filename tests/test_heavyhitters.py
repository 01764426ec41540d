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


# --- Count-Min sketch ---------------------------------------------------------


def _toy_docs(spark):
    return spark.createDataFrame(
        [
            (0, "a a a b c"),
            (1, "b c d e f g"),
            (2, "a h i j k l m"),
            (3, "n o p q r s t u v w x y z"),
        ],
        "doc_id long, text string",
    )


def test_cms_never_undercounts_and_collides_when_narrow(spark):
    """The Count-Min guarantee: estimate ≥ exact for EVERY token (all
    occurrences land in all d of a token's cells; collisions only add).
    At a deliberately tiny width the 26-token vocabulary MUST collide
    somewhere, so at least one estimate strictly overcounts — the
    degradation is visible, never silent undercounting."""
    from overpaint_spark.operators.heavyhitters import cms_cells, cms_estimates

    docs = _toy_docs(spark)
    cells = cms_cells(docs, depth=2, width=8)
    exact = {
        r.token: r.n
        for r in docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token").agg(F.count("*").alias("n")).collect()
    }
    probes = spark.createDataFrame(
        [(t,) for t in sorted(exact)], "token string"
    )
    est = {
        r.token: r.cms_est
        for r in cms_estimates(cells, probes, depth=2, width=8).collect()
    }
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)
    assert any(est[t] > exact[t] for t in exact)  # width 8 ≪ 26 tokens


def test_cms_exact_at_production_width_on_fixture(spark, sf_dir):
    """At the declared geometry (4×1024) the fixture vocabulary is far
    below the collision regime for its heavy hitters: the declared
    audit card's overcount column must be all-zero — pinning both the
    estimate path and the card's self-consistency."""
    from overpaint_spark import queries as Q

    rows = Q.q_text_token_cms(spark, sf_dir).collect()
    assert len(rows) == 25
    assert all(r.overcount >= 0 for r in rows)
    assert all(r.cms_est == r.n_exact + r.overcount for r in rows)


def test_cms_merge_is_cellwise_sum(spark):
    """Mergeability — the property the streaming twin leans on: the
    sketch of a union equals the cell-wise SUM of the parts' sketches,
    bit for bit."""
    from overpaint_spark.operators.heavyhitters import cms_cells

    docs = _toy_docs(spark)
    whole = {
        (r.row_idx, r.cell_idx): r.cnt
        for r in cms_cells(docs, depth=3, width=16).collect()
    }
    merged: dict = {}
    for half in (docs.filter(F.col("doc_id") < 2), docs.filter(F.col("doc_id") >= 2)):
        for r in cms_cells(half, depth=3, width=16).collect():
            k = (r.row_idx, r.cell_idx)
            merged[k] = merged.get(k, 0) + r.cnt
    assert merged == whole
