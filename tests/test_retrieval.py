"""Budget-bounded selection + BM25 keyword retrieval.

Value-level correctness is the oracle harness's job
(tools/oracle_check.py); these pin the operator INVARIANTS — the
properties that must survive any refactor of the plan shape.
"""

import pytest
from pyspark.sql import functions as F

from overpaint_spark import queries as Q
from overpaint_spark.queries import (
    _BM25_TERMS,
    _BUDGET_SELECT_TOKENS,
)


@pytest.fixture(scope="module")
def budget_rows(spark, sf_dir):
    return Q.q_dataset_budget_select(spark, sf_dir).collect()


def test_budget_never_exceeded_per_source(budget_rows):
    """Selected token mass per source stays within the budget — the
    whole point of the operator."""
    per_source = {}
    for r in budget_rows:
        per_source[r["source"]] = per_source.get(r["source"], 0) + r["n_tokens"]
    assert per_source, "selection must be non-empty at fixture scale"
    for src, toks in per_source.items():
        assert toks <= _BUDGET_SELECT_TOKENS, (src, toks)


def test_budget_selection_is_selective(spark, sf_dir, budget_rows):
    """The budget must actually bind: strictly fewer docs out than in."""
    total = Q._t(spark, sf_dir, "documents").count()
    assert 0 < len(budget_rows) < total


def test_budget_takes_quality_prefix(budget_rows):
    """Whole-bin admission from the top: within a source, every selected
    bin must be ABOVE every unselected doc's bin — i.e. the selected
    bins form a contiguous top segment. Equivalent check without
    re-deriving quality: cum_tokens must decrease as quality_bin rises
    within a source (it accumulates downward from the best bin)."""
    by_source = {}
    for r in budget_rows:
        by_source.setdefault(r["source"], []).append(
            (r["quality_bin"], r["cum_tokens"])
        )
    for src, pairs in by_source.items():
        pairs.sort()
        cums = [c for _, c in pairs]
        assert all(a >= b for a, b in zip(cums, cums[1:])), src


def test_bm25_scores_positive_and_ranked(spark, sf_dir):
    rows = Q.q_documents_bm25(spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    scores = [r["bm25_ppm"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_bm25_term_hit_beats_no_hit(spark, sf_dir):
    """Any doc containing a query term outscores (is selected over) a
    doc containing none: zero-hit docs score exactly 0 and are filtered,
    so every returned doc must contain ≥ 1 query term."""
    top = Q.q_documents_bm25(spark, sf_dir)
    d = Q._t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    has_term = None
    for t in _BM25_TERMS:
        c = F.array_contains(toks, t)
        has_term = c if has_term is None else (has_term | c)
    joined = top.join(d.select("doc_id", has_term.alias("hit")), "doc_id")
    assert joined.filter(~F.col("hit")).count() == 0
