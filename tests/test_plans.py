"""Physical-plan shape tests: lock in the scale-critical plan features
(aggregate pushdown, column pruning, broadcast joins, no accidental
nested-loop/cartesian products) so a refactor that silently loses one
fails CI, not a 100 TB run."""

import contextlib
import io

import pytest

from overpaint_spark import queries as Q

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = Q.QUERIES[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_minmax_answered_from_parquet_statistics(spark):
    plan = plan_of(spark, "profile_minmax_numeric")
    # DSv2 aggregate pushdown: MIN/MAX come from row-group stats
    assert "PushedAggregation: [MIN(" in plan


def test_rowcounts_pushed_down(spark):
    plan = plan_of(spark, "profile_rowcounts_exact")
    assert "PushedAggregation: [COUNT(*)]" in plan


def test_dimension_joins_broadcast(spark):
    plan = plan_of(spark, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    # the region filter reaches the scan
    assert "EqualTo(r_name,ASIA)" in plan


def test_column_pruning_reaches_scan(spark):
    plan = plan_of(spark, "text_stats")
    # only doc_id + text are read from a 5-column table
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read and "doc_id" in read[0] and "text" in read[0]
    assert "lang" not in read[0] and "source" not in read[0]


@pytest.mark.parametrize(
    "name",
    ["dedup_ngram_jaccard", "dedup_minhash_lsh", "events_asof_attribution",
     "events_session_errors", "top_orders_by_revenue"],
)
def test_no_accidental_cross_products(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_single_shuffle(spark):
    plan = plan_of(spark, "events_asof_attribution")
    # union + one window: exactly one exchange feeds the window sort
    n_exchanges = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_exchanges <= 2, plan  # key shuffle (+ AQE final coalesce at most)
    assert "Window" in plan


# Queries whose semantics REQUIRE a non-equi join of two relations
# (exact brute-force scoring of queries × corpus) — everything else must
# never plan a cartesian/nested-loop join.
_CROSS_OK = {"ann_topk_bruteforce"}


def test_no_query_plans_a_cartesian_product(spark):
    """Plan hygiene across the ENTIRE declared manifest: an accidental
    cross product is the classic silent 100 TB killer — a refactor that
    drops an equi-key must fail here, not in production."""
    offenders = {}
    for name in Q.QUERIES:
        if name in _CROSS_OK:
            continue
        plan = plan_of(spark, name)
        bad = [
            kind
            for kind in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if kind in plan
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders
