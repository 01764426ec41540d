"""SemDeDup-style semantic dedup: known-cluster semantics on a tiny
synthetic set, survivor invariants on the fixtures, and the plan shape
that makes it a 100 TB operator (within-cluster equi-join, no cross
product, anti-join survivor filter)."""

import pytest
from pyspark.sql import Row

from overpaint_spark.operators import semantic as SEM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny(spark):
    # two tight direction groups + one loner; ids chosen so the two
    # seeded centroids (lowest ids 0 and 1) split the groups
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=2, embedding=[0.99, 0.01, 0.0]),   # near-dup of 0
        Row(vec_id=3, embedding=[0.01, 0.99, 0.0]),   # near-dup of 1
        Row(vec_id=4, embedding=[0.0, 0.0, 1.0]),     # loner
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_within_cluster_pairs_and_greedy_keep(tiny):
    surv = SEM.semantic_dedup_survivors(tiny, n_centroids=2, tau=0.95).collect()
    kept = sorted(r.vec_id for r in surv)
    # 2 duplicates 0 (same cluster, sim ≈ 0.9999), 3 duplicates 1;
    # the loner 4 lands in some cluster but has no ≥0.95 mate
    assert kept == [0, 1, 4]


def test_pairs_are_cluster_bounded(tiny):
    assigned = SEM.cluster_assignments(tiny, n_centroids=2)
    pairs = SEM.semantic_dup_pairs(assigned, tau=-1.0).collect()
    by_cluster = {}
    for r in assigned.collect():
        by_cluster[r.vec_id] = r.cluster_id
    for p in pairs:
        assert by_cluster[p.a_id] == by_cluster[p.b_id] == p.cluster_id
        assert p.a_id < p.b_id


def test_fixture_survivors_subset_and_deterministic(spark):
    from overpaint_spark.queries import QUERIES

    a = QUERIES["semantic_dedup"](spark, SF)
    ids = sorted(r.vec_id for r in a.collect())
    n_total = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    # pruning drops something on the fixture but keeps the vast majority
    assert 0 < len(ids) <= n_total
    assert len(ids) == len(set(ids))
    b = sorted(r.vec_id for r in QUERIES["semantic_dedup"](spark, SF).collect())
    assert ids == b


def test_plan_equijoin_no_cross_product(spark):
    from overpaint_spark.queries import QUERIES

    df = QUERIES["semantic_dedup"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # pair search joins on cluster_id; survivor filter is an anti join
    assert "cluster_id" in plan
    assert "LeftAnti" in plan
