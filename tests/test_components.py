"""Connected components + survivor selection (operators/components.py)."""

import pytest
from pyspark.sql import functions as F

from overpaint_spark.operators.components import (
    connected_components,
    dedup_survivors,
)


# threshold 0 forces the distributed min-label loop; default exercises
# the driver union-find fast path — results must be identical
THRESHOLDS = [0, 1_000_000]


def _cc(spark, edges, threshold):
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    return {
        (r.id, r.component)
        for r in connected_components(df, driver_threshold=threshold).collect()
    }


@pytest.mark.parametrize("threshold", THRESHOLDS)
def test_two_clusters_and_chain(spark, threshold):
    # chain 1-2-3 (transitive: 1 and 3 never paired) + pair 10-11
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)], threshold)
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


@pytest.mark.parametrize("threshold", THRESHOLDS)
def test_long_chain_converges(spark, threshold):
    # a 12-vertex path needs multiple propagation rounds
    edges = [(i, i + 1) for i in range(12)]
    got = _cc(spark, edges, threshold)
    assert got == {(i, 0) for i in range(13)}


@pytest.mark.parametrize("threshold", THRESHOLDS)
def test_direction_and_duplicates_irrelevant(spark, threshold):
    # reversed edges and repeated pairs change nothing
    got = _cc(spark, [(5, 2), (2, 5), (5, 2), (7, 5)], threshold)
    assert got == {(2, 2), (5, 2), (7, 2)}


@pytest.mark.parametrize("threshold", THRESHOLDS)
def test_dense_clique(spark, threshold):
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _cc(spark, edges, threshold)
    assert got == {(i, 0) for i in range(4)}


def test_fallback_when_over_threshold(spark):
    # threshold smaller than the edge count → distributed path, same answer
    edges = [(i, i + 1) for i in range(10)]
    got = _cc(spark, edges, 3)
    assert got == {(i, 0) for i in range(11)}


def test_survivors_keep_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 4)], "a_id long, b_id long"
    )  # cluster {1,2,4} → keep 1; docs 0,3,5 untouched
    got = sorted(
        r.doc_id for r in dedup_survivors(docs, pairs).collect()
    )
    assert got == [0, 1, 3, 5]


def test_survivors_no_pairs_is_identity(spark):
    docs = spark.createDataFrame(
        [(i, "t") for i in range(3)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([], "a_id long, b_id long")
    assert dedup_survivors(docs, pairs).count() == 3


def test_unconverged_distributed_loop_raises(spark):
    """A 30-vertex chain needs ~29 propagation rounds; with max_iter=3
    and the star fallback disabled, the distributed loop must FAIL
    LOUDLY — silent partial labels would let dedup keep several
    representatives of one cluster."""
    import pytest

    from overpaint_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "a_id long, b_id long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            edges, max_iter=3, driver_threshold=0, fallback_star=False
        ).collect()
    # the same graph converges fine with enough rounds
    ok = connected_components(edges, max_iter=40, driver_threshold=0)
    assert {r.component for r in ok.collect()} == {0}


def test_dedup_survivors_by_keeps_longest(spark):
    """dedup_survivors_by with (n_chars DESC, doc_id ASC): each
    transitive cluster keeps exactly its longest member (lowest id on
    ties); off-graph docs pass through."""
    from pyspark.sql import functions as F

    from overpaint_spark.operators.components import dedup_survivors_by

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (9, 7)],
        "doc_id long, n_chars long",
    )
    # 1~2, 2~3 chain -> one cluster {1,2,3}; 4 alone via no pairs; 9 off-graph
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a_id long, b_id long")
    got = sorted(
        r.doc_id
        for r in dedup_survivors_by(
            docs, pairs, [F.col("n_chars").desc(), F.col("doc_id").asc()]
        ).collect()
    )
    # cluster {1,2,3}: max n_chars 30 shared by 2 and 3 -> doc 2 wins
    assert got == [2, 4, 9]


def _star_labels(spark, pairs):
    from overpaint_spark.operators.components import connected_components_star

    return sorted(
        (r.id, r.component)
        for r in connected_components_star(pairs).collect()
    )


def test_star_matches_min_label_on_fixture_graph(spark):
    """Large-star/small-star must produce exactly the min-label
    component relation on the real LSH dup graph."""
    from overpaint_spark.operators import dedup as DD
    from overpaint_spark.operators.components import connected_components

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = DD.lsh_near_dup_pairs(docs, k=3, num_hashes=12, bands=4, threshold=0.5)
    want = sorted(
        (r.id, r.component) for r in connected_components(pairs).collect()
    )
    assert _star_labels(spark, pairs) == want and want


@pytest.mark.slow
def test_star_converges_on_long_chain_where_min_label_refuses(spark):
    """A 60-vertex path has diameter 59: with the fallback disabled the
    distributed min-label loop (driver_threshold=0 forces it) raises
    its honest non-convergence error at max_iter=25; the DEFAULT
    public entry auto-dispatches to the star rounds and labels every
    vertex with the chain minimum — as does calling the star variant
    directly."""
    import pytest as _pytest

    from overpaint_spark.operators.components import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 60)], "a_id long, b_id long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            chain, driver_threshold=0, max_iter=25, fallback_star=False
        )
    want = [(i, 1) for i in range(1, 61)]
    via_public = sorted(
        (r.id, r.component)
        for r in connected_components(
            chain, driver_threshold=0, max_iter=25
        ).collect()
    )
    assert via_public == want
    assert _star_labels(spark, chain) == want


def test_star_matches_union_find_on_random_graphs(spark):
    """Deterministic pseudo-random multi-component graphs: star labels
    equal the driver union-find's (the ≤threshold fast path of
    connected_components)."""
    from overpaint_spark.operators.components import connected_components

    # 3 seeds x 40 edges over 30 vertices, self-loops and dups included
    for seed in (7, 19, 41):
        edges = [
            ((seed * k * 2654435761 + 17) % 30, (k * k * seed + 5) % 30)
            for k in range(40)
        ]
        pairs = spark.createDataFrame(edges, "a_id long, b_id long").filter(
            "a_id <> b_id"
        )
        want = sorted(
            (r.id, r.component) for r in connected_components(pairs).collect()
        )
        assert _star_labels(spark, pairs) == want and want
