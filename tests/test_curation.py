"""Curation-audit relations: data-constrained epoch planning,
embedding mean drift, duplicate-vs-unique quality lift.

Value-level correctness is pinned by the oracle harness (all three
relations carry full SQL oracles, MATCH at sf0.001/0.01/0.1); these
tests pin the INVARIANTS the oracles can't see — planted-signal
behavior, cohort accounting, and integer-domain identities.
"""

from pyspark.sql import functions as F

import overpaint_spark.queries as Q


# --- dataset_epoch_plan -----------------------------------------------------


def test_epoch_plan_invariants(spark, sf_dir):
    rows = Q.q_dataset_epoch_plan(spark, sf_dir).collect()
    assert rows, "fixture has sources"
    total = sum(r["avail_tokens"] for r in rows)
    budget = total * Q._EPOCH_BUDGET_MULT
    # the largest source carries weight exactly 1000 per-mille
    biggest = max(rows, key=lambda r: r["avail_tokens"])
    assert biggest["weight_pml"] == 1000
    # floor division never over-allocates the budget
    assert sum(r["requested_tokens"] for r in rows) <= budget
    for r in rows:
        # ceil-division identity: epochs is the least e with
        # e·avail >= requested
        e, a, req = r["epochs_needed"], r["avail_tokens"], r["requested_tokens"]
        assert e * a >= req and (e - 1) * a < req or (e == 0 and req == 0)
        # over-cap tokens are exactly the excess past cap epochs
        assert r["over_cap_tokens"] == max(req - Q._EPOCH_CAP * a, 0)


def test_epoch_plan_uniform_sources_need_budget_mult_epochs(spark):
    # equal-size sources: every weight is 1000, the budget splits
    # evenly, and each source must be repeated exactly budget_mult times
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta", f"s{i % 4}") for i in range(40)],
        "doc_id long, text string, source string",
    )
    rows = Q.epoch_plan(docs, budget_mult=3, cap=2).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["weight_pml"] == 1000
        assert r["requested_tokens"] == 3 * r["avail_tokens"]
        assert r["epochs_needed"] == 3
        # cap 2 < 3 epochs: exactly one epoch's worth over the cliff
        assert r["over_cap_tokens"] == r["avail_tokens"]


def test_epoch_plan_small_source_upweighted(spark):
    # temperature alpha=0.5: a 4x smaller source gets HALF the weight
    # (sqrt), i.e. more than its 1/4 proportional share -> its epoch
    # count exceeds the big source's
    docs = spark.createDataFrame(
        [(i, "tok " * 4, "big") for i in range(64)]
        + [(1000 + i, "tok " * 4, "small") for i in range(16)],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in Q.epoch_plan(docs, budget_mult=3).collect()}
    assert got["small"]["weight_pml"] == 500
    assert got["big"]["weight_pml"] == 1000
    assert got["small"]["epochs_needed"] > got["big"]["epochs_needed"]


# --- embedding_drift --------------------------------------------------------


def test_embedding_drift_fixture_shape(spark, sf_dir):
    rows = Q.q_embedding_drift(spark, sf_dir).collect()
    assert sorted(r["pos"] for r in rows) == list(range(64))
    n = Q._t(spark, sf_dir, "embeddings").count()
    for r in rows:
        assert r["n_old"] + r["n_new"] == n
        assert r["shift_ppm"] == r["mean_new_ppm"] - r["mean_old_ppm"]


def test_embedding_drift_planted_shift(spark):
    # cohort B = cohort A shifted by +0.5 in dim 0 only: the drift
    # relation must report ~500000 micro-units there and 0 elsewhere
    base = [[0.25, -0.5, 1.0], [0.75, 0.25, -1.0], [0.5, 0.0, 0.5]]
    data = [(2 * i, v, 0) for i, v in enumerate(base)] + [
        (2 * i + 1, [v[0] + 0.5, v[1], v[2]], 0) for i, v in enumerate(base)
    ]
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r["pos"]: r
        for r in Q.embedding_mean_drift(df, F.col("vec_id") % 2 == 0).collect()
    }
    assert got[0]["shift_ppm"] == 500000
    assert got[1]["shift_ppm"] == 0 and got[2]["shift_ppm"] == 0
    assert got[0]["n_old"] == 3 and got[0]["n_new"] == 3


# --- quality_dup_lift -------------------------------------------------------


def test_dup_lift_accounts_for_every_doc(spark, sf_dir):
    rows = Q.q_quality_dup_lift(spark, sf_dir).collect()
    d = Q._t(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == d.count()
    assert sum(r["n_groups"] for r in rows) == d.select("text").distinct().count()
    for r in rows:
        if r["is_dup"]:
            assert r["n_docs"] > r["n_groups"]
        else:
            assert r["n_docs"] == r["n_groups"]


def test_dup_lift_planted_low_quality_dups(spark):
    # plant: 3 copies of a junk doc (!!!! -> punct-heavy, low quality)
    # vs 3 distinct natural sentences -> the dup cohort's mean quality
    # must sit below the unique cohort's
    junk = "!!!! #### $$$$ %%%%"
    goods = [
        "the quick brown fox jumps over the lazy dog near a quiet river",
        "a small boat drifted past the old harbor while gulls called out",
        "in the morning light the garden was full of bees and soft wind",
    ]
    docs = spark.createDataFrame(
        [(i, junk, "s") for i in range(3)]
        + [(10 + i, t, "s") for i, t in enumerate(goods)],
        "doc_id long, text string, source string",
    )
    got = {r["is_dup"]: r for r in Q.dup_quality_lift(docs).collect()}
    assert got[True]["n_docs"] == 3 and got[True]["n_groups"] == 1
    assert got[False]["n_docs"] == 3 and got[False]["n_groups"] == 3
    assert got[True]["avg_quality_ppm"] < got[False]["avg_quality_ppm"]


# --- dataset_dsir_resample ---------------------------------------------------


def test_dsir_resample_subset_and_predicate(spark, sf_dir):
    """Kept docs are exactly the weight rows passing the integer
    acceptance predicate, recomputed independently in python."""
    import hashlib

    weights = {
        r["doc_id"]: (r["n_tokens"], r["dsir_ppm"])
        for r in Q.dsir_weights(Q._t(spark, sf_dir, "documents")).collect()
    }
    kept = {r["doc_id"]: r for r in Q.q_dataset_dsir_resample(spark, sf_dir).collect()}

    def accept(doc_id, ppm):
        h = int(hashlib.md5(f"{doc_id}:dsir".encode()).hexdigest()[:6], 16)
        return h * Q._DSIR_RESAMPLE_CAP < min(ppm, Q._DSIR_RESAMPLE_CAP) * Q._DSIR_HEX

    want = {d for d, (_, ppm) in weights.items() if accept(d, ppm)}
    assert set(kept) == want
    assert 0 < len(kept) < len(weights)  # the coin actually separates
    for d, r in kept.items():
        assert (r["n_tokens"], r["dsir_ppm"]) == weights[d]


def test_dsir_resample_high_weight_always_kept(spark, sf_dir):
    """Any doc at or above the cap ratio (2e6 ppm = 2x corpus average)
    has acceptance probability exactly 1 -- no hash value can reject
    it (h < 16^6 strictly, so h*CAP < CAP*16^6 always)."""
    kept = {r["doc_id"] for r in Q.q_dataset_dsir_resample(spark, sf_dir).collect()}
    w = Q.dsir_weights(Q._t(spark, sf_dir, "documents")).collect()
    capped = [r["doc_id"] for r in w if r["dsir_ppm"] >= Q._DSIR_RESAMPLE_CAP]
    assert all(d in kept for d in capped)


# --- embedding_outliers ------------------------------------------------------


def test_embedding_outliers_accounting(spark, sf_dir):
    rows = Q.q_embedding_outliers(spark, sf_dir).collect()
    e = Q._t(spark, sf_dir, "embeddings")
    assert len(rows) == e.count()  # every vector gets exactly one row
    n_cent, _ = Q._ivf_params(sf_dir)
    assert all(0 <= r["cluster_id"] < n_cent for r in rows)
    # flag consistency with the reported rounded cosine (margins >>
    # rounding step, so the two views can't disagree)
    for r in rows:
        if r["cos_r"] < 0.24:
            assert r["is_outlier"]
        if r["cos_r"] > 0.26:
            assert not r["is_outlier"]
    assert any(r["is_outlier"] for r in rows)
    assert any(not r["is_outlier"] for r in rows)


def test_embedding_outliers_centroid_members_not_outliers(spark, sf_dir):
    """The seeded centroids ARE embedding rows, so each centroid's own
    vector sits at cosine exactly 1.0 to itself -- never flagged."""
    n_cent, _ = Q._ivf_params(sf_dir)
    e = Q._t(spark, sf_dir, "embeddings")
    cent_ids = [
        r["vec_id"] for r in e.orderBy("vec_id").limit(n_cent).collect()
    ]
    got = {
        r["vec_id"]: r
        for r in Q.q_embedding_outliers(spark, sf_dir).collect()
        if r["vec_id"] in set(cent_ids)
    }
    assert len(got) == n_cent
    for i, vid in enumerate(sorted(cent_ids)):
        assert got[vid]["cluster_id"] == i  # assigned to itself
        assert got[vid]["cos_r"] == 1.0 and not got[vid]["is_outlier"]


def test_cluster_topics_shape_and_ordering(spark, sf_dir):
    """Per cluster: at most top-3 rows, integer scores strictly ordered
    (score desc, token asc), and every cluster_id comes from the seeded
    geometry [0, C)."""
    import overpaint_spark.queries as Q

    rows = Q.q_corpus_cluster_topics(spark, sf_dir).collect()
    assert rows
    n_cent, _ = Q._ivf_params(sf_dir)
    per = {}
    for r in rows:
        assert 0 <= r["cluster_id"] < n_cent
        per.setdefault(r["cluster_id"], []).append((r["tfidf_score"], r["tok"]))
    for cid, items in per.items():
        assert 1 <= len(items) <= Q._CLUSTER_TOPICS_TOPK
        # no duplicate tokens within a cluster's card
        toks = [t for _, t in items]
        assert len(toks) == len(set(toks)), f"cluster {cid} repeats a token"


def test_snapshot_diff_statuses_and_unchanged_dropped(spark, sf_dir):
    """All three statuses occur on the derived v1/v2 fixture views;
    unchanged docs never leak a row; token deltas line up with the
    planted ' v2' suffix edit (+1 token on every changed doc)."""
    from overpaint_spark import queries as Q

    rows = Q.q_corpus_snapshot_diff(spark, sf_dir).collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r["status"], []).append(r)
    assert set(by_status) == {"added", "removed", "changed"}
    for r in by_status["added"]:
        assert r["old_tokens"] is None and r["new_tokens"] is not None
        assert r["doc_id"] % 11 == 5  # absent from v1, present in v2
    for r in by_status["removed"]:
        assert r["new_tokens"] is None and r["doc_id"] % 13 == 7
    for r in by_status["changed"]:
        assert r["doc_id"] % 17 == 2
        assert r["new_tokens"] == r["old_tokens"] + 1
