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


def test_shipping_priority_filters_pushed_and_topk(spark):
    plan = plan_of(spark, "shipping_priority")
    # Both fact-side date filters sit directly on the scans (DataFilters).
    # Spark's DSv2 parquet translation does not convert timestamp_ntz
    # comparisons into PushedFilters (no row-group pruning) — if a Spark
    # upgrade starts pushing them, the stronger assert below should be
    # tightened to PushedFilters.
    assert "(l_shipdate" in plan and "> 1998-06-01" in plan
    assert "(o_orderdate" in plan and "< 1998-06-01" in plan
    # top-10 is a TakeOrderedAndProject, never a global Sort
    assert "TakeOrderedAndProject" in plan


def test_part_profit_all_dims_broadcast(spark):
    plan = plan_of(spark, "part_profit_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    # the LIKE filter prunes part before the broadcast build
    assert "StringContains(p_name,widget)" in plan


def test_customer_order_distribution_preaggregates(spark):
    plan = plan_of(spark, "customer_order_distribution")
    # orders are reduced to one row per custkey BEFORE the outer join:
    # partial agg must appear below the join in the plan
    assert "HashAggregate" in plan
    # only the two needed columns are read from orders
    read = [l for l in plan.splitlines() if "ReadSchema" in l and "o_custkey" in l]
    assert read and "o_totalprice" not in read[0]


def test_idle_rich_scalar_is_broadcast_and_anti_join_deduped(spark):
    plan = plan_of(spark, "idle_rich_customers")
    # the ONLY nested-loop join is the 1-row scalar-average broadcast
    # (formatted explain mentions each operator twice: tree + detail)
    assert plan.count("BroadcastNestedLoopJoin") == 2
    assert "CartesianProduct" not in plan
    # the recent-customers set is distinct-ed BEFORE the anti join probe
    assert "LeftAnti" in plan


def test_asof_join_single_shuffle(spark):
    plan = plan_of(spark, "events_asof_attribution")
    # union + one window: exactly one exchange feeds the window sort
    n_exchanges = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_exchanges <= 2, plan  # key shuffle (+ AQE final coalesce at most)
    assert "Window" in plan


# Queries whose semantics REQUIRE a non-equi join of two relations
# (exact brute-force scoring of queries × corpus), or a scalar 1-row
# broadcast subquery (a BroadcastNestedLoopJoin whose build side is one
# aggregate row is a per-row comparison, not a cross product) —
# everything else must never plan a cartesian/nested-loop join.
_CROSS_OK = {
    "ann_topk_bruteforce",
    # kNN label eval: the bounded probe set (|N|/25 rows) broadcast
    # against candidates — same asymmetry as ann_topk_bruteforce
    "ann_knn_accuracy",
    "idle_rich_customers",
    "part_value_share",
    # round-robin interleave: the only nested-loop join is the 1-row
    # n_sources scalar broadcast
    "dataset_interleave",
    # LM score: the only nested-loop join is the 1-row (total, v)
    # model-size scalar broadcast
    "text_lm_score",
    # clean v2 embeds the LM score, inheriting the same 1-row scalar
    # broadcast
    "corpus_clean_v2",
    # clean v3 = v2 + the span gate; same inherited 1-row broadcast
    "corpus_clean_v3",
    # quantization: the only nested-loop join is the 1-row per-dim
    # bounds broadcast
    "embedding_quantize",
    # PQ ADC search: the only nested-loop join is the |Q|-row broadcast
    # of the per-query lookup tables (the candidate side reads codes
    # only — that asymmetry IS the operator)
    "ann_topk_pq",
    # OPQ ADC search: same |Q|-row LUT broadcast as ann_topk_pq
    "ann_topk_opq",
    # hamming search: the |Q|-row query-sketch broadcast (8 bytes/row)
    "ann_topk_hamming",
    # rerank composes the hamming shortlist + a |Q|-row vector broadcast
    "ann_topk_hamming_rerank",
    # recall report embeds the brute-force ground truth + the full-ADC
    # tier: the nested-loop joins are the same bounded |Q|-row
    # broadcasts those two whitelisted queries make
    "ann_ivfpq_recall",
    # probe curve embeds the same brute-force ground truth crossJoin
    "ann_ivf_probe_curve",
    # hybrid RRF: the only nested-loop join is the 1-row query-vector
    # broadcast on the dense side
    "retrieval_hybrid_rrf",
    # temperature mixture: the only nested-loop join is the 1-row
    # max-source-count scalar broadcast
    "dataset_mixture_temperature",
    # epoch plan: two 1-row scalar broadcasts (max avail, budget
    # totals) into the #sources-row relation
    "dataset_epoch_plan",
    # SQ8 error audit: the 1-row per-dim bounds broadcast, same as
    # embedding_quantize
    "embedding_sq8_error",
    # DSIR: the 1-row (total_raw, total_target) scalar broadcast into
    # the 64-row bucket-ratio relation
    "dataset_dsir_weights",
    # DSIR resample embeds dsir_weights, inheriting the same 1-row
    # scalar broadcast
    "dataset_dsir_resample",
    # entropy: one 1-row totals broadcast per profiled column (4 arms)
    "profile_entropy",
    # BPE merge: the 1-row argmax-count scalar broadcast for the
    # is_best_merge flag
    "bpe_merge_pairs",
    # trained-tier recall report: the same bounded |Q|-row broadcasts
    # as ann_ivfpq_recall (brute-force ground truth + ADC LUT relations)
    "ann_trained_recall",
    # funnel embeds text_lm_score's 1-row (total, v) scalar broadcast
    "corpus_funnel",
    # the end-to-end pipeline chains clean_v3, inheriting the same
    # 1-row LM scalar broadcast
    "corpus_pipeline",
    # shard balance: the 1-row total-tokens scalar broadcast
    "shard_balance",
    # BM25: the 1-row corpus-stats (N, avgdl, per-term df) scalar
    # broadcast into the per-doc scorer
    "documents_bm25",
    # LSH recall report: three 1-row count scalars crossed into the
    # single summary row
    "dedup_lsh_recall",
    # semantic decontamination: training side crossed against the
    # BOUNDED broadcast eval split (benchmark suites are ≤ ~10⁴ rows)
    "decontaminate_semantic",
    # NB classifier: the doc × label scaffold crosses docs with the
    # BOUNDED broadcast priors relation (K labels); training crosses
    # the K-row label totals with the 1-row doc count
    "langid_nb_confusion",
    # tf-idf: the 1-row corpus doc count crossed into the vocab-bounded
    # scoring relation
    "source_tfidf_terms",
    # cluster topics: the same 1-row doc-count scalar broadcast as
    # source_tfidf_terms, into the vocab-bounded scoring relation
    "corpus_cluster_topics",
    # multi-query BM25: the 1-row corpus-stats scalar broadcast into
    # the postings-sliver scorer (documents_bm25's shape, per query)
    "retrieval_bm25_queries",
    # multi-query RRF: inherits the BM25 stats scalar + the BOUNDED
    # |Q|-row query-vector broadcast on the dense side (the
    # brute_force_topk asymmetry)
    "retrieval_rrf_queries",
    # multi-query MMR: the only nested-loop join is the BOUNDED |Q|-row
    # broadcast query relation crossed into the shortlist builder
    # (operators/retrieval.py: c.crossJoin(F.broadcast(q)) — the exact
    # asymmetric shape of its whitelisted twins above)
    "retrieval_mmr_queries",
    # indexed RRF: inherits the BM25 1-row corpus-stats scalar
    # broadcast; the dense side is an equi-join on cluster_id against
    # the bounded LUT relation (no corpus fold — that's the point)
    "retrieval_rrf_indexed",
    # hard-negative mining: the bounded probe set (|N|/25 rows)
    # broadcast against the candidate scan — the ann_knn_accuracy
    # asymmetry with the cross-label filter fused into the same stage
    "embedding_hard_negatives",
    # triplet mining: the same bounded probe broadcast, with BOTH label
    # sides surviving into the per-(query, is_pos) rank windows
    "embedding_triplets",
    # FK audit: per edge, the two 1-row summary aggregates (totals ×
    # orphan totals) cross into the edge's report row
    "profile_referential_integrity",
    # FK discovery (r11): per candidate, the three 1-row gate
    # aggregates (child keys × parent uniqueness × containment) cross
    # into the candidate's report row — bounded by construction
    "profile_fk_discovery",
    # near-dup leakage: the 1-row pair fold crossed with the 1-row
    # test-doc count (the split_dedup_leakage fold over pairs)
    "split_neardup_leakage",
}


def test_embedding_blocked_gemm_single_shuffle(spark):
    """The declared embedding-cosine dedup path must stay fully
    distributed: one hash exchange on the block-pair key feeding the
    grouped GEMM, a column-pruned scan, and no driver-side collect
    anywhere in the plan (the old numpy path shipped the whole matrix in
    the task closure)."""
    plan = plan_of(spark, "dedup_embedding_cosine")
    assert "FlatMapGroupsInPandas" in plan
    n_exchanges = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_exchanges <= 2, plan  # block-pair shuffle (+ AQE coalesce)
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read and "vec_id" in read[0] and "embedding" in read[0]
    assert "label" not in read[0]  # pruned


def test_simhash_pairs_band_equijoin(spark):
    """SimHash candidates must come from the 16-bit band equi-join —
    never a cartesian or nested-loop comparison of fingerprints."""
    plan = plan_of(spark, "dedup_simhash_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "half_idx" in plan and "half" in plan  # the band join keys


@pytest.mark.slow
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


def test_corpus_vocabulary_rank_is_partitioned(spark):
    """token_id assignment must never sort the whole vocabulary in one
    task (a 10^8-row relation at web scale): the row_number window is
    partitioned by (n_occurrences, first-char bucket); the only
    unpartitioned window allowed is the running-sum over the tiny
    per-bucket size relation, and the offsets join is a broadcast."""
    df = Q.QUERIES["corpus_vocabulary"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    rn_windows = [
        line for line in plan.splitlines()
        if "Window" in line and "row_number()" in line
    ]
    assert rn_windows, plan
    for line in rn_windows:
        assert "tok_bkt" in line, f"unpartitioned vocabulary rank: {line}"
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_dataset_shuffle_rank_is_partitioned(spark):
    """The training-order permutation must never sort the whole corpus
    in one task: the row_number window is partitioned by the hex-prefix
    bucket; the only unpartitioned window is the running-sum over the
    256-row bucket-size relation, and the offsets join is a broadcast."""
    df = Q.QUERIES["dataset_shuffle"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    rn_windows = [
        line for line in plan.splitlines()
        if "Window" in line and "row_number()" in line
    ]
    assert rn_windows, plan
    for line in rn_windows:
        assert "bkt" in line, f"unpartitioned corpus rank: {line}"
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_dataset_shuffle_prefix_width_equivalence(spark):
    """The bucket prefix width is a pure partitioning knob (2-hex =
    256 buckets through ~1e9 docs, 3-hex past that): positions must be
    identical at any width."""
    from overpaint_spark.queries import q_dataset_shuffle

    two = {r.doc_id: (r.position, r.shard)
           for r in q_dataset_shuffle(spark, SF, prefix_hex=2).collect()}
    three = {r.doc_id: (r.position, r.shard)
             for r in q_dataset_shuffle(spark, SF, prefix_hex=3).collect()}
    assert two == three


def test_multiquery_rank_windows_use_group_limit(spark):
    """The multi-query retrieval tiers' per-query row_number filters
    must plan as WindowGroupLimit (bounded per-partition top-k heaps
    BEFORE the exchange — the multi-query analogue of
    TakeOrderedAndProject), never a full per-query sort: a refactor
    that defeats InferWindowGroupLimit (e.g. selecting extra window
    functions or a non-rank filter) turns each rank window into a
    corpus-sized sort per query at 100 TB."""
    for name, min_hits in [
        ("retrieval_rrf_queries", 3),  # lex depth + dense depth + final top-k
        ("retrieval_bm25_queries", 1),
    ]:
        plan = plan_of(spark, name)
        hits = plan.count("WindowGroupLimit")
        assert hits >= min_hits, f"{name}: {hits} WindowGroupLimit in plan"


def test_corpus_pipeline_scrub_subtree_runs_once(spark):
    """r12: corpus_pipeline's surviving-scrubbed relation (``alive``)
    has THREE consumers (OOV explode, seeded_shuffle, pack join);
    without the eager localCheckpoint each consumer re-executed the
    entire clean_v3 + span-scrub subtree — 148 parquet scans / 12 gram
    explodes in one physical plan at r11. The lineage cut bounds the
    final plan to the post-checkpoint work: a handful of scans (the
    vocabulary CTE's documents scan) and ZERO gram explodes."""
    plan = plan_of(spark, "corpus_pipeline")
    assert plan.count("Scan parquet") <= 8, plan.count("Scan parquet")
    # the clean/scrub gram machinery must not appear downstream of the
    # checkpoint (it ran exactly once, at DataFrame build)
    assert "zip_with" not in plan


def test_profile_correlations_single_scan(spark):
    """r13: the 6 pair rows come from one stack over ONE aggregate row —
    the previous 6-branch union re-ran the full lineitem scan + moment
    fold per branch (Spark does no CSE across union branches), 6 scans
    for 6 rows at any scale."""
    plan = plan_of(spark, "profile_correlations")
    # formatted explain lists every node twice (tree + details)
    assert plan.count("Scan parquet") == 2, plan.count("Scan parquet")
    assert plan.count("Exchange") <= 2, plan.count("Exchange")


def test_profile_functional_deps_no_expand(spark):
    """r13: each FD branch pre-aggregates to distinct (det, dep) pairs
    and folds counts over that small relation. The two-countDistinct
    form planned an Expand that doubled every input row before the
    first hash aggregate; mixing distinct+regular aggregates over the
    pair relation re-scanned the table twice per branch."""
    plan = plan_of(spark, "profile_functional_deps")
    assert "Expand" not in plan
    # formatted explain lists every node twice (tree + details): 4 scans
    assert plan.count("Scan parquet") == 8, plan.count("Scan parquet")
