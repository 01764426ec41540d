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


@pytest.fixture(scope="module")
def rrf_rows(spark, sf_dir):
    return Q.q_retrieval_hybrid_rrf(spark, sf_dir).collect()


def test_rrf_scores_ranked_and_bounded(rrf_rows):
    """rrf_ppm descending, and every score within the algebraic range:
    a doc on one list scores at most 1e6/(60+1); on both lists at most
    2e6/61; always > 0 (rank ≤ depth ⇒ contribution ≥ 1/(60+50))."""
    from overpaint_spark.queries import _RRF_DEPTH, _RRF_K

    assert 0 < len(rrf_rows) <= 25
    scores = [r["rrf_ppm"] for r in rrf_rows]
    assert scores == sorted(scores, reverse=True)
    hi = int(2_000_000 / (_RRF_K + 1)) + 1
    lo = int(1_000_000 / (_RRF_K + _RRF_DEPTH))
    for r in rrf_rows:
        assert lo <= r["rrf_ppm"] <= hi, dict(r.asDict())


def test_rrf_rank_consistency(rrf_rows):
    """Each fused row keeps at least one source rank, ranks stay within
    the retrieval depth, and the score recomputes exactly from the
    ranks (the fusion formula is the row's own witness)."""
    import math

    from overpaint_spark.queries import _RRF_DEPTH, _RRF_K

    for r in rrf_rows:
        lex, vec = r["lex_rank"], r["vec_rank"]
        assert lex is not None or vec is not None
        for rk in (lex, vec):
            if rk is not None:
                assert 1 <= rk <= _RRF_DEPTH
        expect = math.floor(
            (
                (1.0 / (_RRF_K + lex) if lex is not None else 0.0)
                + (1.0 / (_RRF_K + vec) if vec is not None else 0.0)
            )
            * 1_000_000.0
            + 0.5
        )
        assert r["rrf_ppm"] == expect, dict(r.asDict())


def test_rrf_both_lists_represented(rrf_rows):
    """The fusion must actually fuse: at fixture scale the top-25 holds
    docs carrying a lexical rank AND docs carrying a dense rank (a
    degenerate single-source result would silently reduce to one
    ranker)."""
    assert any(r["lex_rank"] is not None for r in rrf_rows)
    assert any(r["vec_rank"] is not None for r in rrf_rows)


def test_rrf_dual_membership_dominates_tail(rrf_rows):
    """A doc on BOTH lists at ranks (a, b) outscores any doc whose
    single rank exceeds both — ordering sanity of the fusion."""
    dual = [
        r
        for r in rrf_rows
        if r["lex_rank"] is not None and r["vec_rank"] is not None
    ]
    single = [
        r
        for r in rrf_rows
        if (r["lex_rank"] is None) != (r["vec_rank"] is None)
    ]
    for d in dual:
        worst = max(d["lex_rank"], d["vec_rank"])
        for s in single:
            rk = s["lex_rank"] if s["lex_rank"] is not None else s["vec_rank"]
            if rk >= worst:
                assert d["rrf_ppm"] > s["rrf_ppm"], (
                    dict(d.asDict()),
                    dict(s.asDict()),
                )


def _reference_mmr(rows, query_vec, k, shortlist):
    """Independent pure-python MMR (λ = 0.5): left-to-right float
    folds mirror the engine's sequential `aggregate` exactly, so the
    two implementations must agree bit-for-bit on the ppm integers."""
    import math

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def cos(a, b):
        na, nb = math.sqrt(dot(a, a)), math.sqrt(dot(b, b))
        if na == 0.0 or nb == 0.0:
            return -1.0
        return dot(a, b) / (na * nb)

    def ppm(x):
        return math.floor(x * 1_000_000.0 + 0.5)

    scored = sorted(
        ((cos(v, query_vec), i) for i, v in rows),
        key=lambda t: (-t[0], t[1]),
    )[:shortlist]
    vec_of = dict(rows)
    pool = [(i, ppm(rel)) for rel, i in scored]
    trace, maxsim, picked = [], {}, set()
    for rank in range(1, min(k, len(pool)) + 1):
        best = None
        for i, rp in pool:
            if i in picked:
                continue
            score = rp if not picked else rp - maxsim[i]
            if best is None or score > best[0] or (score == best[0] and i < best[1]):
                best = (score, i, rp)
        _, j, rp = best
        trace.append((rank, j, rp, 0 if not picked else maxsim[j]))
        picked.add(j)
        for i, _rp in pool:
            s = ppm(cos(vec_of[i], vec_of[j]))
            if i not in maxsim or s > maxsim[i]:
                maxsim[i] = s
    return trace


def test_mmr_matches_independent_reference(spark, sf_dir):
    """Full-trace agreement with the pure-python reference MMR on the
    real fixture — selection, ranks, rel and penalty ppm all equal."""
    got = [
        (r["select_rank"], r["item_id"], r["rel_ppm"], r["maxsim_ppm"])
        for r in Q.q_retrieval_mmr(spark, sf_dir).collect()
    ]
    e = Q._t(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    rows = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in e]
    qv = next(v for i, v in rows if i == 0)
    rows = [(i, v) for i, v in rows if i != 0]
    want = _reference_mmr(rows, qv, k=10, shortlist=50)
    assert got == want


def test_mmr_trace_shape_and_uniqueness(spark, sf_dir):
    rows = Q.q_retrieval_mmr(spark, sf_dir).collect()
    assert [r["select_rank"] for r in rows] == list(range(1, 11))
    ids = [r["item_id"] for r in rows]
    assert len(set(ids)) == len(ids)
    assert rows[0]["maxsim_ppm"] == 0  # first pick pays no penalty


def test_mmr_first_pick_is_relevance_argmax(spark, sf_dir):
    rows = Q.q_retrieval_mmr(spark, sf_dir).collect()
    assert rows[0]["rel_ppm"] == max(r["rel_ppm"] for r in rows)


def test_mmr_diversification_binds_on_planted_clump(spark):
    """Three near-identical high-relevance vectors: pure relevance
    would take all three first; MMR must interleave — after the clump
    representative, the orthogonal-ish items outrank its twins."""
    base = [1.0, 1.0, 1.0, 1.0]
    clump = [
        [1.0, 0.05 + 0.001 * j, 0.05, 0.05] for j in range(3)
    ]  # rel ≈ 0.57 (the top), mutually ≈ identical
    spread = [
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]  # rel = 0.5, mutually orthogonal, ≈ orthogonal to the clump
    data = [(0, base)] + [(i + 1, v) for i, v in enumerate(clump + spread)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    from overpaint_spark.operators.similarity import mmr_select

    got = [r["item_id"] for r in mmr_select(df, 0, k=4, shortlist=6).collect()]
    # one clump member leads; the three spread vectors beat the
    # remaining two clump twins (penalty ≈ 1e6 wipes their rel edge)
    assert got[0] in {1, 2, 3}
    assert set(got[1:]) == {4, 5, 6}


# --- multi-query retrieval (operators/retrieval.py) --------------------------
#
# Each operator takes a QUERY RELATION; on a 1-row relation matching the
# declared fixed-literal query, it must reproduce the declared row.


def test_bm25_queries_one_row_matches_declared(spark, sf_dir):
    """bm25_topk_queries on the declared 3-term query reproduces
    documents_bm25's ranking; scores agree within the per-term
    quantization bound (the multi-query path sums ppm-quantized
    per-term contributions; the declared row quantizes the float sum
    — they differ by < |terms| ppm)."""
    from overpaint_spark.operators.retrieval import bm25_topk_queries

    d = Q._t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [(0, list(_BM25_TERMS))], "query_id long, terms array<string>"
    )
    got = {
        r["doc_id"]: (r["rank"], r["bm25_ppm"])
        for r in bm25_topk_queries(d, queries, k=25).collect()
    }
    want = Q.q_documents_bm25(spark, sf_dir).collect()
    assert len(got) == len(want) == 25
    for rank, r in enumerate(want, start=1):
        assert r["doc_id"] in got
        g_rank, g_ppm = got[r["doc_id"]]
        assert g_rank == rank
        assert abs(g_ppm - r["bm25_ppm"]) <= len(_BM25_TERMS)


def test_bm25_queries_scores_are_per_query(spark, sf_dir):
    """Two queries with disjoint vocabularies rank independently: each
    hit doc's score equals the 1-query run's score for that query."""
    from overpaint_spark.operators.retrieval import bm25_scores_queries

    d = Q._t(spark, sf_dir, "documents")
    both = spark.createDataFrame(
        [(0, ["hash", "join"]), (1, ["vector"])],
        "query_id long, terms array<string>",
    )
    multi = {
        (r["query_id"], r["doc_id"]): r["bm25_ppm"]
        for r in bm25_scores_queries(d, both).collect()
    }
    for qid, terms in [(0, ["hash", "join"]), (1, ["vector"])]:
        solo_rel = spark.createDataFrame(
            [(qid, terms)], "query_id long, terms array<string>"
        )
        solo = {
            (r["query_id"], r["doc_id"]): r["bm25_ppm"]
            for r in bm25_scores_queries(d, solo_rel).collect()
        }
        assert solo == {kv: v for kv, v in multi.items() if kv[0] == qid}


def test_hybrid_rrf_queries_one_row_matches_declared(spark, sf_dir):
    """hybrid_rrf_queries with query 0 = (declared terms, vec 0's
    embedding) reproduces retrieval_hybrid_rrf row-for-row (doc_id,
    lex_rank, vec_rank, rrf_ppm)."""
    from overpaint_spark.operators.retrieval import hybrid_rrf_queries

    d = Q._t(spark, sf_dir, "documents")
    e = Q._t(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    queries = spark.createDataFrame(
        [(0, list(_BM25_TERMS), list(qvec))],
        "query_id long, terms array<string>, qvec array<double>",
    )
    got = sorted(
        (r["doc_id"], r["lex_rank"], r["vec_rank"], r["rrf_ppm"])
        for r in hybrid_rrf_queries(d, e, queries, k=25).collect()
    )
    want = sorted(
        (r["doc_id"], r["lex_rank"], r["vec_rank"], r["rrf_ppm"])
        for r in Q.q_retrieval_hybrid_rrf(spark, sf_dir).collect()
    )
    assert got == want


def test_mmr_queries_one_row_matches_declared(spark, sf_dir):
    """mmr_select_queries with query 0 = vec 0's embedding reproduces
    mmr_select's greedy trace exactly (same integer core)."""
    from overpaint_spark.operators.retrieval import mmr_select_queries

    e = Q._t(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    queries = spark.createDataFrame(
        [(0, list(qvec))], "query_id long, qvec array<double>"
    )
    got = sorted(
        (
            r["select_rank"],
            r["item_id"],
            r["rel_ppm"],
            r["maxsim_ppm"],
        )
        for r in mmr_select_queries(e, queries, k=10, shortlist=50).collect()
    )
    want = sorted(
        (r["select_rank"], r["item_id"], r["rel_ppm"], r["maxsim_ppm"])
        for r in Q.q_retrieval_mmr(spark, sf_dir).collect()
    )
    assert got == want


def test_mmr_queries_traces_are_independent(spark, sf_dir):
    """Each query's trace depends only on its own shortlist: a 2-query
    run restricted to either query equals the corresponding 1-query
    run."""
    from overpaint_spark.operators.retrieval import mmr_select_queries

    e = Q._t(spark, sf_dir, "embeddings")
    v0 = e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    v1 = e.filter(F.col("vec_id") == 1).collect()[0]["embedding"]
    both = spark.createDataFrame(
        [(0, list(v0)), (1, list(v1))], "query_id long, qvec array<double>"
    )
    multi = {
        (r["query_id"], r["select_rank"]): (r["item_id"], r["rel_ppm"])
        for r in mmr_select_queries(e, both, k=5).collect()
    }
    for qid, v in [(0, v0), (1, v1)]:
        solo_rel = spark.createDataFrame(
            [(qid, list(v))], "query_id long, qvec array<double>"
        )
        solo = {
            (r["query_id"], r["select_rank"]): (r["item_id"], r["rel_ppm"])
            for r in mmr_select_queries(e, solo_rel, k=5).collect()
        }
        assert solo == {kv: v2 for kv, v2 in multi.items() if kv[0] == qid}


def test_declared_rrf_queries_q0_equals_single_query_row(spark, sf_dir):
    """The declared 2-query RRF's query-0 slice must equal the declared
    single-query retrieval_hybrid_rrf row-for-row (same terms, same
    query vector, same exclusion rule)."""
    got = sorted(
        (r["doc_id"], r["lex_rank"], r["vec_rank"], r["rrf_ppm"])
        for r in Q.q_retrieval_rrf_queries(spark, sf_dir).collect()
        if r["query_id"] == 0
    )
    want = sorted(
        (r["doc_id"], r["lex_rank"], r["vec_rank"], r["rrf_ppm"])
        for r in Q.q_retrieval_hybrid_rrf(spark, sf_dir).collect()
    )
    assert got == want


@pytest.mark.slow
def test_rrf_indexed_all_probes_equals_bruteforce_twin(spark, sf_dir):
    """With EVERY inverted list probed and depth >= N, the indexed dense
    path degenerates to exact search: the ADC shortlist holds every
    non-self candidate and the exact-cosine rerank reproduces the
    brute-force ranks — so hybrid_rrf_indexed must equal
    hybrid_rrf_queries row-for-row. (The declared row's approximate
    regime — bounded n_probe, depth 50 — is value-checked by its SQL
    oracle instead.)"""
    from overpaint_spark.operators.ann_index import build_ann_index
    from overpaint_spark.operators.retrieval import (
        hybrid_rrf_indexed,
        hybrid_rrf_queries,
    )
    from overpaint_spark.queries import (
        _BM25_QUERIES,
        _PQ_K,
        _PQ_M,
        _QUANT_DIM,
        _ivf_params,
        _t,
    )

    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    n = e.count()
    n_cent, _ = _ivf_params(sf_dir)
    idx = build_ann_index(
        e, dim=_QUANT_DIM, n_centroids=n_cent, n_subspaces=_PQ_M, n_codes=_PQ_K
    )
    qids = sorted(_BM25_QUERIES)
    terms_rel = spark.createDataFrame(
        [(qid, list(_BM25_QUERIES[qid])) for qid in qids],
        "query_id long, terms array<string>",
    )
    qvecs = e.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    queries = terms_rel.join(qvecs, "query_id")
    key = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["doc_id"], r["lex_rank"], r["vec_rank"], r["rrf_ppm"])
        for r in rows
    )
    got = key(
        hybrid_rrf_indexed(
            d, idx, queries, e, k=25, depth=n, n_probe=n_cent
        ).collect()
    )
    want = key(hybrid_rrf_queries(d, e, queries, k=25, depth=n).collect())
    assert got == want


def test_mmr_indexed_all_probes_equals_bruteforce_twin(spark, sf_dir):
    """The hybrid_rrf_indexed degeneracy argument applied to MMR: with
    every inverted list probed and shortlist >= N the ADC shortlist is
    every non-self candidate, relevance is recomputed exactly on the
    true vectors by both paths, and the integer greedy core sees the
    SAME candidate set — so mmr_select_indexed must reproduce
    mmr_select_queries' traces tuple-for-tuple. (The declared row's
    approximate regime — bounded n_probe, shortlist 50 — is
    value-checked by its SQL oracle instead.)"""
    from overpaint_spark.operators.ann_index import build_ann_index
    from overpaint_spark.operators.retrieval import (
        mmr_select_indexed,
        mmr_select_queries,
    )
    from overpaint_spark.queries import (
        _BM25_QUERIES,
        _PQ_K,
        _PQ_M,
        _QUANT_DIM,
        _ivf_params,
        _t,
    )

    e = _t(spark, sf_dir, "embeddings")
    n = e.count()
    n_cent, _ = _ivf_params(sf_dir)
    idx = build_ann_index(
        e, dim=_QUANT_DIM, n_centroids=n_cent, n_subspaces=_PQ_M, n_codes=_PQ_K
    )
    qids = sorted(_BM25_QUERIES)
    queries = e.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    key = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["select_rank"], r["item_id"], r["rel_ppm"], r["maxsim_ppm"])
        for r in rows
    )
    got = key(
        mmr_select_indexed(
            idx, queries, e, k=10, shortlist=n, n_probe=n_cent
        ).collect()
    )
    want = key(mmr_select_queries(e, queries, k=10, shortlist=n).collect())
    assert got == want
