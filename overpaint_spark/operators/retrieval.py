"""Multi-query retrieval: BM25 / hybrid RRF / MMR over a QUERY RELATION.

The declared retrieval rows (``documents_bm25``, ``retrieval_hybrid_rrf``,
``retrieval_mmr`` in queries.py) pin a fixed literal query because the
driver harness needs parameterless entries — but a real search stack
ranks per ARRIVING query. These operators take a queries DataFrame
(bounded: the ``brute_force_topk`` broadcast posture — a query batch is
KBs–MBs even at production fan-in) and produce per-query rankings; each
is equivalence-pinned to its single-query declared twin on a 1-row
query relation in tests/test_retrieval.py.

Scale shape (100 TB corpus, bounded query batch):

- **BM25**: the corpus is scanned twice, both map-side — once for the
  2-column stats row (N, avgdl), once for the postings sliver (tokens
  are filtered against the distinct-query-term literal BEFORE the
  explode, so the shuffle carries only matching tokens — near-empty
  relative to the corpus for natural query vocabularies). Everything
  after runs on bounded relations (≤ |terms| df rows, matching docs).
- **Per-(doc, term) contributions are half-up ppm-quantized BEFORE the
  per-query sum**, which then adds exact BIGINTs — deterministic under
  ANY aggregation order, the property a distributed SUM over doubles
  cannot give. (The single-query declared row quantizes the 3-term
  float sum instead; the two agree within ±|terms| ppm, and the pin
  test shows identical fixture rankings.)
- **RRF / MMR**: per-query work after the shortlists is O(depth) /
  O(k·shortlist) BY CONSTRUCTION; MMR's greedy recurrence runs
  vectorized inside one ``applyInPandas`` group PER QUERY (≤ shortlist
  rows each), so a thousand queries fan out across executors instead
  of serializing through the driver the way the single-query
  ``mmr_select`` does.
- **Per-query rank windows are NOT corpus-sized sorts**: every
  ``row_number ≤ k`` filter here plans as Partial+Final
  ``WindowGroupLimit`` (Spark 3.5 InferWindowGroupLimit) — each map
  partition keeps a bounded top-k heap per query BEFORE the exchange,
  so the shuffle carries ≤ k·partitions rows per query, the
  multi-query analogue of the single-query tier's
  TakeOrderedAndProject. Verified in the executed plans
  (tests/test_plans.py sweeps the declared rows; the rrf plan shows
  six WindowGroupLimit operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from overpaint_spark.functions import vectors as V

BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60


def bm25_scores_queries(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, doc_id, bm25_ppm) with bm25_ppm > 0 — BM25 scores of
    every document against every query's term array (Robertson/Sparck
    Jones, +1-smoothed idf; the same formula as queries._bm25_scores).

    Per-(doc, term) contributions are ppm-quantized at the bounded
    postings relation and summed as exact BIGINTs per (query, doc) —
    see the module docstring for why that is the distributed-sum-safe
    form. Terms appearing in several queries are scored once and fan
    out through the broadcast (term → query) map.
    """
    # distinct BEFORE the broadcast join: a term duplicated inside one
    # query's array must score once, not fan the same posting out twice
    # (the single-query twin and the declared oracle score distinct terms)
    term_rows = queries.select(
        F.explode(F.col(terms_col)).alias("term"), F.col(query_id_col)
    ).distinct()
    all_terms = sorted(
        {r["term"] for r in term_rows.select("term").distinct().collect()}
    )
    if not all_terms:
        raise ValueError("queries carry no terms")
    term_lit = F.array(*[F.lit(t) for t in all_terms])

    toks = F.split(F.col(text_col), " ")
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum(F.size(toks)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    # postings sliver: filter to query terms map-side, THEN explode —
    # the shuffle carries only matching tokens
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).cast("bigint").alias("dl"),
            F.explode(
                F.filter(toks, lambda t: F.array_contains(term_lit, t))
            ).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df_rel = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    tf_d = F.col("tf").cast("double")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0)
        - F.lit(b)
        + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
    )
    contrib = idf * (tf_d * F.lit(k1 + 1.0)) / denom
    contrib_ppm = F.floor(contrib * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "bigint"
    )
    scored = (
        tf.join(F.broadcast(df_rel), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", contrib_ppm.alias("contrib_ppm"))
    )
    return (
        scored.join(F.broadcast(term_rows), "term")
        .groupBy(query_id_col, "doc_id")
        .agg(F.sum("contrib_ppm").cast("bigint").alias("bm25_ppm"))
        .filter(F.col("bm25_ppm") > 0)
    )


def bm25_topk_queries(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per-query BM25 top-``k``: (query_id, doc_id, rank, bm25_ppm),
    rank = row_number over (bm25_ppm desc, doc_id) — the
    partitioned-window form of ``documents_bm25``'s global
    TakeOrderedAndProject."""
    scores = bm25_scores_queries(
        docs,
        queries,
        id_col=id_col,
        text_col=text_col,
        query_id_col=query_id_col,
        terms_col=terms_col,
        k1=k1,
        b=b,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25_ppm").desc(), F.col("doc_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "doc_id", "rank", "bm25_ppm")
    )


def hybrid_rrf_queries(
    docs: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 25,
    depth: int = 50,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Per-query hybrid retrieval with reciprocal-rank fusion (Cormack
    et al. 2009): (query_id, doc_id, lex_rank, vec_rank, rrf_ppm) —
    the BM25 lexical top-``depth`` and the dense cosine top-``depth``
    fused by ``rrf = Σ 1/(rrf_k + rank)``, missing list ⇒ 0, top-``k``
    kept per query.

    The dense side broadcasts the prepared query vectors against the
    corpus scan (brute_force_topk's shape, self-match excluded on
    ``vec_id == query_id``); both rank windows partition by query_id,
    so no single-partition window ever sees corpus-sized input."""
    lex = bm25_topk_queries(
        docs,
        queries,
        k=depth,
        id_col=id_col,
        text_col=text_col,
        query_id_col=query_id_col,
        terms_col=terms_col,
    ).select(query_id_col, "doc_id", F.col("rank").alias("lex_rank"))

    qv = V.as_double(F.col(qvec_col))
    q = queries.select(
        F.col(query_id_col),
        qv.alias("q_vec"),
        V.norm(qv).alias("q_norm"),
    )
    cv = V.as_double(F.col(vec_col))
    c = vectors.select(
        F.col(vec_id_col).alias("doc_id"),
        cv.alias("c_vec"),
        V.norm(cv).alias("c_norm"),
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("doc_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "doc_id",
            V.cosine(
                F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
            ).alias("sim"),
        )
    )
    wd = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col("doc_id")
    )
    den = (
        sims.withColumn("vec_rank", F.row_number().over(wd).cast("bigint"))
        .filter(F.col("vec_rank") <= depth)
        .select(query_id_col, "doc_id", "vec_rank")
    )

    return _rrf_fuse(lex, den, k, rrf_k, query_id_col)


def _rrf_fuse(
    lex: DataFrame,
    den: DataFrame,
    k: int,
    rrf_k: int,
    query_id_col: str,
) -> DataFrame:
    """Reciprocal-rank fusion of a lexical (query_id, doc_id, lex_rank)
    and a dense (query_id, doc_id, vec_rank) ranking: rrf = Σ
    1/(rrf_k + rank), missing list ⇒ 0, per-query top-``k`` — the
    shared tail of :func:`hybrid_rrf_queries` and
    :func:`hybrid_rrf_indexed`. Both inputs are bounded (≤ depth rows
    per query), so the full-outer fusion and its rank window run over
    KB-scale relations regardless of corpus size."""
    fused = lex.join(den, [query_id_col, "doc_id"], "full_outer")
    rl = F.coalesce(
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("lex_rank")), F.lit(0.0)
    )
    rv = F.coalesce(
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("vec_rank")), F.lit(0.0)
    )
    rrf = F.floor((rl + rv) * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")
    wr = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf_ppm").desc(), F.col("doc_id")
    )
    return (
        fused.select(
            query_id_col, "doc_id", "lex_rank", "vec_rank", rrf.alias("rrf_ppm")
        )
        .withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def hybrid_rrf_indexed(
    docs: DataFrame,
    index,
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 25,
    depth: int = 50,
    n_probe: int = 4,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Per-query hybrid RRF whose dense side is the PRODUCTION path:
    shortlist from a persisted IVF-PQ index
    (operators/ann_index.search_ann_index — probe + ADC over stored
    code bytes, vectors never read) followed by an exact cosine rerank
    of the ≤ ``depth``-row shortlist against the true vectors. The
    100 TB shape :func:`hybrid_rrf_queries` deliberately does NOT have:
    its brute-force broadcast fold reads every corpus vector per query,
    this reads ``n_probe`` inverted lists' codes and exactly
    |shortlist| true vectors (a semi-join sliver).

    ``index`` is an :class:`overpaint_spark.operators.ann_index.
    AnnIndex` (live-built or loaded from parquet — same search body
    either way). Ranks after the shortlist follow the twin's
    discipline: per-query row_number windows over bounded relations,
    fused by :func:`_rrf_fuse`."""
    from overpaint_spark.operators.ann_index import search_ann_index

    lex = bm25_topk_queries(
        docs,
        queries,
        k=depth,
        id_col=id_col,
        text_col=text_col,
        query_id_col=query_id_col,
        terms_col=terms_col,
    ).select(query_id_col, "doc_id", F.col("rank").alias("lex_rank"))

    qv_rel = queries.select(
        F.col(query_id_col).alias(index.id_col),
        F.col(qvec_col).alias(vec_col),
    )
    short = search_ann_index(index, qv_rel, n_probe=n_probe, k=depth).select(
        F.col("query_id").alias(query_id_col),
        F.col("neighbor_id").alias("doc_id"),
    )

    qv = V.as_double(F.col(qvec_col))
    q = queries.select(
        F.col(query_id_col),
        qv.alias("q_vec"),
        V.norm(qv).alias("q_norm"),
    )
    cv = V.as_double(F.col(vec_col))
    c = vectors.select(
        F.col(vec_id_col).alias("doc_id"),
        cv.alias("c_vec"),
        V.norm(cv).alias("c_norm"),
    )
    rr = (
        short.join(c, "doc_id")
        .join(F.broadcast(q), query_id_col)
        .select(
            query_id_col,
            "doc_id",
            V.cosine(
                F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
            ).alias("sim"),
        )
    )
    wd = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col("doc_id")
    )
    den = (
        rr.withColumn("vec_rank", F.row_number().over(wd).cast("bigint"))
        .select(query_id_col, "doc_id", "vec_rank")
    )
    return _rrf_fuse(lex, den, k, rrf_k, query_id_col)


def mmr_select_queries(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Per-query MMR diversified selection (λ = 0.5): (query_id,
    select_rank, item_id, rel_ppm, maxsim_ppm) — the greedy trace of
    :func:`similarity.mmr_select`, one trace PER QUERY.

    Plan: cosine shortlists for all queries in one broadcast-fold pass
    (per-query partitioned top-``shortlist`` window), then ONE
    ``applyInPandas`` group per query runs the SAME integer greedy
    core (``similarity.mmr_greedy_trace``) over its ≤ ``shortlist``
    rows — queries parallelize across executors; the driver never
    sees a vector. Self-matches are excluded on ``item_id ==
    query_id`` (the brute_force_topk convention)."""
    qv = V.as_double(F.col(qvec_col))
    q = queries.select(
        F.col(query_id_col),
        qv.alias("q_vec"),
        V.norm(qv).alias("q_norm"),
    )
    cv = V.as_double(F.col(vec_col))
    c = candidates.select(
        F.col(id_col).alias("item_id"),
        cv.alias("c_vec"),
        V.norm(cv).alias("c_norm"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rel").desc(), F.col("item_id")
    )
    pool = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("item_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "item_id",
            F.col("c_vec").alias("vec"),
            V.cosine(
                F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
            ).alias("rel"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= shortlist)
        .drop("_rn")
    )
    return _mmr_trace_groups(pool, k, query_id_col)


def _mmr_trace_groups(pool: DataFrame, k: int, query_id_col: str) -> DataFrame:
    """Shared trace tail of :func:`mmr_select_queries` and
    :func:`mmr_select_indexed`: ``pool`` is the per-query candidate
    relation (query_id, item_id, vec, rel); one ``applyInPandas`` group
    per query runs the integer greedy core
    (``similarity.mmr_greedy_trace``) over its bounded rows."""
    import pandas as pd

    from overpaint_spark.operators.similarity import mmr_greedy_trace

    out_schema = (
        f"{query_id_col} long, select_rank int, item_id long, "
        "rel_ppm long, maxsim_ppm long"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        qid = int(pdf[query_id_col].iloc[0])
        order = np.lexsort((pdf["item_id"].to_numpy(), -pdf["rel"].to_numpy()))
        ids = pdf["item_id"].to_numpy()[order].astype(np.int64)
        mat = np.array(
            [list(v) for v in pdf["vec"].to_numpy()[order]], dtype=np.float64
        )
        rel = pdf["rel"].to_numpy()[order].astype(np.float64)
        trace = mmr_greedy_trace(ids, mat, rel, k)
        return pd.DataFrame(
            {
                query_id_col: [qid] * len(trace),
                "select_rank": [t[0] for t in trace],
                "item_id": [t[1] for t in trace],
                "rel_ppm": [t[2] for t in trace],
                "maxsim_ppm": [t[3] for t in trace],
            }
        )

    return pool.groupBy(query_id_col).applyInPandas(run, out_schema)


def mmr_select_indexed(
    index,
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    n_probe: int = 4,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Per-query MMR whose shortlist is the PRODUCTION dense path —
    the :func:`hybrid_rrf_indexed` discipline applied to diversified
    selection: candidates come from a persisted IVF-PQ index
    (operators/ann_index.search_ann_index, ADC top-``shortlist`` per
    query over stored code bytes), their TRUE vectors are fetched as a
    |shortlist| semi-join sliver, exact-cosine relevance is recomputed
    on that sliver, and the SAME integer greedy core re-ranks it
    (:func:`_mmr_trace_groups`). At 100 TB this replaces
    :func:`mmr_select_queries`' brute-force corpus fold with
    ``n_probe`` inverted-list code reads per query; the greedy step
    stays O(k·shortlist) by construction. When the index shortlist
    agrees with the brute-force top-``shortlist`` set, the traces are
    IDENTICAL (rel is recomputed exactly; the recurrence sees the same
    candidate set) — pinned in tests/test_retrieval.py."""
    from overpaint_spark.operators.ann_index import search_ann_index

    qv_rel = queries.select(
        F.col(query_id_col).alias(index.id_col),
        F.col(qvec_col).alias(vec_col),
    )
    short = search_ann_index(index, qv_rel, n_probe=n_probe, k=shortlist).select(
        F.col("query_id").alias(query_id_col),
        F.col("neighbor_id").alias("item_id"),
    )
    qv = V.as_double(F.col(qvec_col))
    q = queries.select(
        F.col(query_id_col),
        qv.alias("q_vec"),
        V.norm(qv).alias("q_norm"),
    )
    cv = V.as_double(F.col(vec_col))
    c = vectors.select(
        F.col(vec_id_col).alias("item_id"),
        cv.alias("c_vec"),
        V.norm(cv).alias("c_norm"),
    )
    pool = (
        short.join(c, "item_id")
        .join(F.broadcast(q), query_id_col)
        .select(
            query_id_col,
            "item_id",
            F.col("c_vec").alias("vec"),
            V.cosine(
                F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
            ).alias("rel"),
        )
    )
    return _mmr_trace_groups(pool, k, query_id_col)
