"""Multinomial Naive Bayes over hashed-unigram features — the
fastText-shaped classifier every training-data pipeline runs (quality
filtering, language ID, domain tagging) expressed as three bounded
relations and two corpus passes.

Model shape (`nb_train`): labels × 64 hash buckets of Laplace-smoothed
log-likelihoods plus per-label log-priors — ≤ 64·K + K rows total, a
BROADCAST relation no matter how large the corpus. Training is ONE
map-side-combined aggregate over the exploded token stream (shuffle is
64·K rows) plus one doc-count aggregate.

Scoring (`nb_classify`) is the second corpus pass: each token row joins
the broadcast model (K rows per token — K is a small constant), per-
(doc, label) partial sums combine map-side, and the argmax is a
doc_id-partitioned window. Nothing data-sized is ever collected; no
stage is single-partition.

Cross-engine exactness: the ONLY transcendental is `ln` over the
bounded model table. Each log-likelihood is quantized to integer
parts-per-million at model-build time (`floor(1e6·ln(p))` — the
documents_bm25 idiom), so scoring and argmax are pure BIGINT arithmetic
and the declared query carries a full SQL oracle. A 1-ulp libm
disagreement flips a table entry only when 1e6·ln(p) sits within
~2.6e-9 of an integer; the fixture tables' minimum distance is
measured in the declared query's docstring.

Feature hashing follows queries._dsir_bucket verbatim (first two md5
hex chars, 13·a + b mod 64 — the one hex→int path Spark and DuckDB
share); the formula is duplicated here because queries.py imports this
package, not the reverse.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Hashed-unigram feature buckets (matches queries._DSIR_BUCKETS).
NB_BUCKETS = 64


def _bucket(tok: Column) -> Column:
    """Feature bucket 0..63 — queries._dsir_bucket's formula: the
    multiplier 13 is coprime to 64 so both hex chars reach all buckets."""
    h = F.md5(tok)
    return (
        F.ascii(F.substring(h, 1, 1)) * 13 + F.ascii(F.substring(h, 2, 1))
    ) % NB_BUCKETS


def _tokens(docs: DataFrame, id_col: str, label_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.col(label_col).alias("_label"),
        F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
    ).withColumn("_b", _bucket(F.col("_tok")))


def nb_train(
    docs: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "lang",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Train: returns ``(likelihoods, priors)``.

    ``likelihoods``: one row per (label, bucket) — DENSE over all 64
    buckets (zero-count buckets carry the smoothed floor), with
    ``lp_ppm = floor(1e6 · ln((n_lb + 1) / (tot_l + 64)))``.
    ``priors``: one row per label with ``prior_ppm = floor(1e6 ·
    ln(n_docs_l / n_docs))``. Both are bounded by the label count and
    meant to be broadcast."""
    tk = _tokens(docs, id_col, label_col, text_col)
    counts = tk.groupBy("_label", "_b").agg(F.count(F.lit(1)).alias("_n"))
    totals = tk.groupBy("_label").agg(F.count(F.lit(1)).alias("_tot"))
    dense = totals.select(
        "_label",
        "_tot",
        F.explode(F.sequence(F.lit(0), F.lit(NB_BUCKETS - 1))).alias("_b"),
    ).join(counts, ["_label", "_b"], "left")
    likelihoods = dense.select(
        "_label",
        "_b",
        F.floor(
            F.log(
                (F.coalesce(F.col("_n"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.col("_tot") + F.lit(NB_BUCKETS)).cast("double")
            )
            * F.lit(1_000_000.0)
        )
        .cast("bigint")
        .alias("lp_ppm"),
    )
    ndocs = docs.groupBy(F.col(label_col).alias("_label")).agg(
        F.count(F.lit(1)).alias("_nd")
    )
    total_docs = ndocs.agg(F.sum("_nd").alias("_n"))
    priors = ndocs.crossJoin(F.broadcast(total_docs)).select(
        "_label",
        F.floor(
            F.log(F.col("_nd").cast("double") / F.col("_n").cast("double"))
            * F.lit(1_000_000.0)
        )
        .cast("bigint")
        .alias("prior_ppm"),
    )
    return likelihoods, priors


def nb_classify(
    docs: DataFrame,
    likelihoods: DataFrame,
    priors: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Predict per doc: ``(id, pred)`` where pred is the argmax label of
    ``prior_ppm + Σ_tokens lp_ppm`` — all-BIGINT once the model exists.
    Ties break by label ascending (deterministic cross-engine). NULL
    texts classify as the empty string (one '' token), matching
    streaming/nbayes.nb_classify_stream row-for-row; docs whose token
    join finds no likelihood rows still score on priors alone via the
    doc × label scaffold."""
    tb = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("_tok"),
    ).withColumn("_b", _bucket(F.col("_tok")))
    tok_scores = (
        tb.join(F.broadcast(likelihoods), "_b")
        .groupBy(id_col, "_label")
        .agg(F.sum("lp_ppm").alias("_s"))
    )
    scaffold = docs.select(id_col).crossJoin(F.broadcast(priors))
    scored = scaffold.join(tok_scores, [id_col, "_label"], "left").select(
        id_col,
        "_label",
        (F.col("prior_ppm") + F.coalesce(F.col("_s"), F.lit(0))).alias(
            "_score"
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_score").desc(), F.col("_label").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("_label").alias("pred"))
    )


def nb_confusion(
    train: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Held-out confusion matrix ``(label, pred, n_docs)`` — train on
    ``train``, classify ``heldout``, count (true, predicted) pairs.
    ≤ K² rows; the standard evidence a pipeline keeps for any deployed
    filter model."""
    likelihoods, priors = nb_train(train, id_col, label_col, text_col)
    preds = nb_classify(heldout, likelihoods, priors, id_col, text_col)
    return (
        heldout.select(F.col(id_col), F.col(label_col))
        .join(preds, id_col)
        .groupBy(label_col, "pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
