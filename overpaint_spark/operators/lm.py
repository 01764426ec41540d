"""Character-trigram LM quality model as a PERSISTABLE artifact.

``q_text_lm_score`` (queries.py) builds its Laplace-smoothed trigram
model and scores the corpus in one declared pipeline — two passes over
the exploded grams per invocation. At production cadence the model is
built once (or refreshed slowly) and used to score every new batch, so
repeated scoring should pay ONE data-sized pass, not two: this module
makes the model a first-class persisted relation, the same surface
shape as the persisted dedup band index (operators/dedup.py
build/persist/load_dedup_index — VERDICT r4 task #6).

The model relation is (gram string, c bigint) — bounded by charset³
regardless of corpus size, so it broadcasts. The smoothing totals
(total = Σc, v = |vocab|) are DERIVED from the model rather than
persisted beside it: re-deriving costs one aggregate over a bounded
relation and makes a stale-totals mismatch impossible.

Equality with the declared query is by construction —
``q_text_lm_score`` routes through these same helpers — and pinned in
tests/test_text.py (build → persist → load → score round-trip equals
the one-shot query row-for-row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def doc_trigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, gram) exploded char-trigram rows — the shared scan both
    the model build and the scoring pass read."""
    from overpaint_spark.queries import _char_trigrams

    return docs.select(
        "doc_id", F.explode(_char_trigrams(F.col("text"))).alias("gram")
    )


def build_lm_model(docs: DataFrame, sample_mod: int = 10) -> DataFrame:
    """(gram, c) counts from the deterministic doc_id-mod sample. One
    map-side-combined aggregate; shuffle is O(distinct grams) ≤
    charset³."""
    return (
        doc_trigrams(docs)
        .filter(F.col("doc_id") % sample_mod == 0)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def persist_lm_model(model: DataFrame, path: str) -> None:
    """Write the model relation as parquet. Single file-set, no
    partitioning — the relation is broadcast-sized by construction."""
    model.write.mode("overwrite").parquet(path)


def load_lm_model(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def lm_score(docs: DataFrame, model: DataFrame) -> DataFrame:
    """(doc_id, n_grams, lm_score_ppm) — ONE pass over the corpus's
    exploded grams against a prebuilt (possibly loaded) model. Integer
    ppm math end-to-end; identical output to q_text_lm_score given the
    model that query would build (see module docstring)."""
    from overpaint_spark.queries import _LM_PPM

    tot = model.agg(
        F.sum("c").cast("bigint").alias("total"), F.count(F.lit(1)).alias("v")
    )
    per_doc = (
        doc_trigrams(docs)
        .join(F.broadcast(model), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("c"), F.lit(0)) + F.lit(1))
            .cast("bigint")
            .alias("sum_c1"),
            F.count(F.lit(1)).alias("n_grams"),
        )
    )
    return per_doc.crossJoin(F.broadcast(tot)).selectExpr(
        "doc_id",
        "n_grams",
        f"(sum_c1 * {_LM_PPM}) div ((total + v) * n_grams) AS lm_score_ppm",
    )
