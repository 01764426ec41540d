"""Benchmark decontamination: cross-corpus n-gram containment.

A training corpus must not contain evaluation-benchmark text; the
standard check flags every training document sharing word k-grams with
any eval document. This is NOT dedup (operators/dedup.py): dedup finds
pairs *within* one corpus, decontamination is an asymmetric containment
probe of a huge corpus against a small reference set — which is exactly
the asymmetry the plan exploits.

Scale shape (100 TB training corpus, MB-scale benchmark suite):

- the eval gram set is tiny → **broadcast**; the probe is a map-side
  ``left_semi`` join — the training side is never shuffled to meet the
  eval side;
- the only data-sized exchange is the per-doc ``distinct`` of training
  postings (same materialized-postings pattern as
  operators/dedup.distinct_shingles, which this reuses);
- the per-doc count aggregation input is only the *matching* postings —
  post-semi-join, i.e. near-zero for a clean corpus.

The reference has no similarity surface at all; this extends the
north-star dedup family (BASELINE.json) to its cross-corpus twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from overpaint_spark.operators.dedup import distinct_shingles


def contamination_report(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_shared: int = 1,
) -> DataFrame:
    """Per contaminated training doc: how many distinct word-``k``-grams
    it shares with ANY eval doc, its own distinct-gram count, and the
    containment fraction ``n_shared / n_shingles``.

    Docs with fewer than ``k`` words have no grams and can never flag.
    ``containment`` is one double÷double division of exact integer
    counts — bit-identical cross-engine, so the whole report is
    SQL-oracle-checkable.
    """
    tr = distinct_shingles(train, id_col, text_col, k)
    ev = (
        distinct_shingles(eval_docs, id_col, text_col, k)
        .select("shingle")
        .distinct()
    )
    sizes = tr.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    shared = (
        tr.join(F.broadcast(ev), "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(sizes, id_col)
        .filter(F.col("n_shared") >= F.lit(min_shared))
        .withColumn(
            "containment",
            F.col("n_shared").cast("double") / F.col("n_shingles").cast("double"),
        )
        .select(id_col, "n_shared", "n_shingles", "containment")
    )


def decontaminated(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    max_containment: float = 0.0,
) -> DataFrame:
    """The cleaning counterpart: training docs whose containment is at
    or below ``max_containment`` (default: drop on ANY shared gram).
    Anti join against the (small) flagged set, so the corpus payload is
    scanned once and never shuffled."""
    flagged = contamination_report(
        train, eval_docs, id_col, text_col, k, min_shared=1
    ).filter(F.col("containment") > F.lit(max_containment))
    return train.join(
        F.broadcast(flagged.select(id_col)), id_col, "left_anti"
    )
