"""Decontamination: cross-corpus n-gram containment + cleaning."""

import pytest
from pyspark.sql import functions as F

from overpaint_spark.operators.decontaminate import (
    contamination_report,
    decontaminated,
)
from overpaint_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, f"{sf_dir}/documents.parquet")


def _split(docs):
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    tr = docs.filter(F.col("doc_id") % 20 != 0)
    return tr, ev


def test_verbatim_eval_copy_has_full_containment(spark, docs):
    """A training doc that IS an eval doc must flag with containment 1.0."""
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    # forge a training corpus containing one verbatim eval text
    leak = ev.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    tr = docs.filter(F.col("doc_id") % 20 != 0).select("doc_id", "text").union(leak)
    rep = contamination_report(tr, ev, k=5).filter(F.col("doc_id") >= 1_000_000)
    rows = rep.collect()
    assert len(rows) == 1
    assert rows[0]["containment"] == 1.0
    assert rows[0]["n_shared"] == rows[0]["n_shingles"]


def test_clean_and_flagged_partition_the_corpus(spark, docs):
    tr, ev = _split(docs)
    flagged = {r["doc_id"] for r in contamination_report(tr, ev, k=5).collect()}
    clean = {r["doc_id"] for r in decontaminated(tr, ev, k=5).select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in tr.select("doc_id").collect()}
    assert clean | flagged == all_ids
    assert clean & flagged == set()


def test_short_docs_never_flag(spark):
    """Docs with fewer than k words have no k-grams → cannot flag."""
    tr = spark.createDataFrame([(1, "too short"), (2, "a b c d")], ["doc_id", "text"])
    ev = spark.createDataFrame([(9, "too short indeed it is")], ["doc_id", "text"])
    assert contamination_report(tr, ev, k=5).count() == 0


def test_containment_bounds(spark, docs):
    tr, ev = _split(docs)
    bad = (
        contamination_report(tr, ev, k=5)
        .filter(
            (F.col("containment") <= 0)
            | (F.col("containment") > 1)
            | (F.col("n_shared") > F.col("n_shingles"))
        )
        .count()
    )
    assert bad == 0
