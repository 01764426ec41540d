"""Decontamination: cross-corpus n-gram containment + cleaning."""

import pytest
from pyspark.sql import functions as F

from overpaint_spark.operators.decontaminate import (
    bloom_might_contain,
    build_eval_bloom,
    contamination_report,
    decontaminated,
    decontaminated_bloom,
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


def test_bloom_equals_exact_path(spark, docs):
    """Bloom gating is a pure pre-filter: no false negatives means the
    bloom-screened result is bit-identical to the exact anti-join."""
    tr, ev = _split(docs)
    exact = decontaminated(tr, ev, k=5).select("doc_id")
    bloom = decontaminated_bloom(tr, ev, k=5).select("doc_id")
    assert exact.exceptAll(bloom).count() == 0
    assert bloom.exceptAll(exact).count() == 0


def test_bloom_has_no_false_negatives(spark, docs):
    """Every gram inserted into the bitset must probe positive — the
    property the exact-equality above rests on, checked directly on the
    eval grams themselves."""
    from overpaint_spark.operators.dedup import distinct_shingles

    _, ev = _split(docs)
    words = build_eval_bloom(ev, k=5)
    grams = distinct_shingles(ev, k=5).select("shingle").distinct()
    misses = grams.filter(
        ~bloom_might_contain(F.col("shingle"), words, 1 << 17, 5)
    ).count()
    assert misses == 0


def test_bloom_verbatim_leak_is_dropped(spark, docs):
    """A planted verbatim eval copy must be removed by the bloom path."""
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    leak = ev.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    tr = docs.filter(F.col("doc_id") % 20 != 0).select("doc_id", "text").union(leak)
    kept = decontaminated_bloom(tr, ev, k=5).filter(
        F.col("doc_id") >= 1_000_000
    )
    assert kept.count() == 0


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
