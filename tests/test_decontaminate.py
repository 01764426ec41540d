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


# --- semantic (embedding-space) decontamination ----------------------------


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    return load_table(spark, f"{sf_dir}/embeddings.parquet")


def _vsplit(vecs):
    ev = vecs.filter(F.col("vec_id") % 20 == 0)
    tr = vecs.filter(F.col("vec_id") % 20 != 0)
    return tr, ev


def test_semantic_verbatim_leak_flags_at_cosine_one(spark, vecs):
    """A training vector that IS an eval vector (the paraphrase-probe
    worst case: identical embedding) must flag with max cosine 1.0."""
    from overpaint_spark.operators.decontaminate import (
        semantic_contamination_report,
    )

    tr, ev = _vsplit(vecs)
    leak = ev.limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    rep = semantic_contamination_report(
        tr.select("vec_id", "embedding").union(leak), ev, threshold=0.4
    ).filter(F.col("vec_id") >= 1_000_000)
    rows = rep.collect()
    assert len(rows) == 1
    assert rows[0]["max_cosine_r"] == 1.0
    assert rows[0]["n_eval_hits"] >= 1


def test_semantic_zero_norm_never_flags(spark, vecs):
    """An all-zero embedding cosines to -1.0 (functions/vectors) and
    must never appear in the flagged report."""
    from overpaint_spark.operators.decontaminate import (
        semantic_contamination_report,
    )

    _, ev = _vsplit(vecs)
    dim = len(ev.limit(1).collect()[0]["embedding"])
    zero = spark.createDataFrame(
        [(2_000_000, [0.0] * dim)], "vec_id bigint, embedding array<float>"
    )
    rep = semantic_contamination_report(zero, ev, threshold=-0.5)
    assert rep.count() == 0


def test_semantic_report_invariants(spark, vecs):
    """Flagged rows only, hits >= 1, max cosine at/above threshold and
    never above 1 (+ rounding headroom)."""
    from overpaint_spark.operators.decontaminate import (
        semantic_contamination_report,
    )

    tr, ev = _vsplit(vecs)
    rep = semantic_contamination_report(tr, ev, threshold=0.4)
    bad = rep.filter(
        (F.col("n_eval_hits") < 1)
        | (F.col("max_cosine_r") < 0.4 - 5e-5)
        | (F.col("max_cosine_r") > 1.0)
    ).count()
    assert bad == 0
    train_ids = {r["vec_id"] for r in tr.select("vec_id").collect()}
    assert {r["vec_id"] for r in rep.collect()} <= train_ids


# --- derived Bloom geometry (bloom_geometry) ---------------------------------


def test_bloom_geometry_formula():
    """Floor at the 2^17 default, next-power-of-two growth at ~10
    bits/gram, ceiling at the 16 MiB plan-literal bound."""
    from overpaint_spark.operators.decontaminate import (
        BLOOM_BITS_DEFAULT,
        BLOOM_BITS_MAX,
        bloom_geometry,
    )

    assert bloom_geometry(0) == BLOOM_BITS_DEFAULT
    assert bloom_geometry(1) == BLOOM_BITS_DEFAULT
    assert bloom_geometry(13_000) == BLOOM_BITS_DEFAULT  # 130k <= 2^17
    assert bloom_geometry(14_000) == 1 << 18  # 140k > 131072
    assert bloom_geometry(40_000) == 1 << 19
    assert bloom_geometry(1_000_000) == 1 << 24
    assert bloom_geometry(10**12) == BLOOM_BITS_MAX
    for n in (1, 100, 13_000, 50_000, 10**7):
        bits = bloom_geometry(n)
        assert bits & (bits - 1) == 0  # power of two


def test_bloom_derived_geometry_stays_selective_where_fixed_saturates(spark):
    """At an eval suite ~3x past the fixed default's saturation point
    (40k distinct grams), the DERIVED bitset keeps the candidate
    fraction on a disjoint training corpus under 10%, while the old
    fixed 2^17 geometry lets the majority of clean docs through to the
    exact confirm — the screen stops screening."""
    from pyspark.sql import functions as F

    from overpaint_spark.functions import text as TX
    from overpaint_spark.operators.decontaminate import (
        BLOOM_BITS_DEFAULT,
        bloom_geometry,
        bloom_might_contain,
        build_gram_bloom,
    )
    from overpaint_spark.operators.dedup import distinct_shingles

    k = 5
    # eval: 2000 docs x 24 globally-unique words -> 40k distinct 5-grams
    ev = spark.createDataFrame(
        [(i, " ".join(f"e{i}w{j}" for j in range(24))) for i in range(2000)],
        "doc_id long, text string",
    )
    # train: 500 docs x 10 words, vocabulary DISJOINT from eval
    tr = spark.createDataFrame(
        [(i, " ".join(f"t{i}w{j}" for j in range(10))) for i in range(500)],
        "doc_id long, text string",
    )
    grams_rel = distinct_shingles(ev, k=k).select("shingle").distinct().cache()
    n_grams = grams_rel.count()
    assert n_grams == 2000 * 20
    derived_bits = bloom_geometry(n_grams)
    assert derived_bits > BLOOM_BITS_DEFAULT

    def candidate_fraction(n_bits: int) -> float:
        words = build_gram_bloom(grams_rel, n_bits=n_bits)
        g = TX.shingles(F.col("text"), k)
        n = tr.filter(
            F.exists(g, lambda x: bloom_might_contain(x, words, n_bits, 5))
        ).count()
        return n / 500.0

    assert candidate_fraction(derived_bits) <= 0.10
    assert candidate_fraction(BLOOM_BITS_DEFAULT) >= 0.50
    grams_rel.unpersist()


def test_bloom_candidate_pred_equals_per_gram_screen(spark):
    """SCALE.md r11: the hash-once candidate screen must yield the
    IDENTICAL verdict as exists(bloom_might_contain) for every doc —
    same double-hash probe sequence, restructured only so each gram
    hashes twice instead of 2*n_hashes times."""
    import pyspark.sql.functions as F

    from overpaint_spark.functions import text as TX
    from overpaint_spark.operators.decontaminate import (
        bloom_candidate_pred,
        bloom_geometry,
        bloom_might_contain,
        build_gram_bloom,
    )
    from overpaint_spark.operators.dedup import distinct_shingles

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = (
        distinct_shingles(d.filter(F.col("doc_id") % 20 == 0), "doc_id", "text", 5)
        .select("shingle")
        .distinct()
    )
    n_bits = bloom_geometry(ev.count())
    words = build_gram_bloom(ev, n_bits, 5)
    grams = TX.shingles(F.col("text"), 5)
    both = d.select(
        "doc_id",
        bloom_candidate_pred(grams, words, n_bits, 5).alias("fast"),
        F.exists(
            grams, lambda g: bloom_might_contain(g, words, n_bits, 5)
        ).alias("slow"),
    )
    assert both.filter(
        F.coalesce(F.col("fast"), F.lit(False))
        != F.coalesce(F.col("slow"), F.lit(False))
    ).count() == 0
    assert both.filter("fast").count() > 0  # the planted leaks screen in
