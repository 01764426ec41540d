"""Text-analysis function tests."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from overpaint_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="the cat and the dog"),
        Row(doc_id=2, text="le chat et le chien noir"),
        Row(doc_id=3, text="xyzzy plugh"),          # no markers → und
        Row(doc_id=4, text="one two"),               # < 3 words → no shingles
    ]
    return spark.createDataFrame(rows)


def _one(df, col):
    return {r.doc_id: r[col] for r in df.collect()}


def test_word_stats(docs):
    out = docs.select(
        "doc_id",
        TX.n_words(F.col("text")).alias("nw"),
        TX.n_distinct_words(F.col("text")).alias("nd"),
        TX.avg_word_len(F.col("text")).alias("awl"),
    )
    nw, nd, awl = _one(out, "nw"), _one(out, "nd"), _one(out, "awl")
    assert nw[1] == 5 and nd[1] == 4          # 'the' twice
    assert awl[1] == (19 - 4) / 5             # exact integer-derived mean


def test_langid(docs):
    pred = _one(docs.select("doc_id", TX.predicted_lang(F.col("text")).alias("p")), "p")
    assert pred[1] == "en"
    assert pred[2] == "fr"
    assert pred[3] == "und"


def test_bpe_tokens(docs):
    out = _one(docs.select("doc_id", TX.bpe_token_count(F.col("text")).alias("t")), "t")
    assert out[1] == 5                        # pure letter runs
    mixed = docs.sparkSession.createDataFrame([Row(doc_id=9, text="ab12cd, x9!")])
    got = _one(mixed.select("doc_id", TX.bpe_token_count(F.col("text")).alias("t")), "t")
    # ab | 12 | cd | , | x | 9 | !  → 7
    assert got[9] == 7


def test_shingles_short_doc_empty(docs):
    out = _one(docs.select("doc_id", TX.shingles(F.col("text"), 3).alias("s")), "s")
    assert out[4] == []
    assert out[1] == ["the cat and", "cat and the", "and the dog"]


def test_minhash_component_is_min_of_hashes(docs):
    out = docs.select(
        "doc_id", TX.minhash_component(TX.shingles(F.col("text"), 3), seed=0).alias("m")
    )
    m = _one(out, "m")
    assert m[4] is None                        # empty shingle set → no signature
    assert len(m[1]) == 32                     # md5 hex


def test_quality_components_and_score(docs):
    comp = TX.quality_components(F.col("text"))
    out = docs.select(
        "doc_id",
        comp["stopword_ratio"].alias("sr"),
        comp["type_token_ratio"].alias("ttr"),
        comp["punct_ratio"].alias("pr"),
        TX.quality_score(F.col("text")).alias("q"),
    )
    rows = {r.doc_id: r for r in out.collect()}
    # doc 1: "the cat and the dog" → 3 stopwords of 5 words, 4 distinct
    assert rows[1]["sr"] == 3 / 5
    assert rows[1]["ttr"] == 4 / 5
    assert rows[1]["pr"] == 0.0       # lowercase corpus, no noise chars
    assert rows[3]["sr"] == 0.0       # "xyzzy plugh" has no stopwords
    for r in rows.values():
        assert 0.0 <= r["q"] <= 1.0
    # prose with stopwords scores above keyword soup of the same length
    assert rows[1]["q"] > rows[3]["q"]


def test_redactions_sequential_counts(spark):
    from overpaint_spark.functions.text import redactions
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com from 10.0.0.1 about customer x"),
            (2, "supplier customer supplier"),
            (3, "clean text"),
        ],
        "id long, text string",
    )
    red, counts = redactions(F.col("text"))
    out = {
        r.id: r
        for r in df.select(
            "id", red.alias("t"),
            *[c.alias(f"n_{k}") for k, c in counts.items()],
        ).collect()
    }
    assert out[1].n_email == 1 and out[1].n_ip == 1 and out[1].n_entity == 1
    assert out[1].t == "mail <email> from <ip> about <entity> x"
    # global replacement, not first-match
    assert out[2].n_entity == 3 and out[2].t == "<entity> <entity> <entity>"
    assert out[3].n_email == out[3].n_ip == out[3].n_entity == 0
    assert out[3].t == "clean text"


def test_empty_document_yields_null_ratios_not_divide_by_zero(spark):
    """ANSI mode is on by default in Spark 4 and this project never
    disables it: an empty document must produce NULL ratios, not a
    job-killing DIVIDE_BY_ZERO."""
    from pyspark.sql import functions as F

    from overpaint_spark.functions import text as TX

    df = spark.createDataFrame([(0, ""), (1, "a b")], "doc_id long, text string")
    comp = TX.quality_components(F.col("text"))
    rows = {r.doc_id: r for r in df.select(
        "doc_id",
        comp["punct_ratio"].alias("pr"),
        TX.quality_score(F.col("text")).alias("qs"),
    ).collect()}
    # char-denominator ratios are NULL; the composite still evaluates
    # (LEAST ignores NULLs identically in Spark and DuckDB, so the
    # empty doc scores 0.255 in both engines — low, as it should)
    assert rows[0].pr is None and abs(rows[0].qs - 0.255) < 1e-9
    assert rows[1].pr is not None and rows[1].qs is not None


def test_lm_model_persist_roundtrip_equals_declared_query(spark, tmp_path):
    """build -> persist -> load -> score must equal the declared
    one-shot text_lm_score row-for-row: the persisted-model path is how
    production amortizes the model build over many scoring batches
    (same build-once surface as the persisted dedup band index), so any
    drift between the two would silently change quality filtering."""
    from overpaint_spark import queries as Q
    from overpaint_spark.operators import lm as LM
    from overpaint_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, f"{sf}/documents.parquet")

    path = str(tmp_path / "lm_model.parquet")
    LM.persist_lm_model(LM.build_lm_model(d, sample_mod=10), path)
    loaded = LM.load_lm_model(spark, path)
    via_persisted = {
        r.doc_id: (r.n_grams, r.lm_score_ppm)
        for r in LM.lm_score(d, loaded).collect()
    }
    declared = {
        r.doc_id: (r.n_grams, r.lm_score_ppm)
        for r in Q.QUERIES["text_lm_score"](spark, sf).collect()
    }
    assert via_persisted == declared


@pytest.mark.slow
def test_span_scrub_consistent_with_span_stats(spark):
    """The scrubber and the audit must agree: a doc loses exactly as
    many tokens as its duplicated spans cover (n_kept == n_tokens iff
    n_dup_spans == 0, and the clean text is the verbatim original in
    that case); a doc with duplicated spans keeps a text whose
    remaining windows contain none of the corpus's duplicated spans
    (idempotence: scrubbing twice changes nothing further on docs
    already clean)."""
    from overpaint_spark.queries import (
        scrub_duplicated_spans,
        substring_span_stats,
    )
    from overpaint_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, f"{sf}/documents.parquet")
    stats = {r.doc_id: r for r in substring_span_stats(d).collect()}
    scrub = {r.doc_id: r for r in scrub_duplicated_spans(d).collect()}
    originals = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}

    assert set(scrub) == set(originals)
    touched = 0
    for doc_id, row in scrub.items():
        st = stats.get(doc_id)
        if st is None or st.n_dup_spans == 0:
            assert row.n_kept == row.n_tokens
            assert row.text_clean == originals[doc_id]
        else:
            assert row.n_kept < row.n_tokens
            touched += 1
    assert touched > 0  # the fixture corpus really contains duplication


@pytest.mark.slow
def test_corpus_funnel_last_stage_equals_clean_v3(spark):
    """The funnel's span_cap row must equal COUNT(corpus_clean_v3) —
    the standing cross-check the funnel exists to provide — and the
    cumulative counts must be monotonically non-increasing from raw."""
    from overpaint_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {
        r.stage_idx: r for r in QUERIES["corpus_funnel"](spark, sf).collect()
    }
    assert sorted(rows) == [0, 1, 2, 3, 4, 5]
    counts = [rows[i].n_docs for i in range(6)]
    assert counts == sorted(counts, reverse=True)
    assert rows[0].retained_ppm == 1_000_000
    v3 = QUERIES["corpus_clean_v3"](spark, sf).count()
    assert rows[5].n_docs == v3


def test_zipf_fit_recovers_planted_slope_and_flags_fixture(spark, sf_dir):
    """The fit must recover slope ≈ −1 on a genuinely Zipfian planted
    distribution (count(r) = round(1200/r), 40 ranks) and report the
    near-uniform fixture vocabulary as NON-Zipfian (|slope| ≪ 1) — the
    flat-slope synthetic-text alarm working as designed."""
    from overpaint_spark.queries import q_text_zipf_fit, zipf_fit

    docs = spark.createDataFrame(
        [(r, " ".join([f"tok{r:03d}"] * max(1, round(1200 / r))))
         for r in range(1, 41)],
        "doc_id long, text string",
    )
    planted = zipf_fit(docs).collect()[0]
    assert planted.n_ranks == 40
    # rounding of 1200/r perturbs the tail; the fit stays within 3%
    assert abs(planted.slope_ppm + 1_000_000) < 30_000

    fixture = q_text_zipf_fit(spark, sf_dir).collect()[0]
    assert abs(fixture.slope_ppm) < 500_000  # near-uniform, not Zipfian


def test_char_trigrams_zip_form_equals_substr_form(spark):
    """SCALE.md r11: _char_trigrams is built from zipped slices (O(L))
    — pinned byte-identical to the naive substr form (O(L^2)) it
    replaced, over fixture texts plus multi-byte and edge cases."""
    import pyspark.sql.functions as F

    from overpaint_spark.queries import _char_trigrams

    def substr_form(text_col):
        n = F.length(text_col) - 2
        return F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: text_col.substr(i, F.lit(3)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    edge = spark.createDataFrame(
        [("",), ("a",), ("ab",), ("abc",), ("héllo wörld",), ("日本語テキスト",)],
        "text string",
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (edge, docs.select("text")):
        got = df.select(_char_trigrams(F.col("text")).alias("g")).collect()
        want = df.select(substr_form(F.col("text")).alias("g")).collect()
        assert [r.g for r in got] == [r.g for r in want]


def test_bind_once_rewrites_match_python_reference(spark):
    """The r12 bind-once HOF rewrites (TX.shingles, _span_hashes,
    _char_trigrams) changed how often split() evaluates, never a byte
    of output — pin each against a plain python reference on edge-case
    texts (empty, short, exact-boundary, repeated tokens)."""
    import hashlib

    from pyspark.sql import Row

    from overpaint_spark import queries as Q

    texts = [
        "",
        "a",
        "ab",
        "abc",
        "one",
        "one two",
        "one two three",
        " ".join(f"t{i % 7}" for i in range(25)),
        " ".join("x" for _ in range(10)),      # exactly _SPAN_L tokens
        " ".join("y" for _ in range(9)),       # one short of _SPAN_L
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )

    def py_shingles(t, k):
        w = t.split(" ")
        return (
            [" ".join(w[i : i + k]) for i in range(len(w) - k + 1)]
            if len(w) >= k
            else []
        )

    def py_spans(t):
        L = Q._SPAN_L
        w = t.split(" ")
        return [
            hashlib.md5(" ".join(w[i : i + L]).encode()).hexdigest()
            for i in range(len(w) - L + 1)
        ] if len(w) >= L else []

    def py_trigrams(t):
        return [t[i : i + 3] for i in range(len(t) - 2)] if len(t) >= 3 else []

    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            TX.shingles(F.col("text"), 3).alias("sh3"),
            TX.shingles(F.col("text"), 5).alias("sh5"),
            Q._span_hashes().alias("sp"),
            Q._char_trigrams(F.col("text")).alias("tg"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i].sh3 == py_shingles(t, 3), (i, t)
        assert got[i].sh5 == py_shingles(t, 5), (i, t)
        assert got[i].sp == py_spans(t), (i, t)
        assert got[i].tg == py_trigrams(t), (i, t)
