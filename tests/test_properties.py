"""Property-based tests (SURVEY §5.4): formatter math against an
independent Decimal model, and profiler stats against naive recomputation
on hypothesis-generated tables."""

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from overpaint_spark.functions.formatting import format_percent_one_decimal


@given(n=st.integers(min_value=0, max_value=10**15), d=st.integers(min_value=0, max_value=10**15))
def test_percent_matches_decimal_half_up(n, d):
    got = format_percent_one_decimal(n, d)
    if d == 0:
        assert got == "0.0%"
        return
    want = (Decimal(n) * 100 / Decimal(d)).quantize(Decimal("0.1"), rounding=ROUND_HALF_UP)
    assert got == f"{want}%"
    # integer math never goes through floats: exactness at bigint scale
    assert got.endswith("%")


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31 - 1)),
            st.one_of(st.none(), st.booleans()),
        ),
        min_size=0,
        max_size=30,
    )
)
@settings(max_examples=8, deadline=None)
def test_profile_stats_match_naive(spark, rows):
    from overpaint_spark.profiler.profile import stat_exprs

    df = spark.createDataFrame(rows, "x int, b boolean")
    got = df.agg(*stat_exprs(df.schema, exact=True)).collect()[0].asDict()

    xs = [x for x, _ in rows if x is not None]
    bs = [b for _, b in rows if b is not None]
    assert got["mn_0"] == (min(xs) if xs else None)
    assert got["mx_0"] == (max(xs) if xs else None)
    assert got["tc_1"] == sum(1 for b in bs if b)
    assert got["fc_1"] == sum(1 for b in bs if not b)
    assert got["n_rows"] == len(rows)
    # three-valued logic invariant: buckets + nulls == rowcount
    n_null_b = sum(1 for _, b in rows if b is None)
    assert got["tc_1"] + got["fc_1"] + n_null_b == len(rows)


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=6, deadline=None)
def test_connected_components_paths_agree(spark, edges):
    """The distributed min-label loop and the driver union-find fast path
    are independent implementations — random graphs (self-loops,
    duplicates, both directions) must give identical components."""
    from overpaint_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, "a_id long, b_id long")
    dist = {
        (r.id, r.component)
        for r in connected_components(df, driver_threshold=0).collect()
    }
    fast = {
        (r.id, r.component)
        for r in connected_components(df, driver_threshold=10**6).collect()
    }
    assert dist == fast


def test_chunking_reconstructs_documents(spark):
    """Dropping each chunk's overlap prefix (all but the first) and
    concatenating must reproduce the original token stream exactly —
    the no-token-lost/no-token-duplicated invariant of the chunker."""
    from overpaint_spark import queries as Q
    from overpaint_spark.queries import _CHUNK_SIZE, _CHUNK_STRIDE

    sf = "/root/testdata/sf0.001"
    chunks = Q.QUERIES["documents_chunked"](spark, sf).collect()
    originals = {
        r.doc_id: r.text
        for r in Q._t(spark, sf, "documents").select("doc_id", "text").collect()
    }
    overlap = _CHUNK_SIZE - _CHUNK_STRIDE
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(originals)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        words: list[str] = []
        for i, r in enumerate(rows):
            toks = r.chunk_text.split(" ")
            assert len(toks) == r.chunk_words
            words.extend(toks if i == 0 else toks[overlap:])
        assert " ".join(words) == originals[doc_id]


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=30).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=8, deadline=None)
def test_substring_spans_match_naive(spark, docs):
    """substring_span_stats (the pipeline q_dedup_substring_spans
    declares) against a brute-force python model on hypothesis corpora:
    same span counts, same duplicated-span counts (a span is duplicated
    iff its 10-token window text occurs in more than one document)."""
    from overpaint_spark.queries import _SPAN_L, substring_span_stats

    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    spans = {}
    for i, t in enumerate(docs):
        toks = t.split(" ")
        spans[i] = [
            " ".join(toks[j : j + _SPAN_L])
            for j in range(len(toks) - _SPAN_L + 1)
        ]
    owners = {}
    for i, ss in spans.items():
        for s in ss:
            owners.setdefault(s, set()).add(i)
    dup = {s for s, o in owners.items() if len(o) > 1}

    got = {r.doc_id: r for r in substring_span_stats(df).collect()}
    for i in range(len(docs)):
        want_spans = len(spans[i])
        want_dup = sum(1 for s in spans[i] if s in dup)
        if want_spans == 0:
            assert i not in got  # no spans -> absent from the relation
            continue
        assert got[i].n_spans == want_spans
        assert got[i].n_dup_spans == want_dup
        assert got[i].dup_frac_ppm == want_dup * 1_000_000 // want_spans


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.lists(st.sampled_from("xyzw"), min_size=1, max_size=8).map(
                lambda ws: " ".join(ws)
            ),
        ),
        min_size=1,
        max_size=10,
    ).filter(lambda d: any(lang == "en" for lang, _ in d))
)
@settings(max_examples=8, deadline=None)
def test_dsir_weights_match_naive(spark, docs):
    """dsir_weights (the pipeline q_dataset_dsir_weights declares)
    against an integer-exact python model: identical per-doc ppm
    weights."""
    import hashlib

    from overpaint_spark.queries import _DSIR_BUCKETS, dsir_weights

    rows = [(i, t, lang, "s", len(t)) for i, (lang, t) in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    def bucket(tok: str) -> int:
        h = hashlib.md5(tok.encode()).hexdigest()
        return (ord(h[0]) * 13 + ord(h[1])) % _DSIR_BUCKETS

    cr, ct = {}, {}
    tr = tt = 0
    for _, (lang, t) in enumerate(docs):
        for tok in t.split(" "):
            b = bucket(tok)
            cr[b] = cr.get(b, 0) + 1
            tr += 1
            if lang == "en":
                ct[b] = ct.get(b, 0) + 1
                tt += 1
    B = _DSIR_BUCKETS
    r_ppm = {
        b: ((ct.get(b, 0) + 1) * (tr + B) * 1_000_000)
        // ((cr[b] + 1) * (tt + B))
        for b in cr
    }
    want = {}
    for i, (lang, t) in enumerate(docs):
        toks = t.split(" ")
        s = sum(r_ppm[bucket(tok)] for tok in toks)
        want[i] = s // len(toks)

    got = {r.doc_id: r.dsir_ppm for r in dsir_weights(df).collect()}
    assert got == want


def test_dsir_bucket_feature_space_is_full():
    """All 64 hashed-feature buckets are reachable from two md5 hex
    chars (the r4 advisor caught a *256 multiplier that vanished mod 64
    and silently collapsed DSIR resolution to 16 buckets)."""
    from overpaint_spark.queries import _DSIR_BUCKETS

    hexv = [ord(c) for c in "0123456789abcdef"]
    reached = {(13 * a + b) % _DSIR_BUCKETS for a in hexv for b in hexv}
    assert len(reached) == _DSIR_BUCKETS


@given(
    counts=st.dictionaries(
        st.sampled_from(["web", "books", "code", "wiki", "news"]),
        st.integers(min_value=1, max_value=10**6),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=8, deadline=None)
def test_mixture_temperature_matches_python_model(spark, counts):
    """dataset_mixture_temperature's floor(sqrt(n)/sqrt(max)*1e6) must
    equal the python-math model exactly for any source counts — both
    go through the same IEEE-correctly-rounded double ops, which is
    the query's whole cross-engine-determinism argument."""
    import math

    from overpaint_spark.queries import q_dataset_mixture_temperature

    rows = []
    doc_id = 0
    for src, n in counts.items():
        # cap fixture size: weight depends only on counts, so scale
        # counts down while keeping exact integers
        for _ in range(min(n, 40)):
            rows.append((doc_id, "t", "en", src, 1))
            doc_id += 1
    eff = {s: min(n, 40) for s, n in counts.items()}
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import unittest.mock as mock

    from overpaint_spark import queries as Q

    with mock.patch.object(Q, "_t", lambda spark_, sf, name: df):
        got = {
            r.source: (r.n_docs, r.weight_ppm)
            for r in q_dataset_mixture_temperature(spark, "unused").collect()
        }
    mx = max(eff.values())
    want = {
        s: (n, int(math.floor(math.sqrt(float(n)) / math.sqrt(float(mx)) * 1e6)))
        for s, n in eff.items()
    }
    assert got == want
