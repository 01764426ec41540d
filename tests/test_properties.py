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
