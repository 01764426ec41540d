"""Iterative BPE trainer (operators/bpe.py) vs an independent
pure-python reference implementation of Sennrich et al. 2016 — the
value-level evidence for the rows-only declared query
``bpe_learned_merges`` (the merge recurrence has no SQL oracle)."""

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from overpaint_spark.operators.bpe import EOW, bpe_segment, bpe_train


def _ref_bpe(word_counts: dict[str, int], n_merges: int, min_count: int):
    """Reference BPE: argmax weighted adjacent-pair count, ties to the
    lexicographically smallest (left, right), merge left-to-right
    non-overlapping, stop below min_count."""
    vocab = {w: (list(w) + [EOW], n) for w, n in word_counts.items()}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        eligible = {p: c for p, c in pairs.items() if c >= min_count}
        if not eligible:
            break
        best_n = max(eligible.values())
        left, right = min(p for p, c in eligible.items() if c == best_n)
        merges.append((rank, left, right, best_n))
        for w, (syms, n) in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            vocab[w] = (merged, n)
    return merges, vocab


def _word_counts(texts):
    c = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                c[w] += 1
    return dict(c)


def test_bpe_train_matches_reference_on_fixture(spark):
    from overpaint_spark.sources.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001/documents.parquet")
    texts = [r.text for r in d.select("text").collect()]
    want, _ = _ref_bpe(_word_counts(texts), n_merges=6, min_count=2)
    got = [
        (r.merge_rank, r.left, r.right, r.pair_n)
        for r in bpe_train(d, n_merges=6, min_count=2)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want
    assert len(got) == 6  # the fixture corpus sustains 6 merges


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=5),
            min_size=0,
            max_size=6,
        ).map(lambda ws: " ".join(ws)),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=6, deadline=None)
def test_bpe_train_matches_reference_random(spark, docs):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    want, _ = _ref_bpe(_word_counts(docs), n_merges=4, min_count=2)
    got = [
        (r.merge_rank, r.left, r.right, r.pair_n)
        for r in bpe_train(df, n_merges=4, min_count=2)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want


def test_bpe_driver_and_distributed_paths_agree(spark):
    """The in-memory merge loop (default) and the per-round Spark-job
    fallback (forced via max_driver_vocab=0) must produce byte-identical
    merge tables and vocabularies — the dispatch threshold is a
    performance knob, never a semantics knob."""
    from overpaint_spark.operators.bpe import bpe_vocabulary
    from overpaint_spark.sources.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001/documents.parquet").limit(80)
    key = lambda r: tuple(r)  # noqa: E731
    drv = sorted(map(key, bpe_train(d, n_merges=5, min_count=2).collect()))
    dist = sorted(
        map(
            key,
            bpe_train(d, n_merges=5, min_count=2, max_driver_vocab=0).collect(),
        )
    )
    assert drv == dist and len(drv) == 5
    v_drv = sorted(map(key, bpe_vocabulary(d, 5, 2).collect()))
    v_dist = sorted(
        map(key, bpe_vocabulary(d, 5, 2, max_driver_vocab=0).collect())
    )
    assert v_drv == v_dist


def test_bpe_segment_counts_match_reference(spark):
    """Applying the learned merge table via bpe_segment must produce
    exactly the reference vocabulary's post-merge symbol counts."""
    from overpaint_spark.sources.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001/documents.parquet").limit(50)
    texts = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}
    merges, vocab = _ref_bpe(_word_counts(texts.values()), 6, 2)
    seg = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe_segment(d, [(m[1], m[2]) for m in merges]).collect()
    }
    assert set(seg) == set(texts)
    for doc_id, text in texts.items():
        words = [w for w in text.split(" ") if w]
        want_tokens = sum(len(vocab[w][0]) for w in words)
        assert seg[doc_id] == (len(words), want_tokens)


def test_bpe_segment_counts_shrink_with_merges(spark):
    """More merge rules can only shrink (never grow) the token count —
    the compression monotonicity a tokenizer consumer relies on."""
    from overpaint_spark.sources.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001/documents.parquet").limit(30)
    table = bpe_train(d, n_merges=6, min_count=2).orderBy("merge_rank").collect()
    rules = [(r.left, r.right) for r in table]
    none = {r.doc_id: r.n_tokens for r in bpe_segment(d, []).collect()}
    all_ = {r.doc_id: r.n_tokens for r in bpe_segment(d, rules).collect()}
    assert all(all_[k] <= none[k] for k in none)
    assert sum(all_.values()) < sum(none.values())


def test_bpe_vocabulary_matches_reference(spark):
    """The post-merge symbol inventory must equal the reference BPE's
    final vocabulary state: per symbol, distinct-word membership and
    corpus-weighted frequency."""
    from collections import defaultdict

    from overpaint_spark.operators.bpe import bpe_vocabulary
    from overpaint_spark.sources.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001/documents.parquet")
    texts = [r.text for r in d.select("text").collect()]
    wc = _word_counts(texts)
    _, vocab = _ref_bpe(wc, n_merges=8, min_count=2)
    words_of = defaultdict(set)
    freq = defaultdict(int)
    for w, (syms, n) in vocab.items():
        for s in syms:
            words_of[s].add(w)
            freq[s] += n
    got = {
        r.symbol: (r.n_words, r.freq)
        for r in bpe_vocabulary(d, n_merges=8, min_count=2).collect()
    }
    want = {s: (len(words_of[s]), freq[s]) for s in freq}
    assert got == want
