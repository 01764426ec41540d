"""Iterative BPE merge-rule training (Sennrich et al. 2016,
arXiv:1508.07909) — the real multi-round tokenizer-training loop, the
sequel to the single-step ``bpe_merge_pairs`` statistic in queries.py.

Scale shape — the decisive observation is that after ONE data-sized
pass the whole loop runs on the BOUNDED vocabulary relation, never the
corpus again:

1. ``word_vocab``: (word, count) — one map-side-combined aggregate over
   the corpus's exploded words. O(corpus tokens) once; the result is
   zipf-bounded (≈10⁵–10⁶ distinct words at web scale), NOT
   corpus-sized.
2. The merge recurrence then runs entirely in DRIVER MEMORY on the
   collected vocab (the shape of every production tokenizer trainer —
   HF-tokenizers, sentencepiece, Sennrich's learn_bpe): pair counts
   maintained INCREMENTALLY (only words containing the merged pair are
   rewritten, only their touched pairs re-counted) with a lazy-deletion
   max-heap for the per-round argmax, so a 32k-merge production run is
   ONE Spark job + a driver loop — not 32k sequential Spark jobs of
   per-round agg + collect + mapInPandas (the r5 design, kept below as
   ``_train_loop_distributed`` strictly as a fallback for vocabularies
   that genuinely exceed driver memory, dispatched by
   ``max_driver_vocab``).

Both paths share ``_merge_once`` (the left-to-right non-overlapping
merge semantics) and produce byte-identical merge tables: the argmax
is max pair count ≥ min_count with ties to the lexicographically
smallest (left, right) — Python's str ordering (code points) and
Spark's default UTF8_BINARY string ordering agree because UTF-8 byte
order preserves code-point order. Equivalence of the two paths is
pinned in tests/test_bpe.py alongside the independent pure-python
reference BPE (fixture + hypothesis corpora). The declared queries
(``bpe_learned_merges``, ``bpe_vocab``) are rows-only BY DESIGN: the
merge recurrence has no non-recursive SQL form (same class as
dataset_pack_ffd's first-fit).

Reference parity: overpaint (the profiling CLI) has no tokenizer; this
belongs to the north-star LLM-pipeline extension set (SURVEY §7.4).
"""

from __future__ import annotations

import heapq
from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from overpaint_spark.localrel import local_df

# Vocabularies up to this many distinct words run the merge loop in
# driver memory (a (word, n) row is tens of bytes; 4M rows ≈ a few
# hundred MB — comfortable in any driver sized for this engine).
# Above it, the distributed per-round fallback keeps correctness at
# the cost of one Spark job per merge.
DEFAULT_MAX_DRIVER_VOCAB = 4_000_000

# End-of-word sentinel (classic BPE: lets merges distinguish suffixes
# from mid-word sequences). Kept out of the corpus charset.
EOW = "</w>"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) distinct-word counts — THE one corpus-sized pass."""
    from overpaint_spark.functions import text as TX

    return (
        docs.select(F.explode(TX.words(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def _initial_symbols(vocab: DataFrame) -> DataFrame:
    """(word, n, syms array<string>): characters + the EOW sentinel."""
    syms = F.concat(
        F.split(F.col("word"), ""),  # per-character array
        F.array(F.lit(EOW)),
    )
    return vocab.select("word", "n", syms.alias("syms"))


def _pair_counts(state: DataFrame) -> DataFrame:
    """(left, right, pair_n): adjacent-symbol pair counts weighted by
    word frequency — one explode + one map-side-combined aggregate over
    the vocab-sized state."""
    k = F.size(F.col("syms"))
    pairs = F.when(
        k >= 2,
        F.transform(
            F.sequence(F.lit(1), k - 1),
            lambda i: F.struct(
                F.element_at(F.col("syms"), i).alias("left"),
                F.element_at(F.col("syms"), i + 1).alias("right"),
            ),
        ),
    ).otherwise(F.array())
    return (
        state.select(F.explode(pairs).alias("p"), "n")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("n").alias("pair_n"))
    )


def _merge_once(syms: list, left: str, right: str) -> list:
    """Left-to-right non-overlapping single-rule merge — THE merge
    semantics, shared by the trainer's per-round rewrite and the
    encode-side segmenter so the two can never diverge (r5 review
    finding: they were duplicated loops)."""
    merged = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            merged.append(left + right)
            i += 2
        else:
            merged.append(syms[i])
            i += 1
    return merged


def _merge_pair(state: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every word's symbol sequence with (left, right) merged
    left-to-right non-overlapping — the per-round recurrence, run as an
    Arrow-batched pandas pass over the BOUNDED vocab relation."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            out = [_merge_once(list(syms), left, right) for syms in pdf["syms"]]
            yield pd.DataFrame(
                {"word": pdf["word"], "n": pdf["n"], "syms": out}
            )

    return state.mapInPandas(fn, "word string, n long, syms array<string>")


def _train_loop_distributed(
    state: DataFrame,
    n_merges: int,
    min_count: int,
):
    """(merges list, final_state DataFrame) — the per-round Spark-job
    fallback for vocabularies too large to collect. Each round: one
    pair-count aggregate + a 1-row argmax collect + an Arrow-batched
    rewrite of the vocab-sized state. The returned state is CACHED;
    callers that materialize from it should unpersist when done."""
    # each round re-reads the evolving vocab-sized state several times;
    # caching it bounds the loop's lineage (and recomputation) growth
    state = state.cache()
    merges = []
    for rank in range(n_merges):
        counts = _pair_counts(state).filter(F.col("pair_n") >= min_count)
        best = (
            counts.orderBy(
                F.col("pair_n").desc(), F.col("left"), F.col("right")
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        merges.append((rank, b.left, b.right, int(b.pair_n)))
        new_state = _merge_pair(state, b.left, b.right).cache()
        new_state.count()  # materialize before unpersisting the parent
        state.unpersist()
        state = new_state
    return merges, state


def _train_driver(
    vocab_rows: list,
    n_merges: int,
    min_count: int,
):
    """(merges, words, counts) — the in-memory merge recurrence over
    the collected (word, n) vocab. Incremental pair maintenance: a
    pair→word-index postings map limits each round's rewrite to the
    words that actually contain the merged pair, and only THEIR
    adjacency counts change; the per-round argmax is a lazy-deletion
    max-heap (every count change pushes the pair's current value; pops
    discard entries whose recorded count no longer matches), ordered
    (-count, left, right) so heapq's min-pop yields exactly the
    distributed path's ORDER BY pair_n DESC, left, right LIMIT 1.

    A pop'd valid entry IS the global argmax because every pair always
    has an entry at its current count (pushed at init and after every
    change). The merged pair's postings set can be popped outright: a
    left-to-right non-overlapping pass leaves no adjacent (left,
    right) in its output (any surviving left would have been followed
    by a non-right symbol at scan time, and merged symbols left+right
    can equal neither left nor right since both halves are non-empty).
    """
    words = [list(w) + [EOW] for w, _ in vocab_rows]
    counts = [int(n) for _, n in vocab_rows]

    pair_n: dict = defaultdict(int)
    where: dict = defaultdict(set)  # pair -> word indices (may go stale)
    for idx, syms in enumerate(words):
        n = counts[idx]
        for p in zip(syms, syms[1:]):
            pair_n[p] += n
            where[p].add(idx)
    heap = [(-c, p[0], p[1]) for p, c in pair_n.items()]
    heapq.heapify(heap)

    merges = []
    for rank in range(n_merges):
        best = None
        while heap:
            negc, left, right = heapq.heappop(heap)
            if pair_n.get((left, right), 0) == -negc:
                best = (left, right, -negc)
                break
        if best is None or best[2] < min_count:
            break
        left, right, c = best
        merges.append((rank, left, right, c))
        touched = set()
        for idx in where.pop((left, right), ()):
            syms = words[idx]
            new = _merge_once(syms, left, right)
            if len(new) == len(syms):
                continue  # stale postings entry — pair no longer present
            n = counts[idx]
            for p in zip(syms, syms[1:]):
                pair_n[p] -= n
                touched.add(p)
            for p in zip(new, new[1:]):
                pair_n[p] += n
                touched.add(p)
                where[p].add(idx)
            words[idx] = new
        touched.discard((left, right))
        pair_n.pop((left, right), None)
        for p in touched:
            cur = pair_n.get(p, 0)
            if cur > 0:
                heapq.heappush(heap, (-cur, p[0], p[1]))
            else:
                pair_n.pop(p, None)
                where.pop(p, None)
    return merges, words, counts


def _collect_vocab(vocab: DataFrame, max_rows: int):
    """The collected [(word, n)] vocab, or None if it exceeds
    ``max_rows`` (LIMIT max_rows+1 returns every row iff the relation
    fits — one job, no separate count)."""
    rows = vocab.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        return None
    return [(r.word, r.n) for r in rows]


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    max_driver_vocab: int = DEFAULT_MAX_DRIVER_VOCAB,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules; returns the merge table
    (merge_rank, left, right, pair_n) — the artifact a tokenizer ships.
    Stops early (fewer rows) when no pair reaches ``min_count``.

    One corpus-sized Spark job (the word-count aggregate) + the driver
    merge loop when the vocab fits ``max_driver_vocab``; otherwise the
    per-round distributed fallback. Determinism on both paths: the
    argmax pair breaks ties by (left, right) lexicographic order — a
    fixed total order, so re-runs and engine ports produce the
    identical merge table (the distributed argmax plans as
    TakeOrderedAndProject — a per-partition top-1 heap, not a
    materialized global sort)."""
    spark = docs.sparkSession
    vocab = word_vocab(docs, text_col)
    rows = _collect_vocab(vocab, max_driver_vocab)
    if rows is not None:
        merges, _, _ = _train_driver(rows, n_merges, min_count)
    else:
        merges, state = _train_loop_distributed(
            _initial_symbols(vocab), n_merges, min_count
        )
        state.unpersist()
    return local_df(
        spark, merges, "merge_rank int, left string, right string, pair_n long"
    )


def bpe_vocabulary(
    docs: DataFrame,
    n_merges: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    max_driver_vocab: int = DEFAULT_MAX_DRIVER_VOCAB,
) -> DataFrame:
    """(symbol, n_words, freq): the corpus symbol inventory AFTER the
    learned merges — the tokenizer's actual vocabulary, with how many
    distinct words each symbol appears in and its corpus-weighted
    frequency. The result is BOUNDED by construction: distinct symbols
    ≤ |charset| + n_merges + 1 (every merge adds at most one new
    symbol), so it is an O(100)-row relation either way. Driver path:
    the inventory falls directly out of the final in-memory state.
    Distributed fallback: one vocab-sized explode + aggregate over the
    final training state, materialized before dropping the cached
    lineage (so first use doesn't re-run the merge loop)."""
    spark = docs.sparkSession
    vocab = word_vocab(docs, text_col)
    vrows = _collect_vocab(vocab, max_driver_vocab)
    if vrows is not None:
        _, words, counts = _train_driver(vrows, n_merges, min_count)
        n_words_of: dict = defaultdict(int)
        freq: dict = defaultdict(int)
        for syms, n in zip(words, counts):
            for s in set(syms):
                n_words_of[s] += 1
            for s in syms:
                freq[s] += n
        rows = [(s, n_words_of[s], freq[s]) for s in freq]
    else:
        _, state = _train_loop_distributed(
            _initial_symbols(vocab), n_merges, min_count
        )
        out = (
            state.select("word", "n", F.explode("syms").alias("symbol"))
            .groupBy("symbol")
            .agg(
                F.countDistinct("word").cast("bigint").alias("n_words"),
                F.sum("n").cast("bigint").alias("freq"),
            )
        )
        rows = [(r.symbol, r.n_words, r.freq) for r in out.collect()]
        state.unpersist()
    return local_df(spark, rows, "symbol string, n_words long, freq long")


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_tokens): apply a learned merge table to the
    corpus and count the resulting BPE tokens per document — the
    encode-side consumer of :func:`bpe_train`'s artifact. One
    Arrow-batched pass; the merge list rides in the task closure
    (tokenizer tables are KB-sized by construction)."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            n_words_out, n_tokens_out = [], []
            for text in pdf[text_col]:
                words = [w for w in (text or "").split(" ") if w]
                total = 0
                for w in words:
                    syms = list(w) + [EOW]
                    for left, right in merges:
                        syms = _merge_once(syms, left, right)
                    total += len(syms)
                n_words_out.append(len(words))
                n_tokens_out.append(total)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": pd.Series(n_words_out, dtype="int64"),
                    "n_tokens": pd.Series(n_tokens_out, dtype="int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        fn, f"{id_col} long, n_words long, n_tokens long"
    )
