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
2. Per merge round, on the vocab relation only: explode each word's
   current symbol sequence into adjacent pairs weighted by word count,
   ONE count aggregate (shuffle O(distinct pairs)), take the argmax
   pair (ties broken lexicographically — deterministic without a
   global sort: a 1-row min-over-maxcount broadcast), and rewrite each
   word's symbols left-to-right non-overlapping (Arrow-batched pandas
   over the vocab relation — vocab-sized, vectorizable, and the
   recurrence that makes this op non-SQL-expressible).

``n_merges`` rounds cost n_merges small-relation shuffles — a driver
LOOP, not driver DATA: nothing corpus-sized is ever collected. The
declared query (``bpe_learned_merges``) is rows-only BY DESIGN: the
left-to-right merge recurrence inside each round has no non-recursive
SQL form (same class as dataset_pack_ffd's first-fit); correctness is
pinned against an independent pure-python reference BPE in
tests/test_bpe.py (fixture + hypothesis corpora).

Reference parity: overpaint (the profiling CLI) has no tokenizer; this
belongs to the north-star LLM-pipeline extension set (SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def _train_loop(
    docs: DataFrame,
    n_merges: int,
    min_count: int,
    text_col: str,
):
    """(merges list, final_state DataFrame) — shared by bpe_train (the
    merge table) and bpe_vocabulary (the post-merge symbol inventory).
    The returned state is CACHED; callers that materialize from it
    should unpersist when done."""
    state = _initial_symbols(word_vocab(docs, text_col))
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


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules; returns the merge table
    (merge_rank, left, right, pair_n) — the artifact a tokenizer ships.
    Stops early (fewer rows) when no pair reaches ``min_count``.

    Determinism: the argmax pair breaks ties by (left, right)
    lexicographic order — a fixed total order, so re-runs and engine
    ports produce the identical merge table. The argmax is
    orderBy().limit(1), which Spark plans as TakeOrderedAndProject —
    a per-partition top-1 heap merged on the driver, NOT a
    materialized global sort of the pair relation."""
    merges, state = _train_loop(docs, n_merges, min_count, text_col)
    state.unpersist()
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_n long"
    )


def bpe_vocabulary(
    docs: DataFrame,
    n_merges: int = 8,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """(symbol, n_words, freq): the corpus symbol inventory AFTER the
    learned merges — the tokenizer's actual vocabulary, with how many
    distinct words each symbol appears in and its corpus-weighted
    frequency. One vocab-sized explode + aggregate over the final
    training state; rows-only like the trainer (same recurrence). The
    final collect is BOUNDED by construction: distinct symbols ≤
    |charset| + n_merges + 1 (every merge adds at most one new symbol),
    so driver materialization is O(100) rows — done so the cached
    training state can be dropped without the returned DataFrame's
    lineage re-running the whole merge loop on first use."""
    _, state = _train_loop(docs, n_merges, min_count, text_col)
    out = (
        state.select("word", "n", F.explode("syms").alias("symbol"))
        .groupBy("symbol")
        .agg(
            F.countDistinct("word").cast("bigint").alias("n_words"),
            F.sum("n").cast("bigint").alias("freq"),
        )
    )
    # materialize before dropping the cached lineage it reads from
    rows = out.collect()
    state.unpersist()
    spark = docs.sparkSession
    return spark.createDataFrame(rows, "symbol string, n_words long, freq long")


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
