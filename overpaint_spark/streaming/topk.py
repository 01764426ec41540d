"""Streaming stateful top-k tokens: a running corpus-frequency leaderboard
over an unbounded document stream.

The batch form (operators/heavyhitters.py) bounds its shuffle with
per-partition candidate truncation; the streaming form must additionally
bound STATE — a naive ``groupBy(token).count()`` in update mode keeps one
state row per distinct token forever (billions of n-grams at web scale).
Design:

1. **Per-batch partial counts** (``mapInPandas``): tokenize inside the
   Arrow batch and forward (token, n) partials — token rows never exist
   JVM-side, and each micro-batch contributes at most
   #partitions × vocabulary_of_batch rows.
2. **Fixed bucket key** (``crc32(token) % n_buckets``): the stateful
   stage is keyed by a *bounded* keyspace, so Spark's state store holds
   exactly ``n_buckets`` entries regardless of vocabulary.
3. **Per-bucket Misra-Gries summary** (``applyInPandasWithState``): each
   bucket's state is a (token → count) candidate table truncated to
   ``capacity`` entries (Space-Saving-style: keep the most common, same
   degraded-mode semantics as the batch operator). Counts for tokens that
   never overflow are exact.
4. **Versioned emission**: every micro-batch each touched bucket emits
   its current top-``emit_k`` with a monotonically increasing version, so
   an append sink holds the full history and the *latest* snapshot is
   recoverable with one window query (:func:`top_k_snapshot`).

Total state = n_buckets × capacity (token, count) pairs — independent of
both stream length and vocabulary. A token in the global top-k is in the
top-k of its bucket, so emitting ``emit_k ≥ k`` per bucket preserves the
global leaderboard exactly (for non-overflowed buckets).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

OUTPUT_SCHEMA = "bucket int, version long, token string, n long"
STATE_SCHEMA = "version long, tokens array<string>, counts array<long>"


def _make_merge(capacity: int, emit_k: int):
    def merge(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        from collections import Counter

        (bucket,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            return
        if state.exists:
            version, tokens, counts = state.get
            counter = Counter(dict(zip(tokens, counts)))
        else:
            version, counter = 0, Counter()
        for pdf in pdfs:
            for tok, n in zip(pdf["token"], pdf["n"]):
                counter[tok] += int(n)
        if len(counter) > capacity:
            counter = Counter(dict(counter.most_common(capacity)))
        version += 1
        items = counter.most_common(capacity)
        state.update((version, [t for t, _ in items], [c for _, c in items]))
        top = items[:emit_k]
        yield pd.DataFrame(
            {
                "bucket": bucket,
                "version": version,
                "token": [t for t, _ in top],
                "n": [c for _, c in top],
            }
        )

    return merge


def streaming_top_tokens(
    docs: DataFrame,
    n_buckets: int = 8,
    capacity: int = 10_000,
    emit_k: int = 25,
    text_col: str = "text",
) -> DataFrame:
    """Running top tokens over a streaming DataFrame with a ``text_col``.

    Returns an append-mode stream of (bucket, version, token, n) — feed
    the accumulated sink to :func:`top_k_snapshot` for the current
    global leaderboard. ``capacity`` is the accuracy/state knob;
    ``emit_k`` must be ≥ the k you intend to read from snapshots.
    """

    def local_counts(batches):
        from collections import Counter

        counts: Counter = Counter()
        for pdf in batches:
            for text in pdf[text_col]:
                if text is None:  # a NULL row must not kill the
                    continue  # long-running streaming query
                counts.update(text.split(" "))
        if counts:
            yield pd.DataFrame(
                {"token": list(counts.keys()), "n": list(counts.values())}
            )

    partials = docs.select(text_col).mapInPandas(local_counts, "token string, n long")
    bucketed = partials.withColumn(
        "bucket", (F.crc32(F.col("token").cast("binary")) % n_buckets).cast("int")
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _make_merge(capacity, emit_k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def top_k_snapshot(sink: DataFrame, k: int = 25) -> DataFrame:
    """Latest global top-k from an accumulated append sink: keep each
    bucket's newest version, merge, rank. Ordering ties break token-asc —
    the same contract as the batch operators."""
    latest = sink.withColumn(
        "max_v", F.max("version").over(Window.partitionBy("bucket"))
    ).filter(F.col("version") == F.col("max_v"))
    return (
        latest.select("token", "n")
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
    )
