"""Approximate heavy hitters: corpus-frequency top-k with bounded shuffle.

The exact formulation (queries.q_text_top_tokens: explode → groupBy →
top-k) shuffles one row per DISTINCT TOKEN — at web scale the vocabulary
is billions of n-grams and the shuffle is the job. The classic fix is
per-partition candidate truncation (the parallel form of Space-Saving /
Misra-Gries): each partition counts locally and forwards only its top
``per_partition`` candidates, so the shuffle carries

    #partitions × per_partition   rows   (independent of vocabulary size)

and the merge sums candidate counts and takes the global top-k.

Error model (Misra-Gries bound, applied per partition): a token globally
in the top-k is missed only if it fails to make the local top-M in every
partition holding it; with M ≫ k (default 40×) that requires extreme
skew-against-the-token in every partition at once. Reported counts are
exact for tokens that survive in all their partitions, otherwise an
undercount. The fixtures' top-25 matches the exact query bit-for-bit in
tests; the deliberately-tiny-M divergence case is also pinned.

Tokenization happens inside the Arrow batch (``str.split`` on spaces —
the same single-space semantics as functions/text.words), so raw
documents cross into Python once per batch and token rows never exist
JVM-side at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_top_tokens(
    docs: DataFrame,
    k: int = 25,
    per_partition: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Approximate (token, n) global top-k, count desc / token asc.

    ``per_partition`` is the accuracy knob: shuffle volume and miss
    probability trade off through it (see module docstring).
    """
    from collections import Counter

    import pandas as pd

    def local_counts(batches):
        counts: Counter = Counter()
        for pdf in batches:
            for text in pdf[text_col]:
                if text is None:  # NULL docs: the exact twin's
                    continue  # explode(split(..)) skips them too
                counts.update(text.split(" "))
        if not counts:
            return
        top = counts.most_common(per_partition)
        yield pd.DataFrame({"token": [t for t, _ in top],
                            "n": [c for _, c in top]})

    partials = docs.select(text_col).mapInPandas(local_counts, "token string, n long")
    return (
        partials.groupBy("token")
        .agg(F.sum("n").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
    )
