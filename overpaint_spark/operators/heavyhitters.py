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


# --- Count-Min sketch: mergeable point-frequency summary ----------------------
#
# Misra-Gries above answers "what are the top-k?"; Count-Min (Cormode &
# Muthukrishnan 2005) answers "how often did THIS token occur?" for any
# token, from a fixed d×w integer matrix. cell[r][c] = Σ count of every
# token hashing to c under row r's salt; estimate(t) = min over rows of
# its d cells — always ≥ the true count (every occurrence of t lands in
# all d of its cells; collisions only ADD), within ε·N with probability
# 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. The matrix is the 100 TB shape:
# map-side partial counts collapse the shuffle to ≤ d·w rows per
# partition regardless of vocabulary, the relation is mergeable by
# cell-wise SUM (partitions, days, streams — the same merge), and the
# salted-md5 cell function is engine-reproducible, so the whole sketch
# is SQL-derivable cross-engine (unlike HLL/DDSketch, whose internal
# registers are implementation-defined).

CMS_DEPTH = 4
CMS_WIDTH = 1024
_CMS_HEX = 16**6


def cms_cell(token, row_idx: int, width: int = CMS_WIDTH):
    """Row ``row_idx``'s cell for a token: first 6 hex digits of the
    salted md5 (the dataset_split / dsir-resample idiom — deterministic
    across runs, partitionings, and engines) mod the row width."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(token, F.lit(f":cms{row_idx}")).cast("binary")), 1, 6
        ),
        16,
        10,
    ).cast("bigint")
    return (h % width).cast("int")


def cms_cells(
    docs: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    text_col: str = "text",
) -> DataFrame:
    """The sketch matrix as a relation: (row_idx, cell_idx, cnt).

    One pass: each token emits its d (row, cell) coordinates from a
    single explode (no d-fold rescan), then ONE groupBy whose key space
    is d·w — map-side combine bounds the shuffle at d·w rows per
    partition, independent of both corpus size and vocabulary."""
    from overpaint_spark.functions import text as TX

    toks = docs.select(F.explode(TX.words(F.col(text_col))).alias("token"))
    coords = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_idx"),
                        cms_cell(F.col("token"), r, width).alias("cell_idx"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc")
    ).select("rc.row_idx", "rc.cell_idx")
    return coords.groupBy("row_idx", "cell_idx").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimates(
    cells: DataFrame,
    probes: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for a probe relation with a ``token`` column:
    adds ``cms_est`` = MIN over the token's d cells. ``cells`` is at
    most d·w rows — broadcast it; the probe side never shuffles.

    Cells the sketch never touched hold an implicit 0, so the join is
    LEFT with a COALESCE: a probe token whose cell has no entry gets
    that 0 into its MIN (a token the sketch never saw estimates 0, and
    a partially-empty row set cannot inflate the estimate by dropping
    its empty cells from the MIN)."""
    carry = [c for c in probes.columns if c != "token"]
    coords = probes.select(
        "token",
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_idx"),
                        cms_cell(F.col("token"), r, width).alias("cell_idx"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("token", *carry, "rc.row_idx", "rc.cell_idx")
    return (
        coords.join(F.broadcast(cells), ["row_idx", "cell_idx"], "left")
        .groupBy("token", *carry)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
