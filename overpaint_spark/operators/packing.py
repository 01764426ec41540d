"""Sequence packing: assign documents to fixed-token-budget training
sequences (the "concat-and-cut" packing used to build LLM pretraining
batches: concatenate docs into a token stream, cut every ``budget``
tokens; a doc straddling a cut belongs to the pack where it starts).

Scale shape: a single global stream would serialize the window into one
partition, so the stream is sharded into ``n_buckets`` independent
streams keyed by ``id % n_buckets`` — deterministic integer arithmetic
(NOT engine-specific hash functions), so membership is reproducible in
any engine and independent of physical partitioning. Each bucket's
running sum is a partition-local window: one shuffle on the bucket key,
state O(1) per bucket. At 1000 executors pick n_buckets ≳ cores so
every core packs its own stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def concat_pack_plan(
    docs: DataFrame,
    token_col: Column,
    id_col: str = "doc_id",
    budget: int = 256,
    n_buckets: int = 8,
) -> DataFrame:
    """Per doc: its bucket, token count, pack index within the bucket,
    and token offset within the pack.

    ``token_col`` is any integer token-count expression (whitespace or
    BPE-ish regex counts from functions/text.py). All arithmetic is
    int64 (window SUM of bigint, floor-div, mod) — no floats anywhere,
    so the plan is exactly reproducible cross-engine.
    """
    w = Window.partitionBy("bucket").orderBy(id_col)
    t = docs.select(
        F.col(id_col),
        (F.col(id_col) % F.lit(n_buckets)).cast("bigint").alias("bucket"),
        token_col.cast("bigint").alias("n_tokens"),
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off")
    return t.select(id_col, "bucket", "n_tokens", start).select(
        id_col,
        "bucket",
        "n_tokens",
        F.floor(F.col("start_off") / F.lit(budget)).cast("bigint").alias("pack_id"),
        (F.col("start_off") % F.lit(budget)).alias("tok_offset"),
    )


def pack_budget_check(plan: DataFrame, budget: int) -> DataFrame:
    """Invariant relation for tests/monitoring: per (bucket, pack),
    total tokens of docs *starting* in the pack, and how far the last
    straddling doc overflows the cut. Overflow is bounded by
    max(n_tokens) - 1 by construction."""
    return (
        plan.groupBy("bucket", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            (F.max(F.col("tok_offset") + F.col("n_tokens")) - F.lit(budget)).alias(
                "overflow"
            ),
        )
    )


def ffd_pack_plan(
    docs: DataFrame,
    token_col: Column,
    id_col: str = "doc_id",
    budget: int = 256,
    n_buckets: int = 8,
) -> DataFrame:
    """NO-SPLIT packing via first-fit-decreasing: each doc lands whole
    in exactly one bin of capacity ``budget`` — the packing used when
    sequences must not straddle an attention boundary (no cross-doc
    contamination, no truncation). Docs longer than the budget get
    ``bin_id = -1`` (oversize flag — chunk upstream via
    documents_chunked, don't silently truncate here).

    FFD is the classic 11/9·OPT + 6/9 bin-packing heuristic; its
    first-fit recurrence is inherently sequential, so the scalable
    shape shards the corpus into ``n_buckets`` independent streams by
    ``id % n_buckets`` (same deterministic integer keying as
    :func:`concat_pack_plan`) and runs FFD per bucket inside
    ``applyInPandas`` — one shuffle on the bucket key, per-task state is
    one open-bin remaining-capacity array. Deterministic: within a
    bucket docs sort by (n_tokens desc, id asc), so re-runs and
    repartitions produce identical bins. The recurrence is also why
    this operator declares NO SQL oracle (non-recursive SQL cannot
    express first-fit); its invariants — per-bin capacity, determinism,
    bin count ≤ concat-and-cut's doc-aligned upper bound — are pinned
    in tests/test_packing.py instead.

    Cost honesty: exact first-fit is O(docs × bins) comparisons per
    bucket — the scan is a single vectorized numpy argmax per doc, but
    the asymptotic is real, so size ``n_buckets`` to keep buckets at
    ~10⁵–10⁶ docs (the knob is free: buckets are independent streams).
    The O(n log n) tree variants change which bin "first" means and
    would break bit-reproducibility with this reference implementation.

    Output: (id, bucket, n_tokens, bin_id, bin_fill) where bin_fill is
    the bin's total AFTER placing the doc (≤ budget for every placed
    doc). Docs with a NULL token count (NULL text upstream) are flagged
    ``bin_id = -1`` like oversize docs — routed around the pandas stage
    entirely, since a NULL would reach ``pack()`` as NaN and crash the
    task (the same NULL-doc crash class r4 fixed in heavyhitters and
    streaming/topk)."""
    import pandas as pd

    t = docs.select(
        F.col(id_col),
        (F.col(id_col) % F.lit(n_buckets)).cast("bigint").alias("bucket"),
        token_col.cast("bigint").alias("n_tokens"),
    )
    bad = t.filter(F.col("n_tokens").isNull()).select(
        id_col,
        "bucket",
        "n_tokens",
        F.lit(-1).cast("bigint").alias("bin_id"),
        F.lit(0).cast("bigint").alias("bin_fill"),
    )
    t = t.filter(F.col("n_tokens").isNotNull())

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        # remaining capacity per open bin, index = bin_id; first-fit =
        # index of the FIRST bin with rem >= n (vectorized argmax over
        # a boolean array — C speed, exact first-fit semantics)
        rems = np.empty(max(len(pdf), 1), dtype=np.int64)
        n_bins = 0
        bin_ids, bin_fills = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > budget:
                bin_ids.append(-1)
                bin_fills.append(n)
                continue
            open_rems = rems[:n_bins]
            fit = open_rems >= n
            if fit.any():
                bi = int(np.argmax(fit))
                rems[bi] -= n
            else:
                bi = n_bins
                rems[bi] = budget - n
                n_bins += 1
            bin_ids.append(bi)
            bin_fills.append(budget - int(rems[bi]))
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
        pdf["bin_fill"] = pd.Series(bin_fills, dtype="int64")
        return pdf

    schema = f"{id_col} long, bucket long, n_tokens long, bin_id long, bin_fill long"
    return t.groupBy("bucket").applyInPandas(pack, schema).unionByName(bad)
