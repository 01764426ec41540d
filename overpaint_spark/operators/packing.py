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
