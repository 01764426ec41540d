"""Sequence packing: concat-and-cut invariants."""

import pytest
from pyspark.sql import functions as F

from overpaint_spark.functions import text as TX
from overpaint_spark.operators.packing import concat_pack_plan, pack_budget_check
from overpaint_spark.sources.catalog import load_table

BUDGET = 256


@pytest.fixture(scope="module")
def plan(spark, sf_dir):
    docs = load_table(spark, f"{sf_dir}/documents.parquet")
    return concat_pack_plan(
        docs, TX.n_words(F.col("text")), budget=BUDGET, n_buckets=8
    ).cache()


def test_every_doc_packed_once(spark, sf_dir, plan):
    docs = load_table(spark, f"{sf_dir}/documents.parquet")
    assert plan.count() == docs.count()
    assert plan.select("doc_id").distinct().count() == docs.count()


def test_offsets_within_budget(plan):
    assert plan.filter((F.col("tok_offset") < 0) | (F.col("tok_offset") >= BUDGET)).count() == 0
    assert plan.filter(F.col("pack_id") < 0).count() == 0


def test_offset_matches_bucket_running_sum(plan):
    """start offset = pack_id * budget + tok_offset must equal the
    running token sum of all earlier docs in the bucket."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("bucket").orderBy("doc_id")
    chk = plan.withColumn(
        "expect_start", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).filter(
        F.col("pack_id") * BUDGET + F.col("tok_offset") != F.col("expect_start")
    )
    assert chk.count() == 0


def test_overflow_bounded_by_longest_doc(plan):
    """A pack overflows only by the tail of one straddling doc —
    strictly less than the longest doc's token count."""
    max_tokens = plan.agg(F.max("n_tokens")).collect()[0][0]
    worst = (
        pack_budget_check(plan, BUDGET)
        .agg(F.max("overflow").alias("o"))
        .collect()[0]["o"]
    )
    assert worst < max_tokens


def test_deterministic(spark, sf_dir):
    docs = load_table(spark, f"{sf_dir}/documents.parquet")
    a = concat_pack_plan(docs, TX.n_words(F.col("text")), budget=BUDGET, n_buckets=8)
    b = concat_pack_plan(docs, TX.n_words(F.col("text")), budget=BUDGET, n_buckets=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.fixture(scope="module")
def ffd_plan(spark, sf_dir):
    from overpaint_spark.operators.packing import ffd_pack_plan

    docs = load_table(spark, f"{sf_dir}/documents.parquet")
    return ffd_pack_plan(
        docs, TX.n_words(F.col("text")), budget=BUDGET, n_buckets=8
    ).cache()


def test_ffd_every_doc_placed_once(spark, sf_dir, ffd_plan):
    docs = load_table(spark, f"{sf_dir}/documents.parquet")
    assert ffd_plan.count() == docs.count()
    assert ffd_plan.select("doc_id").distinct().count() == docs.count()


def test_ffd_no_bin_exceeds_budget(ffd_plan):
    """The no-split contract: every placed doc's bin total stays within
    the budget; only oversize docs (flagged bin_id = -1) may exceed."""
    placed = ffd_plan.filter("bin_id >= 0")
    over = (
        placed.groupBy("bucket", "bin_id")
        .agg(F.sum("n_tokens").alias("tot"))
        .filter(F.col("tot") > BUDGET)
    )
    assert over.count() == 0
    oversize = ffd_plan.filter("bin_id = -1")
    bad = oversize.filter(F.col("n_tokens") <= BUDGET)
    assert bad.count() == 0


def test_ffd_matches_reference_implementation(ffd_plan, spark, sf_dir):
    """Cross-check the distributed per-bucket FFD against a plain
    python FFD on the same (sorted) input for every bucket."""
    docs = load_table(spark, f"{sf_dir}/documents.parquet")
    rows = docs.select(
        "doc_id", TX.n_words(F.col("text")).alias("n")
    ).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.doc_id % 8, []).append((int(r.n), int(r.doc_id)))
    want = {}
    for bkt, items in by_bucket.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        fills = []
        for n, did in items:
            if n > BUDGET:
                want[did] = -1
                continue
            for bi, f in enumerate(fills):
                if f + n <= BUDGET:
                    fills[bi] = f + n
                    want[did] = bi
                    break
            else:
                fills.append(n)
                want[did] = len(fills) - 1
    got = {r.doc_id: r.bin_id for r in ffd_plan.collect()}
    assert got == want


def test_ffd_never_worse_than_concat_doc_aligned(ffd_plan, spark, sf_dir):
    """Utilization guarantee: FFD's bin count per bucket is <= the
    doc-aligned next-fit baseline (close each bin when the next doc in
    id order would overflow) — the bound that justifies paying for the
    sort."""
    docs = load_table(spark, f"{sf_dir}/documents.parquet")
    rows = sorted(
        (int(r.doc_id), int(r.n))
        for r in docs.select("doc_id", TX.n_words(F.col("text")).alias("n")).collect()
    )
    nf_bins = {}
    for did, n in rows:
        b = did % 8
        fill, count = nf_bins.get(b, (0, 0))
        if n > BUDGET:
            continue
        if fill + n > BUDGET:
            count, fill = count + 1, 0
        nf_bins[b] = (fill + n, count)
    ffd_counts = {
        r.bucket: r.n_bins
        for r in ffd_plan.filter("bin_id >= 0")
        .groupBy("bucket")
        .agg((F.max("bin_id") + 1).alias("n_bins"))
        .collect()
    }
    for b, (_, closed) in nf_bins.items():
        assert ffd_counts[b] <= closed + 1  # +1: next-fit's final open bin


def test_ffd_deterministic_under_repartition(spark, sf_dir):
    from overpaint_spark.operators.packing import ffd_pack_plan

    docs = load_table(spark, f"{sf_dir}/documents.parquet")
    a = ffd_pack_plan(docs, TX.n_words(F.col("text")), budget=BUDGET, n_buckets=8)
    b = ffd_pack_plan(
        docs.repartition(17), TX.n_words(F.col("text")), budget=BUDGET, n_buckets=8
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ffd_null_token_count_flags_not_crashes(spark):
    """A NULL text (NULL token count) must flag bin_id = -1, not crash
    the pandas task with int(NaN) — the r4 advisor's NULL-doc crash
    class (same family heavyhitters/streaming-topk fixed in r4)."""
    from pyspark.sql import functions as F

    from overpaint_spark.operators.packing import ffd_pack_plan

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, None), (2, "d e")], "doc_id long, text string"
    )
    tok = F.when(
        F.col("text").isNotNull(), F.size(F.split(F.col("text"), " "))
    )
    got = {r.doc_id: r for r in ffd_pack_plan(docs, tok, budget=4).collect()}
    assert set(got) == {0, 1, 2}
    assert got[1].bin_id == -1 and got[1].n_tokens is None
    assert got[0].bin_id >= 0 and got[2].bin_id >= 0
