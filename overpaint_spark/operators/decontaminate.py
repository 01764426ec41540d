"""Benchmark decontamination: cross-corpus n-gram containment.

A training corpus must not contain evaluation-benchmark text; the
standard check flags every training document sharing word k-grams with
any eval document. This is NOT dedup (operators/dedup.py): dedup finds
pairs *within* one corpus, decontamination is an asymmetric containment
probe of a huge corpus against a small reference set — which is exactly
the asymmetry the plan exploits.

Scale shape (100 TB training corpus, MB-scale benchmark suite):

- the eval gram set is tiny → **broadcast**; the probe is a map-side
  ``left_semi`` join — the training side is never shuffled to meet the
  eval side;
- the only data-sized exchange is the per-doc ``distinct`` of training
  postings (same materialized-postings pattern as
  operators/dedup.distinct_shingles, which this reuses);
- the per-doc count aggregation input is only the *matching* postings —
  post-semi-join, i.e. near-zero for a clean corpus.

The reference has no similarity surface at all; this extends the
north-star dedup family (BASELINE.json) to its cross-corpus twin.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from overpaint_spark.functions import text as TX
from overpaint_spark.functions import vectors as VX
from overpaint_spark.operators.dedup import distinct_shingles

#: Bloom geometry floor: 2^17 bits = 16 KiB — roomy for any eval suite
#: under ~13k distinct grams at the 10 bits/gram budget below.
BLOOM_BITS_DEFAULT = 1 << 17
BLOOM_HASHES_DEFAULT = 5
#: Derived-geometry budget: ~10 bits per eval gram at 5 probes keeps the
#: false-positive rate (= the candidate fraction paying the exact
#: confirm) under ~1% however large the eval suite grows.
BLOOM_BITS_PER_GRAM = 10
#: Geometry ceiling: 2^27 bits = 16 MiB — the bitset rides into the plan
#: as a literal, so it must stay broadcast-sized. Past ~13M eval grams
#: the screen degrades gracefully (more candidates pay the exact
#: confirm); correctness is unchanged at ANY geometry (no false
#: negatives).
BLOOM_BITS_MAX = 1 << 27


def bloom_geometry(n_grams: int) -> int:
    """Bitset size derived from the eval gram count: the next power of
    two ≥ ``BLOOM_BITS_PER_GRAM · n_grams``, clamped to
    ``[BLOOM_BITS_DEFAULT, BLOOM_BITS_MAX]`` — the ``_ivf_params``
    posture (geometry from a measured count, not a constant). A fixed
    2^17 default saturates past ~13k grams and every doc then pays the
    exact confirm join: correct, but the screen stops screening."""
    target = BLOOM_BITS_PER_GRAM * max(1, int(n_grams))
    bits = 1 << max(
        BLOOM_BITS_DEFAULT.bit_length() - 1, (target - 1).bit_length()
    )
    return min(bits, BLOOM_BITS_MAX)


def contamination_report(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_shared: int = 1,
) -> DataFrame:
    """Per contaminated training doc: how many distinct word-``k``-grams
    it shares with ANY eval doc, its own distinct-gram count, and the
    containment fraction ``n_shared / n_shingles``.

    Docs with fewer than ``k`` words have no grams and can never flag.
    ``containment`` is one double÷double division of exact integer
    counts — bit-identical cross-engine, so the whole report is
    SQL-oracle-checkable.
    """
    tr = distinct_shingles(train, id_col, text_col, k)
    ev = (
        distinct_shingles(eval_docs, id_col, text_col, k)
        .select("shingle")
        .distinct()
    )
    sizes = tr.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    shared = (
        tr.join(F.broadcast(ev), "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(sizes, id_col)
        .filter(F.col("n_shared") >= F.lit(min_shared))
        .withColumn(
            "containment",
            F.col("n_shared").cast("double") / F.col("n_shingles").cast("double"),
        )
        .select(id_col, "n_shared", "n_shingles", "containment")
    )


def decontaminated(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    max_containment: float = 0.0,
) -> DataFrame:
    """The cleaning counterpart: training docs whose containment is at
    or below ``max_containment`` (default: drop on ANY shared gram).
    Anti join against the (small) flagged set, so the corpus payload is
    scanned once and never shuffled."""
    flagged = contamination_report(
        train, eval_docs, id_col, text_col, k, min_shared=1
    ).filter(F.col("containment") > F.lit(max_containment))
    return train.join(
        F.broadcast(flagged.select(id_col)), id_col, "left_anti"
    )


# --- Bloom-gated decontamination ------------------------------------------
#
# ``decontaminated`` above still materializes the full training posting
# relation (one distinct-shuffle of every gram in the corpus) because the
# containment *fraction* needs per-doc gram totals. When the policy is
# binary — "drop on ANY shared gram", the usual pretraining rule — none of
# that is needed: a fixed-size Bloom filter of the eval grams can be probed
# MAP-SIDE against each document's gram array, so the 100 TB training side
# is never exploded, never shuffled, and never leaves its scan stage except
# for the (near-empty on a clean corpus) candidate set. Bloom filters have
# no false negatives, so confirming candidates against the exact gram set
# makes the result bit-identical to the exact path — which is what the
# driver oracle checks.


def _bloom_positions(shingle: Column, n_bits: int, n_hashes: int) -> Column:
    """``array<bigint>`` of ``n_hashes`` bit positions for one gram.

    Kirsch–Mitzenmacher double hashing: ``pos_i = (h1 + i*h2) mod m`` with
    two independent ``xxhash64`` views needs only two real hash
    evaluations per gram yet is asymptotically as good as ``n_hashes``
    independent functions (Kirsch & Mitzenmacher, ESA 2006). Both hashes
    are reduced mod ``m`` BEFORE the linear combination so the arithmetic
    stays far from bigint overflow under ANSI mode, and ``h2`` is forced
    into ``[1, m-1]`` so the probe sequence never degenerates to a single
    position."""
    h1 = F.pmod(F.xxhash64(shingle), F.lit(n_bits))
    h2 = F.pmod(F.xxhash64(shingle, F.lit(1)), F.lit(n_bits - 1)) + F.lit(1)
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(n_hashes)]
    )


def build_eval_bloom(
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_bits: int = BLOOM_BITS_DEFAULT,
    n_hashes: int = BLOOM_HASHES_DEFAULT,
) -> list[int]:
    """Build the eval-gram Bloom filter DISTRIBUTED and return its
    ``n_bits/64`` packed words.

    Each gram's bit positions are OR-ed into 64-bit words by a
    ``bit_or`` aggregate — the only exchange is ≤ ``n_bits/64`` groups
    (2048 rows at the default geometry), and the driver collects exactly
    that: a 16 KiB bitset, independent of eval-corpus size."""
    ev = (
        distinct_shingles(eval_docs, id_col, text_col, k)
        .select("shingle")
        .distinct()
    )
    return build_gram_bloom(ev, n_bits, n_hashes)


def build_gram_bloom(
    ev: DataFrame,
    n_bits: int = BLOOM_BITS_DEFAULT,
    n_hashes: int = BLOOM_HASHES_DEFAULT,
) -> list[int]:
    """``build_eval_bloom`` over an already-materialized distinct gram
    relation (column ``shingle``) — the shared body, so callers that
    need the gram relation anyway (for the exact confirm, or to COUNT
    it for :func:`bloom_geometry`) never re-shingle the eval corpus."""
    rows = (
        ev.select(
            F.explode(
                _bloom_positions(F.col("shingle"), n_bits, n_hashes)
            ).alias("pos")
        )
        .select(
            F.expr("pos DIV 64").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    words = [0] * (n_bits // 64)
    for r in rows:
        words[int(r["w"])] = int(r["word"])
    return words


def bloom_might_contain(
    shingle: Column, words: list[int], n_bits: int, n_hashes: int
) -> Column:
    """True iff every probe bit for ``shingle`` is set in ``words``.

    The bitset rides into the plan as ONE ``array<bigint>`` Literal
    node, NOT a ``CreateArray`` of n_bits/64 scalar literals:
    CreateArray's per-element expression nodes made analysis/codegen
    cost scale with the bitset (the r7 derived geometry grew a 10× eval
    set to 2^20 bits = 16k elements and the screen's wall time went
    super-linear — α 0.94 — from plan overhead alone). NOTE the idiom:
    ``F.lit(python_list)`` still expands to ``array(lit(x)...)`` —a
    CreateArray that only folds to a Literal in the optimizer, after
    analysis has paid per-element cost; ``F.lit(numpy_int64_array)``
    takes the ndarray fast path in ``lit()`` and constructs a genuine
    single ArrayType Literal JVM-side. ``bit_get`` takes a *column*
    position, which is what lets the probe run inside a higher-order
    lambda with zero UDFs."""
    import numpy as np

    wl = F.lit(np.asarray([int(w) for w in words], dtype=np.int64))
    pos = _bloom_positions(shingle, n_bits, n_hashes)
    return F.forall(
        pos,
        lambda p: F.bit_get(
            F.element_at(wl, (p / F.lit(64)).cast("int") + F.lit(1)),
            p % F.lit(64),
        )
        == F.lit(1),
    )


def bloom_candidate_pred(
    grams: Column, words: list[int], n_bits: int, n_hashes: int
) -> Column:
    """True iff ANY gram of ``grams`` (an array column) probes all-set
    bits — the map-side candidate screen, HASH-ONCE form.

    The naive ``exists(grams, g -> bloom_might_contain(g, ...))`` pays
    2·n_hashes xxhash64 evaluations per gram: higher-order lambdas run
    interpreted with NO common-subexpression elimination, so the h1/h2
    subtrees inside the position array re-evaluate per element (the
    r11 100× scale run measured the screen at ~360 µs/doc from exactly
    this — SCALE.md r11). Here an inner ``transform`` computes the two
    hashes once per gram (lambda bodies run once per ELEMENT, and the
    hash pair IS the element), and the probe loop does arithmetic +
    bit_get only. Identical verdicts by construction — pinned against
    ``bloom_might_contain`` in tests/test_decontaminate.py."""
    import numpy as np

    wl = F.lit(np.asarray([int(w) for w in words], dtype=np.int64))
    m = F.lit(n_bits)
    hashed = F.transform(
        grams,
        lambda g: F.struct(
            F.pmod(F.xxhash64(g), m).alias("h1"),
            (F.pmod(F.xxhash64(g, F.lit(1)), F.lit(n_bits - 1)) + F.lit(1))
            .alias("h2"),
        ),
    )

    def _probe(h, i):
        p = F.pmod(h["h1"] + F.lit(i) * h["h2"], m)
        return (
            F.bit_get(
                F.element_at(wl, (p / F.lit(64)).cast("int") + F.lit(1)),
                p % F.lit(64),
            )
            == F.lit(1)
        )

    return F.exists(
        hashed,
        lambda h: reduce(
            lambda acc, i: acc & _probe(h, i), range(1, n_hashes), _probe(h, 0)
        ),
    )


def decontaminated_bloom(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_bits: int | None = None,
    n_hashes: int = BLOOM_HASHES_DEFAULT,
) -> DataFrame:
    """Training docs sharing NO word-``k``-gram with any eval doc —
    bit-identical to ``decontaminated(..., max_containment=0.0)`` but
    with the 100 TB-shaped plan:

    1. eval grams → Bloom bitset (distributed build, tiny collect) —
       geometry DERIVED from the measured eval gram count by default
       (:func:`bloom_geometry`, one cheap count over the bounded eval
       gram relation; pass ``n_bits`` to pin it);
    2. every training doc is screened MAP-SIDE by an ``exists`` lambda
       over its own gram array probing the bitset literal — no explode,
       no shuffle, no join for the (vast) clean majority;
    3. only Bloom *candidates* explode their grams for the exact
       confirm (broadcast semi-join against the real eval gram set),
       which removes the Bloom's false positives;
    4. confirmed-contaminated ids anti-join back against the corpus.

    Steps 3–4 touch only the candidate sliver, so the full corpus is
    read once and shuffled never."""
    # cached: three jobs read this relation (the geometry count, the
    # bloom-build collect, the exact-confirm broadcast) — without the
    # cache the eval corpus is re-shingled for each, contradicting
    # build_gram_bloom's never-re-shingle purpose. Matches the
    # streaming twin (write_decontaminate_stream); eval suites are
    # bounded so the cached footprint is KBs–MBs.
    ev_exact = (
        distinct_shingles(eval_docs, id_col, text_col, k)
        .select("shingle")
        .distinct()
        .cache()
    )
    if n_bits is None:
        n_bits = bloom_geometry(ev_exact.count())
    words = build_gram_bloom(ev_exact, n_bits, n_hashes)
    grams = TX.shingles(F.col(text_col), k)
    is_candidate = bloom_candidate_pred(grams, words, n_bits, n_hashes)
    candidates = train.filter(is_candidate)

    confirmed = (
        candidates.select(
            F.col(id_col), F.explode(grams).alias("shingle")
        )
        .join(F.broadcast(ev_exact), "shingle", "left_semi")
        .select(id_col)
        .distinct()
        # eager: materializes the bounded contaminated-id sliver NOW,
        # which lets the cached eval grams be released before return —
        # repeated calls (bench n_runs loops) must not accumulate
        # cached relations for the session lifetime
        .localCheckpoint(eager=True)
    )
    ev_exact.unpersist()
    return train.join(F.broadcast(confirmed), id_col, "left_anti")


# --- Semantic (embedding-space) decontamination ----------------------------
#
# n-gram containment misses PARAPHRASED leakage: an eval item rewritten in
# different words shares no 5-gram with its source yet is the same test
# question. The embedding-space probe catches exactly that class — flag
# every training item whose embedding is close (cosine) to ANY eval item's
# embedding. Same asymmetry as the gram probes: the eval side is a bounded
# benchmark suite (≤ ~10⁴ rows even for a large eval harness) → broadcast;
# the training side is never shuffled to meet it.


def semantic_contamination_report(
    train_vecs: DataFrame,
    eval_vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Per contaminated training vector: how many eval vectors sit at
    cosine ≥ ``threshold``, and the best (max) cosine rounded to 4 dp —
    ``(id, n_eval_hits, max_cosine_r)``, flagged rows only.

    Plan shape: per-side norms are computed once BEFORE the join (one
    projection each); the cross join against the broadcast eval side is
    a fused-codegen sequential fold per (train, eval) pair — no explode,
    no Python, no shuffle of the training payload. The ≥ threshold
    filter runs inside the same stage, so the only exchange is the
    final per-id aggregate over the flagged SLIVER (map-side combined;
    near-empty for a clean corpus — the same posture as
    :func:`contamination_report`). Per-train cost is ∝ |eval| · dim
    flops, embarrassingly parallel; for eval suites past ~10⁴ items the
    hamming-sketch shortlist (operators/similarity.hamming_rerank_topk)
    is the sub-linear screen, exactly as the Bloom bitset screens the
    gram probe.

    Zero-norm vectors cosine to -1.0 (functions/vectors.cosine) and can
    never flag; max is taken over hits only, so no sentinel leaks into
    the output. Fixture margins to the 0.4 threshold are ≥ 1.08e-4 at
    all three SFs — far above cross-engine float noise — and per-pair
    ROUND(cos, 4) parity is already established by
    ``dedup_embedding_cosine`` (its all-pairs set contains every
    cross-split pair scored here)."""
    ev = eval_vecs.select(
        F.col(id_col).alias("_eval_id"),
        VX.as_double(F.col(vec_col)).alias("_ev"),
    )
    ev = ev.withColumn("_evn", VX.norm(F.col("_ev")))
    tr = train_vecs.select(
        F.col(id_col), VX.as_double(F.col(vec_col)).alias("_tv")
    ).withColumn("_tvn", VX.norm(F.col("_tv")))
    hits = (
        tr.crossJoin(F.broadcast(ev))
        .select(
            id_col,
            VX.cosine(
                F.col("_tv"), F.col("_ev"), F.col("_tvn"), F.col("_evn")
            ).alias("_cos"),
        )
        .filter(F.col("_cos") >= F.lit(threshold))
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval_hits"),
        F.round(F.max("_cos"), 4).alias("max_cosine_r"),
    )
