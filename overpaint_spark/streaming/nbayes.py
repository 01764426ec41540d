"""Streaming Naive-Bayes classification — the ingest-time twin of
operators/nbayes.nb_classify, same design stance as streaming/lm.py:
freeze the bounded model up front, make the stream side a PURE
STATELESS projection.

The batch classifier joins exploded token rows against the broadcast
model and argmaxes through a doc_id window — two shuffles a stream
cannot afford for what is logically a per-ROW decision (each document
arrives whole). Here the frozen model rides in the plan as K per-label
literal arrays (64 BIGINT log-likelihood ppms each — a few KB at any
realistic label count) and each row folds ITS OWN token array once per
label: zero shuffle, zero state store, append-mode safe, and the same
all-BIGINT scores as the batch path — so batch/stream equivalence is
testable row-for-row (tests/test_nbayes.py).

Argmax ties break label-ascending exactly like the batch window's
``ORDER BY score DESC, label ASC``: labels are folded in ascending
order and a candidate replaces the incumbent only on a STRICTLY
greater score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from overpaint_spark.operators.nbayes import NB_BUCKETS, _bucket


def frozen_nb_model(
    likelihoods: DataFrame, priors: DataFrame
) -> tuple[list[str], list[int], list[list[int]]]:
    """Collect the bounded model (64·K + K rows) once:
    ``(labels_asc, prior_ppms, lp_tables)`` where ``lp_tables[i][b]``
    is label i's log-likelihood ppm for bucket b."""
    pri = sorted(
        (r["_label"], int(r["prior_ppm"])) for r in priors.collect()
    )
    labels = [p[0] for p in pri]
    prior_ppms = [p[1] for p in pri]
    # nb_train's grid is DENSE (all 64 buckets carry the smoothed
    # floor); a sparse relation here would leave holes that score as
    # ppm 0 = probability 1.0 — a silent wrong-results bug, so refuse
    lp: dict[str, list[int | None]] = {
        l: [None] * NB_BUCKETS for l in labels
    }
    for r in likelihoods.collect():
        lp[r["_label"]][int(r["_b"])] = int(r["lp_ppm"])
    holes = {l for l, t in lp.items() if any(v is None for v in t)}
    if holes:
        raise ValueError(
            f"sparse likelihood grid for labels {sorted(holes)}: "
            "frozen_nb_model needs nb_train's dense 64-bucket relation"
        )
    return labels, prior_ppms, [lp[l] for l in labels]


def nb_classify_stream(
    stream: DataFrame,
    labels: list[str],
    prior_ppms: list[int],
    lp_tables: list[list[int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pred): stateless streaming argmax over the frozen model.

    Per label, ``score = prior_ppm + Σ_tokens lp[bucket(token)]`` — one
    sequential fold per label over the row's own token array, all
    BIGINT, all JVM built-ins (the md5 bucket expression is
    operators/nbayes._bucket verbatim). NULL texts classify as the
    empty string (one '' token) rather than poisoning the fold."""
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    buckets = F.transform(toks, _bucket)

    def score(i: int) -> F.Column:
        tbl = F.lit(lp_tables[i]).cast("array<bigint>")
        return F.aggregate(
            buckets,
            F.lit(prior_ppms[i]).cast("bigint"),
            lambda acc, b: acc + F.element_at(tbl, b + F.lit(1)),
        )

    cands = F.array(
        *[
            F.struct(score(i).alias("s"), F.lit(labels[i]).alias("l"))
            for i in range(len(labels))
        ]
    )
    best = F.aggregate(
        cands,
        F.struct(
            F.lit(None).cast("bigint").alias("s"),
            F.lit(None).cast("string").alias("l"),
        ),
        lambda acc, c: F.when(
            acc["s"].isNull() | (c["s"] > acc["s"]), c
        ).otherwise(acc),
    )
    return stream.select(F.col(id_col), best["l"].alias("pred"))
