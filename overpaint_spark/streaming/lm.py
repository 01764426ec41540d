"""Streaming LM quality scoring — the ingest-time twin of
operators/lm.lm_score, same design stance as streaming/quantize.py:
freeze the bounded model up front, make the stream side a PURE
STATELESS projection.

Where the batch operator joins the corpus's exploded grams against the
model relation (one data-sized shuffle), the stream side cannot afford
a per-doc aggregate (a streaming groupBy(doc_id) would be a stateful
agg with watermark semantics for what is logically a per-ROW
computation — each document arrives whole). Instead the frozen model
becomes a MAP LITERAL riding in the plan, and the score is a per-row
``aggregate`` fold over that row's own trigrams: zero shuffle, zero
state store, append-mode safe, and the same integer-ppm math as the
batch path — which is what makes batch/stream equivalence testable
row-for-row (tests/test_streaming.py).

Model size honesty: the trigram vocabulary is bounded by charset³, but
a map literal lives in the serialized plan — fine for the ≤ ~50k-entry
ASCII-corpus models here; a multi-MB model should go back through the
broadcast-join batch path via foreachBatch instead (the dedup stream's
pattern). Re-freezing the model is a re-deploy event, not a streaming
concern (same contract as the SQ8 frozen bounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frozen_model(reference: DataFrame, sample_mod: int = 10):
    """(grams, counts, total, v) from the reference corpus — the one
    collect (bounded: ≤ charset³ rows); reuse across every stream.
    Accepts either a documents relation or an already-built/loaded
    model relation with (gram, c) columns."""
    from overpaint_spark.operators.lm import build_lm_model

    model = (
        reference
        if set(reference.columns) == {"gram", "c"}
        else build_lm_model(reference, sample_mod)
    )
    rows = model.collect()
    grams = [r.gram for r in rows]
    counts = [int(r.c) for r in rows]
    return grams, counts, sum(counts), len(counts)


def lm_score_stream(
    stream: DataFrame,
    grams: list,
    counts: list,
    total: int,
    v: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    ppm: int = 1_000_000,
) -> DataFrame:
    """(doc_id, n_grams, lm_score_ppm) as a stateless streaming
    projection: per row, fold the row's own trigrams over the frozen
    model map. Unknown grams contribute the Laplace +1 exactly like the
    batch path's left-join coalesce; the final division is integer
    ``div`` on bigints, so scores are bit-identical to the batch path
    (no float path exists to diverge). Empty/short texts (no trigrams)
    yield n_grams = 0 and a NULL score (the batch groupBy simply has no
    row there; a stream must emit one per input row — NULL marks 'no
    evidence', distinguishable from a real low score)."""
    from overpaint_spark.queries import _char_trigrams

    model_map = F.map_from_arrays(
        F.lit(grams).cast("array<string>"), F.lit(counts).cast("array<bigint>")
    )
    g = _char_trigrams(F.col(text_col))
    sum_c1 = F.aggregate(
        g,
        F.lit(0).cast("bigint"),
        lambda acc, gram: acc
        + F.coalesce(F.try_element_at(model_map, gram), F.lit(0))
        + F.lit(1),
    )
    tmp = stream.select(
        F.col(id_col),
        F.size(g).cast("bigint").alias("n_grams"),
        sum_c1.alias("sum_c1"),
    )
    return tmp.selectExpr(
        id_col,
        "n_grams",
        f"CASE WHEN n_grams > 0 THEN (sum_c1 * {ppm}) div "
        f"(CAST({total + v} AS BIGINT) * n_grams) END AS lm_score_ppm",
    )
