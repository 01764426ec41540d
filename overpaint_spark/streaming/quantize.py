"""Streaming embedding quantization — the ingest-time twin of
operators/quantization.scalar_quantize.

The scale-defining decision is WHERE the bounds come from: codes are
only comparable (and an ANN index only consistent) if every batch
encodes against the SAME per-dimension bounds, so the bounds are
FROZEN from a static reference corpus up front — one batch aggregate,
collected once — and the stream applies a pure, stateless ``zip_with``
projection per micro-batch. No ``foreachBatch``, no state store, no
shuffle: the encode is exactly the batch operator's codegen expression,
which is what makes the batch/stream equivalence testable row-for-row
(tests/test_streaming.py). Out-of-range values (drift past the frozen
bounds) clamp to 0/255 — the standard SQ8 ingest contract; re-freezing
bounds is a reindex event, not a streaming concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frozen_bounds(reference: DataFrame, dim: int, vec_col: str = "embedding"):
    """(mins, maxs) float lists from the reference corpus — the one
    collect; reuse across every stream and session."""
    from overpaint_spark.operators.quantization import dimension_stats

    row = dimension_stats(reference, dim, vec_col).collect()[0]
    return list(row.mins), list(row.maxs)


def quantize_stream(
    stream: DataFrame,
    mins: list,
    maxs: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<bigint>) streaming projection against frozen
    bounds: same ``floor((v-mn)/(mx-mn)*255 + 0.5)`` IEEE-exact code
    path as the batch operator, clamped to [0, 255] for drifted
    values."""
    v = F.col(vec_col).cast("array<double>")
    zipped = F.arrays_zip(
        v.alias("val"),
        F.lit(mins).alias("mn"),
        F.lit(maxs).alias("mx"),
    )
    code = F.transform(
        zipped,
        lambda s: F.when(s["mx"] == s["mn"], F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(255),
                    F.floor(
                        (s["val"] - s["mn"]) / (s["mx"] - s["mn"]) * 255
                        + F.lit(0.5)
                    ),
                ),
            )
        )
        .cast("bigint"),
    )
    return stream.select(F.col(id_col), code.alias("codes"))
