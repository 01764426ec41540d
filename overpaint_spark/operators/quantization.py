"""Scalar (int8-range) embedding quantization — the storage/ANN-memory
reduction step of a 100 TB embedding pipeline (the "SQ8" tier of
FAISS-style indexes: 4× smaller than float32, distance error bounded by
half a quantization step per dimension).

Shape: per-dimension global min/max come from ONE aggregate pass with
2·dim channels (map-side partial aggregation — no explode, no shuffle of
vectors; the stats relation is a single row). Quantization itself is a
pure per-row JVM expression (``zip_with`` over the vector and the
broadcast stats arrays), so the encode step costs zero shuffles and
stays inside whole-stage codegen.

Determinism: codes are ``floor((v - mn) / (mx - mn) * 255 + 0.5)`` —
subtraction, division, multiplication, addition and floor are all
exactly specified by IEEE 754, so the integer codes are bit-identical
in any engine given the same doubles (no transcendentals, no
round-half mode ambiguity — ``floor(x + 0.5)``, not ``round``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dimension_stats(
    vectors: DataFrame, dim: int, vec_col: str = "embedding"
) -> DataFrame:
    """1-row DataFrame with ``mins``/``maxs`` array<double> columns —
    per-dimension global bounds from one 2·dim-channel aggregate."""
    v = F.col(vec_col).cast("array<double>")
    agg = vectors.agg(
        *[F.min(v[i]).alias(f"mn_{i}") for i in range(dim)],
        *[F.max(v[i]).alias(f"mx_{i}") for i in range(dim)],
    )
    return agg.select(
        F.array(*[F.col(f"mn_{i}") for i in range(dim)]).alias("mins"),
        F.array(*[F.col(f"mx_{i}") for i in range(dim)]).alias("maxs"),
    )


def scalar_quantize(
    vectors: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<bigint>) with each dimension quantized to the
    0..255 range against the global per-dimension bounds (constant
    dimensions code to 0). The stats row is broadcast; encoding is one
    codegen stage over the scan."""
    stats = dimension_stats(vectors, dim, vec_col)
    v = F.col(vec_col).cast("array<double>")
    zipped = F.arrays_zip(v.alias("val"), F.col("mins").alias("mn"), F.col("maxs").alias("mx"))
    code = F.transform(
        zipped,
        lambda s: F.when(s["mx"] == s["mn"], F.lit(0))
        .otherwise(
            F.floor((s["val"] - s["mn"]) / (s["mx"] - s["mn"]) * 255 + F.lit(0.5))
        )
        .cast("bigint"),
    )
    return vectors.crossJoin(F.broadcast(stats)).select(
        F.col(id_col), code.alias("codes")
    )
