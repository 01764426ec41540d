"""Streaming deduplication with bounded state.

The batch dedup family (:mod:`overpaint_spark.operators.dedup`) assumes a
finite corpus; a training-data ingest stream needs the same guarantee —
one row per key — without unbounded state. ``dropDuplicatesWithinWatermark``
keeps a key's state only until the event-time watermark passes it, so
state size is bounded by (arrival rate × watermark horizon), not by the
full stream history — the only formulation that survives an unbounded
100 TB/day feed.

Two deployment notes encoded here rather than left to callers:

- duplicates **older than the watermark** never reach the dedup state at
  all (they are dropped as late data), so the horizon is an explicit
  correctness/SLA knob, not a tuning detail;
- content-level dedup keys on a deterministic fingerprint (md5 of
  lowercased, whitespace-squashed text — a strict superset of the batch
  exact-dedup's raw-text md5) so retried/re-ingested documents collapse
  even when their ids or incidental formatting differ.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Emit each key at most once within the watermark horizon."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def streaming_content_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    fingerprint_col: str = "content_fp",
) -> DataFrame:
    """Near-ingest content dedup: collapse rows whose *normalized text*
    (lowercased, whitespace-squashed) is identical, regardless of id
    columns — the streaming twin of operators/dedup.exact_dedup."""
    from overpaint_spark.functions import text as TX

    fp = TX.md5_fingerprint(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    )
    return (
        stream.withColumn(fingerprint_col, fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([fingerprint_col])
    )
