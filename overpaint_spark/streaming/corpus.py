"""Streaming corpus intake gate: the ingest-side of the training-data
pipeline as ONE composed stream.

Batch `q_corpus_clean` assumes the whole corpus is present (its near-dup
clustering is global); the ingest stream applies everything that is
decidable ROW-AT-ARRIVAL-TIME, so the expensive global passes downstream
see only surviving documents:

1. **redaction** (functions/text.redactions — PII/denylist scrub with
   per-doc audit counts), pure projection;
2. **quality gate** (quality_score ≥ threshold), pure predicate;
3. **content dedup** within a watermark horizon
   (streaming/dedup.streaming_content_dedup — bounded state).

All three are the same expressions the batch path uses (mode-agnostic,
like the rules engine), so a document admitted by the stream gate agrees
with the batch decision wherever their scopes overlap; the state cost is
the dedup horizon only — redaction and quality are stateless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from overpaint_spark.functions import text as TX
from overpaint_spark.streaming.dedup import streaming_content_dedup


def corpus_intake_gate(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    quality_threshold: float = 0.5,
    watermark: str = "2 hours",
) -> DataFrame:
    """Redact → quality-gate → content-dedup an ingest stream.

    Output adds ``quality_score`` and the redaction count columns
    (``n_email``/``n_ip``/``n_entity``); the text column holds the
    REDACTED form — quality is scored on the redacted text (what would
    actually be trained on). Dedup fingerprints the redacted text too,
    so documents identical after scrubbing collapse.
    """
    red, counts = TX.redactions(F.col(text_col))
    # audit counts FIRST (they read the original text), then swap in the
    # redacted form — the other order would count on already-scrubbed
    # text and always report zero
    scrubbed = stream.select(
        "*", *[c.alias(f"n_{name}") for name, c in counts.items()]
    ).withColumn(text_col, red)
    gated = scrubbed.withColumn(
        "quality_score", TX.quality_score(F.col(text_col))
    ).filter(F.col("quality_score") >= F.lit(quality_threshold))
    return streaming_content_dedup(
        gated, text_col=text_col, ts_col=ts_col, watermark=watermark
    )
