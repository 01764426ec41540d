"""Streaming distribution-drift monitor: per-micro-batch PSI against a
frozen baseline histogram.

The batch path (rules/psi.py) compares two runs after the fact; in a
live pipeline the question is "is the data arriving RIGHT NOW still
shaped like the training/baseline window?". Each micro-batch is reduced
to its fixed-bin histogram (a shuffle of n_bins rows — the histogram
cost is independent of batch size), PSI-folded against the baseline on
the driver, and appended to a parquet drift log with batch provenance.

The baseline is collected ONCE at monitor construction (n_bins+2 rows
held on the driver) — the stream never re-reads it, and because bin
edges are declared up front the comparison stays valid across the whole
run. State: none (no watermarks, no aggregation state); the monitor is
exactly as scalable as the ingest itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from overpaint_spark.rules.psi import (
    HistogramSpec,
    histogram,
    psi_band,
    psi_from_histograms,
)


def write_drift_monitor_stream(
    stream: DataFrame,
    baseline: DataFrame,
    spec: HistogramSpec,
    drift_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Monitor ``spec.column`` of a stream for distribution drift.

    Appends one row per non-empty micro-batch to ``drift_dir``:
    (batch_id, column_name, n_rows, psi, band). Exactly-once per batch
    via the checkpointed foreachBatch sink (same pattern as
    streaming/alerts.py).
    """
    base_hist = [
        (r.bucket, r.n)
        for r in histogram(
            baseline, spec.column, spec.lo, spec.hi, spec.n_bins
        ).collect()
    ]
    if not base_hist:
        raise ValueError(f"baseline histogram for {spec.column} is empty")

    def monitor(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        cur = [
            (r.bucket, r.n)
            for r in histogram(
                batch_df, spec.column, spec.lo, spec.hi, spec.n_bins
            ).collect()
        ]
        if not cur:  # batch had only NULLs in the monitored column
            return
        value = psi_from_histograms(base_hist, cur, spec.n_bins)
        n_rows = sum(n for _, n in cur)
        spark.createDataFrame(
            [(batch_id, spec.column, n_rows, value, psi_band(value))],
            "batch_id long, column_name string, n_rows long, psi double, band string",
        ).write.mode("append").parquet(drift_dir)

    writer = (
        stream.writeStream.foreachBatch(monitor)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
