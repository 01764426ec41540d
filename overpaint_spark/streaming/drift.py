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

from overpaint_spark.localrel import local_df
from overpaint_spark.streaming.sink import idempotent_append

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
    (batch_id, column_name, n_rows, psi, band). Exactly-once per batch:
    the row lands via the batch-id-keyed idempotent sink
    (streaming/sink.py), so a crash-replayed batch replaces its own
    partition (same pattern as streaming/alerts.py).
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
        idempotent_append(
            local_df(
                spark,
                [(batch_id, spec.column, n_rows, value, psi_band(value))],
                "batch_id long, column_name string, n_rows long, psi double, band string",
            ),
            batch_id,
            drift_dir,
        )

    writer = (
        stream.writeStream.foreachBatch(monitor)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- oracle-checkable integer-ppm variant (r7) ------------------------------
#
# write_drift_monitor_stream above is the OPERATIONAL monitor: float
# PSI + batch_id provenance, exactly what a live pipeline logs. The
# declared ``stream_psi`` relation needs the cross-engine-reproducible
# form: per-bucket PSI terms half-up ppm-quantized then summed as exact
# BIGINTs (rules/psi.psi_ppm_from_histograms — the column_entropy
# idiom), and batches self-identified by a staged ``label_col`` so the
# emitted relation is order-independent and a DuckDB oracle can mirror
# it bucket-for-bucket. Same per-batch plan shape as the monitor above.


def psi_batch_row(
    batch: DataFrame,
    base_counts: list[tuple[int, int]],
    column: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    label_col: str | None = None,
) -> tuple | None:
    """Score ONE batch against the frozen reference histogram — the
    shared body of :func:`write_psi_stream` and the equivalence test.
    Returns ``(split_id, n_rows, psi_ppm, band)``, or ``None`` for a
    batch with no non-NULL values; ``split_id`` is the batch's
    ``label_col`` value when given (assumed constant within the batch
    — the declared query stages files that way), else −1.

    ONE Spark action per batch: the bucket histogram and the batch
    label come back from a single groupBy aggregate (≤ n_bins+2 rows)
    — a separate isEmpty probe / label agg would triple the per-batch
    job count for no information."""
    from overpaint_spark.rules.psi import bucket_expr, psi_ppm_from_histograms

    c = F.col(column)
    label = F.min(label_col) if label_col is not None else F.min(F.lit(-1))
    rows = (
        batch.filter(c.isNotNull())
        .groupBy(bucket_expr(c, lo, hi, n_bins).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), label.alias("split"))
        .collect()
    )
    if not rows:
        return None
    cur = [(r["bucket"], r["n"]) for r in rows]
    n_rows = sum(n for _, n in cur)
    ppm = psi_ppm_from_histograms(base_counts, cur, n_bins)
    split = min(r["split"] for r in rows)
    return (int(split), int(n_rows), int(ppm), psi_band(ppm / 1_000_000.0))


def write_psi_stream(
    stream: DataFrame,
    base_hist: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    column: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    label_col: str | None = None,
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Integer-ppm PSI per micro-batch: one
    ``(split_id, n_rows, psi_ppm, band)`` row appended to ``out_dir``
    per non-empty batch, scored against ``base_hist`` (a (bucket, n)
    relation — collected and frozen HERE, once). See the section
    comment for how this differs from write_drift_monitor_stream."""
    base_counts = [(r.bucket, r.n) for r in base_hist.collect()]
    if not base_counts:
        raise ValueError("reference histogram is empty")

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        row = psi_batch_row(
            batch_df, base_counts, column, lo, hi, n_bins, label_col
        )
        if row is None:
            return
        # local_df: ONE slice up front — the old createDataFrame +
        # coalesce(1) serialized 32 partition evaluations (each paying
        # the ScalaReflection toll) into one task: ~5 s per 1-row batch
        # append on the bench box (overpaint_spark/localrel.py)
        idempotent_append(
            local_df(
                batch_df.sparkSession,
                [row],
                "split_id long, n_rows long, psi_ppm long, band string",
            ),
            batch_id,
            out_dir,
        )

    writer = stream.writeStream.foreachBatch(apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
