"""Streaming ingest gate for the persisted ANN index — the micro-batch
twin of :func:`overpaint_spark.operators.ann_index.add_to_ann_index`,
completing the ingest-time story every other persisted artifact already
has (dedup bands → streaming/dedup.py, phash → streaming/phash.py,
LM/NB models → frozen-literal scorers): a production corpus does not
arrive as one batch, it TRICKLES, and the index must grow with it
without ever retraining or rebuilding.

Each micro-batch of arriving vectors is encoded against the FROZEN
geometry (coarse centroids + PQ codebooks loaded once at sink
construction) and its code rows appended to the stored index's
``codes`` relation. Raw coding (``by_residual=false``) makes per-vector
encode independent of every other vector, so the grown index is
BIT-IDENTICAL to a one-shot build over the union REGARDLESS of how the
stream is chopped into batches — batch boundaries cannot change a
single code byte. That invariant is what makes the declared
``stream_ann_ingest`` relation's oracle free: a post-stream search is
held to the live ivfpq SQL verbatim (the ``ann_topk_ivfpq_incremental``
proof shape, streamed), and tests pin codes-level equality between a
streamed ingest and the batch ``add_to_ann_index``.

Replay caveat (same as the dedup/CDC parquet sinks): a crash between
the codes append and the checkpoint commit can re-append a batch's
code rows on replay. Duplicated (id, codes, cluster_id) rows change
search results only by duplicating a neighbor row pre-rank; a
transactional table format for ``codes`` removes the window entirely.
At 100 TB cadence this sink is the daily-ingest path the
``add_to_ann_index`` docstring promises: each micro-batch pays one
assignment GEMM + one encode pass over ITS OWN rows only — the stored
corpus is never re-read, never re-encoded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_ann_ingest_stream(
    stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    trigger_available_now: bool = False,
):
    """Start a foreachBatch sink appending arriving vectors' code rows
    to the persisted index at ``index_path``.

    The index geometry (centroids/codebook — the bounded relations) is
    loaded ONCE here and frozen into the closure; per batch only the
    data-sized encode of the batch's own rows runs. ``stream`` must
    carry ``id_col`` and ``vec_col``; extra columns are ignored by the
    encoder. Empty batches are skipped without touching the index."""
    from overpaint_spark.operators.ann_index import (
        add_to_ann_index,
        load_ann_index,
    )

    spark = stream.sparkSession
    frozen = load_ann_index(spark, index_path, id_col=id_col)

    def apply(batch_df: DataFrame, _batch_id: int) -> None:
        if not batch_df.take(1):
            return
        # add_to_ann_index appends the batch's code rows to the stored
        # codes relation; the returned in-session handle (frozen ∪
        # delta) is deliberately discarded — the stream's contract is
        # the STORED artifact, re-loaded by readers via load_ann_index
        add_to_ann_index(
            frozen,
            batch_df.select(id_col, vec_col),
            vec_col=vec_col,
            persist_path=index_path,
        )

    writer = stream.writeStream.foreachBatch(apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
