"""Eager materialization of an expensive intermediate relation, with a
deployment-selectable fault-tolerance mode (VERDICT r12 #5).

The engine's repeated-subtree cuts (the q_text_lm_score model, the
corpus_pipeline scrubbed-survivor relation) use ``localCheckpoint``:
the subtree executes ONCE and downstream consumers read materialized
rows instead of re-running corpus-sized lineage per consumer. That is
the right call locally and in the bench, but localCheckpoint blocks
live UNREPLICATED on executors with lineage truncated — on a real
cluster one executor loss makes every consumer of the relation
unrecoverable. This helper keeps the call sites mode-agnostic; the
deployment picks the durability tier via ``SPARK_GRAFT_MATERIALIZE``:

- ``local`` (default): ``localCheckpoint(eager=True)`` — fastest, no
  replication, lineage truncated. Correct for local mode (executor ==
  driver: losing it loses the query anyway) and for the bench, whose
  plans are unchanged by this helper.
- ``persist``: ``persist(MEMORY_AND_DISK)`` + an eager count. Lineage
  is KEPT, so an executor loss recomputes only the lost partitions —
  the standard cluster answer when the subtree is re-runnable. The
  logical plan still contains the full subtree per consumer (physical
  planning swaps in the InMemoryRelation), so prefer ``reliable`` when
  plan SIZE is itself the problem (the 148-scan corpus_pipeline case).
- ``reliable``: ``checkpoint(eager=True)`` to the reliable checkpoint
  directory (``SPARK_GRAFT_CHECKPOINT_DIR``, or a directory already
  set via ``SparkContext.setCheckpointDir``) — replicated to durable
  storage (HDFS/object store on a cluster), lineage truncated, and the
  relation survives any executor loss. The write costs one extra copy
  of the (bounded) relation; every current call site materializes a
  relation that is tiny next to its inputs, so this is the documented
  100 TB posture (DEPLOY.md).

Mode applies process-wide by design: a deployment sets one durability
policy, not one per call site.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_ENV = "SPARK_GRAFT_MATERIALIZE"
_MODES = ("local", "persist", "reliable")


def materialize(df: DataFrame, mode: str | None = None) -> DataFrame:
    """Eagerly materialize ``df`` and return the relation downstream
    consumers should read. ``mode`` overrides ``$SPARK_GRAFT_MATERIALIZE``
    (default ``local``); see the module docstring for the tiers."""
    m = (mode or os.environ.get(_ENV, "local") or "local").strip().lower()
    if m not in _MODES:
        raise ValueError(
            f"{_ENV}={m!r}: expected one of {', '.join(_MODES)}"
        )
    if m == "local":
        return df.localCheckpoint(eager=True)
    if m == "persist":
        from pyspark.storagelevel import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()  # eager: the subtree runs now, once
        return out
    # reliable
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        cp_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR", "").strip()
        if not cp_dir:
            raise ValueError(
                f"{_ENV}=reliable needs a checkpoint directory: set "
                "SPARK_GRAFT_CHECKPOINT_DIR or call "
                "SparkContext.setCheckpointDir first"
            )
        sc.setCheckpointDir(cp_dir)
    return df.checkpoint(eager=True)
