"""Connected components over near-duplicate pair graphs.

Pairwise dedup output (``jaccard_pairs``, ``lsh_near_dup_pairs``,
``simhash_candidate_pairs``, ``embedding_near_dup_pairs``) is a *graph*:
transitive matches (A~B, B~C) must collapse into one cluster even when
A and C were never compared. Cluster resolution — "keep one document per
duplicate cluster" — is the step that turns pair relations into an
actual deduplicated corpus, so it is a first-class operator here.

Algorithm: iterative **min-label propagation** expressed entirely in
DataFrame joins/aggregations.

- Every vertex starts labeled with its own id.
- Each round, every vertex takes the min of its own label and its
  neighbors' labels (one shuffle: edge⋈label join + groupBy-min).
- Converged when no label changed (checked with a count on the changed
  set — one action per round).

Scale posture: each round is a single equi-join shuffle keyed by vertex
id; lineage is truncated per round with ``localCheckpoint`` so the plan
does not grow with iterations (an un-checkpointed loop re-executes every
prior round per action — quadratic). Round count is bounded by the
cluster *diameter*, not cluster size; near-dup graphs have tiny
diameters (dup clusters are near-cliques), so 2-4 rounds is typical.
For adversarial long-chain graphs, the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) halves path lengths per round for O(log n) worst-case
rounds — same join/agg building blocks; min-label is preferred here for
its strictly smaller per-round constant on the observed workload.

The reference (a Postgres profiler, src/listTables.tsx) has no graph
surface; this extends the north-star LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every vertex in ``pairs``; component is the
    minimum id reachable through the pair graph (deterministic cluster
    representative).

    ``pairs`` is an undirected edge list; only the two id columns are
    read. Isolated documents (no pair) are absent from the output —
    union them back at call sites that need total coverage
    (:func:`dedup_survivors` does).
    """
    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    )
    # symmetrize once; both propagation directions come from one relation
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # neighbor messages: each edge forwards the src's current label
        # to dst; groupBy-min folds them with the vertex's own label
        msgs = sym.join(
            labels.withColumnRenamed("id", "src"), "src"
        ).select(F.col("dst").alias("id"), "component")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("component"))


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Keep-one-per-cluster: all of ``docs`` minus every pair-graph member
    that is not its cluster's min-id representative.

    The non-representative set is tiny relative to the corpus (it is
    bounded by the number of near-duplicates), so the final filter is a
    broadcast-friendly LEFT ANTI join keyed on ``id_col`` — the corpus
    itself is never shuffled.
    """
    comp = connected_components(pairs, a_col, b_col)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(F.broadcast(losers), id_col, "left_anti")
