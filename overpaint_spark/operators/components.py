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
from overpaint_spark.localrel import local_df


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
    driver_threshold: int = 1_000_000,
    fallback_star: bool = True,
) -> DataFrame:
    """(id, component) for every vertex in ``pairs``; component is the
    minimum id reachable through the pair graph (deterministic cluster
    representative).

    ``pairs`` is an undirected edge list; only the two id columns are
    read. Isolated documents (no pair) are absent from the output —
    union them back at call sites that need total coverage
    (:func:`dedup_survivors` does).

    **Size-regime switch** (same logic as a broadcast join threshold):
    the edge list is bounded by the number of *duplicate pairs*, which is
    tiny relative to the corpus, so when it fits on the driver
    (≤ ``driver_threshold`` edges) a single-action union-find replaces
    the iterative join loop — one pipeline execution instead of
    2 actions × rounds, measured ~8× on the corpus-clean pipeline.
    Above the threshold (web-scale dup graphs) the distributed min-label
    loop runs unchanged. ``driver_threshold=0`` forces the distributed
    path (used by tests to cover it). For adversarial-diameter graphs
    that exceed ``max_iter`` rounds (long chains), the loop
    AUTO-DISPATCHES to :func:`connected_components_star` — same output
    contract, O(log n) rounds on any shape — so the public entry is
    total: near-clique dup graphs pay min-label's smaller per-round
    constant, pathological diameters converge anyway instead of
    raising. ``fallback_star=False`` restores the loud
    non-convergence error (diagnostics / tests).
    """
    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    )
    if driver_threshold:
        # limit(T+1): if fewer rows come back the relation is complete
        # and fits; exactly T+1 means "too big" → distributed fallback
        head = edges.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            return _driver_union_find(pairs.sparkSession, edges, head)
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

    converged = False
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
            converged = True
            break
    if not converged:
        if fallback_star:
            # min-label needs ~graph-diameter rounds; a diameter past
            # max_iter means a chain-shaped graph — exactly the shape
            # the alternating-star rounds collapse in O(log n). Silent
            # partial labels are never returned: either the star path
            # converges or IT raises.
            return connected_components_star(pairs, a_col, b_col)
        # silent partial labels would let dedup keep several
        # "representatives" of one duplicate cluster — fail loudly
        # instead (min-label propagation needs ~graph-diameter rounds;
        # chain-shaped dup graphs exceed 25 on purpose-built inputs)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter) — raise max_iter, or use "
            "the driver union-find path for driver-sized edge lists"
        )
    return labels.select(F.col("id"), F.col("component"))


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) via alternating LARGE-STAR / SMALL-STAR rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the O(log n)-round worst-case solve for the graph shapes
    min-label propagation cannot finish: each large-star re-links every
    larger neighbor of a center to the center's neighborhood minimum,
    each small-star collapses the smaller neighbors, and path lengths
    halve per round regardless of diameter. Same output contract as
    :func:`connected_components` (component = min reachable id;
    isolated vertices absent), equivalence-pinned in
    tests/test_components.py on fixture graphs, random graphs, and a
    60-long chain the min-label distributed loop refuses (diameter >
    max_iter → RuntimeError there, converges in ~6 rounds here).

    This is the intended DISTRIBUTED fallback once a dup graph outgrows
    the driver union-find threshold AND its diameter outgrows
    min-label's round bound (the SCALE.md r6 watch item on
    dedup_survivors); per round it costs two groupBy-min shuffles and
    two distinct edge folds over the edge relation — a bigger constant
    than one min-label round, which is why min-label stays the default
    for the near-clique graphs real dedup produces."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
        )
        return (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        directed = e.select(
            F.greatest(F.col("u"), F.col("v")).alias("c"),
            F.least(F.col("u"), F.col("v")).alias("n"),
        ).distinct()
        mins = directed.groupBy("c").agg(F.min("n").alias("m"))
        linked = directed.join(mins, "c").select(
            F.col("n").alias("u"), F.col("m").alias("v")
        )
        centers = mins.select(F.col("c").alias("u"), F.col("m").alias("v"))
        return (
            linked.unionByName(centers)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    converged = False
    for _ in range(max_iter):
        new_edges = small_star(large_star(edges)).localCheckpoint(eager=True)
        same = (
            new_edges.count() == edges.count()
            and new_edges.exceptAll(edges).limit(1).count() == 0
        )
        edges = new_edges
        if same:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds — O(log n) bound implies a bug or max_iter far below "
            "log2(graph size)"
        )
    # fixed point = disjoint stars: every non-root points at its root
    roots = edges.select(F.col("v").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    members = edges.select(
        F.col("u").alias("id"), F.col("v").alias("component")
    )
    return members.unionByName(roots).groupBy("id").agg(
        F.min("component").alias("component")
    )


def _driver_union_find(spark, edges: DataFrame, rows) -> DataFrame:
    """Union-find with path compression over a collected edge list;
    roots are the minimum member id (matching the distributed path
    bit-for-bit). Output schema mirrors the edge id type."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        u, v = r[0], r[1]
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            # min id wins as the root → deterministic representative
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo

    out = sorted((x, find(x)) for x in parent)
    id_type = edges.schema[0].dataType
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", id_type), T.StructField("component", id_type)]
    )
    return local_df(spark, out, schema)


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


def dedup_survivors_by(
    docs: DataFrame,
    pairs: DataFrame,
    order_cols: list,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Keep-one-per-cluster with a CALLER-CHOSEN representative policy:
    within each pair-graph component, keep the member ranking FIRST
    under ``order_cols`` (e.g. ``[n_chars DESC, doc_id ASC]`` = keep
    the longest version of duplicated boilerplate); everything off the
    pair graph passes through untouched. :func:`dedup_survivors` is the
    min-id special case kept separate because it never needs the docs
    columns at all.

    Scale shape: the component relation is bounded by #duplicates, so
    it BROADCASTS against the corpus to fetch the ranking columns (the
    corpus is never shuffled), and the representative window runs over
    that bounded relation partitioned by component. The final filter is
    the same broadcast anti-join as the min-id variant. The caller's
    ordering should end with ``id_col`` so representatives are total-
    order deterministic."""
    from pyspark.sql import Window

    comp = connected_components(pairs, a_col, b_col)
    members = comp.select(F.col("id").alias(id_col), "component")
    ranked = docs.join(F.broadcast(members), id_col).withColumn(
        "_rk",
        F.row_number().over(Window.partitionBy("component").orderBy(*order_cols)),
    )
    losers = ranked.filter(F.col("_rk") > 1).select(id_col)
    return docs.join(F.broadcast(losers), id_col, "left_anti")
