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
from overpaint_spark.localrel import local_df


# Above this dimensionality the flat aggregate's 2·dim channels strain
# a single whole-stage-codegen projection (the same failure family as
# the pre-r3 LSH signature fold); the posexplode path takes over.
_FLAT_STATS_MAX_DIM = 512


def dimension_stats(
    vectors: DataFrame, dim: int, vec_col: str = "embedding"
) -> DataFrame:
    """1-row DataFrame with ``mins``/``maxs`` array<double> columns —
    per-dimension global bounds.

    dim ≤ 512: ONE aggregate with 2·dim channels — zero shuffles, the
    stats relation is a single row. Past 512 the wide projection would
    strain codegen, so the shape switches to posexplode → groupBy(pos):
    still one pass over the data, min/max partials combine map-side so
    the shuffle carries only ~#partitions·dim tiny rows, and the dim-row
    result folds back to one row of arrays. Both paths are exact and
    compared equal in tests/test_quantization.py.

    Degenerate inputs behave IDENTICALLY on both paths (r4 advisor
    finding — they used to diverge): an empty relation yields one row
    of length-``dim`` all-NULL arrays on either path (the flat path's
    global agg does this natively; the posexplode path normalizes its
    collected entries to ``dim`` map lookups); vectors shorter than
    ``dim`` contribute nothing to the missing trailing positions on
    either path (``try_element_at`` in the flat path — plain ``getItem``
    would throw under ANSI while posexplode silently shrank)."""
    v = F.col(vec_col).cast("array<double>")
    if dim <= _FLAT_STATS_MAX_DIM:
        agg = vectors.agg(
            *[F.min(F.try_element_at(v, F.lit(i + 1))).alias(f"mn_{i}") for i in range(dim)],
            *[F.max(F.try_element_at(v, F.lit(i + 1))).alias(f"mx_{i}") for i in range(dim)],
        )
        return agg.select(
            F.array(*[F.col(f"mn_{i}") for i in range(dim)]).alias("mins"),
            F.array(*[F.col(f"mx_{i}") for i in range(dim)]).alias("maxs"),
        )
    per_dim = (
        vectors.select(F.posexplode(v).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    )
    packed = per_dim.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("pos", F.struct("mn", "mx"))))
        ).alias("m")  # pos -> (mn, mx); empty map on empty input
    )
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    return packed.select(
        F.transform(dims, lambda i: F.try_element_at(F.col("m"), i)["mn"]).alias("mins"),
        F.transform(dims, lambda i: F.try_element_at(F.col("m"), i)["mx"]).alias("maxs"),
    )


def scalar_quantize(
    vectors: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: DataFrame | None = None,
) -> DataFrame:
    """(id, codes array<bigint>) with each dimension quantized to the
    0..255 range against the global per-dimension bounds (constant
    dimensions code to 0). The stats row is broadcast; encoding is one
    codegen stage over the scan.

    ``stats``: a precomputed :func:`dimension_stats` relation — callers
    that also need the bounds themselves (the SQ8 error audit) pass it
    through so the bounds aggregate scans the corpus once, not twice,
    and the audit provably decodes against the bounds it encoded
    with."""
    if stats is None:
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


# --- product quantization (PQ) ---------------------------------------------

def pq_codebooks(
    vectors: DataFrame,
    dim: int,
    n_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
    train_sample: int = 4096,
    sample=None,
):
    """Deterministic PQ codebooks (numpy, subspaces × codes × sub-dim).

    ``train_iters=0``: each subspace's codebook is the corresponding
    slice of the ``n_codes`` lowest-id vectors — the seeded-index trick
    that makes the declared query SQL-reproducible. ``train_iters>0``
    refines each subspace with that many Lloyd's iterations (L2 mean
    update, empty cells keep their centroid) on the ``train_sample``
    lowest-id vectors — deterministic but no longer cheaply
    SQL-expressible, so the trained variant stays undeclared; the
    encode/search plans are identical either way. The sample collect is
    bounded (train_sample × dim doubles) and independent of corpus
    size — the standard PQ training recipe.

    ``sample``: a numpy matrix of the lowest-id vectors IN id ORDER
    (≥ max(n_codes, train_sample) rows, or the whole table if smaller)
    — callers that already collected the id-ordered prefix (the
    trained-recall report builds five tiers from one collect, guide
    §1.2) pass it here so no Spark job runs at all; prefixes of it are
    exactly what the two collects below would have fetched."""
    import numpy as np

    assert dim % n_subspaces == 0, "subspaces must divide dim"
    dsub = dim // n_subspaces
    if sample is not None:
        mat = np.asarray(sample, dtype=np.float64)[:n_codes]
    else:
        rows = vectors.orderBy(id_col).limit(n_codes).select(vec_col).collect()
        mat = np.array([r[0] for r in rows], dtype=np.float64)  # (codes, dim)
    cb = mat.reshape(n_codes, n_subspaces, dsub).transpose(1, 0, 2).copy()
    if train_iters <= 0:
        return cb
    if sample is not None:
        smat = np.asarray(sample, dtype=np.float64)[:train_sample]
    else:
        srows = (
            vectors.orderBy(id_col).limit(train_sample).select(vec_col).collect()
        )
        smat = np.array([r[0] for r in srows], dtype=np.float64)
    for mi in range(n_subspaces):
        sub = smat[:, mi * dsub : (mi + 1) * dsub]
        cents = cb[mi]
        for _ in range(train_iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            new = cents.copy()
            for ki in range(n_codes):
                sel = sub[assign == ki]
                if len(sel):
                    new[ki] = sel.mean(axis=0)
            cents = new
        cb[mi] = cents
    return cb


def pq_encode(
    vectors: DataFrame,
    dim: int,
    n_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
    codebook=None,
    rotation=None,
) -> DataFrame:
    """(id, codes array<int>) — classic product quantization (Jégou et
    al. 2011, the FAISS "PQ" tier): the vector splits into
    ``n_subspaces`` slices, each slice coded as the index of its nearest
    (L2) codebook entry, ties toward the lower index. At 16 codes per
    subspace a 64-dim float32 vector compresses 256B → 4B (8× beyond
    SQ8) while ADC search stays possible.

    Scale shape: the codebook is tiny and rides in the task closure;
    encoding is one Arrow-batched pass — per batch, one vectorized
    squared-distance computation per subspace against ``n_codes``
    entries. Nothing shuffles but the output codes.

    ``codebook``: a precomputed :func:`pq_codebooks` result — callers
    that already built one (the ADC/IVF-PQ searches) pass it through so
    the two seeding collect jobs (and any Lloyd's refinement) run
    once, not twice.

    ``rotation``: an optional dim×dim orthogonal matrix applied before
    coding — the OPQ pre-transform. One GEMM per batch; the matrix
    rides in the closure. Identity semantics when absent, so OPQ's
    encode IS this function (r5 review finding: it was a copy)."""
    import numpy as np
    import pandas as pd

    cb = codebook if codebook is not None else pq_codebooks(
        vectors, dim, n_subspaces, n_codes, id_col, vec_col,
        train_iters=train_iters)
    dsub = dim // n_subspaces

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            if rotation is not None:
                x = x @ rotation
            codes = np.empty((len(x), n_subspaces), dtype=np.int32)
            for mi in range(n_subspaces):
                sub = x[:, mi * dsub : (mi + 1) * dsub]
                d2 = ((sub[:, None, :] - cb[mi][None, :, :]) ** 2).sum(axis=2)
                codes[:, mi] = np.argmin(d2, axis=1)  # first min = lowest code
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": [list(map(int, c)) for c in codes]}
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        fn, f"{id_col} long, codes array<int>"
    )


def pq_adc_topk(
    candidates: DataFrame,
    queries: DataFrame,
    dim: int,
    n_subspaces: int = 8,
    n_codes: int = 16,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
    codebook=None,
    q_rows=None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes — the search half
    of the PQ tier: queries stay exact, every candidate is represented
    only by its code bytes, and the distance is the classic lookup-table
    sum ``Σ_m LUT_q[m][code_m]`` with ``LUT_q[m][k] = ‖q_m − cb[m][k]‖²``.

    Scale shape: the per-query LUTs (|Q|·M·K doubles) are BROADCAST;
    each candidate row does M integer array lookups + a fixed-length
    add chain inside codegen — the candidate VECTORS are never read at
    search time, which is the entire point of PQ at 100 TB. One
    shuffle: the final per-query top-k window over k·|Q| surviving
    rows. Ranking ties break on neighbor id. The left-to-right add
    chain keeps the distance bit-reproducible in SQL.

    ``codebook`` / ``q_rows``: precomputed :func:`pq_codebooks` result
    and pre-collected ``(id, vec)`` query rows — callers building
    several tiers over the same inputs (the trained-recall report)
    dedupe the seeding/collect jobs this way (guide §1.2/§2.6).
    """
    spark = candidates.sparkSession
    cb = codebook if codebook is not None else pq_codebooks(
        candidates, dim, n_subspaces, n_codes, id_col, vec_col,
        train_iters=train_iters)
    codes = pq_encode(candidates, dim, n_subspaces, n_codes, id_col, vec_col,
                      codebook=cb)
    if q_rows is None:
        q_rows = queries.select(id_col, vec_col).collect()
    return _adc_search(
        spark, codes, cb, q_rows, dim, n_subspaces, n_codes, k, id_col
    )


def _adc_search(
    spark,
    codes: DataFrame,
    cb,
    q_rows,
    dim: int,
    n_subspaces: int,
    n_codes: int,
    k: int,
    id_col: str,
    rotation=None,
) -> DataFrame:
    """Shared ADC search body — LUT build (optionally in a rotated
    space), |Q|-row broadcast scan over code bytes, top-k window.
    ONE copy serves pq_adc_topk and opq_adc_topk so tie-break, LUT
    schema, and dist-expression fixes cannot drift between the tiers
    (r5 review finding: they were near-verbatim copies)."""
    import numpy as np

    dsub = dim // n_subspaces
    lut_rows = []
    for r in q_rows:
        qv = np.array(r[1], dtype=np.float64)
        if rotation is not None:
            qv = qv @ rotation
        lut = [
            [
                float(((qv[mi * dsub : (mi + 1) * dsub] - cb[mi][ki]) ** 2).sum())
                for ki in range(n_codes)
            ]
            for mi in range(n_subspaces)
        ]
        lut_rows.append((int(r[0]), lut))
    lut_df = local_df(
        spark, lut_rows, "q_id long, lut array<array<double>>"
    )

    from pyspark.sql.window import Window

    scored = (
        codes.crossJoin(F.broadcast(lut_df))
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            _adc_dist_expr(n_subspaces).alias("adc_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def _adc_dist_expr(n_subspaces: int):
    """Left-to-right LUT-sum expression — the fixed add order is what
    keeps the distance bit-reproducible in SQL."""
    dist = None
    for mi in range(n_subspaces):
        term = F.element_at(
            F.col("lut")[mi], F.col("codes")[mi].cast("int") + F.lit(1)
        )
        dist = term if dist is None else dist + term
    return dist


# --- optimized product quantization (OPQ) ----------------------------------

def opq_train(
    vectors: DataFrame,
    dim: int,
    n_subspaces: int = 8,
    n_codes: int = 16,
    n_iter: int = 5,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample=None,
):
    """(R, codebook): an orthogonal rotation + per-subspace codebooks —
    OPQ (Ge et al. 2013, Optimized Product Quantization; FAISS's
    ``OPQMatrix`` pre-transform). Plain PQ quantizes fixed coordinate
    slices, so correlated/anisotropic dimensions waste code budget; OPQ
    alternates (a) PQ codebook training in the rotated space with (b)
    the orthogonal-Procrustes solve R = UVᵀ of SVD(XᵀX̂) that best
    aligns the data to its own reconstruction — provably non-increasing
    quantization error per round.

    Scale shape: training runs on the bounded ``train_sample`` lowest-id
    sample (same collect bound as pq_codebooks — sample×dim doubles,
    independent of corpus size); each alternation is
    sample-sized numpy. Deterministic: sample and codebook seeding are
    id-ordered, Lloyd's updates are argmin/mean, and the SVD runs on
    the same LAPACK everywhere a session runs — same-platform re-runs
    are bit-identical (cross-platform bit-parity is NOT claimed, which
    is one reason the declared query is rows-only; the other is the
    iterative loop).

    ``sample``: the id-ordered lowest-id vector matrix, if the caller
    already collected it (same contract as :func:`pq_codebooks`) —
    skips this function's own collect job."""
    import numpy as np

    assert dim % n_subspaces == 0, "subspaces must divide dim"
    dsub = dim // n_subspaces
    if sample is not None:
        X = np.asarray(sample, dtype=np.float64)[:train_sample]
    else:
        rows = (
            vectors.orderBy(id_col).limit(train_sample).select(vec_col).collect()
        )
        X = np.array([r[0] for r in rows], dtype=np.float64)
    R = np.eye(dim)
    # codebooks seed ONCE (first n_codes rows in the initial space) and
    # PERSIST across alternations — each round refines the PREVIOUS
    # round's centroids in the current rotated space. Re-seeding every
    # round (the original implementation) voids Ge et al.'s
    # non-increasing-error argument, which assumes both sub-steps only
    # improve the shared objective (r5 review finding); per-round
    # monotonicity is pinned in tests now.
    cb = (
        X[:n_codes].reshape(n_codes, n_subspaces, dsub)
        .transpose(1, 0, 2)
        .copy()
    )
    for _ in range(n_iter):
        XR = X @ R
        codes = np.empty((len(XR), n_subspaces), dtype=np.int64)
        for mi in range(n_subspaces):
            sub = XR[:, mi * dsub : (mi + 1) * dsub]
            d2 = ((sub[:, None, :] - cb[mi][None, :, :]) ** 2).sum(axis=2)
            codes[:, mi] = np.argmin(d2, axis=1)
            for ki in range(n_codes):
                sel = sub[codes[:, mi] == ki]
                if len(sel):
                    cb[mi][ki] = sel.mean(axis=0)
            d2 = ((sub[:, None, :] - cb[mi][None, :, :]) ** 2).sum(axis=2)
            codes[:, mi] = np.argmin(d2, axis=1)
        Xhat = np.concatenate(
            [cb[mi][codes[:, mi]] for mi in range(n_subspaces)], axis=1
        )
        # orthogonal Procrustes: R minimizing ||X R - Xhat||_F
        U, _s, Vt = np.linalg.svd(X.T @ Xhat)
        R = U @ Vt
    return R, cb


def opq_encode(
    vectors: DataFrame,
    R,
    codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): rotate then PQ-code — a thin wrapper
    over :func:`pq_encode`'s rotation parameter (ONE encode body for
    both tiers; r5 review finding: this was a copy). The rotation
    matrix (dim² doubles — 32 KB at dim 64) and codebook ride in the
    task closure; per batch one GEMM + one argmin per subspace."""
    n_subspaces = len(codebook)
    dsub = codebook[0].shape[1]
    return pq_encode(
        vectors,
        dim=n_subspaces * dsub,
        n_subspaces=n_subspaces,
        n_codes=codebook[0].shape[0],
        id_col=id_col,
        vec_col=vec_col,
        codebook=codebook,
        rotation=R,
    )


def opq_adc_topk(
    candidates: DataFrame,
    queries: DataFrame,
    dim: int,
    n_subspaces: int = 8,
    n_codes: int = 16,
    k: int = 5,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trained=None,
    q_rows=None,
) -> DataFrame:
    """ADC top-k in the OPQ-rotated space: rotation is orthogonal, so
    L2 distances are preserved exactly — rotating the query then
    LUT-summing against rotated-space codes searches the ORIGINAL
    space, just with less quantization error per code byte. Same scale
    shape as pq_adc_topk: |Q|·M·K LUTs broadcast, candidates read code
    bytes only, one final top-k window — the search body is the SHARED
    :func:`_adc_search` with the rotation applied to queries.

    ``trained``: a precomputed ``(R, codebook)`` from :func:`opq_train`;
    ``q_rows``: pre-collected query rows — same dedupe contract as
    :func:`pq_adc_topk`."""
    spark = candidates.sparkSession
    R, cb = trained if trained is not None else opq_train(
        candidates, dim, n_subspaces, n_codes, n_iter=n_iter,
        id_col=id_col, vec_col=vec_col,
    )
    codes = opq_encode(candidates, R, cb, id_col, vec_col)
    if q_rows is None:
        q_rows = queries.select(id_col, vec_col).collect()
    return _adc_search(
        spark, codes, cb, q_rows, dim, n_subspaces, n_codes, k, id_col,
        rotation=R,
    )


def ivf_pq_topk(
    candidates: DataFrame,
    queries: DataFrame,
    dim: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_subspaces: int = 8,
    n_codes: int = 16,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    by_residual: bool = False,
    q_rows=None,
    seed_rows=None,
) -> DataFrame:
    """IVF-PQ — the production FAISS index shape, composed from the
    verified pieces: candidates live in coarse centroid lists
    (similarity.assign_to_centroids, cosine, seeded) and are represented
    by PQ codes; a query probes its ``n_probe`` nearest lists and scores
    ONLY those lists' members by ADC lookup — expected work per query is
    ``n_probe·N/C`` LUT-sums over code bytes, with neither candidate
    vectors nor out-of-probe lists ever touched.

    ``by_residual=False`` codes RAW vectors (FAISS ``by_residual=false``)
    so the whole index stays SQL-reproducible — this is the declared
    oracle query's shape. ``by_residual=True`` is the production FAISS
    default: each candidate is coded as its offset from its assigned
    coarse centroid (residuals are smaller and centered, so the same
    code budget quantizes finer), and the per-(query, probed-list) LUT
    becomes ``‖(q − c_list)_m − cb[m][k]‖²`` — same join/scan shape, one
    extra zip_with in the encode stage, still deterministic (seeded
    residual codebook) but not cheaply SQL-expressible, so it stays
    undeclared and is property-tested instead (recall ≥ raw at equal
    n_probe, distances consistent with an exact numpy re-derivation;
    tests/test_quantization.py). One shuffle: the cluster_id equi-join
    (query side broadcast); plus the final top-k window."""
    import numpy as np

    from overpaint_spark.operators.similarity import assign_to_centroids

    spark = candidates.sparkSession
    # ONE ordered-limit collect seeds everything driver-side (guide
    # §1.2): the coarse centroids (n_centroids lowest ids), the raw-path
    # PQ codebook (n_codes lowest ids — a prefix of the same ordered
    # rows), and the residual path's seed_max boundary (the max of the
    # n_centroids lowest ids IS the last seed row's id). Previously
    # these were two to three separate ordered-limit jobs over the same
    # relation. Callers holding a longer id-ordered (id, vec) prefix
    # (``seed_rows``) or pre-collected query rows (``q_rows``) pass
    # them in — the recall report shares one collect across its tiers.
    if seed_rows is None:
        seed_rows = (
            candidates.orderBy(id_col)
            .limit(max(n_centroids, n_codes))
            .select(id_col, vec_col)
            .collect()
        )
    coarse = np.array(
        [r[1] for r in seed_rows[:n_centroids]], dtype=np.float64
    )
    dsub = dim // n_subspaces

    c_assigned = assign_to_centroids(
        candidates, coarse, 1, id_col, vec_col, include_vec=False
    )
    if by_residual:
        # (id, cluster_id, residual vector): one broadcast join against
        # the C-row centroid relation + a zip_with — no extra shuffle
        # beyond the assignment join the raw path also pays at encode.
        cent_df = local_df(
            spark,
            [(int(i), [float(x) for x in coarse[i]]) for i in range(len(coarse))],
            "cluster_id int, centroid array<double>",
        )
        to_code = (
            candidates.select(id_col, F.col(vec_col).cast("array<double>").alias(vec_col))
            .join(c_assigned, id_col)
            .join(F.broadcast(cent_df), "cluster_id")
            .select(
                id_col,
                F.zip_with(
                    F.col(vec_col), F.col("centroid"), lambda v, c: v - c
                ).alias(vec_col),
            )
        )
        # The n_centroids lowest-id vectors ARE the coarse seeds, so
        # their residuals are ~zero — seeding the codebook from them
        # would collapse every code onto the origin. Seed from the next
        # n_codes ids instead (their residuals are representative
        # cluster offsets). Still deterministic: ORDER BY id, rows
        # C..C+K. The seeds are BY CONSTRUCTION the C lowest ids, so
        # exclusion is one boundary comparison — an isin() over C ids
        # would embed C literals in the plan (C = N/125 now that the
        # geometry scales; r5 review finding), and only the boundary
        # value crosses to the driver.
        seed_max = seed_rows[: n_centroids][-1][0]
        cb_source = to_code.filter(F.col(id_col) > seed_max)
        cb = pq_codebooks(cb_source, dim, n_subspaces, n_codes, id_col, vec_col)
    else:
        to_code = candidates
        cb = pq_codebooks(
            candidates, dim, n_subspaces, n_codes, id_col, vec_col,
            sample=np.array(
                [r[1] for r in seed_rows[:n_codes]], dtype=np.float64
            ),
        )
    codes = pq_encode(to_code, dim, n_subspaces, n_codes, id_col, vec_col,
                      codebook=cb)
    indexed = codes.join(c_assigned, id_col)

    if q_rows is None:
        q_rows = queries.select(id_col, vec_col).collect()
    return _ivfpq_search(
        spark, indexed, coarse, cb, q_rows, dim, n_subspaces, n_codes,
        n_probe, k, id_col, by_residual,
    )


def _ivfpq_search(
    spark,
    indexed: DataFrame,
    coarse,
    cb,
    q_rows,
    dim: int,
    n_subspaces: int,
    n_codes: int,
    n_probe: int,
    k: int,
    id_col: str,
    by_residual: bool = False,
) -> DataFrame:
    """The probe-and-ADC search half of IVF-PQ over a PREBUILT index
    (``indexed`` = (id, codes, cluster_id); ``coarse``/``cb`` = numpy
    centroid matrix / codebooks) — shared by :func:`ivf_pq_topk` and
    the persisted-index path (operators/ann_index.search_ann_index), so
    live and loaded indexes can never diverge in search semantics."""
    import numpy as np

    dsub = dim // n_subspaces
    cnorm = np.linalg.norm(coarse, axis=1)

    def lut_for(tv):
        return [
            [
                float(((tv[mi * dsub : (mi + 1) * dsub] - cb[mi][ki]) ** 2).sum())
                for ki in range(n_codes)
            ]
            for mi in range(n_subspaces)
        ]

    lut_rows = []
    for r in q_rows:
        qv = np.array(r[1], dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            sims = (coarse @ qv) / (cnorm * np.linalg.norm(qv))
        np.nan_to_num(sims, nan=-1.0, copy=False)  # zero-norm vectors
        probes = np.argsort(-sims, kind="stable")[:n_probe]
        # raw coding: the LUT depends only on qv — build once, not per
        # probed list (residual coding shifts it by the list centroid,
        # so there it is genuinely per-(query, list))
        shared = None if by_residual else lut_for(qv)
        for cid in probes:
            lut = lut_for(qv - coarse[cid]) if by_residual else shared
            lut_rows.append((int(r[0]), int(cid), lut))
    lut_df = local_df(
        spark, lut_rows, "q_id long, cluster_id int, lut array<array<double>>"
    )

    from pyspark.sql.window import Window

    scored = (
        indexed.join(F.broadcast(lut_df), "cluster_id")
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            _adc_dist_expr(n_subspaces).alias("adc_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def gram_partials(vectors: DataFrame, dim: int, vec_col: str = "embedding") -> DataFrame:
    """Per-Arrow-batch partial second-moment statistics: each batch
    emits ONE row (n, sum[dim], gram[dim*dim] row-major) computed by a
    single ``X.T @ X`` GEMM — the distributed-covariance shape (one
    pass, no shuffle, output rows = #batches, data-sized work stays in
    the executor BLAS). The caller reduces the batch rows; at any
    realistic partition count that relation is KBs."""
    import numpy as np
    import pandas as pd
    from typing import Iterator

    out_schema = "n long, s array<double>, g array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            if X.shape[1] != dim:
                raise ValueError(
                    f"expected dim={dim}, batch has {X.shape[1]}"
                )
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    return vectors.select(vec_col).mapInPandas(run, out_schema)


def pca_variance_report(vectors: DataFrame, dim: int, vec_col: str = "embedding"):
    """PCA variance-explained curve without ever materializing the
    vectors on the driver: the covariance is assembled from the
    bounded ``gram_partials`` relation (collected — #batches rows, the
    BPE-trainer bounded-collect posture) and eigendecomposed in driver
    numpy; only the dim-row report leaves the driver.

    C = (G − n·μμᵀ) / (n−1); eigenvalues sorted descending, reported
    as half-up ppm of the trace (scale-free) plus the cumulative
    curve. This is the 'how many PQ/OPQ/IVF dimensions actually carry
    signal' report an embedding pipeline reads before choosing code
    sizes. Deterministic given one BLAS build; declared rows-only
    (eigendecomposition has no SQL form — the dataset_pack_ffd class),
    pinned against direct numpy PCA on the collected fixture in
    tests/test_quantization.py."""
    import numpy as np

    rows = gram_partials(vectors, dim, vec_col).collect()
    if not rows:
        raise ValueError("no vectors")
    n = sum(r["n"] for r in rows)
    if n < 2:
        raise ValueError(
            f"pca_variance_report needs >= 2 vectors for the n-1 "
            f"covariance denominator, got {n}"
        )
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(dim, dim) for r in rows], axis=0)
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / (n - 1)
    evals = np.linalg.eigvalsh(cov)[::-1]  # descending
    evals = np.clip(evals, 0.0, None)  # numerical negatives -> 0
    trace = float(evals.sum())
    if trace <= 0.0:
        # identical vectors: zero variance everywhere — report all-zero
        # ppm rather than dividing by the zero trace
        ppm = [0] * len(evals)
    else:
        ppm = [int(np.floor(v / trace * 1_000_000.0 + 0.5)) for v in evals]
    out, cum = [], 0
    for i, p in enumerate(ppm):
        cum += p
        out.append((i + 1, p, cum))
    spark = vectors.sparkSession
    return local_df(
        spark, out, "component int, var_ppm long, cum_var_ppm long"
    )
