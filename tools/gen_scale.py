"""Generate a K× scale-up of the sf0.1 fixture for empirical scaling
measurement (tools/scale_check.py → SCALE.md). Generalizes
tools/gen_scale10.py (which now delegates here with K=10) so the scale
proof extends beyond one decade — the r11 run measures 10× → 100×
(lineitem 600k → 60M rows) for a second alpha point per heavy family.

Replica construction preserves per-row workload and SELECTIVITY instead
of naively duplicating rows (exact duplication would multiply dedup
pair counts quadratically and measure a different problem):

- documents: replica k suffixes every token with ``k`` ZERO-PADDED to
  a fixed width — token/char counts and within-replica near-dup
  structure match the original, replicas never share a shingle (so
  candidate-pair counts scale linearly like a real corpus), and the
  padding keeps per-row text length UNIFORM across replicas: without
  it a 100× replica set carries 2-digit suffixes where the 10× set
  carried 1-digit ones, and per-decade alpha comparisons absorb a
  ~+0.1 row-width artifact (found in the r11 run);
- embeddings: fresh seeded unit-norm gaussian vectors per replica
  (the fixture is unit-norm 64-dim) — no artificial near-identical
  pairs;
- events: user/event ids offset per replica, timestamps untouched —
  K× users with the original per-user session structure;
- orders + lineitem: orderkey-offset replicas (offset in lockstep so
  the fact⋈fact join fans out correctly; customer/supplier/part FKs
  untouched, so dimension joins see K× fan-in against the same 1×
  dims — exactly the shape of a bigger day over the same catalog).

The dimension tables (region/nation/customer/supplier/part) are copied
1×: dims grow far slower than facts in a real warehouse, and the
broadcast-join plan shape under test assumes exactly that.

Replicas are built with a crossJoin against a bounded replica-index
range — a K-way union would build a K-branch plan (pathological at
K=100); the crossJoin is one scan × a broadcast K-row range.

Usage: python tools/gen_scale.py OUTDIR K
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

SRC = Path("/root/testdata/sf0.1")
DOC_STRIDE = 100_000
VEC_STRIDE = 100_000
EVENT_STRIDE = 10_000_000
USER_STRIDE = 1_000_000
ORDER_STRIDE = 10_000_000


def main(out: Path, k_factor: int) -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from overpaint_spark.session import get_spark
    from overpaint_spark.sources.catalog import load_table

    spark = get_spark()
    out.mkdir(parents=True, exist_ok=True)
    # replica indices 1..K-1 (replica 0 is the original, unioned as-is)
    reps = spark.range(1, k_factor).select(F.col("id").alias("__k"))
    # files sized so a partition stays well under executor memory at
    # K=100 (60M lineitem rows ≈ 1.5 GB total)
    n_files = max(8, k_factor)

    docs = spark.read.parquet(str(SRC / "documents.parquet"))
    # pad floor 2: alpha comparisons only hold between dirs generated
    # with the SAME suffix width, and 2 covers every K ≤ 100 (the 10×
    # guard dir and the 100× run dir share it); K > 100 widens both
    pad = max(2, len(str(k_factor - 1)))
    doc_reps = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("__k") * DOC_STRIDE).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda x: F.concat(
                        x, F.lpad(F.col("__k").cast("string"), pad, "0")
                    ),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        doc_reps
    ).coalesce(n_files).write.mode("overwrite").parquet(
        str(out / "documents.parquet")
    )

    emb = spark.read.parquet(str(SRC / "embeddings.parquet"))
    n_vec = emb.count()
    labels = [r[0] for r in emb.select("label").orderBy("vec_id").collect()]

    def gen(batches):
        for pdf in batches:
            rows = {"vec_id": [], "embedding": [], "label": []}
            for vid in pdf["vec_id"]:
                vid = int(vid)
                rng = np.random.default_rng(vid)
                v = rng.standard_normal(64)
                v /= np.linalg.norm(v)
                rows["vec_id"].append(vid)
                rows["embedding"].append(
                    [float(x) for x in v.astype(np.float32)]
                )
                rows["label"].append(labels[vid % n_vec])
            yield pd.DataFrame(rows)

    fresh_ids = (
        spark.range(VEC_STRIDE, k_factor * VEC_STRIDE)
        .filter((F.col("id") % VEC_STRIDE) < n_vec)
        .repartition(32)
        .select(F.col("id").alias("vec_id"))
    )
    fresh = fresh_ids.mapInPandas(
        gen, "vec_id long, embedding array<float>, label int"
    )
    emb.unionByName(fresh).coalesce(n_files).write.mode("overwrite").parquet(
        str(out / "embeddings.parquet")
    )

    ev = load_table(spark, str(SRC / "events.parquet"))
    ev_reps = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("__k") * EVENT_STRIDE).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("__k") * USER_STRIDE).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    ev.unionByName(ev_reps).coalesce(n_files).write.mode(
        "overwrite"
    ).parquet(str(out / "events.parquet"))

    orders = spark.read.parquet(str(SRC / "orders.parquet"))
    li = spark.read.parquet(str(SRC / "lineitem.parquet"))
    o_reps = orders.crossJoin(F.broadcast(reps)).select(
        (F.col("o_orderkey") + F.col("__k") * ORDER_STRIDE).alias(
            "o_orderkey"
        ),
        *[c for c in orders.columns if c != "o_orderkey"],
    )
    l_reps = li.crossJoin(F.broadcast(reps)).select(
        (F.col("l_orderkey") + F.col("__k") * ORDER_STRIDE).alias(
            "l_orderkey"
        ),
        *[c for c in li.columns if c != "l_orderkey"],
    )
    orders.unionByName(o_reps, allowMissingColumns=False).select(
        orders.columns
    ).coalesce(n_files).write.mode("overwrite").parquet(
        str(out / "orders.parquet")
    )
    li.unionByName(l_reps).select(li.columns).coalesce(
        max(n_files, 2 * k_factor)
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))

    for t in ("region", "nation", "customer", "supplier", "part"):
        dst = out / f"{t}.parquet"
        if dst.exists() or dst.is_dir():
            shutil.rmtree(dst, ignore_errors=True)
        shutil.copy(SRC / f"{t}.parquet", dst)

    for t in ("documents", "embeddings", "events", "orders", "lineitem"):
        n = spark.read.parquet(str(out / f"{t}.parquet")).count()
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit("usage: python tools/gen_scale.py OUTDIR K")
    main(Path(sys.argv[1]), int(sys.argv[2]))
