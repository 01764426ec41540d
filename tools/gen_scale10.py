"""Generate a 10× scale-up of the sf0.1 fixture for empirical scaling
measurement (tools/scale_check.py → SCALE.md).

Scaled tables: documents (5k → 50k), embeddings (2k → 20k), events
(100k → 1M). Replica construction preserves per-row workload and
SELECTIVITY instead of naively duplicating rows (exact duplication
would multiply dedup pair counts quadratically and measure a different
problem):

- documents: replica k suffixes every token with ``k`` — token/char
  counts and within-replica near-dup structure match the original, but
  replicas never share a shingle, so candidate-pair counts scale
  linearly like a real corpus;
- embeddings: fresh seeded unit-norm gaussian vectors per replica
  (the fixture is unit-norm 64-dim) — no artificial near-identical
  pairs;
- events: user/event ids offset per replica, timestamps untouched —
  10× users with the original per-user session structure;
- orders + lineitem: orderkey-offset replicas (o_orderkey and
  l_orderkey offset in lockstep so the fact⋈fact join fans out
  correctly; customer/supplier/part FKs untouched, so dimension joins
  see 10× fan-in against the same 1× dims — exactly the shape of a
  bigger day over the same catalog). lineitem 600k → 6M rows.

The dimension tables (region/nation/customer/supplier/part) are copied
1×: dims grow far slower than facts in a real warehouse, and the
broadcast-join plan shape under test assumes exactly that.

Usage: python tools/gen_scale10.py [outdir]   (default /tmp/scale_sf1)
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

SRC = Path("/root/testdata/sf0.1")
K = 10
DOC_STRIDE = 100_000
VEC_STRIDE = 100_000
EVENT_STRIDE = 10_000_000
USER_STRIDE = 1_000_000


def main(out: Path) -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from overpaint_spark.session import get_spark
    from overpaint_spark.sources.catalog import load_table

    spark = get_spark()
    out.mkdir(parents=True, exist_ok=True)

    docs = spark.read.parquet(str(SRC / "documents.parquet"))
    parts = [docs]
    for k in range(1, K):
        parts.append(
            docs.select(
                (F.col("doc_id") + k * DOC_STRIDE).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x: F.concat(x, F.lit(str(k))),
                    ),
                    " ",
                ).alias("text"),
                "lang",
                "source",
            ).withColumn("n_chars", F.length("text"))
            .select("doc_id", "text", "lang", "source", "n_chars")
        )
    scaled_docs = parts[0].select("doc_id", "text", "lang", "source", "n_chars")
    for p in parts[1:]:
        scaled_docs = scaled_docs.unionByName(p)
    scaled_docs.coalesce(8).write.mode("overwrite").parquet(str(out / "documents.parquet"))

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
                rows["embedding"].append([float(x) for x in v.astype(np.float32)])
                rows["label"].append(labels[vid % n_vec])
            yield pd.DataFrame(rows)

    fresh_ids = spark.range(VEC_STRIDE, K * VEC_STRIDE).filter(
        (F.col("id") % VEC_STRIDE) < n_vec
    ).select(F.col("id").alias("vec_id"))
    fresh = fresh_ids.mapInPandas(gen, "vec_id long, embedding array<float>, label int")
    emb.unionByName(fresh).coalesce(8).write.mode("overwrite").parquet(
        str(out / "embeddings.parquet")
    )

    ev = load_table(spark, str(SRC / "events.parquet"))
    ev_parts = [ev]
    for k in range(1, K):
        ev_parts.append(
            ev.select(
                (F.col("event_id") + k * EVENT_STRIDE).alias("event_id"),
                "ts",
                (F.col("user_id") + k * USER_STRIDE).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    scaled_ev = ev_parts[0]
    for p in ev_parts[1:]:
        scaled_ev = scaled_ev.unionByName(p)
    scaled_ev.coalesce(8).write.mode("overwrite").parquet(str(out / "events.parquet"))

    ORDER_STRIDE = 10_000_000
    orders = spark.read.parquet(str(SRC / "orders.parquet"))
    li = spark.read.parquet(str(SRC / "lineitem.parquet"))
    o_parts, l_parts = [orders], [li]
    for k in range(1, K):
        o_parts.append(
            orders.withColumn("o_orderkey", F.col("o_orderkey") + k * ORDER_STRIDE)
        )
        l_parts.append(
            li.withColumn("l_orderkey", F.col("l_orderkey") + k * ORDER_STRIDE)
        )
    so, sl = o_parts[0], l_parts[0]
    for p in o_parts[1:]:
        so = so.unionByName(p)
    for p in l_parts[1:]:
        sl = sl.unionByName(p)
    so.coalesce(8).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    sl.coalesce(16).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))

    for t in ("region", "nation", "customer", "supplier", "part"):
        dst = out / f"{t}.parquet"
        if dst.exists() or dst.is_dir():
            shutil.rmtree(dst, ignore_errors=True)
        shutil.copy(SRC / f"{t}.parquet", dst)

    for t in ("documents", "embeddings", "events", "orders", "lineitem"):
        n = spark.read.parquet(str(out / f"{t}.parquet")).count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main(Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/scale_sf1"))
