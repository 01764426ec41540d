"""In-contract scaling measurement for decontaminate_bloom (VERDICT r12
task #6, carried from r11 #3).

The operator's design contract (documented since r6) is a BOUNDED eval
side: benchmark suites do not grow with the training corpus. The r11
two-decade replica run scaled the eval split 100× ALONGSIDE the corpus
(eval = doc_id % 20 inside the replica), measuring the operator OUTSIDE
that contract (α 0.88). This script measures the contracted shape:

- training side = the replica's full training split (corpus × K),
- eval side     = replica 0 ONLY (doc_id < DOC_STRIDE ∧ doc_id % 20 = 0)
  — the SAME eval suite at every scale (1×: 250 docs of sf0.1).

Per point it times ``decontaminated_bloom(tr, ev, k=5)`` against the
noop sink, cold build per run, median of 3 — the bench methodology.
α = log10(t_B / t_A) per decade between consecutive points.

Usage: PYTHONPATH=. python tools/decontam_contract_check.py \
           [--dirs /root/testdata/sf0.1 /tmp/scale_sf1 /tmp/scale_sf2]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

DOC_STRIDE = 100_000  # tools/gen_scale.py replica id stride


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dirs",
        nargs="+",
        default=["/root/testdata/sf0.1", "/tmp/scale_sf1", "/tmp/scale_sf2"],
    )
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from overpaint_spark.operators.decontaminate import decontaminated_bloom
    from overpaint_spark.session import get_spark

    spark = get_spark("decontam-contract-check")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for d in args.dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        runs = []
        n_out = None
        for _ in range(args.runs):
            tr = docs.filter(F.col("doc_id") % 20 != 0)
            # replica 0 only: the bounded benchmark suite
            ev = docs.filter(
                (F.col("doc_id") % 20 == 0) & (F.col("doc_id") < DOC_STRIDE)
            )
            spark.sparkContext.setJobDescription(f"decontam-contract {d}")
            t0 = time.perf_counter()
            out = decontaminated_bloom(tr, ev, k=5)
            out.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            if n_out is None:
                n_out = out.count()
        med = sorted(runs)[len(runs) // 2]
        results.append((d, med, n_out))
        print(f"{d}: median {med:.2f}s (runs {[round(r, 2) for r in runs]}, "
              f"{n_out} survivors)")
    for (da, ta, _), (db, tb, _) in zip(results, results[1:]):
        alpha = math.log10(tb / ta)
        print(f"alpha {da} -> {db}: {alpha:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
