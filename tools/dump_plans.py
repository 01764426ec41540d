"""Dump .explain("formatted") for declared queries to plans/<tag>/.

Usage:
    python tools/dump_plans.py --sf /root/testdata/sf0.1 --tag r12 \
        --suffix before -q corpus_clean_v3 -q corpus_pipeline ...

Writes plans/<tag>/<query>_<suffix>.txt for each named query.  Building
a query's DataFrame may run bounded driver-side jobs (eager
localCheckpoints); streaming witnesses execute their stream at build
time, so their plan file reflects the sink read — both are noted in the
file header.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("-q", "--query", action="append", required=True)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from overpaint_spark import queries as Q
    from overpaint_spark.session import get_spark

    spark = get_spark("overpaint-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in args.query:
        fn = Q.QUERIES[name]
        df = fn(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {args.sf} ({args.suffix})\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
