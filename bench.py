"""Benchmark harness — runs the headline declared queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE COMPACT JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>, "n_queries": N}

The driver retains only a bounded stdout tail, so the stdout line is
kept deliberately small (< ~1,500 chars): ``queries`` holds only the
top-10 slowest entries. The FULL per-query timing map is written to
``BENCH_DETAIL.json`` next to this script and echoed to stderr.

Each query is forced end-to-end with the ``noop`` sink (full execution,
no driver materialization, no sink IO skew). One warm-up job first so
JVM/codegen startup isn't billed to the first query.

Timing semantics (r5, per VERDICT r4 task #1): each query is measured
``$SPARK_GRAFT_BENCH_RUNS`` times (default 3, back-to-back) and reports
the per-query MEDIAN. Rounds 1–4 measured once, cold, and the r4 noise
audit showed single cold runs drifting up to 2.2× on untouched,
plan-identical queries (SCALE.md) — a noise floor that blinded the
cross-round perf gate. The median of three discards the one-off
codegen-compile/GC outlier while still being a full fresh build+execute
each run (``fn()`` is re-invoked per run, so plan construction — and
the driver-side actions some dedup pipelines take at build time — stay
in the number).

Spread semantics (r10, VERDICT r9 #5 — the two numbers measure the
same run set, in different units): ``BENCH_DETAIL.json``'s ``spread``
map is ABSOLUTE seconds (max − min over the counted runs, warm-up
discards excluded); the ``rel_spread`` map and the stdout line's
``max_rel_spread`` are the SAME spreads divided by the query's median
(dimensionless), with sub-0.2 s medians excluded from the max because
their relative spread is pure scheduler jitter. Both artifacts now
carry both representations, labeled. r4→r5 totals are NOT directly
comparable (median ≈ warm time; the old cold numbers were
systematically higher).

Session-heat triage (r10, VERDICT r9 #6): any query whose full-suite
median exceeds its trailing-round median (the committed
BENCH_DETAIL.json read BEFORE this run overwrites it) by >1.3× and
>0.5 s is automatically RE-MEASURED solo at the end of the suite —
after the session has settled — and the solo medians land in the
detail's ``solo_remeasured`` map. A solo median back at the trailing
level is the session-order-heat signature SCALE.md twice diagnosed by
hand; a solo median that stays high is a real regression.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Coverage contract (VERDICT r5 task #4): the bench times EVERY
# declared query in the manifest unless it is listed here with an
# explicit reason — so new declarations are timed by default and a
# coverage gap is a visible diff, not a silent omission.
# tests/test_bench_budget.py pins BENCH_EXCLUDED ∪ timed == declared.
BENCH_EXCLUDED: dict[str, str] = {}


def bench_query_names(Q) -> list[str]:
    """Manifest order (window first) minus the documented exclusions."""
    return [n for n in Q.QUERIES if n not in BENCH_EXCLUDED]


def prepare_extra_timers(Q, spark, sf_dir) -> dict:
    """Phase-split extras (VERDICT r6 #6): steady-state timings whose
    setup runs OUTSIDE the timed region — ``name → zero-arg callable``
    executing only the steady-state phase against the noop sink. Names
    carry a ``:phase`` suffix so they can never collide with declared
    manifest queries (tests/test_bench_budget.py pins disjointness).

    ``ann_ivfpq_persisted:search``: the declared
    ``ann_topk_ivfpq_persisted`` row deliberately times the FULL
    index lifecycle (build → persist → load → search) because the
    round-trip is its oracle claim — which leaves the steady-state
    number (what a deployed index costs per query batch after ONE
    build) invisible in the bench record. This extra builds/persists/
    loads once, then times search alone; its median should sit ≈ the
    live ``ann_topk_ivfpq`` row."""
    from pyspark.sql import functions as F

    from overpaint_spark.operators.ann_index import (
        load_ann_index,
        search_ann_index,
    )
    from overpaint_spark.queries import _ivf_params, _session_ann_store, _t

    e = _t(spark, sf_dir, "embeddings")
    _, n_probe = _ivf_params(sf_dir)
    # the session-shared pristine store (r10): the extras are read-only
    # consumers, and the declared lifecycle rows already warmed it
    path = _session_ann_store(spark, sf_dir)
    loaded = load_ann_index(spark, path)
    queries_side = e.filter(F.col("vec_id") < 10)

    def search_only():
        out = search_ann_index(loaded, queries_side, n_probe=n_probe, k=5)
        out.select(
            "query_id", "neighbor_id", "rank",
            F.round("adc_dist", 4).alias("adc_dist_r"),
        ).write.mode("overwrite").format("noop").save()

    # retrieval_rrf_indexed:search — the declared row times the full
    # index lifecycle (its oracle claim); this isolates the production
    # steady state: BM25 + indexed-shortlist + rerank + fusion against
    # an ALREADY-persisted index.
    from overpaint_spark.operators.retrieval import hybrid_rrf_indexed
    from overpaint_spark.queries import _BM25_QUERIES, _RRF_DEPTH

    d = _t(spark, sf_dir, "documents")
    qids = sorted(_BM25_QUERIES)
    # one-slice local relation (localrel.local_df): a default
    # createDataFrame splits 5 rows into 32 slices and pays the
    # per-parent-partition reflection toll on EVERY timed execution
    from overpaint_spark.localrel import local_df

    terms_rel = local_df(
        spark,
        [(qid, list(_BM25_QUERIES[qid])) for qid in qids],
        "query_id long, terms array<string>",
    )
    qvecs = e.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    rrf_queries_rel = terms_rel.join(qvecs, "query_id")

    def rrf_search_only():
        hybrid_rrf_indexed(
            d, loaded, rrf_queries_rel, e, k=25, depth=_RRF_DEPTH,
            n_probe=n_probe,
        ).write.mode("overwrite").format("noop").save()

    # retrieval_mmr_indexed:search — steady-state indexed MMR (probe +
    # ADC shortlist + exact rerank + greedy trace) against the same
    # already-persisted index; the declared row times the lifecycle.
    from overpaint_spark.operators.retrieval import mmr_select_indexed

    def mmr_search_only():
        mmr_select_indexed(
            loaded, qvecs, e, k=10, shortlist=_RRF_DEPTH, n_probe=n_probe
        ).write.mode("overwrite").format("noop").save()

    # ann_index_stats:stats — the health read alone (one codes scan +
    # C-row LUT join + per-cluster aggregate) against the persisted
    # index; the declared row also pays build/persist/tombstone setup.
    from overpaint_spark.operators.ann_index import ann_index_stats

    def stats_only():
        ann_index_stats(spark, path).write.mode("overwrite").format(
            "noop"
        ).save()

    return {
        "ann_ivfpq_persisted:search": search_only,
        "retrieval_rrf_indexed:search": rrf_search_only,
        "retrieval_mmr_indexed:search": mmr_search_only,
        "ann_index_stats:stats": stats_only,
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    # stdout carries EXACTLY one JSON line (the driver parses it); route
    # everything else — Spark banners, progress, stray prints — to stderr
    real_stdout = sys.stdout
    sys.stdout = sys.stderr

    from overpaint_spark import queries as Q
    from overpaint_spark.session import get_spark

    # Session-heat fix (r12, VERDICT r11 #1): over ~650 query
    # executions the default ContextCleaner only fires on driver GC —
    # which a 64 GiB heap almost never needs — so shuffle files,
    # broadcast blocks, and localCheckpoint RDD blocks from finished
    # queries pile up in the block manager and local dirs, and
    # late-suite queries pay the accumulated GC/IO pressure (the
    # 2-3× in-suite-vs-solo medians of r10/r11). The _settle() sweeps
    # below drive the cleaner BETWEEN timed regions. A timer-driven
    # periodic GC (spark.cleaner.periodicGC.interval) was tried first
    # and REVERTED: its full GCs land inside whatever query happens to
    # be on the clock — the 90 s cadence measured a 465 s suite with
    # scattered 3-8x inflations (dedup_cluster_sizes 2.8->23.7,
    # corpus_clean 4.3->23.7) vs 368 s without it. Env-gated for
    # diagnostics only.
    gc_interval = os.environ.get("SPARK_GRAFT_BENCH_GC_INTERVAL", "").strip()
    spark = get_spark(
        "overpaint-bench",
        extra_conf=(
            {"spark.cleaner.periodicGC.interval": gc_interval}
            if gc_interval
            else None
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + codegen, the noop sink's one-time init, and the
    # engine's catalog cache (schemas + footer counts — a real deployment
    # warms these at session start, not per query)
    spark.range(1_000_000).selectExpr("sum(id)").write.mode("overwrite").format("noop").save()
    from overpaint_spark.sources.catalog import discover_tables, footer_row_count, load_all

    load_all(spark, sf_dir)
    for h in discover_tables(sf_dir):
        footer_row_count(h.path)
    # spin up the Python/Arrow worker pool once (session bootstrap)
    spark.range(32).mapInPandas(lambda it: it, "id long").write.mode(
        "overwrite"
    ).format("noop").save()
    # warm the DSv2 aggregate-pushdown codepath on the smallest table
    # (JIT + codegen init, not query work — a deployment's first
    # metadata query pays this once per session)
    spark.read.parquet(f"{sf_dir}/region.parquet").selectExpr(
        "min(r_regionkey)"
    ).write.mode("overwrite").format("noop").save()

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # parsed up front with the other knobs so a malformed value fails
    # fast instead of raising AFTER the whole timed suite has run and
    # discarding its results (ADVICE r12)
    solo_cap = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_SOLO_CAP", "12")))
    # Adaptive warm-up discard (r8, VERDICT r7 #7): a query whose FIRST
    # run costs ≥ this much is a headline query whose cold run (codegen,
    # shuffle-file allocation, Python-worker fan-out) would pollute the
    # median and blow up the recorded spread — discard it and take
    # n_runs more. Sub-threshold queries keep the first run as run 1, so
    # total suite wall grows only by one extra run of the heavy tail.
    warmup_cut = float(os.environ.get("SPARK_GRAFT_BENCH_WARMUP_CUT", "0.5"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    runs_map: dict[str, list[float]] = {}
    warmups: dict[str, float] = {}
    steal_map: dict[str, list[float]] = {}

    # Hypervisor-steal accounting (r12): this sandbox's host steals CPU
    # in multi-second bursts (single runs of untouched, plan-identical
    # queries inflate 3-30x and drop back — the r11/r12 "session noise"
    # diagnosed by interleaved A/B). Record the stolen core-seconds
    # overlapping each timed run so an inflated median is attributable
    # to the machine, not misread as a plan regression. Observability
    # only — timings are untouched.
    def _steal_jiffies() -> int:
        try:
            with open("/proc/stat") as f:
                return int(f.readline().split()[8])
        except (OSError, ValueError, IndexError):
            return 0

    def time_runs(name: str, thunk) -> None:
        s0 = _steal_jiffies()
        t0 = time.perf_counter()
        thunk()
        first = round(time.perf_counter() - t0, 3)
        first_steal = round((_steal_jiffies() - s0) / 100.0, 2)
        runs: list[float] = []
        steals: list[float] = []
        if first >= warmup_cut:
            warmups[name] = first  # recorded, not counted
        else:
            runs.append(first)
            steals.append(first_steal)
        while len(runs) < n_runs:
            s0 = _steal_jiffies()
            t0 = time.perf_counter()
            thunk()
            runs.append(round(time.perf_counter() - t0, 3))
            steals.append(round((_steal_jiffies() - s0) / 100.0, 2))
        runs_map[name] = runs
        steal_map[name] = steals  # stolen core-seconds per counted run
        timings[name] = sorted(runs)[len(runs) // 2]  # median (upper for even n)
        spreads[name] = round(max(runs) - min(runs), 3)

    # SPARK_GRAFT_BENCH_ONLY=a,b,c — targeted re-measure of a subset
    # (drift triage, per-query regression checks). The coverage contract
    # (BENCH_EXCLUDED ∪ timed == declared) applies to the default full
    # run only; filtered runs are a debug surface, never the recorded
    # round artifact.
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    only = {n.strip() for n in only_env.split(",") if n.strip()} if only_env else None

    def _settle() -> None:
        """Between-family hygiene (r12, VERDICT r11 #1): drop every
        block the finished queries left behind — cached relations, then
        a Python GC (releases the DataFrame/RDD handles that pin
        localCheckpoint blocks and shuffle dependencies) and one driver
        JVM GC (what actually triggers ContextCleaner to delete the
        now-unreferenced shuffle files, broadcasts, and checkpoint
        blocks). Runs OUTSIDE any timed region; each sweep costs well
        under a second on a mostly-dead heap and keeps the session's
        storage footprint flat across the suite instead of letting ~650
        executions of state accumulate onto the late families."""
        import gc

        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    settle_every = max(
        1, int(os.environ.get("SPARK_GRAFT_BENCH_SETTLE_EVERY", "16"))
    )
    for i, name in enumerate(bench_query_names(Q)):
        if only is not None and name not in only:
            continue
        if i and i % settle_every == 0:
            _settle()
        fn = Q.QUERIES[name]
        time_runs(
            name,
            lambda: fn(spark, sf_dir)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )

    # phase-split extras: setup outside the timed region, steady-state
    # phase timed with the same protocol
    for name, thunk in prepare_extra_timers(Q, spark, sf_dir).items():
        if only is not None and name not in only:
            continue
        time_runs(name, thunk)

    total = round(sum(timings.values()), 3)
    # worst relative spread across queries ≥ 0.2 s median (tiny queries'
    # relative spread is all scheduler jitter and would dominate noise-free)
    rel = [
        (spreads[n] / timings[n], n)
        for n in timings
        if timings[n] >= 0.2
    ]
    worst_rel, worst_name = max(rel, default=(0.0, ""))
    # same spreads, relative units — so detail and summary can never be
    # read as disagreeing again (spread = absolute s, rel_spread = ×median)
    rel_spreads = {
        n: round(spreads[n] / timings[n], 3) for n in timings if timings[n] > 0
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    # session-heat triage: solo re-measure of queries that drifted
    # >1.3x and >0.5 s vs the trailing committed detail (bounded at
    # ``solo_cap``, default 12, so a pathological round cannot double
    # the suite wall)
    solo_remeasured: dict[str, float | None] = {}
    solo_steal: dict[str, list[float]] = {}
    trailing_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    if only is None and os.path.exists(trailing_path):
        try:
            with open(trailing_path) as f:
                trailing_detail = json.load(f)
        except (OSError, ValueError):
            trailing_detail = {}
        # the committed detail is only a drift baseline at the SAME
        # scale factor — after an sf change every query drifts and the
        # triage would spuriously re-measure the 8 heaviest (ADVICE r10)
        if trailing_detail.get("sf") == sf_val:
            trailing = trailing_detail.get("queries", {})
        else:
            trailing = {}
        # ranked by ABSOLUTE drift: the suite wall is a sum of seconds,
        # so a 1.4× drift on a 20 s query matters more than a 3× drift
        # on a 0.6 s one (the r10 artifact's ratio ranking spent all 8
        # slots on sub-2 s rows while corpus_pipeline's +7.7 s went
        # un-remeasured)
        flagged = sorted(
            (
                n
                for n, t in timings.items()
                if n in trailing
                and trailing[n] > 0
                and t > 1.3 * trailing[n]
                and t - trailing[n] > 0.5
            ),
            key=lambda n: timings[n] - trailing[n],
            reverse=True,
            # cap raised 8 -> 12 (r12, env-tunable): the hypervisor's
            # steal storms routinely inflate more than 8 queries in one
            # suite pass, and an un-remeasured inflated row pollutes
            # value_settled AND the next round's trailing baseline
        )[:solo_cap]
        for name in flagged:
            if name in Q.QUERIES:
                # one flaky re-measure (e.g. a streaming awaitTermination
                # timeout) must not discard the completed suite run —
                # record the failure as None and keep going (ADVICE r10)
                try:
                    fn = Q.QUERIES[name]
                    solo_runs = []
                    steals = []
                    for _ in range(n_runs):
                        s0 = _steal_jiffies()
                        t0 = time.perf_counter()
                        fn(spark, sf_dir).write.mode("overwrite").format(
                            "noop"
                        ).save()
                        solo_runs.append(round(time.perf_counter() - t0, 3))
                        steals.append(
                            round((_steal_jiffies() - s0) / 100.0, 2)
                        )
                    # the solo runs are exactly the rows most suspected of
                    # steal inflation — bracket them too (ADVICE r12)
                    solo_steal[name] = steals
                    solo_remeasured[name] = sorted(solo_runs)[
                        len(solo_runs) // 2
                    ]
                except Exception as exc:  # noqa: BLE001
                    print(
                        f"bench: solo re-measure of {name} failed: {exc}",
                        file=sys.stderr,
                        flush=True,
                    )
                    solo_remeasured[name] = None

    # Heat-corrected total (r12, VERDICT r11 #7): wherever the triage
    # re-measured a flagged query solo and the settled session ran it
    # FASTER, substitute the solo median — value_settled is the suite
    # total with session-order heat removed, the number plan-vs-plan
    # round comparisons should read. value stays the raw in-suite sum
    # (both are recorded; a solo median that stayed high changes
    # nothing, which is exactly the real-regression signal).
    settled = dict(timings)
    for n, solo in solo_remeasured.items():
        if solo is not None and n in settled:
            settled[n] = min(settled[n], solo)
    value_settled = round(sum(settled.values()), 3)

    # Full per-query map: BENCH_DETAIL.json + stderr (driver keeps only a
    # bounded stdout tail, so the stdout line must stay compact).
    detail = {
        "metric": "overpaint_spark headline queries wall time",
        "value": total,
        "value_settled": value_settled,
        "unit": "sec",
        "queries": timings,
        "runs": runs_map,
        "steal_core_s": steal_map,  # stolen core-s overlapping each run
        "solo_steal_core_s": solo_steal,  # same, for the solo re-measures
        # run-quality-at-a-glance: total stolen core-s across counted
        # suite runs (VERDICT r12 #2 — ~0 means a calm window; hundreds
        # mean per-query medians carry storm rows)
        "steal_total_core_s": round(
            sum(s for runs in steal_map.values() for s in runs), 1
        ),
        "spread": spreads,  # ABSOLUTE seconds: max-min over counted runs
        "rel_spread": rel_spreads,  # the same spreads / median
        "max_rel_spread": round(worst_rel, 2),  # == the stdout field
        "noisiest": worst_name,
        "solo_remeasured": solo_remeasured,  # end-of-suite drift triage
        "warmup_discarded": warmups,
        "n_runs": n_runs,
        "sf": sf_val,
        "n_queries": len(timings),
    }
    # overridable so test runs don't clobber the committed artifact; a
    # SPARK_GRAFT_BENCH_ONLY-filtered run never writes over the full one
    default_detail = (
        "/tmp/BENCH_DETAIL_subset.json"
        if only is not None
        else os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
    )
    detail_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL") or default_detail
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print("BENCH_DETAIL: " + json.dumps(detail), file=sys.stderr, flush=True)

    # the driver keeps only a ~2000-char stdout tail: shrink the slowest-
    # queries map until the line fits rather than asserting (asserts
    # vanish under python -O, and aborting here would discard a completed
    # multi-minute suite run over a formatting overflow)
    compact = ""
    for top_n in (10, 5, 3, 0):
        top = dict(
            sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:top_n]
        )
        compact = json.dumps(
            {
                "metric": "overpaint_spark headline queries wall time",
                "value": total,
                "value_settled": value_settled,
                "unit": "sec",
                "queries": top,
                "sf": sf_val,
                "n_queries": len(timings),
                "n_runs": n_runs,
                "max_rel_spread": round(worst_rel, 2),
                "noisiest": worst_name,
                "steal_total_core_s": detail["steal_total_core_s"],
                "detail": "BENCH_DETAIL.json",
            },
            separators=(",", ":"),
        )
        if len(compact) < 1500:
            break
    if len(compact) >= 1500:
        raise RuntimeError(f"stdout bench line too long even empty: {len(compact)}")
    print(compact, file=real_stdout, flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
