"""DDSketch mergeable quantiles (profiler/quantiles.py): the two
properties the module exists for — α relative-error bound against
exact order statistics, and EXACT mergeability of per-split sketches —
plus the declared query's shape."""

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
ALPHA = 0.01


def _exact_at_rank(values, q):
    s = sorted(values)
    return s[math.floor(q * (len(s) - 1))] if len(s) > 1 else s[0]


def test_ddsketch_relative_error_bound(spark):
    """Every estimate is within α of the exact value at the same rank
    (signed values included: events.value spans negatives)."""
    from overpaint_spark.profiler.quantiles import (
        ddsketch_buckets,
        sketch_quantiles,
    )
    from overpaint_spark.sources.catalog import load_table

    ev = load_table(spark, f"{SF}/events.parquet")
    li = load_table(spark, f"{SF}/lineitem.parquet")
    qs = [0.01, 0.1, 0.5, 0.9, 0.99]
    sk = ddsketch_buckets(ev, ["value"], ALPHA).unionByName(
        ddsketch_buckets(li, ["l_quantity", "l_extendedprice"], ALPHA)
    )
    got = {(c, q): (e, n) for c, q, e, n in sketch_quantiles(sk, qs, ALPHA)}

    exact = {
        "value": [r.value for r in ev.select("value").collect() if r.value is not None],
        "l_quantity": [float(r.l_quantity) for r in li.select("l_quantity").collect()],
        "l_extendedprice": [
            float(r.l_extendedprice) for r in li.select("l_extendedprice").collect()
        ],
    }
    for col, vals in exact.items():
        for q in qs:
            est, n = got[(col, q)]
            assert n == len(vals)
            want = _exact_at_rank(vals, q)
            assert abs(est - want) <= ALPHA * abs(want) + 1e-12, (
                col, q, est, want,
            )


def test_ddsketch_merge_is_exact(spark):
    """sketch(whole) == merge(sketch(even), sketch(odd)) — literally
    equal bucket counts, not approximately equal quantiles."""
    from overpaint_spark.profiler.quantiles import (
        ddsketch_buckets,
        merge_sketches,
    )
    from overpaint_spark.sources.catalog import load_table

    li = load_table(spark, f"{SF}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    whole = sorted(map(tuple, ddsketch_buckets(li, cols, ALPHA).collect()))
    even = ddsketch_buckets(li.filter(F.col("l_orderkey") % 2 == 0), cols, ALPHA)
    odd = ddsketch_buckets(li.filter(F.col("l_orderkey") % 2 == 1), cols, ALPHA)
    merged = sorted(map(tuple, merge_sketches(even, odd).collect()))
    assert merged == whole and whole


def test_declared_ddsketch_query_shape(spark):
    from overpaint_spark.queries import QUERIES

    rows = QUERIES["profile_ddsketch_quantiles"](spark, SF).collect()
    cols = {r.column for r in rows}
    assert cols == {"value", "l_quantity", "l_extendedprice", "l_discount"}
    assert len(rows) == 12  # 4 columns x 3 quantiles
    for r in rows:
        assert r.n_total > 0
        # monotone per column: p50 <= p90 <= p99
    per = {}
    for r in rows:
        per.setdefault(r.column, {})[r.q] = r.estimate
    for c, m in per.items():
        assert m[0.5] <= m[0.9] <= m[0.99], (c, m)


def test_ddsketch_nonfinite_inputs_excluded_not_crashing(spark):
    """NULL/NaN/±Inf rows carry no rank: they must be excluded (ANSI
    mode would otherwise crash the Inf→long bucket cast), and the
    finite rows' sketch is unchanged by their presence."""
    from overpaint_spark.profiler.quantiles import ddsketch_buckets

    inf = float("inf")
    dirty = spark.createDataFrame(
        [(1.0,), (-2.0,), (0.0,), (None,), (float("nan"),), (inf,), (-inf,)],
        "v double",
    )
    clean = spark.createDataFrame([(1.0,), (-2.0,), (0.0,)], "v double")
    got = sorted(map(tuple, ddsketch_buckets(dirty, ["v"]).collect()))
    want = sorted(map(tuple, ddsketch_buckets(clean, ["v"]).collect()))
    assert got == want
    assert sum(n for *_a, n in got) == 3
