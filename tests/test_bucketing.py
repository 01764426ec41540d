"""Bucketed layout: the join shuffle moves to write time (sources/bucketing.py)."""

import pytest
from pyspark.sql import functions as F

from overpaint_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
    write_sorted,
)
from overpaint_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    # tables land in the session's spark-warehouse dir (static conf);
    # dropped on teardown
    o = load_table(spark, f"{sf_dir}/orders.parquet")
    li = load_table(spark, f"{sf_dir}/lineitem.parquet")
    write_bucketed(o, "orders_b", "o_orderkey", 8, sort_cols="o_orderkey")
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", "o_orderkey", 8, sort_cols="o_orderkey",
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Bucketing targets fact⋈fact joins where broadcast is impossible;
    at fixture scale the planner would broadcast instead (and skip the
    bucketed read), so pin the shuffle-join path for the plan asserts."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair, no_broadcast):
    ot, lt = bucketed_pair
    joined = read_bucketed(spark, ot).join(read_bucketed(spark, lt), "o_orderkey")
    plan = _executed_plan(joined)
    assert "Exchange hashpartitioning" not in plan, plan  # shuffles elided
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    ot, lt = bucketed_pair
    bucketed_n = (
        read_bucketed(spark, ot).join(read_bucketed(spark, lt), "o_orderkey").count()
    )
    o = load_table(spark, f"{sf_dir}/orders.parquet")
    li = load_table(spark, f"{sf_dir}/lineitem.parquet")
    plain_n = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert bucketed_n == plain_n


def test_bucketed_agg_has_no_shuffle(spark, bucketed_pair, no_broadcast):
    _, lt = bucketed_pair
    agg = read_bucketed(spark, lt).groupBy("o_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    plan = _executed_plan(agg)
    assert "Exchange hashpartitioning" not in plan, plan


def test_write_sorted_ranges_are_disjoint(spark, sf_dir, tmp_path):
    e = load_table(spark, f"{sf_dir}/events.parquet")
    out = str(tmp_path / "events_sorted")
    write_sorted(e, out, "ts", n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == e.count()
    # per-file min/max must not overlap: that's what enables pruning
    spans = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()
    )
    spans = sorted([(r.lo, r.hi) for r in spans])
    assert len(spans) > 1
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next
