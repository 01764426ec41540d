"""Validation-rules engine tests (SURVEY §7.3)."""

from pyspark.sql import Row

from overpaint_spark.rules import (
    accepted_values,
    evaluate_rules,
    in_range,
    min_length,
    not_null,
    row_count_at_least,
    unique,
)


def _metrics(spark, df, rules):
    out = evaluate_rules(spark, {"t": df}, {"t": rules})
    return {(r.rule_name, r.column_name): r for r in out.collect()}


def test_not_null_counts_violations(spark):
    df = spark.createDataFrame([Row(x=1), Row(x=None), Row(x=None)], "x bigint")
    m = _metrics(spark, df, [not_null("x")])
    r = m[("not_null", "x")]
    assert r.metric_value == 2 and not r.passed


def test_unique_ignores_nulls(spark):
    df = spark.createDataFrame([Row(x=1), Row(x=1), Row(x=2), Row(x=None)], "x bigint")
    m = _metrics(spark, df, [unique("x")])
    r = m[("unique", "x")]
    assert r.metric_value == 1 and not r.passed


def test_in_range_and_accepted_values_pass(spark):
    df = spark.createDataFrame([Row(x=0.5, s="A"), Row(x=0.9, s="B")], "x double, s string")
    m = _metrics(spark, df, [in_range("x", 0.0, 1.0), accepted_values("s", ["A", "B"])])
    assert m[("in_range", "x")].passed
    assert m[("accepted_values", "s")].passed


def test_min_length_and_rowcount(spark):
    df = spark.createDataFrame([Row(s="abcdef"), Row(s="ab")], "s string")
    m = _metrics(spark, df, [min_length("s", 3), row_count_at_least(10)])
    assert m[("min_length", "s")].metric_value == 1
    assert not m[("row_count", "*")].passed  # 2 < 10


def test_single_pass_many_rules(spark):
    """All rules for a table must fold into one aggregate (one job)."""
    df = spark.createDataFrame([Row(x=1, s="abc")], "x bigint, s string")
    rules = [not_null("x"), unique("x"), min_length("s", 1), row_count_at_least(1)]
    out = evaluate_rules(spark, {"t": df}, {"t": rules})
    assert out.count() == 4
    assert all(r.passed for r in out.collect())
