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


def test_cli_rules_mode(spark, tmp_path, capsys):
    """Declarative JSON rule suite via the CLI: pass → exit 0, any
    failure → exit 3 with FAIL lines (the monitoring-job contract)."""
    import json

    from overpaint_spark import cli

    passing = {
        "orders": [
            {"rule": "not_null", "column": "o_custkey"},
            {"rule": "unique", "column": "o_orderkey"},
        ],
        "lineitem": [
            {"rule": "in_range", "column": "l_discount", "lo": 0.0, "hi": 0.1},
        ],
    }
    p = tmp_path / "rules_ok.json"
    p.write_text(json.dumps(passing))
    assert cli.main(["/root/testdata/sf0.001", "--rules", str(p)]) == 0
    out = capsys.readouterr().out
    assert "3 rules, 0 failed" in out

    failing = {
        "orders": [{"rule": "row_count_at_least", "n": 10_000_000}],
    }
    p2 = tmp_path / "rules_bad.json"
    p2.write_text(json.dumps(failing))
    assert cli.main(["/root/testdata/sf0.001", "--rules", str(p2)]) == 3
    out = capsys.readouterr().out
    assert "1 failed" in out and "FAIL" in out


def test_rule_config_validation_errors():
    import pytest as _pytest

    from overpaint_spark.rules.config import rule_from_spec, suite_from_config

    with _pytest.raises(ValueError, match="unknown rule"):
        rule_from_spec({"rule": "nope", "column": "c"})
    with _pytest.raises(ValueError, match="missing parameters"):
        rule_from_spec({"rule": "in_range", "column": "c", "lo": 0})
    with _pytest.raises(ValueError, match="JSON object"):
        suite_from_config([1, 2])


def test_sql_check_null_predicate_is_violation(spark):
    from overpaint_spark.rules import sql_check

    df = spark.createDataFrame(
        [(1.0,), (None,), (-2.0,)], "v double"
    )
    out = evaluate_rules(spark, {"t": df}, {"t": [sql_check("v > 0")]}).collect()
    (r,) = out
    # -2.0 fails the predicate; NULL evaluates to NULL → also a violation
    assert r.metric_value == 2 and not r.passed
    assert r.column_name == "v > 0"


def test_sql_metric_bounds(spark):
    import pytest as _pytest

    from overpaint_spark.rules import sql_metric

    df = spark.createDataFrame([(i,) for i in range(7)], "v long")
    rules = [
        sql_metric("count(distinct v)", min_value=5, name="enough_distinct"),
        sql_metric("max(v)", max_value=3, name="max_capped"),
    ]
    out = {r.rule_name: r for r in
           evaluate_rules(spark, {"t": df}, {"t": rules}).collect()}
    assert out["enough_distinct"].passed and out["enough_distinct"].metric_value == 7
    assert not out["max_capped"].passed and out["max_capped"].metric_value == 6
    with _pytest.raises(ValueError, match="min_value"):
        sql_metric("count(*)")


def test_sql_rules_from_json_config(spark):
    from overpaint_spark.rules.config import suite_from_config

    suite = suite_from_config(
        {
            "t": [
                {"rule": "sql_check", "predicate": "v >= 0", "name": "nonneg"},
                {"rule": "sql_metric", "metric_sql": "sum(v)", "min_value": 3},
            ]
        }
    )
    df = spark.createDataFrame([(1,), (2,)], "v long")
    out = {r.rule_name: r for r in
           evaluate_rules(spark, {"t": df}, suite).collect()}
    assert out["nonneg"].passed
    assert out["sql_metric"].passed and out["sql_metric"].metric_value == 3


def test_empty_suite_and_empty_table_rules_yield_empty_metrics(spark):
    """'{}' or a table mapped to [] (a config mid-edit) must evaluate to
    an empty metrics relation, not IndexError / empty-agg assertion."""
    from overpaint_spark.rules.rules import evaluate_rules

    out = evaluate_rules(spark, {}, {})
    assert out.count() == 0
    assert set(out.columns) == {
        "table_name", "rule_name", "column_name", "metric_value", "passed"
    }
    df = spark.createDataFrame([(1,)], "x long")
    out2 = evaluate_rules(spark, {"t": df}, {"t": []})
    assert out2.count() == 0
