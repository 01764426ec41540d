"""Declarative rule-suite configs: JSON → Rule objects.

The rules engine (rules/rules.py) is a Python API; a monitoring
deployment wants suites *as data* — a config the on-call edits without
touching code, the analog of the reference's env-driven configuration
surface (listTables.tsx:184-201) extended to validation:

```json
{
  "orders":   [{"rule": "not_null", "column": "o_custkey"},
               {"rule": "unique",   "column": "o_orderkey"},
               {"rule": "accepted_values", "column": "o_orderstatus",
                "values": ["F", "O", "P"]}],
  "lineitem": [{"rule": "in_range", "column": "l_discount",
                "lo": 0.0, "hi": 0.1},
               {"rule": "row_count_at_least", "n": 1000}]
}
```

Unknown rule names or missing parameters fail fast at parse time (the
config is validated before any Spark job runs).
"""

from __future__ import annotations

import json

from overpaint_spark.rules.rules import (
    Rule,
    accepted_values,
    freshness_within,
    in_range,
    min_length,
    not_null,
    row_count_at_least,
    sql_check,
    sql_metric,
    unique,
)

# rule name → (constructor, required keys passed positionally,
#              optional keys passed by name when present)
_RULE_SPECS = {
    "not_null": (not_null, ("column",), ()),
    "unique": (unique, ("column",), ()),
    "in_range": (in_range, ("column", "lo", "hi"), ()),
    "accepted_values": (accepted_values, ("column", "values"), ()),
    "min_length": (min_length, ("column", "n"), ()),
    "freshness_within": (freshness_within, ("column", "not_before"), ()),
    "row_count_at_least": (row_count_at_least, ("n",), ()),
    "sql_check": (sql_check, ("predicate",), ("name",)),
    "sql_metric": (sql_metric, ("metric_sql",),
                   ("min_value", "max_value", "name")),
}


def rule_from_spec(spec: dict) -> Rule:
    kind = spec.get("rule")
    if kind not in _RULE_SPECS:
        raise ValueError(
            f"unknown rule {kind!r}; known: {sorted(_RULE_SPECS)}"
        )
    ctor, keys, optional = _RULE_SPECS[kind]
    missing = [k for k in keys if k not in spec]
    if missing:
        raise ValueError(f"rule {kind!r} missing parameters: {missing}")
    kwargs = {k: spec[k] for k in optional if k in spec}
    return ctor(*[spec[k] for k in keys], **kwargs)


def suite_from_config(cfg: dict) -> dict[str, list[Rule]]:
    """{table: [rule-spec, ...]} → {table: [Rule, ...]}."""
    if not isinstance(cfg, dict):
        raise ValueError("rules config must be a JSON object keyed by table")
    return {
        table: [rule_from_spec(s) for s in specs]
        for table, specs in cfg.items()
    }


def load_suite(path: str) -> dict[str, list[Rule]]:
    with open(path) as f:
        return suite_from_config(json.load(f))
