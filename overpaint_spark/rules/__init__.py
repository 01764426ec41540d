from overpaint_spark.rules.rules import (  # noqa: F401
    Rule,
    accepted_values,
    evaluate_rules,
    freshness_within,
    in_range,
    min_length,
    not_null,
    row_count_at_least,
    sql_check,
    sql_metric,
    unique,
)
from overpaint_spark.rules.drift import (  # noqa: F401
    read_profile_snapshot,
    snapshot_drift,
    write_profile_snapshot,
)
