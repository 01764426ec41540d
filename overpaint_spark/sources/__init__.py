from overpaint_spark.sources.catalog import (  # noqa: F401
    TableHandle,
    discover_tables,
    footer_row_count,
    load_table,
)
