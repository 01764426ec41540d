from overpaint_spark.profiler.profile import (  # noqa: F401
    ColumnProfile,
    TableProfile,
    profile_data_root,
    profile_table,
)
from overpaint_spark.profiler.render import render_tables  # noqa: F401
