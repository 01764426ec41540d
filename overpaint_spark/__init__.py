"""overpaint_spark — a PySpark-native data-quality / profiling engine.

Re-implements the capabilities of the reference profiler (a Postgres
catalog+stats CLI, ``/root/reference/src/listTables.tsx``) as Spark jobs:

- table/column discovery over a Parquet data root (metadata-only),
- single-pass per-table profile aggregation (min/max, boolean histograms,
  exact counts) instead of the reference's one-query-per-column loop
  (listTables.tsx:236-251, :310-325, :478-485),
- declarative validation rules (Spark SQL + DataFrame expressions),
- LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), similarity search over embeddings, text analysis,
  multimodal binary columns,
- Structured Streaming variants of the profile/rule aggregations.

Everything is built on the public PySpark DataFrame/SQL API; heavy work
stays JVM-side (whole-stage codegen), Python only orchestrates and formats.
"""

__version__ = "0.1.0"

from overpaint_spark.session import get_spark  # noqa: F401
