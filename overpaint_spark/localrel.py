"""Single-partition local relations — the cheap way to turn a small
driver-side row list into a DataFrame that is executed many times.

``SparkSession.createDataFrame(rows, schema)`` parallelizes the rows
over ``defaultParallelism`` slices (32 on the bench box), and EVERY
execution of the resulting plan pays a per-parent-partition Scala
runtime-reflection toll in the task body (ScalaReflection.encoderFor
via scala.runtime.ClassValueCompat — measured ~0.2 s per partition on
JDK 17). Executed in parallel that is a ~0.5 s floor per action; pushed
through ``.coalesce(1)`` (the obvious "one output file" idiom) the 32
partition evaluations SERIALIZE into one task and a 1-row write costs
~5-6 s — which was the hidden floor under every foreachBatch witness
sink and the persisted-ANN-index metadata writes (guide §1.2: measure
where the time actually goes; §7.3: the driver thread dump names the
culprit).

``local_df`` parallelizes the SAME rows into exactly ONE slice up
front: one partition, one reflection toll per action, row order
preserved verbatim (a single slice holds the list in order — identical
bytes to what ``coalesce(1)`` produced), and single-file writes need no
coalesce at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows: list, schema) -> DataFrame:
    """``rows`` (list of tuples, possibly empty) as a ONE-partition
    DataFrame with ``schema`` (DDL string or StructType). Row order is
    preserved exactly. An empty list still benefits: the default path
    parallelizes [] into defaultParallelism empty slices, each paying
    the per-partition toll."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
