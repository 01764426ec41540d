"""Table maintenance: small-file compaction for partitioned Parquet.

Rewrite-based sinks (operators/upsert.py) and streaming appends
fragment partitions into many small files; at scale that means footer
overhead, scheduler pressure (one task per tiny split), and lost
row-group statistics value. Compaction rewrites fragmented partitions
into ``ceil(bytes / target_file_bytes)`` files each.

Scale posture: the fragmentation survey is a pure filesystem listing
(no Spark job); only partitions exceeding the file-count threshold
rewrite, each as one pruned read + one write — cost ∝ fragmented data.
The directory swap is not atomic (plain Parquet has no transaction
log); run compaction when no concurrent reader needs snapshot
isolation, or layer a manifest on top.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def partition_file_stats(
    path: str, partition_col: str
) -> dict[str, tuple[int, int]]:
    """{partition value: (n_files, total_bytes)} from a driver-side
    listing — metadata-only, no job."""
    out: dict[str, tuple[int, int]] = {}
    prefix = f"{partition_col}="
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if not (entry.startswith(prefix) and os.path.isdir(full)):
            continue
        files = [
            os.path.join(full, f)
            for f in os.listdir(full)
            if f.endswith(".parquet")
        ]
        out[entry[len(prefix):]] = (
            len(files),
            sum(os.path.getsize(f) for f in files),
        )
    return out


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    min_files: int = 2,
) -> list[str]:
    """Compact every partition holding ≥ ``min_files`` files down to
    ``ceil(bytes / target_file_bytes)`` files; returns the partition
    values rewritten.

    Each partition is read from its own directory (no full-table scan)
    and rewritten in place. A partition already at its target file
    count is skipped even above ``min_files``.
    """
    rewritten: list[str] = []
    for value, (n_files, n_bytes) in partition_file_stats(
        path, partition_col
    ).items():
        target = max(1, math.ceil(n_bytes / target_file_bytes))
        if n_files < min_files or n_files <= target:
            continue
        part_dir = os.path.join(path, f"{partition_col}={value}")
        # write to a sibling temp dir, then swap: Spark cannot overwrite
        # a path it is concurrently reading, and the swap shrinks the
        # non-atomic window to one rename. The temp name is DOT-PREFIXED
        # so partition discovery ignores it — a `<value>._compact_tmp`
        # sibling would be parsed as a real partition value and
        # double-count rows for concurrent readers (or permanently, if
        # a crash leaves it behind)
        tmp_dir = os.path.join(path, f".{partition_col}={value}._compact_tmp")
        (
            spark.read.parquet(part_dir)
            .coalesce(target)
            .write.mode("overwrite")
            .parquet(tmp_dir)
        )
        shutil.rmtree(part_dir)
        os.rename(tmp_dir, part_dir)
        rewritten.append(value)
    return rewritten
