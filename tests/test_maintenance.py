"""Small-file compaction (sources/maintenance.py)."""

import os

from overpaint_spark.sources.maintenance import (
    compact_partitions,
    partition_file_stats,
)

SCHEMA = "k long, day string, v string, ts long"


def _fragment(spark, path):
    """Base table + three appended micro-batches (the streaming-append
    pattern) → d1 accumulates small files; d2 stays single-file."""
    spark.createDataFrame(
        [(1, "d1", "a", 0), (2, "d1", "b", 0), (3, "d2", "c", 0)], SCHEMA
    ).coalesce(1).write.partitionBy("day").parquet(path)
    for i in range(1, 4):
        spark.createDataFrame(
            [(100 + i, "d1", f"n{i}", i * 10)], SCHEMA
        ).coalesce(1).write.mode("append").partitionBy("day").parquet(path)


def test_compaction_reduces_files_and_preserves_data(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _fragment(spark, path)
    before = partition_file_stats(path, "day")
    assert before["d1"][0] >= 2  # fragmented by the upserts
    d2_mtimes = sorted(
        os.path.getmtime(os.path.join(path, "day=d2", f))
        for f in os.listdir(os.path.join(path, "day=d2"))
        if f.endswith(".parquet")
    )
    expected = {
        r.k: (r.day, r.v, r.ts) for r in spark.read.parquet(path).collect()
    }

    rewritten = compact_partitions(spark, path, "day")

    assert "d1" in rewritten
    after = partition_file_stats(path, "day")
    # tiny partition → single file
    assert after["d1"][0] == 1
    got = {
        r.k: (r.day, r.v, r.ts) for r in spark.read.parquet(path).collect()
    }
    assert got == expected
    # partitions already compact are untouched
    if "d2" not in rewritten:
        assert sorted(
            os.path.getmtime(os.path.join(path, "day=d2", f))
            for f in os.listdir(os.path.join(path, "day=d2"))
            if f.endswith(".parquet")
        ) == d2_mtimes


def test_compaction_skips_already_compact(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "d1", "a", 0)], SCHEMA
    ).coalesce(1).write.partitionBy("day").parquet(path)
    assert compact_partitions(spark, path, "day") == []
