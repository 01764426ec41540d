"""materialize() — the deployment-selectable durability tier for the
repeated-subtree cuts (VERDICT r12 #5). The three modes must return
row-identical relations; `local` must keep the bench's plan shape
(a truncated-lineage scan, not the original subtree)."""

import pytest

from overpaint_spark.materialize import materialize


def _src(spark):
    return spark.range(100).selectExpr(
        "id", "id * 2 AS dbl", "CAST(id % 7 AS STRING) AS tag"
    )


def test_local_mode_truncates_lineage_and_keeps_rows(spark):
    src = _src(spark)
    out = materialize(src)  # default mode: local
    # lineage is cut: the optimized plan is a scan of materialized rows,
    # not the original range/project subtree
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan
    assert sorted(out.collect()) == sorted(src.collect())


def test_persist_mode_rows_identical(spark):
    src = _src(spark)
    out = materialize(src, mode="persist")
    try:
        assert out.storageLevel.useMemory or out.storageLevel.useDisk
        assert sorted(out.collect()) == sorted(src.collect())
    finally:
        out.unpersist()


def test_reliable_mode_requires_dir_then_checkpoints(
    spark, tmp_path, monkeypatch
):
    src = _src(spark)
    sc = spark.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
        with pytest.raises(ValueError, match="checkpoint directory"):
            materialize(src, mode="reliable")
        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "cp"))
    out = materialize(src, mode="reliable")
    assert sorted(out.collect()) == sorted(src.collect())
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan


def test_env_selects_mode_and_bad_value_is_loud(spark, monkeypatch):
    src = _src(spark)
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "persist")
    out = materialize(src)
    try:
        assert out.storageLevel.useMemory or out.storageLevel.useDisk
    finally:
        out.unpersist()
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "fastest")
    with pytest.raises(ValueError, match="fastest"):
        materialize(src)
