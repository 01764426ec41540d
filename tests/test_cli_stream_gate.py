"""CLI streaming ingest gates (``--stream-gate``, VERDICT r10 #5): the
foreachBatch sink families, shell-reachable. The clean gate is the
composed witness (quality + frozen-LM band + cross-corpus dedup); fk
stamps verdicts. availableNow + a persistent checkpoint give the
cron-batch cadence: a re-run consumes ONLY files that arrived since.
"""

import pyspark.sql.functions as F

from overpaint_spark import cli

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _novel(spark, mod, rem, id_shift):
    """Word-reversed corpus docs: same vocabulary (quality + LM band
    pass) but new shingles (the dedup gate admits them)."""
    words = F.split(F.col("text"), " ")
    return _docs(spark).filter(F.col("doc_id") % mod == rem).select(
        (F.col("doc_id") + id_shift).alias("doc_id"),
        F.array_join(F.reverse(words), " ").alias("text"),
        "lang", "source", "n_chars",
    )


def test_clean_gate_end_to_end_and_incremental_rerun(spark, tmp_path, capsys):
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    # file 1: verbatim corpus duplicates — every row must be REJECTED
    dups = _docs(spark).filter(F.col("doc_id") % 25 == 0)
    n_dup = dups.count()
    dups.coalesce(1).write.parquet(f"{drop}/dups")
    # file 2: novel docs — admittable (word-reversed, not near-dups)
    nov = _novel(spark, 25, 1, 10_000)
    nov.coalesce(1).write.parquet(f"{drop}/novel")
    assert n_dup > 0

    # the expected admitted set comes from the gate's SHARED predicate
    # body (the batch/stream equivalence contract)
    from overpaint_spark.operators import lm as LM
    from overpaint_spark.streaming.clean import clean_gate_flags

    existing = _docs(spark)
    model = LM.build_lm_model(existing)

    def expected_ids(batch):
        return {
            r.doc_id
            for r in clean_gate_flags(batch, existing, model)
            .filter("admitted")
            .collect()
        }

    exp1 = expected_ids(dups.unionByName(nov))
    assert exp1 and exp1 <= {r.doc_id for r in nov.collect()}

    assert cli.main([
        SF, "--stream-gate", "clean",
        "--stream-source", drop, "--stream-out", out,
    ]) == 0
    assert f"Stream gate [clean]: {len(exp1)} row(s) admitted" in (
        capsys.readouterr().out
    )
    landed = spark.read.parquet(out)
    assert {r.doc_id for r in landed.select("doc_id").collect()} == exp1

    # cron-batch re-run: a NEW file arrives; the persisted checkpoint's
    # file log makes the second run consume only it
    nov2 = _novel(spark, 25, 2, 20_000)
    exp2 = expected_ids(nov2)
    assert exp2
    nov2.coalesce(1).write.parquet(f"{drop}/novel2")
    assert cli.main([
        SF, "--stream-gate", "clean",
        "--stream-source", drop, "--stream-out", out,
    ]) == 0
    assert f"{len(exp1 | exp2)} row(s) admitted" in capsys.readouterr().out
    # exactly-once across the two runs: no duplicated admissions
    got = spark.read.parquet(out)
    assert got.count() == got.select("doc_id").distinct().count()


def test_fk_gate_verdicts_and_error_contract(spark, tmp_path, capsys):
    drop = str(tmp_path / "odrop")
    out = str(tmp_path / "fkout")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    # plant two orphans alongside real orders
    orphans = o.limit(2).withColumn(
        "o_custkey", F.col("o_custkey") + F.lit(9_000_000)
    )
    o.filter(F.col("o_orderkey") % 10 == 0).unionByName(orphans).coalesce(
        1
    ).write.parquet(f"{drop}/a")

    assert cli.main([
        SF, "--stream-gate", "fk",
        "--stream-source", drop, "--stream-out", out,
        "--stream-fk", "o_custkey=customer.c_custkey",
    ]) == 0
    # the gate prints "N row(s) landed (M fk_ok, K quarantined)" — pin
    # the quarantine count positively (the r11-advisor dead assertion,
    # now matching the real format)
    assert "2 quarantined)" in capsys.readouterr().out
    landed = spark.read.parquet(out)
    assert landed.filter(~F.col("fk_ok")).count() == 2

    # A7 error contract: one stderr line + exit 1
    assert cli.main([
        SF, "--stream-gate", "clean",
        "--stream-source", str(tmp_path / "missing"),
        "--stream-out", str(tmp_path / "x"),
    ]) == 1
    err = capsys.readouterr().err
    assert err.startswith("Stream gate error: ")
    assert "\n" == err[err.index("\n"):]


def test_nested_sink_or_checkpoint_is_refused(tmp_path, capsys):
    """The gate reads --stream-source recursively, so a sink or
    checkpoint nested under it would be re-ingested as input on the
    next incremental run — the CLI must refuse the layout up front
    (argparse contract: usage error, exit 2, no Spark session)."""
    import pytest

    drop = str(tmp_path / "drop")
    for bad in (
        ["--stream-out", f"{drop}/out"],
        [
            "--stream-out", str(tmp_path / "ok_out"),
            "--stream-checkpoint", f"{drop}/ckpt",
        ],
    ):
        with pytest.raises(SystemExit) as exc:
            cli.main([SF, "--stream-gate", "clean", "--stream-source", drop]
                     + bad)
        assert exc.value.code == 2
        assert "re-ingest" in capsys.readouterr().err


def test_cdc_gate_bootstrap_and_incremental_apply(spark, tmp_path, capsys):
    """The cdc gate (VERDICT r11 #4): first run BOOTSTRAPS the table
    from the change feed; a re-run with the same checkpoint consumes
    only the newly-dropped file and merges latest-wins per key,
    rewriting only touched partitions."""
    drop = str(tmp_path / "cdrop")
    table = str(tmp_path / "ctable")
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).filter(F.col("o_orderkey") % 5 == 0)
    n0 = o.count()
    o.withColumn("o_version", F.lit(1)).coalesce(1).write.parquet(f"{drop}/v1")

    args = [
        SF, "--stream-gate", "cdc",
        "--stream-source", drop, "--stream-out", table,
        "--stream-cdc", "o_orderkey:o_orderstatus:o_version",
    ]
    assert cli.main(args) == 0
    assert f"table now {n0} current row(s)" in capsys.readouterr().out

    # v2: reprice two orders (same keys, higher version) + one new key
    victims = o.limit(2).select("o_orderkey").collect()
    vkeys = [r.o_orderkey for r in victims]
    upd = (
        o.filter(F.col("o_orderkey").isin(vkeys))
        .withColumn("o_totalprice", F.lit(0.0))
        .withColumn("o_version", F.lit(2))
    )
    new_row = o.limit(1).select(
        (F.col("o_orderkey") + 1_000_000).alias("o_orderkey"),
        "o_orderstatus", "o_totalprice",
    ).withColumn("o_version", F.lit(2))
    upd.unionByName(new_row).coalesce(1).write.parquet(f"{drop}/v2")

    assert cli.main(args) == 0
    assert f"table now {n0 + 1} current row(s)" in capsys.readouterr().out
    t = spark.read.parquet(table)
    # latest-wins: the repriced keys carry v2's price
    assert t.filter(
        F.col("o_orderkey").isin(vkeys) & (F.col("o_totalprice") != 0.0)
    ).count() == 0
    assert t.filter(F.col("o_version") == 2).count() == 3


def test_ann_ingest_gate_grows_persisted_index(spark, tmp_path, capsys):
    """The ann-ingest gate (VERDICT r11 #4): arriving vectors are
    encoded against the frozen geometry and land in codes_delta; the
    reloaded index sees existing ∪ arrived. A non-index --stream-out
    follows the A7 error contract."""
    from overpaint_spark.operators.ann_index import (
        build_ann_index,
        load_ann_index,
        persist_ann_index,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    existing = e.filter(F.col("vec_id") % 4 != 0)
    arriving = e.filter(F.col("vec_id") % 4 == 0)
    idx_path = str(tmp_path / "gate_index")
    persist_ann_index(
        build_ann_index(
            existing, dim=64, n_centroids=16, n_subspaces=8, n_codes=16
        ),
        idx_path,
    )
    drop = str(tmp_path / "vdrop")
    arriving.select("vec_id", "embedding").coalesce(1).write.parquet(
        f"{drop}/a"
    )

    assert cli.main([
        SF, "--stream-gate", "ann-ingest",
        "--stream-source", drop, "--stream-out", idx_path,
    ]) == 0
    total = e.count()
    assert f"index now {total} live vector(s)" in capsys.readouterr().out
    assert load_ann_index(spark, idx_path).indexed.count() == total

    # error contract: not a persisted index
    assert cli.main([
        SF, "--stream-gate", "ann-ingest",
        "--stream-source", drop, "--stream-out", str(tmp_path / "notidx"),
    ]) == 1
    err = capsys.readouterr().err
    assert err.startswith("Stream gate error: ") and "missing" in err
