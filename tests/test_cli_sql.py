"""CLI ad-hoc SQL mode (``--sql`` / ``--sql-file``) — the psql-shaped
surface: a reference user types SQL at the database; ours types the
same SQL at the lake catalog and gets a psql-style grid back.

The mode reuses catalog.load_table for registration, so the
timestamp-nanos events table must be queryable like any other.
"""

import pytest

from overpaint_spark import cli

SF = "/root/testdata/sf0.001"


def test_sql_grid_and_footer(spark, capsys):
    assert cli.main([
        SF, "--sql",
        "SELECT lang, COUNT(*) AS docs FROM documents GROUP BY lang "
        "ORDER BY lang",
    ]) == 0
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    assert lines[0].split("|")[0].strip() == "lang"
    assert set(lines[1]) <= {"-", "+"}
    assert lines[-1] == "(5 rows)"
    assert any(line.startswith("en") for line in lines)


def test_sql_truncation_is_detected_not_guessed(spark, capsys):
    assert cli.main([
        SF, "--sql", "SELECT doc_id FROM documents ORDER BY doc_id",
        "--max-rows", "3",
    ]) == 0
    out = capsys.readouterr().out
    assert "(3 rows)" in out
    assert "truncated at 3 rows" in out
    # exactly at the cap → no spurious truncation note
    assert cli.main([
        SF, "--sql",
        "SELECT doc_id FROM documents ORDER BY doc_id LIMIT 3",
        "--max-rows", "3",
    ]) == 0
    out = capsys.readouterr().out
    assert "(3 rows)" in out and "truncated" not in out


def test_sql_json_rows(spark, capsys):
    import json

    assert cli.main([
        SF, "--sql",
        "SELECT o_orderpriority AS pri, COUNT(*) AS n FROM orders "
        "GROUP BY 1 ORDER BY 1 LIMIT 2",
        "--format", "json",
    ]) == 0
    out = capsys.readouterr().out
    rows = [json.loads(line) for line in out.strip().splitlines()]
    assert rows[0]["pri"] == "1-URGENT" and isinstance(rows[0]["n"], int)
    assert len(rows) == 2


def test_sql_nanos_events_table_queryable(spark, capsys):
    """events.parquet is TIMESTAMP(NANOS) — a raw spark.read would
    throw; registration through load_table must make it plain SQL."""
    assert cli.main([
        SF, "--sql",
        "SELECT COUNT(*) AS n, MIN(ts) AS first_ts FROM events",
    ]) == 0
    out = capsys.readouterr().out
    assert "1000" in out and "2024-" in out


def test_sql_null_renders_empty(spark, capsys):
    assert cli.main([
        SF, "--sql", "SELECT CAST(NULL AS STRING) AS a, 'x' AS b",
    ]) == 0
    out = capsys.readouterr().out.splitlines()
    row = out[2]
    assert row.rstrip() == "  | x" or row.split("|")[0].strip() == ""


def test_sql_error_exits_1_with_named_failure(spark, capsys):
    assert cli.main([SF, "--sql", "SELECT nope FROM missing"]) == 1
    err = capsys.readouterr().err
    # Spark's SQLQueryContextLogger also writes the analysis error to
    # stderr ahead of our line — assert containment, not prefix
    assert "SQL error:" in err and "missing" in err


def test_sql_is_standalone(tmp_path):
    with pytest.raises(SystemExit):
        cli.main([
            SF, "--sql", "SELECT 1", "--snapshot-dir", str(tmp_path),
            "--run-id", "r1",
        ])


def test_query_runs_declared_relation(spark, capsys):
    assert cli.main([SF, "--query", "text_stats", "--max-rows", "2"]) == 0
    out = capsys.readouterr().out
    assert "doc_id" in out.splitlines()[0]
    assert "(2 rows)" in out and "truncated" in out


def test_query_unknown_name_hints_nearest(spark, capsys):
    assert cli.main([SF, "--query", "lm_score"]) == 1
    err = capsys.readouterr().err
    assert "Unknown query: lm_score" in err and "text_lm_score" in err


def test_query_runtime_failure_exits_1_one_line(spark, capsys, tmp_path):
    """A declared query failing at runtime (missing table in the data
    root) follows the same stderr + exit-1 contract as --sql, not a
    raw Python traceback."""
    assert cli.main([str(tmp_path), "--query", "text_stats"]) == 1
    err = capsys.readouterr().err
    assert "Query error:" in err
    assert "Traceback" not in err


def test_list_queries_covers_manifest(capsys):
    from overpaint_spark import queries as Q

    assert cli.main(["--list-queries"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == len(Q.QUERIES)
    assert any(line.endswith("[rows-only]") for line in out)
    assert out[0].split()[0] in Q.QUERIES


def test_sql_file_reads_query(spark, capsys, tmp_path):
    p = tmp_path / "q.sql"
    p.write_text("SELECT COUNT(*) AS n FROM region")
    assert cli.main([SF, "--sql-file", str(p)]) == 0
    assert "(1 row)" in capsys.readouterr().out


def test_materialize_parquet_and_jsonl(spark, capsys, tmp_path):
    """--materialize writes the FULL result distributed (no --max-rows
    cap) in either sink format; an existing dir is refused, not
    clobbered."""
    pq = str(tmp_path / "pq")
    assert cli.main([
        SF, "--sql", "SELECT doc_id, lang FROM documents",
        "--materialize", pq, "--max-rows", "3",
    ]) == 0
    assert f"Materialized [parquet] -> {pq}" in capsys.readouterr().out
    assert spark.read.parquet(pq).count() == 500  # cap did not apply
    jl = str(tmp_path / "jl")
    assert cli.main([
        SF, "--query", "text_stats", "--materialize", jl,
        "--materialize-format", "jsonl",
    ]) == 0
    capsys.readouterr()
    assert spark.read.json(jl).count() == 500
    assert cli.main([
        SF, "--query", "text_stats", "--materialize", jl,
        "--materialize-format", "jsonl",
    ]) == 1
    assert "Materialize error:" in capsys.readouterr().err


def test_materialize_requires_a_source(tmp_path):
    with pytest.raises(SystemExit):
        cli.main([SF, "--materialize", str(tmp_path / "x")])
