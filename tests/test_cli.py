"""CLI parity surface: python -m odbc2parquet_spark <subcommand>."""

import json
import os

import pyarrow.parquet as pq

from odbc2parquet_spark.__main__ import main


def test_cli_query_single_file(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "out.par")
    rc = main(
        [
            "query",
            "--tables-dir", sf_dir,
            out,
            "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
        ]
    )
    assert rc == 0
    written = json.loads(capsys.readouterr().out)["written"]
    assert written == [out] and os.path.isfile(out)
    t = pq.read_table(out)
    assert t.num_rows == 5 and t.column_names == ["r_regionkey", "r_name"]


def test_cli_query_params_and_stdin_flagparity(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "o")
    rc = main(
        [
            "query",
            "--tables-dir", sf_dir,
            "--column-compression-default", "snappy",
            "--sequential-fetching",  # parity no-op
            out,
            "SELECT n_nationkey FROM nation WHERE n_regionkey = ?",
            "2",
        ]
    )
    assert rc == 0
    produced = json.loads(capsys.readouterr().out)["written"]
    assert produced == [out]
    assert spark.read.parquet(out).count() == 5


def test_cli_exec_via_sqlite(spark, sf_dir, tmp_path, capsys):
    import sqlite3

    src = str(tmp_path / "in")
    spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]).coalesce(1).write.parquet(src)
    db = str(tmp_path / "t.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE target (k INTEGER, v TEXT)")
    rc = main(
        ["exec", "--dbapi", "sqlite3", "--dbapi-connect", db,
         src, "INSERT INTO target (k, v) VALUES (?k?, ?v?)"]
    )
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["rows"] == 2
    with sqlite3.connect(db) as c:
        assert sorted(c.execute("SELECT k, v FROM target").fetchall()) == [(1, "a"), (2, "b")]


def test_cli_list_drivers(spark, capsys):
    assert main(["list-drivers"]) == 0
    assert isinstance(json.loads(capsys.readouterr().out), list)


def test_cli_avoid_decimal_remaps_output_types(spark, sf_dir, tmp_path, capsys):
    # mirror of the reference's decimal CLI cluster (tests/integration.rs
    # decimal cases): --avoid-decimal turns scale-0 decimals into integers
    # and scaled decimals into exact decimal text
    out = str(tmp_path / "dec.par")
    rc = main(
        [
            "query",
            "--tables-dir", sf_dir,
            "--avoid-decimal",
            out,
            "SELECT CAST(o_orderkey AS DECIMAL(15,0)) AS key_dec, "
            "       CAST(o_totalprice AS DECIMAL(12,2)) AS price_dec "
            "FROM orders WHERE o_orderkey <= 10",
        ]
    )
    assert rc == 0
    t = pq.read_table(json.loads(capsys.readouterr().out)["written"][0])
    assert t.schema.field("key_dec").type == "int64"
    assert t.schema.field("price_dec").type == "string"
    # exact decimal rendering, not float repr
    assert "." in t.column("price_dec")[0].as_py()


def test_cli_column_length_limit_errors(spark, sf_dir, tmp_path):
    import pytest

    out = str(tmp_path / "lim.par")
    with pytest.raises(Exception, match="maximum element length"):
        main(
            [
                "query",
                "--tables-dir", sf_dir,
                "--column-length-limit", "3",
                out,
                "SELECT r_name FROM region",
            ]
        )


def test_cli_column_length_limit_truncate_opt_in(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "trunc.par")
    rc = main(
        [
            "query",
            "--tables-dir", sf_dir,
            "--column-length-limit", "3",
            "--length-limit-action", "truncate",
            out,
            "SELECT r_name FROM region ORDER BY r_regionkey",
        ]
    )
    assert rc == 0
    t = pq.read_table(json.loads(capsys.readouterr().out)["written"][0])
    assert all(len(v.as_py()) <= 3 for v in t.column("r_name"))


def test_cli_completions_scripts(capsys):
    rc = main(["completions", "bash"])
    assert rc == 0
    bash = capsys.readouterr().out
    assert "complete -F _odbc2parquet_spark" in bash
    assert "--avoid-decimal" in bash and "query" in bash
    rc = main(["completions", "zsh"])
    assert rc == 0
    zsh = capsys.readouterr().out
    assert zsh.startswith("#compdef") and "--column-length-limit" in zsh


def test_cli_completions_all_clap_shells(capsys):
    """Reference emits clap completions for every shell
    (src/main.rs:363-367); fish/powershell/elvish join bash/zsh."""
    rc = main(["completions", "fish"])
    assert rc == 0
    fish = capsys.readouterr().out
    assert "__fish_use_subcommand' -a query" in fish
    assert "__fish_seen_subcommand_from query' -l avoid-decimal" in fish

    rc = main(["completions", "powershell"])
    assert rc == 0
    ps = capsys.readouterr().out
    assert ps.startswith("Register-ArgumentCompleter")
    assert "'--column-compression-level-default'" in ps

    rc = main(["completions", "elvish"])
    assert rc == 0
    elv = capsys.readouterr().out
    assert elv.startswith("set edit:completion:arg-completer")
    assert "--single-file" in elv


def test_cli_verbosity_maps_to_log_levels():
    """-q / -v / -vv / -vvv parity (reference src/main.rs:29-44): counts
    map onto log4j levels, quiet wins, excess -v caps at DEBUG."""
    from odbc2parquet_spark.__main__ import log_level_for

    assert log_level_for(0, False) == "ERROR"
    assert log_level_for(1, False) == "WARN"
    assert log_level_for(2, False) == "INFO"
    assert log_level_for(3, False) == "DEBUG"
    assert log_level_for(9, False) == "DEBUG"
    assert log_level_for(2, True) == "OFF"


def test_cli_global_flags_accepted(spark, sf_dir, tmp_path, capsys):
    """-v/-q/--no-color parse before the subcommand and the query still
    runs (flag placement parity with the reference's global clap args)."""
    out = str(tmp_path / "v.par")
    rc = main(
        ["-v", "--no-color", "query", "--tables-dir", sf_dir, "--single-file",
         out, "SELECT r_regionkey FROM region"]
    )
    assert rc == 0
    assert pq.read_table(out).num_rows == 5
    spark.sparkContext.setLogLevel("ERROR")  # restore for other tests


def test_cli_query_stdout_stream(spark, sf_dir, tmp_path):
    # A8: out='-' streams one parquet file to stdout (pipeable)
    import io
    import sys

    import pyarrow as pa

    buf = io.BytesIO()

    class _Cap:
        buffer = buf

        def write(self, s):
            pass

        def flush(self):
            pass

    old = sys.stdout
    sys.stdout = _Cap()
    try:
        rc = main(
            [
                "query",
                "--tables-dir", sf_dir,
                "-",
                "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
            ]
        )
    finally:
        sys.stdout = old
    assert rc == 0
    t = pq.read_table(pa.BufferReader(buf.getvalue()))
    assert t.num_rows == 5 and t.column_names == ["r_regionkey", "r_name"]


def test_cli_dsn_conflicts_with_jdbc_url(tmp_path):
    """The reference's conflict rule (src/connection.rs:11-22): dsn and
    connection string are mutually exclusive — before any connection or
    Spark work happens."""
    import pytest

    with pytest.raises(SystemExit, match="may not be specified both"):
        main(
            ["query", "--dsn", "x", "--jdbc-url", "jdbc:derby:memory:y",
             "out.par", "SELECT 1"]
        )


def test_cli_dsn_unknown_is_actionable(tmp_path, monkeypatch):
    """An unresolvable DSN errors with the file consulted, the aliases
    it defines, and how to register the missing one."""
    import pytest

    alias = tmp_path / "dsn.json"
    alias.write_text('{"warehouse": {"url": "jdbc:derby:memory:wh"}}')
    monkeypatch.setenv("ODBC2PARQUET_SPARK_DSN_FILE", str(alias))
    with pytest.raises(SystemExit) as exc:
        main(["query", "--dsn", "nope", "out.par", "SELECT 1"])
    msg = str(exc.value)
    assert "nope" in msg and str(alias) in msg and "warehouse" in msg


def test_cli_dsn_resolution_and_credentials(tmp_path, monkeypatch):
    """Alias resolution fills jdbc_url + stored credentials; explicit
    --user overrides the alias default (reference: user/password ride
    alongside dsn)."""
    import argparse

    from odbc2parquet_spark.__main__ import _resolve_connection

    alias = tmp_path / "dsn.json"
    alias.write_text(
        '{"wh": {"url": "jdbc:derby:memory:wh", "user": "etl", "password": "s3"},'
        ' "short": "jdbc:derby:memory:short"}'
    )
    monkeypatch.setenv("ODBC2PARQUET_SPARK_DSN_FILE", str(alias))
    ns = argparse.Namespace(dsn="wh", jdbc_url=None, user=None, password=None)
    _resolve_connection(ns)
    assert (ns.jdbc_url, ns.user, ns.password) == ("jdbc:derby:memory:wh", "etl", "s3")
    ns = argparse.Namespace(dsn="wh", jdbc_url=None, user="override", password=None)
    _resolve_connection(ns)
    assert (ns.user, ns.password) == ("override", "s3")
    ns = argparse.Namespace(dsn="short", jdbc_url=None, user=None, password=None)
    _resolve_connection(ns)
    assert ns.jdbc_url == "jdbc:derby:memory:short" and ns.user is None


def test_cli_list_data_sources_includes_dsn_aliases(spark, tmp_path, monkeypatch, capsys):
    alias = tmp_path / "dsn.json"
    alias.write_text('{"wh": {"url": "jdbc:derby:memory:wh"}}')
    monkeypatch.setenv("ODBC2PARQUET_SPARK_DSN_FILE", str(alias))
    assert main(["list-data-sources"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert {"name": "wh", "type": "DSN", "url": "jdbc:derby:memory:wh"} in rows


def test_cli_prompt_parity_errors(tmp_path):
    """--prompt mirrors the reference's conflict rule (conflicts_with dsn,
    connection.rs:11-14) and errors actionably on this platform, exactly
    as the reference does off-Windows."""
    import pytest

    with pytest.raises(SystemExit, match="may not be combined with --dsn"):
        main(["query", "--prompt", "--dsn", "x", "out.par", "SELECT 1"])
    with pytest.raises(SystemExit, match="--dsn NAME .* or --jdbc-url"):
        main(["query", "--prompt", "out.par", "SELECT 1"])


def test_cli_batch_size_memory_si_units(spark, sf_dir, tmp_path, capsys):
    """--batch-size-memory takes the reference's SI-unit strings
    (main.rs:97-105) and, when given alone, drops the 65,535-row default
    (main.rs:86-91): with a tiny memory cap each batch holds few rows, so
    splitting by row groups produces multiple files."""
    out = str(tmp_path / "o.par")
    rc = main(
        [
            "query",
            "--tables-dir", sf_dir,
            "--batch-size-memory", "16KiB",
            "--row-groups-per-file", "1",
            out,
            "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
        ]
    )
    assert rc == 0
    written = json.loads(capsys.readouterr().out)["written"]
    # 5 rows at ~4 KiB estimated bytes/row -> ~3 rows per batch -> >1 file;
    # the memory-only path must NOT clamp to the 65,535-row default
    assert len(written) > 1
    total = sum(pq.read_table(p).num_rows for p in written)
    assert total == 5
