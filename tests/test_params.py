"""Named-placeholder parser (reference src/execute.rs:64-109 semantics)."""

import pytest

from odbc2parquet_spark.params import PlaceholderError, quote_identifier, to_positional


def test_basic_rewrite():
    stmt, names = to_positional("INSERT INTO t (a, b) VALUES (?a?, ?b?)")
    assert stmt == "INSERT INTO t (a, b) VALUES (?, ?)"
    assert names == ["a", "b"]


def test_column_bound_multiple_times():
    # reference tests/integration.rs:3882: same column feeds two params
    stmt, names = to_positional("UPDATE t SET x = ?a?, y = ?a?")
    assert stmt == "UPDATE t SET x = ?, y = ?"
    assert names == ["a", "a"]


def test_escaped_question_mark():
    stmt, names = to_positional(r"SELECT 'what\?' , ?col?")
    assert stmt == "SELECT 'what?' , ?"
    assert names == ["col"]


def test_escaped_backslash_and_inside_placeholder():
    stmt, names = to_positional(r"VALUES (?we\?ird?)")
    assert names == ["we?ird"]
    assert stmt == "VALUES (?)"


def test_no_placeholders_passthrough():
    stmt, names = to_positional("DELETE FROM t")
    assert stmt == "DELETE FROM t"
    assert names == []


def test_unterminated_placeholder_errors():
    with pytest.raises(PlaceholderError):
        to_positional("SELECT ?oops")


def test_dangling_escape_errors():
    with pytest.raises(PlaceholderError):
        to_positional("bad \\")


def test_quote_identifier_escapes_backticks():
    assert quote_identifier("we`ird", style="backtick") == "`we``ird`"
    assert quote_identifier('we"ird') == '"we""ird"'
    assert quote_identifier("plain") == '"plain"' 
