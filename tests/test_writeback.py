"""Write-back path: parquet -> bulk INSERT / exec (reference insert.rs,
execute.rs, input.rs) against a real DBAPI target (sqlite)."""

import datetime
import decimal
import sqlite3

import pytest
from pyspark.sql import types as T

from odbc2parquet_spark.params import PlaceholderError
from odbc2parquet_spark.sinks.writeback import (
    UnsupportedInsertType,
    execute_parquet,
    generate_insert_statement,
    insert_parquet,
    validate_insertable_schema,
)


@pytest.fixture()
def typed_parquet(spark, tmp_path):
    """Fixture shaped like FIXTURES.md F11: one column per insertable type."""
    schema = T.StructType(
        [
            T.StructField("b", T.BooleanType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("l", T.LongType()),
            T.StructField("f", T.DoubleType()),
            T.StructField("d", T.DecimalType(10, 2)),
            T.StructField("s", T.StringType()),
            T.StructField("dt", T.DateType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("raw", T.BinaryType()),
        ]
    )
    rows = [
        (
            True,
            42,
            10**12,
            1.5,
            decimal.Decimal("9.99"),
            "Hello",
            datetime.date(2020, 9, 9),
            datetime.datetime(2020, 9, 16, 3, 54, 12),
            b"\x01\x02",
        ),
        (False, -1, -(10**12), -2.5, decimal.Decimal("-1.50"), None, None, None, None),
    ]
    path = str(tmp_path / "typed.parquet")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)
    return path


def _sqlite_factory(db_path):
    def factory():
        return sqlite3.connect(db_path, timeout=60)

    return factory


def test_insert_roundtrip(spark, tmp_path, typed_parquet):
    db = str(tmp_path / "t.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE tgt (b, i, l, f, d, s, dt, ts, raw)")
    con.commit()
    con.close()

    n = insert_parquet(spark, typed_parquet, "tgt", connection_factory=_sqlite_factory(db))
    assert n == 2
    con = sqlite3.connect(db)
    rows = con.execute("SELECT b, i, l, f, d, s, dt, ts, raw FROM tgt ORDER BY i DESC").fetchall()
    con.close()
    assert rows[0] == (
        1,
        42,
        10**12,
        1.5,
        "9.99",  # decimals travel as decimal text (input.rs:795-823)
        "Hello",
        "2020-09-09",
        "2020-09-16 03:54:12.000000",
        b"\x01\x02",
    )
    assert rows[1][5] is None and rows[1][6] is None  # NULLs pass through


def test_exec_named_placeholders(spark, tmp_path, typed_parquet):
    db = str(tmp_path / "e.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE log (msg, num, num_again)")
    con.commit()
    con.close()

    # switched order + same column bound twice (tests/integration.rs:3842,3882)
    n = execute_parquet(
        spark,
        typed_parquet,
        "INSERT INTO log (msg, num, num_again) VALUES (?s?, ?i?, ?i?)",
        connection_factory=_sqlite_factory(db),
    )
    assert n == 2
    con = sqlite3.connect(db)
    rows = con.execute("SELECT msg, num, num_again FROM log ORDER BY num DESC").fetchall()
    con.close()
    assert rows[0] == ("Hello", 42, 42)


def test_exec_unknown_placeholder_errors(spark, typed_parquet):
    with pytest.raises(PlaceholderError, match="nope"):
        execute_parquet(
            spark, typed_parquet, "INSERT INTO x VALUES (?nope?)", connection_factory=lambda: None
        )


def test_non_primitive_rejected():
    # input.rs:187-193: "only able to insert primitive types"
    schema = T.StructType([T.StructField("arr", T.ArrayType(T.IntegerType()))])
    with pytest.raises(UnsupportedInsertType, match="primitive"):
        validate_insertable_schema(schema)


def test_generated_statement_quotes_identifiers():
    stmt = generate_insert_statement("ta`ble", ["a", "b c"])
    assert stmt == "INSERT INTO `ta``ble` (`a`, `b c`) VALUES (?, ?)"
