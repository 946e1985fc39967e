"""Catalog listing — analogue of ``list-drivers`` / ``list-data-sources``
(reference src/main.rs:341-362 enumerates ODBC drivers and DSNs).

In Spark the corresponding enumerables are registered data-source formats
("drivers") and catalogs/databases/tables ("data sources").
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: formats guaranteed by Spark itself; extension formats (delta, iceberg)
#: appear only when their jars are on the classpath.
BUILTIN_FORMATS = (
    "parquet",
    "orc",
    "json",
    "csv",
    "text",
    "avro",
    "jdbc",
    "binaryFile",
)


def list_drivers(spark: SparkSession) -> list[dict]:
    """Known data-source formats with availability probed on the live
    session (the reference prints driver name + attributes)."""
    out = []
    for fmt in BUILTIN_FORMATS:
        try:
            spark.read.format(fmt)
            available = True
        except Exception:  # pragma: no cover - format lookup rarely fails
            available = False
        out.append({"driver": fmt, "available": available})
    return out


def list_data_sources(spark: SparkSession) -> list[dict]:
    """Catalogs, databases and tables visible to this session, plus the
    DSN aliases the ``--dsn`` flag would resolve (the reference lists
    ODBC DSNs: name + driver + attributes, src/main.rs:352-362)."""
    out = []
    for db in spark.catalog.listDatabases():
        for t in spark.catalog.listTables(db.name):
            out.append(
                {
                    "database": db.name,
                    "name": t.name,
                    "type": t.tableType,
                    "is_temporary": t.isTemporary,
                }
            )
    from odbc2parquet_spark.sources.dsn import load_dsn_registry

    for name, entry in sorted(load_dsn_registry().items()):
        out.append({"name": name, "type": "DSN", "url": entry["url"]})
    return out
