"""Explicit DB→Spark type-mapping tables for the JDBC sources — the parity
layer for the reference's per-column Arrow mappings
(``src/db/conversion.rs:9-52``).

The reference hand-maps every supported PostgreSQL OID type and MySQL column
type to an Arrow ``DataType`` and panics on anything else
(``conversion.rs`` ``unimplemented!`` arms).  Spark's JDBC dialects infer
types from JDBC metadata, which is usually right but not pinned; these
tables pin the exact reference semantics as a ``customSchema`` option string
so a scan declares the same column types the reference would have produced,
and unknown types fail loudly the same way.

Live MySQL/PostgreSQL execution is environmentally impossible in this
container (no network, no JDBC jars, no servers — NOTES.md); the shared
``read_jdbc`` path is proven via the SQLite flow, and these tables are unit
tested row-by-row against ``conversion.rs``.

Divergences (both documented, both strictly-wider supersets):
- PG ``TIME`` → Arrow ``Time32(Second)`` in the reference; Spark has no
  standalone TIME type, so we pin ``TIMESTAMP`` (the same choice Spark's
  own PostgresDialect makes).
- ``TIMESTAMP`` → Arrow ``Timestamp(Millisecond)`` in the reference; Spark
  timestamps are microsecond-precision (a superset — no values are lost).
"""

from __future__ import annotations

# PostgreSQL wire-protocol types (tokio_postgres::types::Type) → Spark DDL.
# Mirrors ``impl MapArrowType for tokio_postgres::Column``
# (src/db/conversion.rs:10-29) row by row.
PG_TYPE_MAP: dict[str, str] = {
    "BOOL": "BOOLEAN",  # Arrow Boolean
    "INT2": "SMALLINT",  # Arrow Int16
    "INT4": "INT",  # Arrow Int32
    "FLOAT4": "FLOAT",  # Arrow Float32
    "FLOAT8": "DOUBLE",  # Arrow Float64
    "BIT": "BINARY",  # Arrow Binary
    "NUMERIC": "DOUBLE",  # Arrow Float64 (reference flattens decimals)
    "DATE": "DATE",  # Arrow Date32
    "TIME": "TIMESTAMP",  # Arrow Time32(s); Spark has no TIME (see module doc)
    "VARCHAR": "STRING",  # Arrow Utf8
    "TIMESTAMP": "TIMESTAMP",  # Arrow Timestamp(ms); Spark is µs (superset)
}

# MySQL column types (mysql_async::consts::ColumnType) → Spark DDL.
# Mirrors ``impl MapArrowType for mysql_async::Column``
# (src/db/conversion.rs:31-52) row by row.
MYSQL_TYPE_MAP: dict[str, str] = {
    "MYSQL_TYPE_INT24": "INT",  # Arrow Int32
    "MYSQL_TYPE_LONG": "INT",  # Arrow Int32 (MySQL LONG is 32-bit)
    "MYSQL_TYPE_FLOAT": "DOUBLE",  # Arrow Float64 (reference widens)
    "MYSQL_TYPE_NEWDECIMAL": "DOUBLE",  # Arrow Float64
    "MYSQL_TYPE_TIMESTAMP": "TIMESTAMP",  # Arrow Timestamp(ms)
    "MYSQL_TYPE_VARCHAR": "STRING",  # Arrow Utf8
    "MYSQL_TYPE_VAR_STRING": "STRING",  # Arrow Utf8
    "MYSQL_TYPE_BLOB": "STRING",  # Arrow Utf8 (reference reads blobs as text)
}

_SCHEME_MAPS = {
    "postgresql": PG_TYPE_MAP,
    "postgres": PG_TYPE_MAP,
    "mysql": MYSQL_TYPE_MAP,
}


def map_db_type(scheme: str, db_type: str) -> str:
    """One column type → Spark DDL type, or a loud error on unsupported
    types (the reference's ``unimplemented!`` arm, conversion.rs:24,48)."""
    table = _SCHEME_MAPS.get(scheme.lower())
    if table is None:
        raise ValueError(f"no type-mapping table for scheme {scheme!r}")
    spark_type = table.get(db_type.upper())
    if spark_type is None:
        raise ValueError(
            f"data type not supported for column: {db_type!r} "
            f"({scheme} — conversion.rs parity)"
        )
    return spark_type


def custom_schema(scheme: str, columns: dict[str, str]) -> str:
    """Build the Spark JDBC ``customSchema`` option string from
    ``{column_name: db_type}`` so the scan is pinned to the reference's
    exact type semantics instead of dialect inference.

    >>> custom_schema("postgresql", {"id": "INT4", "name": "VARCHAR"})
    'id INT, name STRING'
    """
    return ", ".join(
        f"{name} {map_db_type(scheme, db_type)}"
        for name, db_type in columns.items()
    )
