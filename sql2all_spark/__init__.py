"""sql2all_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference SQL2ALL tool.

The reference (read-only at /root/reference) is a Rust CLI that forwards a SQL
string verbatim to SQLite/MySQL/PostgreSQL and streams the result cursor out to
Parquet/CSV/NDJSON (see ``src/lib.rs:92-141``, ``src/main.rs:10-31``).  Its
capability surface is therefore (full SQL dialect of the attached engine) ×
(multi-format streamed export).  This package supplies that surface natively on
Spark:

- :mod:`sql2all_spark.session`   — tuned SparkSession factory
- :mod:`sql2all_spark.tables`    — testdata catalog (parquet star schema)
- :mod:`sql2all_spark.sources`   — URL-scheme source dispatch (reference
  ``src/lib.rs:47-65``) over JDBC/file readers
- :mod:`sql2all_spark.sinks`     — extension→format sink dispatch (reference
  ``src/lib.rs:76-90``) over ``df.write``
- :mod:`sql2all_spark.operators` — the relational operator library (the SQL
  surface the reference delegates, re-expressed as DataFrame builders) plus the
  LLM-data-pipeline extension (dedup, similarity search, text analysis)
- :mod:`sql2all_spark.streaming` — Structured Streaming slice over ``events``
- :mod:`sql2all_spark.registry`  — name → (builder, oracle SQL) registry that
  backs ``__spark_entry__.py``
"""

from sql2all_spark.export import export
from sql2all_spark.session import get_spark

__all__ = ["get_spark", "export"]
__version__ = "0.1.0"
