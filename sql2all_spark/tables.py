"""Testdata catalog: the ten parquet tables under /root/testdata/sf*/.

The reference has no catalog at all — schema is inferred per query from driver
column metadata (``src/db/sqlite.rs:58-65`` etc.).  Spark's parquet footer
inference is the direct analogue; this module just centralizes paths and view
registration so every operator builder and the SQL surface share one loader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to a TIMESTAMP (LTZ) UTC instant.

    The testdata has shipped two encodings of ``events.ts``:

    - INT64 TIMESTAMP(NANOS): read as raw ``bigint`` nanos under
      ``spark.sql.legacy.parquet.nanosAsLong`` → truncate to micros with
      integer division, the same truncation DuckDB applies casting
      TIMESTAMP_NS → TIMESTAMP.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as TIMESTAMP_NTZ,
      which ``unix_micros()``/watermarks reject.  Pin the wall-clock as a
      UTC instant.  NOTE: ``to_utc_timestamp(ntz, 'UTC')`` is NOT
      session-timezone independent — Spark first casts NTZ→TIMESTAMP via
      the session timezone, then the 'UTC' shift is a no-op, so the
      instant drifts with the session tz.  Instead shift the NTZ
      wall-clock from UTC into the session's zone with
      ``convert_timezone`` and *then* cast: the two session-tz
      dependencies cancel, giving the same unix_micros under any session
      timezone (the value DuckDB sees reading the file as naive
      TIMESTAMP).

    Shared by :func:`load_table` and ``streaming.jobs.events_stream`` so
    the batch and streaming read paths can never diverge.
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_type == "timestamp_ntz":
        return df.withColumn(
            "ts",
            F.expr(
                "cast(convert_timezone('UTC', current_timezone(), ts) as timestamp)"
            ),
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    if name == "events":
        # events.ts is INT64 TIMESTAMP(NANOS), which the parquet reader
        # rejects outright; the conf is runtime-settable, so set it here so
        # every builder works even on a session we didn't configure (the
        # driver hands us its own session in the queries() contract)
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works alongside
    the DataFrame builders (both paths must exist: reference users write SQL)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
