"""Batch twins of the streaming queries (oracle-checked).

Each function here computes, in batch, exactly what the corresponding
streaming job in :mod:`sql2all_spark.streaming.jobs` converges to after all
input is processed (append mode, watermark expired).  The driver's DuckDB
oracle checks the twin; the pytest streaming tests check stream ≡ twin.
That decomposition makes streaming correctness testable without wall-clock
timing games.

Window-start arithmetic: Spark's ``F.window`` aligns tumbling windows to the
epoch; the oracle reproduces it as ``epoch_us // window_us * window_us``
(integer floor division — all timestamps are post-1970).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.functions.exact import (
    dsum,
    dsum_sql,
    floor_div_duck_sql,
    floor_div_sql,
)
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

FIVE_MIN_US = 5 * 60 * 1_000_000
HOUR_US = 60 * 60 * 1_000_000
SESSION_GAP_MIN = 30


@register(
    "stream_tumbling_window",
    oracle=f"""
SELECT make_timestamp(({floor_div_duck_sql('epoch_us(ts)', HOUR_US)}) * {HOUR_US}) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {dsum_sql('value')} AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling 1-hour window aggregation per event_type — the batch twin"
    " of the watermarked streaming job (streaming/jobs.py:tumbling_counts)."
    " In streaming, state per (window,type) is emitted once the watermark"
    " passes window end; the twin is the converged result.",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
    )


@register(
    "stream_sliding_window",
    oracle=f"""
WITH slid AS (
  SELECT e.*,
         make_timestamp(({floor_div_duck_sql(f'epoch_us(ts) - k.off * {FIVE_MIN_US}', 2 * FIVE_MIN_US)})
                        * {2 * FIVE_MIN_US} + k.off * {FIVE_MIN_US}) AS window_start
  FROM events e
  CROSS JOIN (SELECT UNNEST([0, 1]) AS off) k
)
SELECT window_start, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM slid
GROUP BY window_start
""",
    doc="Sliding window (10 min length, 5 min slide): every event lands in 2"
    " overlapping windows.  Spark's F.window handles the fan-out natively;"
    " the oracle reproduces it with an explicit 2-offset expansion.",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").start.alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "stream_session_window",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > {SESSION_GAP_MIN} * 60 * 1000000
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS is_new_session
  FROM events
),
sessions AS (
  -- event_id tiebreak keeps this cumulative sum's ordering identical to the
  -- is_new_session window above: with ORDER BY ts alone, two same-timestamp
  -- events at a session boundary make session assignment nondeterministic
  SELECT user_id, ts, value,
         SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
       COUNT(*) AS n_events,
       {dsum_sql('value')} AS session_value
FROM sessions
GROUP BY user_id, session_id
""",
    doc="Session windows (30-min inactivity gap) per user via"
    " F.session_window — gap-merged state in streaming.  Oracle rebuilds"
    " sessions with the classic lag→flag→cumsum→group rewrite; Spark's"
    " session end = last event + gap, reproduced as MAX(ts)+gap.",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", f"{SESSION_GAP_MIN} minutes")
    return (
        e.groupBy("user_id", sw)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@register(
    "stream_dedup_watermark",
    oracle=f"""
WITH keyed AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type,
                               ({floor_div_duck_sql('epoch_us(ts)', 60000000)})
                               ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_id, user_id, event_type, ts
FROM keyed WHERE rn = 1
""",
    doc="Streaming dedup twin: first event per (user, type, minute) — what"
    " dropDuplicatesWithinWatermark converges to for a 1-minute dedup key."
    " The streaming version holds keys in state only until the watermark"
    " passes; the twin is its complete-input fixpoint.",
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    minute = F.expr(floor_div_sql("unix_micros(ts)", 60000000))
    w = (
        Window.partitionBy("user_id", "event_type", minute.alias("m"))
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )
