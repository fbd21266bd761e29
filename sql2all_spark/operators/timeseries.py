"""Time-series rollup hierarchy — the hypertable / continuous-aggregate
pattern: pre-aggregate at the finest granularity once, then derive every
coarser granularity from the NEXT-FINER aggregate, never from raw data.

At 100 TB of events this is the difference between one scan per dashboard
granularity and one scan total: minute rows are ~1/sec-rate of raw, hour
rows ~1/60 of that — each rollup step processes orders of magnitude fewer
rows.  Correctness requires compose-able aggregates: COUNT and decimal SUM
compose exactly (sum-of-sums); AVG is derived at read time from (sum,
count); exact percentiles do NOT compose and would need sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.functions.exact import floor_div_duck_sql, floor_div_sql
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table


@register(
    "ts_rollup_hierarchy",
    oracle="""
SELECT date_trunc('day', ts) AS day,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
FROM events
GROUP BY 1, 2
""",
    doc="Day-level aggregate computed minute→hour→day: each level rolls up"
    " the previous one (sum-of-sums over decimal — exact and associative,"
    " so the staged result equals the direct day aggregate, which is what"
    " the oracle computes).  avg derives from (sum, count) at the final"
    " level only — averages never compose.",
)
def ts_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # level 0 → 1: raw → minute (the only pass over raw data)
    minute = (
        e.groupBy(
            F.date_trunc("minute", "ts").alias("minute"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
    )
    # level 1 → 2: minute → hour (decimal sums compose exactly)
    hour = (
        minute.groupBy(
            F.date_trunc("hour", "minute").alias("hour"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
    )
    # level 2 → 3: hour → day; derive avg from (sum, count) here only
    return (
        hour.groupBy(
            F.date_trunc("day", "hour").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
        .select(
            "day",
            "event_type",
            "n_events",
            F.col("sum_value").cast("double").alias("total_value"),
            (F.col("sum_value").cast("double") / F.col("n_events")).alias(
                "avg_value"
            ),
        )
    )


@register(
    "ts_gap_fill",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
  FROM events
),
grid AS (
  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
),
actual AS (
  SELECT date_trunc('day', ts) AS day, COUNT(*) AS n_events
  FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT g.day, COALESCE(a.n_events, 0) AS n_events,
       CASE WHEN a.day IS NULL THEN 1 ELSE 0 END AS gap_filled
FROM grid g LEFT JOIN actual a ON g.day = a.day
""",
    doc="Gap filling: a generated day spine left-joined to the actual"
    " per-day aggregate, zero-filling missing days — the time-series"
    " completeness operator dashboards need (missing ≠ zero only if you"
    " make it so).  The spine generates from MIN/MAX bounds (two scalar"
    " aggregates, broadcast), so no driver-side date math.",
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    actual = (
        e.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return grid.join(actual, "day", "left").select(
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.when(F.col("n_events").isNull(), 1).otherwise(0).alias("gap_filled"),
    )


@register(
    "ts_funnel_conversion",
    oracle="""
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
)
SELECT
  COUNT(*) AS n_users,
  CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS stage_signup,
  CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
           THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
  CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
            AND t_purchase > t_click
           THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
FROM stages
""",
    doc="Funnel conversion (signup → first later click → first later"
    " purchase): per-user stage timestamps via conditional MIN in ONE"
    " aggregation pass, then ordered-progression counts.  No sequence"
    " scan, no self-joins — the single-shuffle funnel shape that holds at"
    " any event volume.  (First-touch approximation: stage k must follow"
    " the FIRST stage k-1 event — the standard funnel simplification.)",
)
def ts_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    t_of = lambda typ: F.min(  # noqa: E731
        F.when(F.col("event_type") == typ, F.col("ts"))
    )
    stages = e.groupBy("user_id").agg(
        t_of("signup").alias("t_signup"),
        t_of("click").alias("t_click"),
        t_of("purchase").alias("t_purchase"),
    )
    reached_signup = F.col("t_signup").isNotNull()
    reached_click = reached_signup & (F.col("t_click") > F.col("t_signup"))
    reached_purchase = reached_click & (F.col("t_purchase") > F.col("t_click"))
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        flag(reached_signup).alias("stage_signup"),
        flag(reached_click).alias("stage_click"),
        flag(reached_purchase).alias("stage_purchase"),
    )


DECIMATE_BUCKET_US = 15 * 60 * 1_000_000  # 15-minute buckets


@register(
    "ts_minmax_decimate",
    oracle=f"""
WITH bucketed AS (
  SELECT event_id, ts, value,
         make_timestamp(({floor_div_duck_sql('epoch_us(ts)', DECIMATE_BUCKET_US)})
                        * {DECIMATE_BUCKET_US}) AS bucket_start,
         ROW_NUMBER() OVER (
           PARTITION BY {floor_div_duck_sql('epoch_us(ts)', DECIMATE_BUCKET_US)}
           ORDER BY value ASC,  ts ASC, event_id ASC) AS rn_min,
         ROW_NUMBER() OVER (
           PARTITION BY {floor_div_duck_sql('epoch_us(ts)', DECIMATE_BUCKET_US)}
           ORDER BY value DESC, ts ASC, event_id ASC) AS rn_max
  FROM events
)
SELECT bucket_start, kind, ts, value, event_id
FROM (
  SELECT bucket_start, 'min' AS kind, ts, value, event_id
  FROM bucketed WHERE rn_min = 1
  UNION ALL
  SELECT bucket_start, 'max' AS kind, ts, value, event_id
  FROM bucketed WHERE rn_max = 1
)
""",
    doc="Min/max envelope decimation (15-min buckets): keep exactly the"
    " extreme points per bucket — the downsampling monitoring systems use"
    " because it preserves spikes that averaging erases.  One shuffle on"
    " the bucket key computes both ranks in a single window pass;"
    " deterministic (ts, event_id) tiebreaks.  A single-point bucket"
    " yields the same event as both its min and max row, by design.",
)
def ts_minmax_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    bucket_us = F.expr(floor_div_sql("unix_micros(ts)", DECIMATE_BUCKET_US))
    b = e.select(
        "event_id",
        "ts",
        "value",
        F.expr(
            f"timestamp_micros(({floor_div_sql('unix_micros(ts)', DECIMATE_BUCKET_US)})"
            f" * {DECIMATE_BUCKET_US})"
        ).alias("bucket_start"),
        bucket_us.alias("bucket_key"),
    )
    w_min = Window.partitionBy("bucket_key").orderBy(
        F.col("value").asc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    w_max = Window.partitionBy("bucket_key").orderBy(
        F.col("value").desc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    ranked = b.withColumn("rn_min", F.row_number().over(w_min)).withColumn(
        "rn_max", F.row_number().over(w_max)
    )
    mins = ranked.filter(F.col("rn_min") == 1).select(
        "bucket_start", F.lit("min").alias("kind"), "ts", "value", "event_id"
    )
    maxs = ranked.filter(F.col("rn_max") == 1).select(
        "bucket_start", F.lit("max").alias("kind"), "ts", "value", "event_id"
    )
    return mins.unionByName(maxs)


ZSCORE_LOOKBACK = 10  # trailing window (rows), excludes the current row
ZSCORE_MIN_N = 5  # need this many trailing points before scoring
ZSCORE_FLAG = 3.0  # |z| above this ⇒ anomaly


@register(
    "ts_anomaly_zscore",
    oracle=f"""
WITH w AS (
  SELECT user_id, event_id, ts, value,
         COUNT(value) OVER win AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER win AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
              OVER win AS DOUBLE) AS s2
  FROM events
  WINDOW win AS (
    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
    ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT user_id, event_id, ts, value, n,
         ROUND((value - s1 / n)
               / SQRT((s2 - s1 * s1 / n) / (n - 1) + 1e-9), 6) AS z
  FROM w WHERE n >= {ZSCORE_MIN_N}
)
SELECT user_id, event_id, ts, value, n, z,
       CASE WHEN ABS(z) > {ZSCORE_FLAG} THEN 1 ELSE 0 END AS is_anomaly
FROM scored
""",
    doc=f"Rolling z-score anomaly detection: each event scored against the"
    f" trailing {ZSCORE_LOOKBACK} events of its own user stream (current"
    " row excluded — no self-contamination).  Engine-deterministic on"
    " purpose: the trailing mean/std come from EXACT decimal window sums"
    " (s1, s2 moments), never from avg/stddev over doubles, whose sliding-"
    "window accumulation order differs per engine (DuckDB segment trees vs"
    " Spark running frames).  One shuffle on user_id; state per frame is"
    " O(lookback).  The epsilon guards zero-variance windows.",
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-ZSCORE_LOOKBACK, -1)
    )
    dec = F.col("value").cast("decimal(18,2)")
    w = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.count("value").over(win).alias("n"),
        F.sum(dec).over(win).cast("double").alias("s1"),
        F.sum(dec * dec).over(win).cast("double").alias("s2"),
    ).filter(F.col("n") >= ZSCORE_MIN_N)
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    z = F.round(
        (F.col("value") - s1 / n)
        / F.sqrt((s2 - s1 * s1 / n) / (n - 1) + F.lit(1e-9)),
        6,
    )
    return w.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        "n",
        z.alias("z"),
        F.when(F.abs(z) > ZSCORE_FLAG, 1).otherwise(0).alias("is_anomaly"),
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity ends a session


@register(
    "ts_sessionize",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events
),
l AS (
  SELECT *, LAG(us) OVER (
    PARTITION BY user_id ORDER BY us ASC, event_id ASC) AS prev
  FROM e
),
s AS (
  SELECT *, CASE WHEN prev IS NULL OR us - prev > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS is_new
  FROM l
),
x AS (
  SELECT *, SUM(is_new) OVER (
    PARTITION BY user_id ORDER BY us ASC, event_id ASC
    ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM s
)
SELECT user_id,
       CAST(session_idx AS INT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(us) AS BIGINT) AS start_us,
       CAST(MAX(us) AS BIGINT) AS end_us,
       CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS duration_sec,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM x
GROUP BY user_id, session_idx
ORDER BY user_id ASC NULLS FIRST, session_idx ASC NULLS FIRST
""",
    doc="Batch sessionization — the gaps-and-islands pattern: per user, a"
    " new session starts after 30 minutes of inactivity (lag + running"
    " sum of session starts), then one row per session with bounds,"
    " duration, and exact decimal value totals.  The batch twin of"
    " stream_session_window's session windows.  Scale shape: ONE shuffle"
    " on user_id serves both window passes and the final rollup"
    " (sessions of one user are in one partition by construction);"
    " deterministic (ts, event_id) ordering; epoch-microsecond integers"
    " end-to-end, so bounds and durations are exact in both engines.",
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("us").asc(), F.col("event_id").asc()
    )
    s = e.withColumn(
        "is_new",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_idx",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        s.groupBy("user_id", F.col("session_idx").cast("int").alias("session_idx"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("us").cast("long").alias("start_us"),
            F.max("us").cast("long").alias("end_us"),
            F.expr("CAST((MAX(us) - MIN(us)) div 1000000 AS BIGINT)").alias(
                "duration_sec"
            ),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy(
            F.col("user_id").asc_nulls_first(),
            F.col("session_idx").asc_nulls_first(),
        )
    )
