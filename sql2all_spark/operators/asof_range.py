"""As-of and range/interval joins — operators the reference's SQL engines
mostly lack (SURVEY.md §2.B "range/interval/as-of join"), re-expressed in
scalable Spark plans.

As-of join: the naive formulation is a non-equi join (for each left row,
the greatest right ts strictly below it) whose intermediate blows up as
|left|×|matching right|.  The scalable form used here is the union+window
trick: tag both sides, sort by (key, ts, side) once, and carry the last
non-null right-side payload forward with an unbounded-preceding window —
one shuffle on the key, zero row blowup, identical semantics.

Range join: point-in-interval joins degrade to BroadcastNestedLoop when the
interval side is large.  The scalable form explodes each interval into the
fixed time-grid buckets it covers (days here) and equi-joins on the bucket,
keeping only the BETWEEN residual — shuffle on a uniform grid key instead
of a nested loop.  The interval table here is a literal (campaign windows),
so Spark would broadcast either way; the plan shape is what scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql2all_spark.functions.exact import dsum, dsum_sql
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

# Campaign windows (UTC, end-exclusive) over the events fixture's Jan-2024
# span; c1/c2 overlap to make the interval join non-trivially many-to-many.
CAMPAIGNS: list[tuple[str, str, str]] = [
    ("c1_newyear", "2024-01-02 00:00:00", "2024-01-05 00:00:00"),
    ("c2_promo", "2024-01-04 12:00:00", "2024-01-10 00:00:00"),
    ("c3_flash", "2024-01-10 00:00:00", "2024-01-11 00:00:00"),
    ("c4_retention", "2024-01-15 06:00:00", "2024-01-20 18:00:00"),
    ("c5_cleanup", "2024-01-25 00:00:00", "2024-02-02 00:00:00"),
]


@register(
    "join_asof_attribution",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, MAX(value) AS click_value
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.value AS purchase_value,
       c.ts AS click_ts, c.click_value,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts > c.ts
""",
    doc="As-of join (purchase attribution): each purchase matched to the"
    " same user's most recent strictly-earlier click, via the union+window"
    " trick — two key-local shuffles (click pre-dedup, per-user window),"
    " no non-equi join, no row blowup.  Clicks are pre-deduped per"
    " (user, ts) so the match is deterministic.",
)
def join_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Dedup right side per (user, ts): determinism when a user has two
    # clicks at the same microsecond (possible at large SF).
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select(
            "user_id",
            "ts",
            F.lit(1).alias("side"),  # sorts AFTER same-ts purchases → strict <
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("purchase_value"),
            F.col("ts").alias("click_ts"),
            "click_value",
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        "event_id",
        F.col("value").alias("purchase_value"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(None).cast("double").alias("click_value"),
    )
    # Sort key (ts, side): purchases (side 0) precede clicks at equal ts, so
    # a same-microsecond click is NOT visible to the purchase — strict p > c.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = purchases.unionByName(clicks).select(
        "user_id",
        "ts",
        "side",
        "event_id",
        "purchase_value",
        F.last("click_ts", ignorenulls=True).over(w).alias("asof_click_ts"),
        F.last("click_value", ignorenulls=True).over(w).alias("asof_click_value"),
    )
    return merged.filter(F.col("side") == 0).select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("purchase_value").alias("purchase_value"),
        F.col("asof_click_ts").alias("click_ts"),
        F.col("asof_click_value").alias("click_value"),
        (F.unix_micros("ts") - F.unix_micros("asof_click_ts")).alias("gap_us"),
    )


def _campaign_values_sql() -> str:
    rows = ",\n    ".join(
        f"('{n}', TIMESTAMP '{s}', TIMESTAMP '{e}')" for n, s, e in CAMPAIGNS
    )
    return f"(VALUES\n    {rows}) AS c(campaign, start_ts, end_ts)"


@register(
    "join_range_interval",
    oracle=f"""
SELECT c.campaign,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users,
       {dsum_sql('e.value', 6)} AS total_value
FROM {_campaign_values_sql()}
JOIN events e ON e.ts >= c.start_ts AND e.ts < c.end_ts
GROUP BY c.campaign
""",
    doc="Point-in-interval range join: events attributed to (possibly"
    " overlapping) campaign windows.  Scalable plan: intervals explode onto"
    " a day grid and the join runs as day-bucket equi-join + BETWEEN"
    " residual — a uniform shuffle key instead of a nested loop.",
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    campaigns = spark.createDataFrame(
        [(n, s, e) for n, s, e in CAMPAIGNS],
        "campaign string, start_s string, end_s string",
    ).select(
        "campaign",
        F.to_timestamp("start_s").alias("start_ts"),
        F.to_timestamp("end_s").alias("end_ts"),
    )
    # Day-grid explode: each interval lands on every day it covers.  End is
    # exclusive, but including end's day only adds rows the residual drops.
    grid = campaigns.select(
        "campaign",
        "start_ts",
        "end_ts",
        F.explode(
            F.sequence(
                F.date_trunc("day", "start_ts"),
                F.date_trunc("day", "end_ts"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    joined = ev.join(F.broadcast(grid), "day").filter(
        (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts"))
    )
    return joined.groupBy("campaign").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum(F.col("value"), 6).alias("total_value"),
    )
