"""Cohort retention analysis over the events table.

The analytics companion of ``ts_sessionize``: group users into daily
cohorts by their FIRST event, then report, for every (cohort, day
offset) cell, how many of the cohort's users were still active — the
retention matrix every product/engagement dashboard is built on, and in
LLM-pipeline terms the freshness/engagement weighting input for
user-generated training corpora.

Scale shape: first-event extraction is one partial-aggregatable
``min`` per user; activity collapses to DISTINCT (user, day) BEFORE
joining cohorts (the corpus-sized exchange carries two integers per
active user-day, never events); cohort sizes are a bounded aggregate
(one row per day) attached as a broadcast; the matrix itself is a
partial-agg count over (cohort_day, offset) — at 100 TB of events this
is two slim keyed exchanges on user_id and nothing else.

Determinism: days are integer epoch-microsecond divisions (no session
timezone anywhere), retention is integer permille arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.functions.exact import floor_div_duck_sql, floor_div_sql
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

DAY_US = 24 * 3600 * 1_000_000


def user_day_pairs(events: DataFrame) -> DataFrame:
    """(user_id, day) projection with the shared floor-division day key.

    The retention state IS the distinct set of these pairs (plus nothing
    else): first-event extraction, cohort sizes, and every matrix cell
    derive from it.  Exposed so the streaming leg folds arriving batches
    into the same representation (streaming/jobs.py:retention_stream)."""
    return events.select(
        "user_id",
        F.expr(floor_div_sql("unix_micros(ts)", DAY_US)).alias("day"),
    )


def matrix_from_pairs(pairs: DataFrame) -> DataFrame:
    """Retention matrix from a (user_id, day) pair set (need not be
    pre-deduplicated; the fold distincts).  Shared by the batch operator
    and the streaming state derivation — equality of the two paths is
    pinned in tests/test_streaming.py."""
    first_ev = pairs.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = pairs.distinct()
    sizes = first_ev.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        active.join(first_ev, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_day")
        .select(
            F.col("cohort_day").cast("long").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.expr("(n_active * 1000) div cohort_size").alias(
                "retention_p1000"
            ),
        )
        .orderBy(
            F.col("cohort_day").asc_nulls_first(),
            F.col("day_offset").asc_nulls_first(),
        )
    )


@register(
    "ts_retention_cohorts",
    oracle=f"""
WITH e AS (
  SELECT user_id, {floor_div_duck_sql('epoch_us(ts)', DAY_US)} AS day FROM events
),
first_ev AS (
  SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id
),
active AS (SELECT DISTINCT user_id, day FROM e),
sizes AS (
  SELECT cohort_day, COUNT(*) AS cohort_size
  FROM first_ev GROUP BY cohort_day
),
cells AS (
  SELECT f.cohort_day, a.day - f.cohort_day AS day_offset,
         COUNT(*) AS n_active
  FROM active a JOIN first_ev f USING (user_id)
  GROUP BY 1, 2
)
SELECT CAST(c.cohort_day AS BIGINT) AS cohort_day,
       CAST(c.day_offset AS BIGINT) AS day_offset,
       CAST(c.n_active AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       (c.n_active * 1000) // s.cohort_size AS retention_p1000
FROM cells c JOIN sizes s USING (cohort_day)
ORDER BY cohort_day ASC NULLS FIRST, day_offset ASC NULLS FIRST
""",
    doc="Daily cohort retention matrix: users cohorted by first-event"
    " day (integer epoch-us division — timezone-free), one cell per"
    " (cohort, day offset) with active count and permille retention."
    "  Scale shape: min-per-user partial agg; DISTINCT (user, day)"
    " collapse BEFORE the cohort join so the exchange carries two"
    " integers per active user-day; cohort sizes are a bounded"
    " broadcast; final cells partial-aggregate.  Offset 0 is 1000 by"
    " construction (every user is active on their cohort day) — pinned"
    " as an invariant test.",
)
def ts_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return matrix_from_pairs(
        user_day_pairs(load_table(spark, sf_dir, "events"))
    )
