"""Skew-mitigation patterns: salted join and explicit repartitioning.

At 100 TB a handful of hot keys (one power user, one viral document) can
make a single shuffle partition 1000× the median and stall the stage on one
task.  Two standing mitigations:

- AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on in
  session.py) splits oversized partitions at runtime — the default answer.
- SALTING — the explicit answer when AQE can't help (e.g. skewed aggregate
  keys feeding a non-commutative computation, or pre-AQE engines): append a
  deterministic salt in [0, S) to the big side's key, replicate the small
  side S times, join on (key, salt).  Each hot key spreads over S tasks.

The salted join below produces bit-identical results to the plain join (the
oracle is the plain join), so the pattern itself is value-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.functions.exact import dsum, dsum_sql
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

N_SALTS = 8


@register(
    "join_skew_salted",
    oracle=f"""
WITH profiles AS (
  SELECT user_id, MIN(ts) AS first_seen
  FROM events WHERE event_type = 'signup'
  GROUP BY user_id
)
SELECT e.user_id,
       COUNT(*) AS n_events,
       {dsum_sql('e.value', 6)} AS total_value,
       MIN(p.first_seen) AS first_seen
FROM events e
JOIN profiles p ON e.user_id = p.user_id
GROUP BY e.user_id
""",
    doc="Salted equi-join: the fact side's key is extended with a"
    f" deterministic salt pmod(event_id, {N_SALTS}) and the dim side is"
    f" replicated {N_SALTS}× with an exploded salt column, so one hot user"
    " spreads over 8 shuffle partitions instead of one straggler task."
    " Results are identical to the unsalted join (the oracle IS the plain"
    " join).  With AQE skew-join on, prefer the plain join and let runtime"
    " splitting handle it; salting is the explicit fallback.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    profiles = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_seen"))
    )
    # big side: deterministic salt (event_id is unique → uniform spread)
    salted_events = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(N_SALTS)))
    # small side: replicate each row once per salt value
    salted_profiles = profiles.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(N_SALTS)]))
    )
    joined = salted_events.join(salted_profiles, ["user_id", "salt"])
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value"), 6).alias("total_value"),
        F.min("first_seen").alias("first_seen"),
    )
