"""Window-function surface: ranking (row_number/rank/dense_rank/ntile),
analytic (lag/lead/first/last), aggregates over frames (ROWS / RANGE
BETWEEN), and top-k-per-group.

Scale notes: a window = one shuffle on partitionBy keys + per-partition sort.
All windows here partition on high-cardinality keys (custkey, user_id,
nation), so partitions stay small and parallelism stays at the key count —
the shape that survives 100×.  Top-k-per-group uses row_number + filter,
which Spark executes with a per-partition bounded heap (WindowGroupLimit
pushdown in 3.5+) instead of a full sort of every group.

Determinism: every orderBy inside a window carries a unique tie-break key —
otherwise rank ties are stable but lag/lead/frames are not.  Frame sums over
doubles go through decimal casts (see functions.exact rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql2all_spark.functions.exact import floor_div_duck_sql, floor_div_sql
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

# DuckDB oracle fragment: event timestamp floored to epoch milliseconds
# (true floor division, negative-epoch safe) — used only by the
# window_lag_lead oracle below.
_MS_EPOCH_DUCK = floor_div_duck_sql("epoch_us(ts)", 1000)


@register(
    "window_ranking",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus ASC) AS status_rank,
       DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus ASC) AS status_dense_rank,
       NTILE(4) OVER w AS quartile
FROM orders
WHERE o_custkey % 50 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
""",
    doc="ROW_NUMBER / RANK / DENSE_RANK / NTILE per customer. rank vs"
    " dense_rank ordered on a 3-value column to actually exercise ties.",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    )
    ws = Window.partitionBy("o_custkey").orderBy(F.col("o_orderstatus").asc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(ws).alias("status_rank"),
        F.dense_rank().over(ws).alias("status_dense_rank"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle=f"""
SELECT user_id, event_id, event_type, ts,
       LAG(event_type)  OVER w AS prev_type,
       LEAD(event_type) OVER w AS next_type,
       {_MS_EPOCH_DUCK} - LAG({_MS_EPOCH_DUCK}) OVER w AS ms_since_prev
FROM events
WHERE user_id % 25 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
    doc="LAG/LEAD sessionization primitives over the event stream: previous/"
    "next event type and inter-event gap per user.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # floor each timestamp to ms BEFORE differencing (duration truncation
    # and boundary counting disagree when the lag ts sits above x.5 ms)
    ms = F.expr(floor_div_sql("unix_micros(ts)", 1000))
    gap_ms = ms - F.lag(ms).over(w)
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        gap_ms.alias("ms_since_prev"),
    )


@register(
    "window_running_frame",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS trailing3_spend,
       FIRST_VALUE(o_orderkey)
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
         AS first_orderkey
FROM orders
WHERE o_custkey % 40 = 0
""",
    doc="Aggregates over ROWS frames: cumulative and trailing-3 spend per"
    " customer + FIRST_VALUE. Decimal-cast sums keep frame accumulation"
    " order-independent.",
)
def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 40 == 0)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(price_dec)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.sum(price_dec)
        .over(w.rowsBetween(-2, Window.currentRow))
        .cast("double")
        .alias("trailing3_spend"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
    )


@register(
    "window_range_frame",
    oracle="""
SELECT o_orderkey, o_totalprice,
       COUNT(*) OVER (ORDER BY o_totalprice ASC
                      RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1000
FROM orders
WHERE o_custkey % 100 = 0
""",
    doc="RANGE frame keyed on a value (not row position): how many orders"
    " fall within 1000 below this price.  Single global window — acceptable"
    " only on a pre-filtered slice; at scale you partition first.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = Window.orderBy(F.col("o_totalprice").asc()).rangeBetween(-1000, 0)
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_1000"),
    )


@register(
    "window_topk_per_group",
    oracle="""
SELECT nation, c_custkey, c_name, c_acctbal, rk
FROM (
  SELECT n.n_name AS nation, c.c_custkey, c.c_name, c.c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n.n_name
                            ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rk
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
) t
WHERE rk <= 3
""",
    doc="Top-3 customers by balance per nation: broadcast dim join +"
    " row_number + filter.  Spark pushes the rank limit into the window sort"
    " (WindowGroupLimit) so each group keeps a 3-row heap, not a full sort.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("nation").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), "c_custkey", "c_name", "c_acctbal")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


@register(
    "window_distribution_ranks",
    oracle="""
SELECT s_suppkey, s_nationkey,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       NTH_VALUE(s_suppkey, 2) OVER (
         PARTITION BY s_nationkey ORDER BY s_acctbal DESC NULLS LAST, s_suppkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS second_richest
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey
             ORDER BY s_acctbal DESC NULLS LAST, s_suppkey)
""",
    doc="Distribution window functions: PERCENT_RANK / CUME_DIST over a"
    " pinned deterministic order, plus NTH_VALUE with an explicit"
    " full-partition frame (its default frame would stop at CURRENT ROW"
    " and return nulls for the first row).  Rounded 6dp: the rank ratios"
    " are double divisions.",
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    order = [F.col("s_acctbal").desc_nulls_last(), F.col("s_suppkey").asc()]
    w = Window.partitionBy("s_nationkey").orderBy(*order)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("s_suppkey", 2).over(w_full).alias("second_richest"),
    )
