"""Join surface: inner/left/right/full/semi/anti/cross/non-equi/multi-way.

The reference delegates all joins to its source DB (SQL passthrough at
``src/db/sqlite.rs:79``, ``src/db/mysql.rs:91``, ``src/db/postgresql.rs:97``);
here each shape is a native DataFrame plan.

Scale notes (100 TB): Catalyst picks the physical join.  Dimension tables
(region/nation/supplier/part at any realistic scale) fall under the broadcast
threshold → BroadcastHashJoin with zero shuffle of the fact table.  Fact-fact
joins (lineitem⋈orders) shuffle both sides on the key — that's the correct
plan at scale, and AQE handles skewed keys by splitting oversized partitions.
The non-equi self-join is bounded by an equi-key (same nation) so it never
degenerates into a global BNL cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.functions.exact import dsum, dsum_sql
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table


@register(
    "join_inner_fact_fact",
    oracle="""
SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice, l.l_linenumber, l.l_quantity
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_totalprice > 400000
""",
    doc="Inner equi-join of the two fact tables. Both sides shuffle on the"
    " join key (sort-merge at scale); the selective filter on orders is"
    " pushed to its scan before the join.",
)
def join_inner_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    li = load_table(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "inner").select(
        "o_orderkey", "o_orderdate", "o_totalprice", "l_linenumber", "l_quantity"
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
       CAST(SUM(CAST(COALESCE(o.o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
""",
    doc="LEFT OUTER join preserving customers with zero orders; COUNT over"
    " the nullable side counts only matches.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.coalesce("o_totalprice", F.lit(0))).alias("total_spent"),
        )
    )


@register(
    "join_right_outer",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM orders o
RIGHT JOIN customer c ON o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
""",
    doc="RIGHT OUTER join with a join-side predicate (not a WHERE filter):"
    " non-matching customers survive with null order columns.",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return o.join(
        c,
        (o.o_custkey == c.c_custkey) & (o.o_totalprice > 450000),
        "right",
    ).select("c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice")


@register(
    "join_full_outer",
    oracle="""
WITH cust AS (
  SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
),
supp AS (
  SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
  FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey
)
SELECT COALESCE(cust.nationkey, supp.nationkey) AS nationkey, n_cust, n_supp
FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
""",
    doc="FULL OUTER join of two aggregated sides with non-overlapping keys on"
    " both sides.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, "nationkey", "full").select(
        F.coalesce(c["nationkey"], s["nationkey"]).alias("nationkey"),
        "n_cust",
        "n_supp",
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
    doc="LEFT SEMI join (EXISTS rewrite): emits each matching customer once;"
    " Spark never materializes the join payload, only the key match.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
""",
    doc="LEFT ANTI join (NOT EXISTS rewrite): customers with no large order."
    " (Plain 'no orders at all' is empty at every test SF — the filtered"
    " variant keeps the result non-trivial.)",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="""
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
""",
    doc="Explicit cross join of the two tiny dims (5×25). At scale a cross"
    " join is only ever sane with at least one broadcast side — Spark plans"
    " BroadcastNestedLoopJoin here.",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "join_nonequi_theta",
    oracle="""
SELECT a.s_suppkey AS suppkey_low, b.s_suppkey AS suppkey_high,
       a.s_nationkey AS nationkey, b.s_acctbal - a.s_acctbal AS bal_gap
FROM supplier a
JOIN supplier b
  ON a.s_nationkey = b.s_nationkey
 AND a.s_suppkey < b.s_suppkey
 AND b.s_acctbal > a.s_acctbal + 5000
""",
    doc="Theta self-join: equi key (nation) bounds the pair space, the"
    " non-equi residual (key order + balance gap) filters pairs. The equi"
    " component keeps this a hash/merge join, not a cross product.",
)
def join_nonequi_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    a, b = s.alias("a"), s.alias("b")
    return a.join(
        b,
        (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
        & (F.col("a.s_suppkey") < F.col("b.s_suppkey"))
        & (F.col("b.s_acctbal") > F.col("a.s_acctbal") + 5000),
    ).select(
        F.col("a.s_suppkey").alias("suppkey_low"),
        F.col("b.s_suppkey").alias("suppkey_high"),
        F.col("a.s_nationkey").alias("nationkey"),
        (F.col("b.s_acctbal") - F.col("a.s_acctbal")).alias("bal_gap"),
    )


@register(
    "join_multiway_revenue",
    oracle=f"""
SELECT n.n_name AS nation,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 8)} AS revenue,
       COUNT(*) AS n_lines
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC NULLS LAST, nation ASC NULLS FIRST
""",
    doc="Six-way star join (TPC-H Q5 shape): local-supplier revenue by nation."
    " region/nation/supplier broadcast; customer⋈orders⋈lineitem shuffle on"
    " their keys; partial aggregation before the final 1-row-per-nation"
    " exchange.  The canonical 100 TB query shape.",
)
def join_multiway_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n),
            (c.c_nationkey == n.n_nationkey) & (s.s_nationkey == n.n_nationkey),
        )
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(revenue, 8).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(
            F.col("revenue").desc_nulls_last(), F.col("nation").asc_nulls_first()
        )
    )
