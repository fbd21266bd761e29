"""Set operations and subquery shapes: UNION [ALL], INTERSECT [ALL],
EXCEPT [ALL], scalar/IN/correlated subqueries, CTEs.

Subquery entries run through ``spark.sql`` over registered temp views — the
reference's users write SQL strings (``-q``, ``src/main.rs:21``), so the SQL
path must be exercised as a first-class surface, not just the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.registry import register
from sql2all_spark.tables import load_table, register_views


@register(
    "setop_union_all_distinct",
    oracle="""
SELECT nationkey, src FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer WHERE c_acctbal > 9990
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier WHERE s_acctbal > 9000
) u
UNION
SELECT n_nationkey AS nationkey, 'nation' AS src FROM nation WHERE n_regionkey = 0
""",
    doc="UNION ALL (bag) feeding a UNION (set-dedup). Spark: unionAll then"
    " distinct; dedup is a hash aggregate with map-side partials.",
)
def setop_union_all_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9990)
        .select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src"))
    )
    n = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select(F.col("n_nationkey").alias("nationkey"), F.lit("nation").alias("src"))
    )
    return c.unionAll(s).union(n).distinct()


@register(
    "setop_intersect_except",
    oracle="""
SELECT nationkey, 'both' AS membership FROM (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
  INTERSECT
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
) i
UNION ALL
SELECT nationkey, 'customer_only' AS membership FROM (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
  EXCEPT
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
) e
""",
    doc="INTERSECT and EXCEPT (set semantics) labelled and unioned.",
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    both = cn.intersect(sn).withColumn("membership", F.lit("both"))
    only = cn.exceptAll(sn).withColumn("membership", F.lit("customer_only"))
    return both.unionAll(only)


@register(
    "setop_intersect_except_all",
    oracle="""
SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 49
INTERSECT ALL
SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
""",
    doc="INTERSECT ALL (bag semantics — multiplicity = min of the two sides);"
    " Spark intersectAll.",
)
def setop_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 49).select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    return a.intersectAll(b)


@register(
    "subquery_scalar_and_in",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 1)
""",
    doc="Scalar subquery + uncorrelated IN subquery, executed via spark.sql"
    " over temp views (the raw-SQL surface reference users rely on).",
)
def subquery_scalar_and_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
          AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 1)
        """
    )


@register(
    "subquery_correlated_cte",
    oracle="""
WITH cust_orders AS (
  SELECT o_custkey, COUNT(*) AS n, MAX(o_totalprice) AS max_price
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, co.n AS n_orders, co.max_price
FROM customer c
JOIN cust_orders co ON co.o_custkey = c.c_custkey
WHERE co.max_price > (
  SELECT AVG(o2.o_totalprice) * 1.8
  FROM orders o2 WHERE o2.o_custkey = c.c_custkey
)
""",
    doc="CTE + correlated scalar subquery; Catalyst decorrelates it into an"
    " aggregate-then-join (RewriteCorrelatedScalarSubquery) — no per-row"
    " re-execution, which is what makes it viable at 100 TB.",
)
def subquery_correlated_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH cust_orders AS (
          SELECT o_custkey, COUNT(*) AS n, MAX(o_totalprice) AS max_price
          FROM orders GROUP BY o_custkey
        )
        SELECT c.c_custkey, co.n AS n_orders, co.max_price
        FROM customer c
        JOIN cust_orders co ON co.o_custkey = c.c_custkey
        WHERE co.max_price > (
          SELECT AVG(o2.o_totalprice) * 1.8
          FROM orders o2 WHERE o2.o_custkey = c.c_custkey
        )
        """
    )
