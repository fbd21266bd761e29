"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the file: parquet
row-group/file skipping works off per-file min/max statistics, and those
stats only prune when the write path CLUSTERS rows so each file covers a
narrow value range.  Sorting by one column gives perfect pruning on that
column and none on any other; Z-ORDER interleaves the bits of several
columns so every cluster is an axis-aligned rectangle — bounded min/max on
EVERY participating dimension — which is what Delta/Iceberg `OPTIMIZE
ZORDER BY` does before rewriting files.

``layout_zorder_cluster`` computes the interleaved key and verifies the
rectangle property itself: grouped by the top byte of the z-value, each
cluster's (custkey, order-day) min/max spans shrink toward ~1/16 of each
domain (vs 1/256 for a single-column sort bucket on one dim and the FULL
domain on the other).  The whole computation is integer-exact, so the
DuckDB oracle replicates it bit-for-bit.

Reference parity note: the reference has no layout surface (it streams
rows straight to one sink file, ``src/lib.rs:96``); this module is part of
the beyond-reference scale surface, next to the bucket-partitioned ANN
index (`operators/similarity.py`) whose static partition pruning is the
read-side twin of this write-side clustering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

ZBITS = 8  # bits per dimension -> 16-bit z-value, 256 top-byte clusters
Z_EPOCH = "1995-01-01 00:00:00"


def interleave_bits(b1: Column, b2: Column, bits: int = ZBITS) -> Column:
    """Morton/Z-value: b1's bits at odd positions, b2's at even."""
    z = F.lit(0)
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(b1, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = z + F.shiftleft(F.shiftright(b2, i).bitwiseAND(F.lit(1)), 2 * i)
    return z


def interleave_bits_sql(b1: str, b2: str, bits: int = ZBITS) -> str:
    terms = [f"((({b1} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
    terms += [f"((({b2} >> {i}) & 1) << {2 * i})" for i in range(bits)]
    return "(" + " + ".join(terms) + ")"


@register(
    "layout_zorder_cluster",
    oracle=f"""
WITH dims AS (
  SELECT CAST(MAX(o_custkey) + 1 AS BIGINT) AS cust_hi,
         CAST(MAX(date_diff('day', TIMESTAMP '{Z_EPOCH}', o_orderdate)) + 1
              AS BIGINT) AS day_hi
  FROM orders
),
keyed AS (
  SELECT ({(1 << ZBITS)} * o_custkey) // cust_hi AS cb,
         ({(1 << ZBITS)} * date_diff('day', TIMESTAMP '{Z_EPOCH}',
                                     o_orderdate)) // day_hi AS db,
         o_custkey,
         date_diff('day', TIMESTAMP '{Z_EPOCH}', o_orderdate) AS oday
  FROM orders, dims
)
SELECT CAST({interleave_bits_sql('cb', 'db')} >> {ZBITS} AS BIGINT)
         AS zcluster,
       COUNT(*) AS n_rows,
       CAST(MIN(o_custkey) AS BIGINT) AS cust_min,
       CAST(MAX(o_custkey) AS BIGINT) AS cust_max,
       CAST(MIN(oday) AS BIGINT) AS day_min,
       CAST(MAX(oday) AS BIGINT) AS day_max
FROM keyed
GROUP BY 1
ORDER BY zcluster ASC NULLS FIRST
""",
    doc="Z-order clustering key over orders(o_custkey, o_orderdate):"
    f" both dimensions scale to {ZBITS}-bit buckets (integer arithmetic"
    " off a broadcast 1-row domain aggregate), bits interleave into a"
    " Morton code, and the result groups by the z-value's top byte — the"
    " file-assignment a zorder-clustered write would use.  The output IS"
    " the data-skipping proof: every cluster carries bounded min/max"
    " spans on BOTH dimensions (axis-aligned rectangles), so a predicate"
    " on either column prunes files via exactly these stats.  Scale"
    " shape: one 1-row domain agg broadcasts; the z-key is row-local"
    " integer arithmetic in whole-stage codegen; the per-cluster stats"
    " are one partial-agg shuffle on a 256-value key.  The oracle"
    " replicates the bit math exactly — no float anywhere.",
)
def layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    oday = F.datediff(F.col("o_orderdate"), F.lit(Z_EPOCH).cast("timestamp"))
    dims = o.agg(
        (F.max("o_custkey") + 1).cast("long").alias("cust_hi"),
        (F.max(oday) + 1).cast("long").alias("day_hi"),
    )
    scale = 1 << ZBITS
    keyed = o.crossJoin(F.broadcast(dims)).select(
        F.floor(scale * F.col("o_custkey") / F.col("cust_hi")).alias("cb"),
        F.floor(scale * oday / F.col("day_hi")).alias("db"),
        "o_custkey",
        oday.alias("oday"),
    )
    return (
        keyed.select(
            F.shiftright(
                interleave_bits(F.col("cb"), F.col("db")), ZBITS
            ).cast("long").alias("zcluster"),
            "o_custkey",
            "oday",
        )
        .groupBy("zcluster")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").cast("long").alias("cust_min"),
            F.max("o_custkey").cast("long").alias("cust_max"),
            F.min("oday").cast("long").alias("day_min"),
            F.max("oday").cast("long").alias("day_max"),
        )
        .orderBy(F.col("zcluster").asc_nulls_first())
    )
