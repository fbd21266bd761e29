"""Incremental-pipeline operators: keyed upsert (merge) and change capture.

A 100 TB corpus is never rebuilt from scratch — it's maintained: new
crawls land, documents get re-fetched, records get corrected.  The two
primitives every incremental pipeline needs:

- MERGE/upsert: combine the base table with an update batch, latest
  version wins per key.  Formats with native MERGE (Delta/Iceberg/Hudi) do
  this transactionally; on plain parquet the same semantics are
  union + rank-per-key + keep-latest, followed by a partition-scoped
  rewrite (only partitions containing touched keys rewrite).
- CHANGE CAPTURE: diff two snapshots into insert/update/delete actions —
  the feed you'd hand to a downstream MERGE.

The update batch here is derived deterministically from orders (10% price
corrections + synthetic new keys) so the oracle can reproduce it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

NEW_KEY_OFFSET = 10_000_000


def _update_batch(o: DataFrame) -> DataFrame:
    """Deterministic simulated update batch: every 10th order gets a 10%
    price correction; every 100th spawns a brand-new key."""
    # price math in DECIMAL: double*1.1 rounds differently per engine at
    # exact-half binary representations; decimal products round identically
    def scaled(factor: str) -> F.Column:
        return (
            F.round(
                F.col("o_totalprice").cast("decimal(18,2)")
                * F.lit(factor).cast("decimal(3,2)"),
                2,
            )
            .cast("double")
        )

    corrections = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        scaled("1.1").alias("o_totalprice"),
        "o_orderstatus",
    )
    inserts = o.filter(F.col("o_orderkey") % 100 == 0).select(
        (F.col("o_orderkey") + NEW_KEY_OFFSET).alias("o_orderkey"),
        scaled("0.5").alias("o_totalprice"),
        F.lit("N").alias("o_orderstatus"),
    )
    return corrections.unionByName(inserts)


_UPDATE_BATCH_SQL = f"""
  SELECT o_orderkey,
         CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2))
                    * CAST(1.1 AS DECIMAL(3,2)), 2) AS DOUBLE) AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + {NEW_KEY_OFFSET},
         CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2))
                    * CAST(0.5 AS DECIMAL(3,2)), 2) AS DOUBLE),
         'N'
  FROM orders WHERE o_orderkey % 100 = 0
"""


@register(
    "merge_upsert",
    oracle=f"""
WITH updates AS ({_UPDATE_BATCH_SQL}),
tagged AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus, 0 AS version FROM orders
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderstatus, 1 AS version FROM updates
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                               ORDER BY version DESC) AS rn
  FROM tagged
)
SELECT o_orderkey, o_totalprice, o_orderstatus,
       CASE version WHEN 1 THEN 'upserted' ELSE 'unchanged' END AS merge_action
FROM ranked WHERE rn = 1
""",
    doc="Keyed MERGE/upsert on plain parquet semantics: union base+updates"
    " tagged by version, rank per key, keep the latest.  One shuffle on the"
    " key; at scale you prune the rewrite to partitions containing touched"
    " keys (partition_by the key's bucket) — table formats make the same"
    " plan transactional.",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    base = o.select("o_orderkey", "o_totalprice", "o_orderstatus").withColumn(
        "version", F.lit(0)
    )
    updates = _update_batch(o).withColumn("version", F.lit(1))
    w = Window.partitionBy("o_orderkey").orderBy(F.col("version").desc())
    return (
        base.unionByName(updates)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "o_totalprice",
            "o_orderstatus",
            F.when(F.col("version") == 1, "upserted")
            .otherwise("unchanged")
            .alias("merge_action"),
        )
    )


@register(
    "change_capture_diff",
    oracle=f"""
WITH updates AS ({_UPDATE_BATCH_SQL})
SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE
         WHEN b.o_orderkey IS NULL THEN 'insert'
         WHEN u.o_orderkey IS NULL THEN 'absent'
         WHEN u.o_totalprice <> b.o_totalprice THEN 'update'
         ELSE 'noop'
       END AS action,
       b.o_totalprice AS old_price,
       u.o_totalprice AS new_price
FROM orders b
FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
WHERE NOT (b.o_orderkey IS NOT NULL AND u.o_orderkey IS NULL)
""",
    doc="Change capture: full-outer diff of snapshot vs update batch into"
    " insert/update/noop actions (rows only in the base are filtered — they"
    " are the unchanged majority and a CDC feed must not carry them).  The"
    " action stream is what a downstream MERGE or audit log consumes.",
)
def change_capture_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.select("o_orderkey", F.col("o_totalprice").alias("old_price"))
    updates = _update_batch(o).select(
        F.col("o_orderkey").alias("u_key"), F.col("o_totalprice").alias("new_price")
    )
    joined = base.join(updates, base.o_orderkey == updates.u_key, "full")
    return (
        joined.filter(~(base.o_orderkey.isNotNull() & updates.u_key.isNull()))
        .select(
            F.coalesce("u_key", "o_orderkey").alias("o_orderkey"),
            F.when(base.o_orderkey.isNull(), "insert")
            .when(F.col("new_price") != F.col("old_price"), "update")
            .otherwise("noop")
            .alias("action"),
            "old_price",
            "new_price",
        )
    )
