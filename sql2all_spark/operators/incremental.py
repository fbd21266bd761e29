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


SCD2_EFFECTIVE = "2002-01-01 00:00:00"  # batch effective date (after fixture max)


@register(
    "scd2_apply_changes",
    oracle=f"""
WITH updates AS ({_UPDATE_BATCH_SQL}),
base AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderdate AS valid_from
  FROM orders
),
changed AS (
  SELECT u.o_orderkey, u.o_totalprice, u.o_orderstatus
  FROM updates u JOIN base b ON b.o_orderkey = u.o_orderkey
  WHERE u.o_totalprice <> b.o_totalprice
),
inserted AS (
  SELECT u.o_orderkey, u.o_totalprice, u.o_orderstatus
  FROM updates u LEFT JOIN base b ON b.o_orderkey = u.o_orderkey
  WHERE b.o_orderkey IS NULL
)
SELECT b.o_orderkey, b.o_totalprice, b.o_orderstatus, b.valid_from,
       CASE WHEN c.o_orderkey IS NULL THEN NULL
            ELSE TIMESTAMP '{SCD2_EFFECTIVE}' END AS valid_to,
       c.o_orderkey IS NULL AS is_current
FROM base b LEFT JOIN changed c ON b.o_orderkey = c.o_orderkey
UNION ALL
SELECT o_orderkey, o_totalprice, o_orderstatus,
       TIMESTAMP '{SCD2_EFFECTIVE}', NULL, TRUE
FROM changed
UNION ALL
SELECT o_orderkey, o_totalprice, o_orderstatus,
       TIMESTAMP '{SCD2_EFFECTIVE}', NULL, TRUE
FROM inserted
""",
    doc="Slowly-changing-dimension Type 2: apply an update batch to a"
    " versioned dimension — changed keys get their current row CLOSED"
    " (valid_to = effective date) plus a new current row; brand-new keys"
    " insert; unchanged rows pass through untouched.  History is never"
    " rewritten, only appended — the warehouse pattern that keeps every"
    " join-as-of-date answerable.  Two hash joins on the key (the update"
    " batch side broadcasts at any realistic dim/batch ratio); at scale"
    " the rewrite prunes to partitions holding touched keys, exactly like"
    " merge_upsert.",
)
def scd2_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    eff = F.lit(SCD2_EFFECTIVE).cast("timestamp")
    base = o.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        F.col("o_orderdate").alias("valid_from"),
    )
    updates = _update_batch(o)
    changed = (
        updates.alias("u")
        .join(base.alias("b"), "o_orderkey")
        .filter(F.col("u.o_totalprice") != F.col("b.o_totalprice"))
        .select("o_orderkey", "u.o_totalprice", "u.o_orderstatus")
    )
    inserted = updates.join(base.select("o_orderkey"), "o_orderkey", "left_anti")
    changed_keys = F.broadcast(changed.select("o_orderkey", F.lit(1).alias("chg")))
    hist = (
        base.join(changed_keys, "o_orderkey", "left")
        .select(
            "o_orderkey",
            "o_totalprice",
            "o_orderstatus",
            "valid_from",
            F.when(F.col("chg").isNotNull(), eff).alias("valid_to"),
            F.col("chg").isNull().alias("is_current"),
        )
    )
    fresh = changed.unionByName(inserted).select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        eff.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return hist.unionByName(fresh)


COMPACT_TARGET_BYTES = 50_000  # group small files up to ~this many bytes


@register(
    "incremental_file_compaction",
    oracle=f"""
WITH files AS (
  SELECT lang, doc_id AS file_id, n_chars AS size_bytes,
         SUM(n_chars) OVER (
           PARTITION BY lang ORDER BY doc_id ASC
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
),
planned AS (
  SELECT lang, file_id, size_bytes,
         CAST((cum - size_bytes) // {COMPACT_TARGET_BYTES} AS INT)
           AS compaction_group
  FROM files
)
SELECT lang, compaction_group,
       COUNT(*) AS n_files,
       CAST(SUM(size_bytes) AS BIGINT) AS group_bytes,
       MIN(file_id) AS first_file, MAX(file_id) AS last_file
FROM planned
GROUP BY lang, compaction_group
""",
    doc="Small-file compaction planning — the table-maintenance operator"
    " every incremental sink eventually needs (streaming/CDC writers leave"
    f" many small files; readers want ~{COMPACT_TARGET_BYTES}-byte"
    " groups).  Files are binned by the RUNNING SIZE within each partition"
    " (cumulative-sum // target — the associative approximation of greedy"
    " first-fit that compactors actually use, because it needs only one"
    " window pass, no sequential state).  Output is the group manifest a"
    " rewrite job would execute.  All-integer arithmetic → engine-exact.",
)
def incremental_file_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    files = d.select(
        "lang",
        F.col("doc_id").alias("file_id"),
        F.col("n_chars").alias("size_bytes"),
    )
    return plan_compaction(files, "lang", target_bytes=COMPACT_TARGET_BYTES)


def plan_compaction(
    files: DataFrame, partition_col: str, target_bytes: int
) -> DataFrame:
    """Bin a (partition, file_id, size_bytes) listing into rewrite groups of
    ~``target_bytes`` each — running-size binning (cumulative-sum // target)
    within each partition, one window pass, no sequential state.

    This is the library form of ``incremental_file_compaction``: point it at
    any real file listing (e.g. the per-bucket parquet files an ANN index
    refresh appends — see refresh_ann_index's docstring) to get the manifest
    a rewrite job would execute."""
    planned = files.select(
        partition_col,
        "file_id",
        "size_bytes",
        F.expr(
            f"(sum(size_bytes) OVER (PARTITION BY {partition_col}"
            f" ORDER BY file_id ASC"
            f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            f" - size_bytes) div {target_bytes}"
        )
        .cast("int")
        .alias("compaction_group"),
    )
    return planned.groupBy(partition_col, "compaction_group").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("size_bytes").alias("group_bytes"),
        F.min("file_id").alias("first_file"),
        F.max("file_id").alias("last_file"),
    )
