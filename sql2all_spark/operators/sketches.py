"""Count-min sketch frequency estimation — the third mergeable sketch.

Completes the sketch family (HLL distinct counts in
``aggregates.agg_hll_sketch_rollup``, KLL-style quantiles in
``agg_approx_quantiles``): CMS answers "how often does item x occur?" in
O(d·w) memory regardless of vocabulary size, and sketches MERGE by
cell-wise addition — per-partition (or per-day) sketches sum into the
global sketch with no re-scan, exactly the property a 100 TB token-frequency
service needs (the exact vocabulary at corpus scale is billions of rows;
the sketch is a few KB).

Unlike HLL/KLL (engine-internal sketch formats, verified via deterministic
bound flags), CMS is simple enough to build from first principles with the
cross-engine md5 hash (`functions/hashing.py`), so the DuckDB oracle
replicates the ENTIRE computation cell-for-cell — the driver hash-compares
the actual estimates, not just bound flags.  Spark's builtin
``count_min_sketch`` aggregate emits an opaque binary with no SQL-side
estimate function, which is why the sketch is built from DataFrame ops
(1 slim shuffle on (row, bucket), d·w ≤ 768 cells) instead.

Reference parity note: the reference has no sketch surface at all (it
forwards SQL to the attached DB, ``src/db/sqlite.rs:79``); this module is
part of the beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.cache import persist_tracked
from sql2all_spark.functions.hashing import base_hash, base_hash_sql
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

CMS_DEPTH = 3  # independent hash rows
CMS_WIDTH = 256  # buckets per row; overestimate ≤ e·N/w w.h.p.
CMS_TOP_K = 10


def _bucket(col: F.Column, row: int) -> F.Column:
    return base_hash(F.concat(F.lit(f"cms{row}|"), col)) % CMS_WIDTH


def _bucket_sql(expr: str) -> str:
    # row index comes from the unnested i column
    return (
        base_hash_sql(f"'cms' || CAST(i AS VARCHAR) || '|' || {expr}")
        + f" % {CMS_WIDTH}"
    )


@register(
    "agg_cms_heavy_hitters",
    oracle=f"""
WITH tok_raw AS (
  SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
),
tok AS (SELECT token FROM tok_raw WHERE token <> ''),
rows_i AS (SELECT unnest(range({CMS_DEPTH})) AS i),
cells AS (
  SELECT i, {_bucket_sql('token')} AS bucket, COUNT(*) AS cnt
  FROM tok, rows_i
  GROUP BY 1, 2
),
exact AS (
  SELECT token, COUNT(*) AS exact_cnt
  FROM tok GROUP BY 1
  ORDER BY exact_cnt DESC, token ASC
  LIMIT {CMS_TOP_K}
),
probes AS (
  SELECT token, exact_cnt, i, {_bucket_sql('token')} AS bucket
  FROM exact, rows_i
)
SELECT p.token, p.exact_cnt,
       CAST(MIN(c.cnt) AS BIGINT) AS cms_est,
       CAST(MIN(c.cnt) - p.exact_cnt AS BIGINT) AS overcount
FROM probes p
JOIN cells c ON c.i = p.i AND c.bucket = p.bucket
GROUP BY p.token, p.exact_cnt
ORDER BY p.exact_cnt DESC, p.token ASC
""",
    doc="Count-min sketch over the document token stream: a"
    f" {CMS_DEPTH}×{CMS_WIDTH} counter grid (each token increments one"
    " bucket per hash row; estimate = min over rows), probed at the exact"
    " top-10 heavy hitters so the driver verifies estimate ≥ exact and the"
    " collision overcount cell-for-cell against DuckDB.  Scale shape: the"
    " only shuffle carries (row, bucket) pairs — never tokens — into"
    f" ≤ {CMS_DEPTH * CMS_WIDTH} cells via partial aggregation (map-side"
    " combine does almost all the work); sketches are mergeable by cell"
    " addition, so per-partition/per-day sketches roll up without"
    " re-scanning — the exact-top-10 side exists only to verify and is the"
    " same two-phase bounded top-k as text_heavy_hitters.",
)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")

    # sketch cells: one slim (row, bucket) pair per token occurrence per row
    pairs = tok.select(
        F.posexplode(
            F.array(*[_bucket(F.col("token"), i) for i in range(CMS_DEPTH)])
        ).alias("i", "bucket")
    )
    cells = pairs.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    exact = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("token").asc())
        .limit(CMS_TOP_K)
    )
    probes = exact.select(
        "token",
        "exact_cnt",
        F.posexplode(
            F.array(*[_bucket(F.col("token"), i) for i in range(CMS_DEPTH)])
        ).alias("i", "bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cnt").cast("long").alias("cms_est"))
        .select(
            "token",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias(
                "overcount"
            ),
        )
        .orderBy(F.col("exact_cnt").desc(), F.col("token").asc())
    )


BF_K = 3  # hash functions
BF_WORDS = 128  # 64-bit words in the bitmap
BF_BITS_PER_WORD = 63  # keep shifts in [0, 62] so 1<<bit never wraps sign
BF_M = BF_WORDS * BF_BITS_PER_WORD  # total bits
BF_PRICE_MIN = 490000  # member set: customers with any order above this


def _bf_pos(col: F.Column, row: int) -> F.Column:
    return base_hash(F.concat(F.lit(f"bf{row}|"), col.cast("string"))) % BF_M


def _bf_pos_sql(expr: str) -> str:
    return (
        base_hash_sql(f"'bf' || CAST(i AS VARCHAR) || '|' || CAST({expr} AS VARCHAR)")
        + f" % {BF_M}"
    )


@register(
    "agg_bloom_filter_probe",
    oracle=f"""
WITH member_keys AS (
  SELECT DISTINCT o_custkey AS k FROM orders
  WHERE o_totalprice > {BF_PRICE_MIN}
),
ki AS (SELECT unnest(range({BF_K})) AS i),
bits AS (
  SELECT {_bf_pos_sql('k')} AS pos FROM member_keys, ki
),
words AS (
  SELECT pos // {BF_BITS_PER_WORD} AS word,
         BIT_OR(CAST(1 AS BIGINT) << (pos % {BF_BITS_PER_WORD})) AS w
  FROM bits GROUP BY 1
),
probes AS (
  SELECT c_custkey AS k, {_bf_pos_sql('c_custkey')} AS pos
  FROM customer, ki
),
per_key AS (
  SELECT p.k,
         MIN(CASE WHEN w.w IS NOT NULL
                   AND (w.w & (CAST(1 AS BIGINT)
                               << (p.pos % {BF_BITS_PER_WORD}))) <> 0
              THEN 1 ELSE 0 END) AS all_hit
  FROM probes p
  LEFT JOIN words w ON w.word = p.pos // {BF_BITS_PER_WORD}
  GROUP BY p.k
),
verdicts AS (
  SELECT pk.k, pk.all_hit,
         CASE WHEN m.k IS NOT NULL THEN 1 ELSE 0 END AS is_member
  FROM per_key pk LEFT JOIN member_keys m ON m.k = pk.k
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
       CAST(SUM(is_member) AS BIGINT) AS n_members,
       CAST(SUM(all_hit) AS BIGINT) AS n_bloom_positive,
       CAST(SUM(CASE WHEN all_hit = 1 AND is_member = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positive,
       (SELECT CAST(SUM(bit_count(w)) AS BIGINT) FROM words) AS n_bits_set
FROM verdicts
""",
    doc=f"Bloom-filter build + membership probe from first principles — the"
    " semi-join pruning primitive: at 100 TB the filter built on a join's"
    " small side is broadcast to the big side's scan so non-matching rows"
    " die before the exchange (what Spark's runtime row-level filtering"
    " does internally; built explicitly here so the driver can verify the"
    f" exact bitmap).  A {BF_M}-bit / {BF_K}-hash filter over customers"
    " with a high-value order, probed with EVERY customer; output pins"
    " zero false negatives structurally (members always pass) and the"
    " exact false-positive count cell-for-cell against DuckDB.  Scale"
    f" shape: the filter aggregates to ≤ {BF_WORDS} bit_or words via"
    " map-side partial agg (commutative OR ⇒ mergeable like the CMS"
    " grid), then BROADCASTS — probes never shuffle; the only keyed"
    " exchange is the slim (key, verdict) truth join.  Shifts stay in"
    f" [0, {BF_BITS_PER_WORD - 1}] so 1<<bit never wraps the sign bit in"
    " either engine.",
)
def agg_bloom_filter_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # member feeds both the bit fan-out and the truth join; words feeds both
    # the probe join and the n_bits branch.  Without the persists each
    # branch re-derives its lineage and rescans orders/customer ~3×
    # (ADVICE r7; same reason tpch_q15 persists its revenue agg).
    member = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > BF_PRICE_MIN)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .transform(persist_tracked)
    )
    bits = member.select(
        F.explode(
            F.array(*[_bf_pos(F.col("k"), i) for i in range(BF_K)])
        ).alias("pos")
    )
    words = (
        bits.groupBy(
            (F.col("pos") / BF_BITS_PER_WORD).cast("long").alias("word")
        )
        .agg(
            F.bit_or(
                F.expr(f"shiftleft(1L, CAST(pos % {BF_BITS_PER_WORD} AS INT))")
            ).alias("w")
        )
        .transform(persist_tracked)
    )
    probes = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("k"))
        .select(
            "k",
            F.explode(
                F.array(*[_bf_pos(F.col("k"), i) for i in range(BF_K)])
            ).alias("pos"),
        )
    )
    hit = F.when(
        F.col("w").isNotNull()
        & (
            F.col("w").bitwiseAND(
                F.expr(f"shiftleft(1L, CAST(pos % {BF_BITS_PER_WORD} AS INT))")
            )
            != 0
        ),
        1,
    ).otherwise(0)
    per_key = (
        probes.join(
            F.broadcast(words),
            (F.col("pos") / BF_BITS_PER_WORD).cast("long") == F.col("word"),
            "left",
        )
        .select("k", hit.alias("hit"))
        .groupBy("k")
        .agg(F.min("hit").alias("all_hit"))
    )
    verdicts = per_key.join(
        member.withColumnRenamed("k", "mk"),
        F.col("k") == F.col("mk"),
        "left",
    ).select(
        "all_hit",
        F.when(F.col("mk").isNotNull(), 1).otherwise(0).alias("is_member"),
    )
    n_bits = words.agg(
        F.sum(F.bit_count("w")).cast("long").alias("n_bits_set")
    )
    return verdicts.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("is_member").cast("long").alias("n_members"),
        F.sum("all_hit").cast("long").alias("n_bloom_positive"),
        F.sum(
            F.when((F.col("all_hit") == 1) & (F.col("is_member") == 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_false_positive"),
    ).crossJoin(F.broadcast(n_bits))
