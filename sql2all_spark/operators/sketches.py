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
