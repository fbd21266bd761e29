"""The composed curation pipeline: quality gate → exact dedup → deterministic
sample → corpus stats, as ONE declarative query.

Each stage exists as a standalone operator elsewhere; this query is the
composition proof — Catalyst fuses the whole chain into a single plan
(gate and fingerprint compute in one scan pass, dedup is the only wide
shuffle, the sample filter is free), which is exactly how a 100 TB curation
run should be expressed: one lazy pipeline, not N materialized stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.functions.hashing import (
    pct_bucket as _hash_bucket,
    pct_bucket_sql as _hash_bucket_sql,
)
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

MIN_CHARS, MAX_CHARS, MIN_TOKENS = 100, 20000, 10
SAMPLE_PCT = 50


@register(
    "pipeline_curation",
    oracle=f"""
WITH gated AS (
  SELECT doc_id, lang, source, text, n_chars
  FROM documents
  WHERE LENGTH(text) BETWEEN {MIN_CHARS} AND {MAX_CHARS}
    AND len(string_split(text, ' ')) >= {MIN_TOKENS}
),
keepers AS (
  SELECT MIN(doc_id) AS doc_id
  FROM gated
  GROUP BY md5(lower(trim(text)))
),
deduped AS (
  SELECT g.* FROM gated g JOIN keepers k ON g.doc_id = k.doc_id
),
sampled AS (
  SELECT * FROM deduped WHERE {_hash_bucket_sql('doc_id')} < {SAMPLE_PCT}
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id
FROM sampled
GROUP BY lang, source
""",
    doc="Quality gate → exact-dedup keepers → deterministic 50% hash sample"
    " → per-(lang, source) corpus stats, composed as one lazy plan: the"
    " gate + fingerprint run in the scan pass, the dedup groupBy is the"
    " only wide shuffle, and the sample is a pushed row-local filter."
    "  The shape of an actual 100 TB curation run.",
)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    gated = d.filter(
        F.length("text").between(MIN_CHARS, MAX_CHARS)
        & (F.size(F.split(F.col("text"), " ")) >= MIN_TOKENS)
    )
    keepers = (
        gated.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = gated.join(keepers, "doc_id")
    sampled = deduped.filter(_hash_bucket(F.col("doc_id")) < SAMPLE_PCT)
    return sampled.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
    )
