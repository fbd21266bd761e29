"""Corpus profiling: the "know your data" pass a training-data pipeline
runs before any curation decision — per-group volume, source diversity,
emptiness, exact-duplicate rate, and length distribution in ONE aggregation
job over the raw corpus.

Scale shape: a single groupBy(lang) with map-side partial aggregation; the
only shuffled payload is (lang, partial aggregates).  The two COUNT(DISTINCT)
columns make Catalyst plan an expand (3 rows per input at the partial stage)
— the standard multi-distinct strategy; at 100 TB you would swap them for
``approx_count_distinct`` to collapse the expand, which changes this query's
semantics from exact to sketch (kept exact here so the DuckDB oracle is a
hash-equality check, not a tolerance check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.registry import register
from sql2all_spark.tables import load_table


@register(
    "profile_corpus",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources,
       COUNT(DISTINCT md5(text)) AS n_unique_texts,
       CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_empty,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars,
       ROUND(AVG(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
       ROUND(median(CAST(n_chars AS DOUBLE)), 2) AS med_chars
FROM documents
GROUP BY lang
""",
    doc="Per-language corpus profile: volume, source diversity, exact-dup"
    " rate (distinct md5 fingerprints vs rows), empty-doc count, and the"
    " n_chars distribution (min/max/avg/median).  One aggregation job;"
    " text itself contributes only its 128-bit fingerprint to the shuffle.",
)
def profile_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
        F.sum(
            (F.col("text").isNull() | (F.col("text") == "")).cast("int")
        ).alias("n_empty"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
        F.round(F.median(F.col("n_chars").cast("double")), 2).alias("med_chars"),
    )
