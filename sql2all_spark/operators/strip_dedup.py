"""Post-strip exact dedup (VERDICT r15 #5): close the template loop —
exact-dedup ON the stripped text's fingerprint and account for the
extra collapse the strip unlocked.

``text_template_strip`` emits the ``base_hash`` fingerprint of every
document's cleaned text — "the key a downstream exact-dedup pass
consumes" (its own docstring).  This operator IS that pass, and it
reports the reason production pipelines strip templates at all: two
documents whose bodies are identical but whose boilerplate differs are
invisible to pre-strip exact dedup (different raw fingerprints) and
collapse only after the strip.  Per post-strip duplicate group the
``merged_gain`` column counts exactly that: ``n_pre_fps - 1`` distinct
PRE-strip fingerprints merged into one post-strip identity — 0 for
groups pre-strip dedup already saw, >0 where the strip created new
dedup yield.

Composition (ONE definition each, zero re-implementation): the rewrite
is ``template_strip.cleaned_corpus``; the pre-strip key is
``dedup_exact``'s exact normalization (md5 of lower/trim).  The oracle
appends one GROUP BY block to ``template_strip.strip_chain_ctes``.

Determinism: both fingerprints are deterministic hashes; keeper is
MIN(doc_id); counts are exact integers; ORDER BY pins n_docs DESC with
the group fingerprint as tiebreak.

Scale shape: the strip chain's shape (hit-table-sized, pair-free, one
anti-join of exploded words against slim (doc, pos) keys), then
exactly dedup_exact's shape on top — one shuffle keyed on the 8-byte
cleaned fingerprint with map-side partial aggregation; the raw text
never shuffles (pre_fp is computed scan-side, 128-bit, and only the
two fingerprints cross the exchange).  The duplicate-group filter
(HAVING n >= 2) prunes the output to the collapse set.

Reference parity note: SQL2ALL has no text surface (its SQL passes
through verbatim — src/db/sqlite.rs:79); LLM-pipeline extension family
(SURVEY.md §2), completing mine -> keep -> strip -> DEDUP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.functions.hashing import base_hash, base_hash_sql
from sql2all_spark.operators.template_strip import (
    cleaned_corpus,
    strip_chain_ctes,
)
from sql2all_spark.registry import register


def _post_strip_oracle() -> str:
    return f"""
WITH RECURSIVE
{strip_chain_ctes()},
perdoc AS (
  SELECT doc.doc_id,
         md5(lower(trim(doc.text))) AS pre_fp,
         {base_hash_sql("COALESCE(c.txt, '')")} AS cleaned_fp
  FROM documents doc LEFT JOIN cleaned c ON c.doc_id = doc.doc_id
)
SELECT cleaned_fp,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keeper_doc_id,
       CAST(COUNT(DISTINCT pre_fp) AS BIGINT) AS n_pre_fps,
       CAST(COUNT(DISTINCT pre_fp) - 1 AS BIGINT) AS merged_gain
FROM perdoc
GROUP BY cleaned_fp
HAVING COUNT(*) >= 2
ORDER BY n_docs DESC NULLS LAST, cleaned_fp ASC NULLS FIRST
"""


@register(
    "dedup_post_strip",
    oracle=_post_strip_oracle(),
    doc="Exact dedup on the POST-template-strip fingerprint — the pass"
    " the strip exists to enable: one row per post-strip duplicate"
    " group (cleaned-text base_hash, member count, MIN-doc_id keeper),"
    " with n_pre_fps = how many distinct PRE-strip exact fingerprints"
    " (dedup_exact's md5-of-normalized-text key) the group spans and"
    " merged_gain = n_pre_fps - 1, the collapse the strip CREATED"
    " (documents identical except for boilerplate).  Reuses the strip"
    " rewrite verbatim (template_strip.cleaned_corpus / the oracle"
    " chain) + dedup_exact's normalization; one fingerprint-keyed"
    " shuffle on top, text never crosses it.",
)
def dedup_post_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d, cleaned, _spans = cleaned_corpus(spark, sf_dir)
    perdoc = (
        d.select(
            "doc_id",
            F.md5(F.lower(F.trim(F.col("text")))).alias("pre_fp"),
        )
        .join(cleaned.select("doc_id", "txt"), "doc_id", "left")
        .select(
            "doc_id",
            "pre_fp",
            base_hash(F.coalesce(F.col("txt"), F.lit(""))).alias(
                "cleaned_fp"
            ),
        )
    )
    return (
        perdoc.groupBy("cleaned_fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.countDistinct("pre_fp").alias("n_pre_fps"),
            (F.countDistinct("pre_fp") - F.lit(1))
            .cast("long")
            .alias("merged_gain"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(
            F.col("n_docs").desc_nulls_last(),
            F.col("cleaned_fp").asc_nulls_first(),
        )
    )
