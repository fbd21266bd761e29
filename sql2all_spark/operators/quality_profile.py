"""Per-domain quality profile (VERDICT r14 #6): classifier score x
domain label — the table that decides per-domain keep thresholds.

FineWeb/DCLM-class pipelines don't apply ONE global quality threshold:
they inspect the score distribution PER DOMAIN (a threshold tuned on web
prose over-drops code and reference material) and set per-domain tau.
This operator is that governance table — the composition of two green
shapes over the shared id space (the fusion.py fixture note:
documents.doc_id == embeddings.vec_id):

1. the quality-classifier SCORING leg (``functions/clf_core.py``; the
   trained round-4 weights re-enter as literals via the session weight
   store — zero training jobs when any classifier leg already ran);
2. the seeded nearest-centroid DOMAIN assignment
   (``functions/domain_core.py``; broadcast-cross + struct-MIN).

ONE slim doc-id join bridges them (the embed_domain_mix_novelty bridge
discipline): the scored side carries (doc_id, p_fx, kept), the domain
side (vec_id, domain) — never text, never embeddings.  Documents
without an embedding profile under 'unassigned' (LEFT join), so the
doc totals reconcile exactly against text_quality_filter's.

Output per (domain, kept): doc counts and exact BIGINT fixed-point
score sums/extrema — the same profile columns as the lang-keyed filter
leg, keyed by learned domain instead.

At 100 TB: two corpus scans (documents features, embeddings
assignment), both row-local against broadcast model tables; one
doc-id-keyed exchange pair for the bridge join; a k*2-row output.

Reference parity note: SQL2ALL has no ML/text surface (its SQL passes
through verbatim — src/db/sqlite.rs:79); LLM-pipeline extension family
(SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.cache import persist_tracked
from sql2all_spark.functions.clf_core import (
    CLF_HALF,
    CLF_ROUNDS,
    _Z_W_SQL,
    _feats,
    _p_fx,
    _p_fx_sql,
    _w_chain_sql,
    _z,
    trained_weights,
)
from sql2all_spark.functions.domain_core import (
    assign_ctes,
    assigned_domains,
    load_vecs,
)
from sql2all_spark.registry import register


def _profile_oracle() -> str:
    return (
        _w_chain_sql(with_acc=False)
        + f""",
{assign_ctes()},
dom AS (SELECT vec_id, c_label AS domain FROM assign WHERE rk = 1),
scored AS (
  SELECT f.doc_id, {_p_fx_sql(_Z_W_SQL)} AS p_fx
  FROM feats f, w{CLF_ROUNDS} w
)
SELECT COALESCE(CAST(d.domain AS VARCHAR), 'unassigned') AS domain,
       CAST(s.p_fx >= {CLF_HALF} AS INTEGER) AS kept,
       COUNT(*) AS n_docs,
       CAST(SUM(s.p_fx) AS BIGINT) AS sum_p_fx,
       MIN(s.p_fx) AS min_p_fx,
       MAX(s.p_fx) AS max_p_fx
FROM scored s LEFT JOIN dom d ON d.vec_id = s.doc_id
GROUP BY domain, kept
ORDER BY domain ASC NULLS FIRST, kept ASC NULLS FIRST
"""
    )


@register(
    "embed_domain_quality_profile",
    oracle=_profile_oracle(),
    doc="Per-domain quality profile — the per-domain-tau decision table:"
    " the trained quality classifier scores every document (stored"
    " round-4 weights as literals, zero training jobs on a warm"
    " session), the seeded nearest-centroid labeler assigns every"
    " embedding a domain (broadcast-cross + struct-MIN), and ONE slim"
    " doc-id LEFT join bridges the two green shapes — per (domain,"
    " kept): doc counts and exact BIGINT score sums/extrema (domain"
    " cast to STRING in both engines — the fixture label is an INTEGER"
    " and an implicit int/varchar coalesce coercion diverges).  Documents"
    " without an embedding profile under 'unassigned', so totals"
    " reconcile exactly against text_quality_filter.",
)
def embed_domain_quality_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    feats = _feats(spark, sf_dir).transform(persist_tracked)
    w = trained_weights(feats, sf_dir)
    scored = feats.select(
        "doc_id", _p_fx(_z(w)).alias("p_fx")
    ).withColumn("kept", (F.col("p_fx") >= F.lit(CLF_HALF)).cast("int"))
    dom = assigned_domains(load_vecs(spark, sf_dir)).select(
        F.col("vec_id").alias("doc_id"), "domain"
    )
    return (
        scored.join(dom, "doc_id", "left")
        .select(
            F.coalesce(
                F.col("domain").cast("string"), F.lit("unassigned")
            ).alias("domain"),
            "kept",
            "p_fx",
        )
        .groupBy("domain", "kept")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("p_fx").alias("sum_p_fx"),
            F.min("p_fx").alias("min_p_fx"),
            F.max("p_fx").alias("max_p_fx"),
        )
        .orderBy(
            F.col("domain").asc_nulls_first(), F.col("kept").asc_nulls_first()
        )
    )
