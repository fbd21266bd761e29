"""End-to-end curation FUNNEL: the per-stage survivor ledger a
production pretraining pipeline publishes with every data release —
how many documents entered each governance stage and how many left it.

Stages (each policy computed ON its stage's input, not the raw corpus
— the composition order is the semantics):

1. ``post_strip_dedup`` — template-strip the corpus and keep ONE doc
   per post-strip fingerprint (MIN doc_id, the dedup_post_strip
   keeper rule, applied to ALL groups, not just the n>=2 report).
2. ``domain_tau`` — classifier-score the SURVIVORS, assign domains,
   and keep each domain's upper half by the discrete-median tau
   (tau recomputed over the deduped survivor set: dedup first is the
   production order — duplicate mass must not move a quality bar).
3. ``source_caps`` — the RefinedWeb-style per-source cap (top CAP_N by
   score DESC, doc_id ASC) on the tau survivors — exactly
   ``embed_domain_tau_caps``'s tau-binds-first order.

One row per stage: docs in, docs out, docs dropped, and the integer
per-mille keep rate.  The table is the audit trail reviewers actually
read: where did the corpus go?

Composition (ONE definition per policy, zero re-implementation): the
strip rewrite is ``template_strip.strip_chain_ctes`` /
``cleaned_corpus``; the post-strip fingerprint is ``dedup_post_strip``'s
``base_hash``-of-cleaned-text; scoring is ``clf_core`` (stored weights
— zero training jobs warm); domain assignment is ``domain_core``; the
tau rule and the cap rank order are ``tau_apply``/``tau_caps``'s
(restricted to the survivor set, so the tau CTEs are written here
against the survivor join rather than splicing ``tau_chain_ctes``,
which is definitionally full-corpus).

Cross-engine determinism: every number is an exact COUNT; tau is the
discrete median (selected value, doc_id tiebreak); keep_p1000 is
integer arithmetic with an explicit zero guard.

Scale shape: the strip chain's pair-free hit-table shape feeds a slim
(fingerprint -> MIN doc_id) exchange; the survivor set crosses to the
scoring leg as an 8-byte doc_id semi-join (text never re-shuffles);
tau and the cap are two window passes over slim id/score rows (the
cap's ``rn <= CAP_N`` compiles to WindowGroupLimit); the four stage
counts are O(1)-row aggregates unioned at the end.  No stage re-scans
the corpus: the features scan and the embeddings scan run once each.

Reference parity note: SQL2ALL has no curation surface (its SQL passes
through verbatim — src/db/sqlite.rs:79); LLM-pipeline extension family
(SURVEY.md §2) — the capstone composition over strip -> dedup -> tau
-> caps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql2all_spark.cache import checkpoint_tracked, materialize_tracked
from sql2all_spark.functions.clf_core import (
    CAP_N,
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
from sql2all_spark.functions.hashing import base_hash, base_hash_sql
from sql2all_spark.operators.template_strip import (
    cleaned_corpus,
    strip_chain_ctes,
)
from sql2all_spark.registry import register


def _funnel_oracle() -> str:
    return f"""
WITH RECURSIVE
{strip_chain_ctes()},
perdoc AS (
  SELECT doc.doc_id,
         {base_hash_sql("COALESCE(c.txt, '')")} AS cleaned_fp
  FROM documents doc LEFT JOIN cleaned c ON c.doc_id = doc.doc_id
),
keep1 AS (
  SELECT MIN(doc_id) AS doc_id FROM perdoc GROUP BY cleaned_fp
),
{_w_chain_sql(with_acc=False, with_kw=False)},
{assign_ctes()},
dom AS (SELECT vec_id, c_label AS domain FROM assign WHERE rk = 1),
scored AS (
  SELECT f.doc_id, f.source, {_p_fx_sql(_Z_W_SQL)} AS p_fx
  FROM feats f, w{CLF_ROUNDS} w
),
surv AS (
  SELECT s.doc_id, s.source, s.p_fx
  FROM scored s JOIN keep1 k ON k.doc_id = s.doc_id
),
joined AS (
  SELECT COALESCE(CAST(d.domain AS VARCHAR), 'unassigned') AS domain,
         s.doc_id, s.source, s.p_fx
  FROM surv s LEFT JOIN dom d ON d.vec_id = s.doc_id
),
ranked AS (
  SELECT domain, doc_id, source, p_fx,
         ROW_NUMBER() OVER (
           PARTITION BY domain ORDER BY p_fx ASC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY domain) AS n
  FROM joined
),
tau AS (
  SELECT domain, p_fx AS tau FROM ranked WHERE rn = (n + 1) // 2
),
s2 AS (
  SELECT r.domain, r.doc_id, r.source, r.p_fx
  FROM ranked r JOIN tau t ON t.domain = r.domain
  WHERE r.p_fx >= t.tau
),
s3 AS (
  SELECT * FROM (
    SELECT doc_id, source, p_fx,
           ROW_NUMBER() OVER (
             PARTITION BY source ORDER BY p_fx DESC, doc_id ASC) AS rn2
    FROM s2
  ) WHERE rn2 <= {CAP_N}
),
c0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM keep1),
c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s2),
c3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s3)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS stage_ord, 'post_strip_dedup' AS stage,
         c0.n AS n_in, c1.n AS n_out, c0.n - c1.n AS n_dropped,
         CASE WHEN c0.n = 0 THEN 0
              ELSE c1.n * 1000 // c0.n END AS keep_p1000
  FROM c0, c1
  UNION ALL
  SELECT CAST(2 AS BIGINT) AS stage_ord, 'domain_tau' AS stage,
         c1.n AS n_in, c2.n AS n_out, c1.n - c2.n AS n_dropped,
         CASE WHEN c1.n = 0 THEN 0
              ELSE c2.n * 1000 // c1.n END AS keep_p1000
  FROM c1, c2
  UNION ALL
  SELECT CAST(3 AS BIGINT) AS stage_ord, 'source_caps' AS stage,
         c2.n AS n_in, c3.n AS n_out, c2.n - c3.n AS n_dropped,
         CASE WHEN c2.n = 0 THEN 0
              ELSE c3.n * 1000 // c2.n END AS keep_p1000
  FROM c2, c3
)
ORDER BY stage_ord ASC NULLS FIRST
"""


@register(
    "pipeline_pretrain_funnel",
    oracle=_funnel_oracle(),
    doc="Per-stage survivor funnel over the full curation composition:"
    " (1) template-strip + exact dedup on the post-strip fingerprint"
    " (MIN-doc_id keeper per group), (2) per-domain discrete-median"
    " tau on the SURVIVORS (dedup first — duplicate mass must not move"
    f" the quality bar), (3) per-source top-{CAP_N} cap on the tau"
    " survivors (tau-binds-first, the tau_caps order).  One audit row"
    " per stage: n_in, n_out, n_dropped, integer keep rate.  Every"
    " policy is composed from its shared core (strip chain, clf_core"
    " stored weights, domain_core assignment), none re-implemented.",
)
def pipeline_pretrain_funnel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _funnel_frame(spark, sf_dir, truncate=True)


def _funnel_frame(
    spark: SparkSession, sf_dir: str, truncate: bool = True
) -> DataFrame:
    """The funnel, with each policy stage materialized at its boundary.

    ``truncate=True`` (production, r17): the four stage frames are
    CHECKPOINTED (``cache.checkpoint_tracked``), so each stage executes
    exactly once and every downstream plan — the stage counts, the
    final 3-row explode — is a leaf scan.  Before this, the composed
    ~0.8 MB plan re-entered Catalyst per action and AQE re-planned
    ~100 exchanges of already-cached subtrees; the measured remaining
    cost of the query was that planning/scheduling floor, not bytes
    (guide §3.3 "materialising an intermediate truncates the plan";
    VERDICT r16 #1).  ``truncate=False`` keeps the fully-composed
    lineage (materialize_tracked) — the plan-pin test audits the
    parent shapes through it; values are identical either way."""
    stage = checkpoint_tracked if truncate else materialize_tracked
    d, cleaned, _spans = cleaned_corpus(spark, sf_dir)
    perdoc = (
        d.select("doc_id")
        .join(cleaned.select("doc_id", "txt"), "doc_id", "left")
        .select(
            "doc_id",
            base_hash(F.coalesce(F.col("txt"), F.lit(""))).alias(
                "cleaned_fp"
            ),
        )
    )
    # slim (fingerprint -> MIN doc_id) survivor set; persisted — the
    # scoring semi-join and the c1 count both read it
    keep1 = (
        perdoc.groupBy("cleaned_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .transform(stage)
    )
    feats = _feats(spark, sf_dir).transform(materialize_tracked)
    w = trained_weights(feats, sf_dir)
    scored = feats.select("doc_id", "source", _p_fx(_z(w)).alias("p_fx"))
    surv = scored.join(keep1, "doc_id")
    # dom's lineage is the 2-embeddings-scan assignment chain; it feeds
    # the broadcast side of the joined left join — materialize so the
    # broadcast build is a cache read (cache.materialize_tracked).
    dom = (
        assigned_domains(load_vecs(spark, sf_dir))
        .select(F.col("vec_id").alias("doc_id"), "domain")
        .transform(stage)
    )
    joined = surv.join(dom, "doc_id", "left").select(
        F.coalesce(F.col("domain").cast("string"), F.lit("unassigned")).alias(
            "domain"
        ),
        "doc_id",
        "source",
        "p_fx",
    )
    by_dom = Window.partitionBy("domain")
    ranked = joined.select(
        "domain",
        "doc_id",
        "source",
        "p_fx",
        F.row_number()
        .over(by_dom.orderBy(F.col("p_fx").asc(), F.col("doc_id").asc()))
        .alias("rn"),
        F.count(F.lit(1)).over(by_dom).alias("n"),
    ).transform(stage)  # tau + s2 + the c2/c3 counts read it
    tau = ranked.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "domain", F.col("p_fx").alias("tau")
    )
    # tau is bounded at k+1 rows — auto-broadcasts
    s2 = (
        ranked.join(tau, "domain")
        .filter(F.col("p_fx") >= F.col("tau"))
        .select("domain", "doc_id", "source", "p_fx")
        .transform(stage)
    )
    win_src = Window.partitionBy("source").orderBy(
        F.col("p_fx").desc(), F.col("doc_id").asc()
    )
    s3 = (
        s2.withColumn("rn2", F.row_number().over(win_src))
        .filter(F.col("rn2") <= CAP_N)
    )
    c0 = d.agg(F.count(F.lit(1)).cast("long").alias("n0"))
    c1 = keep1.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    c2 = s2.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    c3 = s3.agg(F.count(F.lit(1)).cast("long").alias("n3"))
    allc = (
        c0.join(F.broadcast(c1), F.lit(True))
        .join(F.broadcast(c2), F.lit(True))
        .join(F.broadcast(c3), F.lit(True))
    )

    # One explode over the single allc row instead of a 3-arm union of
    # selects from allc: the union form repeated the ENTIRE chain's
    # logical subtree three times (a ~1.5 MB physical plan whose
    # analysis/optimization dominated the query — guide §3.3 "planning
    # time itself can become the bottleneck") and executed the counts
    # three times.  The explode keeps ONE subtree and one execution;
    # rows, schema and values are identical.
    def _stage(ord_: int, name: str, n_in: str, n_out: str):
        return F.struct(
            F.lit(ord_).cast("long").alias("stage_ord"),
            F.lit(name).alias("stage"),
            F.col(n_in).alias("n_in"),
            F.col(n_out).alias("n_out"),
            (F.col(n_in) - F.col(n_out)).cast("long").alias("n_dropped"),
            F.expr(
                f"case when {n_in} = 0 then 0"
                f" else {n_out} * 1000 div {n_in} end"
            )
            .cast("long")
            .alias("keep_p1000"),
        )

    return (
        allc.select(
            F.explode(
                F.array(
                    _stage(1, "post_strip_dedup", "n0", "n1"),
                    _stage(2, "domain_tau", "n1", "n2"),
                    _stage(3, "source_caps", "n2", "n3"),
                )
            ).alias("s")
        )
        .select("s.*")
        .orderBy(F.col("stage_ord").asc_nulls_first())
    )
