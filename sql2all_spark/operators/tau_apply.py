"""Per-domain quality-threshold APPLICATION (the action leg of
``embed_domain_quality_profile``).

The profile is the table a curator reads to SET per-domain tau; this
operator applies the canonical relative policy — each domain keeps its
own upper half by classifier score (tau_d = the domain's discrete
median, rank ceil(n/2) ascending with a doc_id tiebreak) — and reports
the per-domain governance row: the tau actually used, keep counts, and
the exact fixed-point score mass kept.  A global threshold tuned on web
prose over-drops code/reference domains; the per-domain median is the
simplest threshold that adapts (FineWeb's per-dump quantile filters,
DCLM's per-source cuts are the production instances).

Composition (all shared cores, zero re-implementation): classifier
scoring from ``functions/clf_core.py`` (stored weights — zero training
jobs on a warm session), domain assignment from
``functions/domain_core.py``, the same slim doc-id LEFT-join bridge as
the profile ('unassigned' for docs without an embedding).

Determinism: tau is a SELECTED value (discrete median via ROW_NUMBER =
(n+1) div 2, doc_id tiebreak) — never an interpolated quantile, which
is engine-specific; keeps are ``p_fx >= tau`` (ties keep).  All
counts/sums are exact integers.

Scale shape: the per-domain rank needs ONE window pair partitioned by
domain — the ccnet NTILE trade, documented there: oracle-exact per-
group order statistics sort within the partition; production swaps in
a per-domain quantile SKETCH broadcast as a threshold table (no sort).
Everything else is the profile's shape: two row-local corpus scans
against broadcast models, one id-keyed bridge exchange, k-row output.

Reference parity note: SQL2ALL has no ML/text surface (its SQL passes
through verbatim — src/db/sqlite.rs:79); LLM-pipeline extension family
(SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql2all_spark.cache import persist_tracked
from sql2all_spark.functions.clf_core import (
    _feats,
    _p_fx,
    _w_chain_sql,
    _z,
    trained_weights,
)
from sql2all_spark.functions.domain_core import (
    assign_ctes,
    assigned_domains,
    load_vecs,
)
from sql2all_spark.functions.tau_core import tau_chain_ctes
from sql2all_spark.registry import register


def _tau_oracle() -> str:
    return (
        _w_chain_sql(with_acc=False)
        + f""",
{assign_ctes()},
{tau_chain_ctes()}
SELECT r.domain,
       CAST(MAX(t.tau) AS BIGINT) AS tau,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE r.p_fx >= t.tau) AS BIGINT) AS n_kept,
       CAST(COUNT(*) FILTER (WHERE r.p_fx >= t.tau) * 1000 // COUNT(*)
            AS BIGINT) AS kept_p1000,
       CAST(SUM(r.p_fx) FILTER (WHERE r.p_fx >= t.tau) AS BIGINT)
         AS kept_score_mass
FROM ranked r JOIN tau t ON t.domain = r.domain
GROUP BY r.domain
ORDER BY r.domain ASC NULLS FIRST
"""
    )


@register(
    "embed_domain_tau_apply",
    oracle=_tau_oracle(),
    doc="Per-domain threshold APPLICATION — the action leg of the"
    " quality profile: tau_d = each domain's DISCRETE median score"
    " (rank (n+1) div 2 ascending, doc_id tiebreak — a selected value,"
    " never an interpolated quantile, which is engine-specific), keeps"
    " = score >= tau_d (each domain keeps its own upper half — the"
    " relative per-domain cut that a global threshold gets wrong), and"
    " the per-domain governance row: tau used, keep counts, permille,"
    " exact kept score mass.  One window pair per domain (the ccnet"
    " NTILE oracle-exactness trade; production broadcasts a sketch"
    " threshold table instead), otherwise the profile's shape.",
)
def embed_domain_tau_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _feats(spark, sf_dir).transform(persist_tracked)
    w = trained_weights(feats, sf_dir)
    scored = feats.select("doc_id", _p_fx(_z(w)).alias("p_fx"))
    dom = assigned_domains(load_vecs(spark, sf_dir)).select(
        F.col("vec_id").alias("doc_id"), "domain"
    )
    joined = scored.join(dom, "doc_id", "left").select(
        F.coalesce(F.col("domain").cast("string"), F.lit("unassigned")).alias(
            "domain"
        ),
        "doc_id",
        "p_fx",
    )
    by_dom = Window.partitionBy("domain")
    # persisted (the tau_caps precedent): the tau derivation and the
    # probe side both read this slim frame — without the cache the
    # whole upstream (both corpus scans + the bridge + the domain
    # window) replays once per consumer (guide §5).
    ranked = joined.select(
        "domain",
        "p_fx",
        F.row_number()
        .over(by_dom.orderBy(F.col("p_fx").asc(), F.col("doc_id").asc()))
        .alias("rn"),
        F.count(F.lit(1)).over(by_dom).alias("n"),
    ).transform(persist_tracked)
    tau = ranked.filter(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select("domain", F.col("p_fx").alias("tau"))
    kept = F.col("p_fx") >= F.col("tau")
    return (
        ranked.join(tau, "domain")
        .groupBy("domain")
        .agg(
            F.max("tau").alias("tau"),
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(kept).alias("n_kept"),
            F.expr(
                "CAST(count_if(p_fx >= tau) * 1000 div count(1) AS BIGINT)"
            ).alias("kept_p1000"),
            F.sum(F.when(kept, F.col("p_fx"))).alias("kept_score_mass"),
        )
        .orderBy(F.col("domain").asc_nulls_first())
    )
