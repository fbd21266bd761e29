"""Template-family KEEPER policy (VERDICT r14 #5): the action leg after
``text_template_mining``'s enumeration.

A real pipeline doesn't stop at the family report — it decides, per
boilerplate family, WHICH occurrence survives and what gets stripped
from every other document (license headers, navigation bars, footer
boilerplate).  This is ``text_template_mining`` composed with the
``dedup_keeper_select`` policy machinery:

1. **Spans** — a family's hits inside one document form runs of
   consecutive gram positions; each maximal run is ONE strip span
   covering ``run_length + GRAM - 1`` words (the ts_sessionize
   ``pos - row_number`` run-grouping trick, windowed per
   (family, doc)).
2. **Keeper** — the canonical occurrence is the span with the smallest
   (doc_id, span_start): deterministic, content-free, and stable under
   re-runs (the dedup keeper's argmin-by-struct policy, so the choice
   is a partial-aggregatable ``MIN(struct(...))`` — no family-level
   window, no second shuffle beyond the one ``groupBy(family_id)``).
3. **Governance row** — per family: the keeper's location, total span
   count and document coverage, and the exact token volume the strip
   saves (every non-keeper span removed).

Scale shape: everything downstream of ``dup_gram_hits`` is
hit-table-sized (slim (doc_id, pos, h, family) rows — never raw text,
never pair-space); the run-grouping window partitions by
(family, doc) — bounded partitions by construction (a single document's
positions); the keeper argmin is map-side combinable.  The oracle
replays the identical policy over the shared recursive-CTE family
closure (``template.family_ctes``).

Reference parity note: SQL2ALL has no text surface (its SQL passes
through verbatim — src/db/sqlite.rs:79); LLM-pipeline extension family
(SURVEY.md §2), sibling of dedup_keeper_select.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql2all_spark.operators.template import (
    DUP_SPAN_GRAM,
    family_ctes,
    family_hits,
)
from sql2all_spark.registry import register


def _keeper_oracle() -> str:
    return f"""
WITH RECURSIVE
{family_ctes()},
runs AS (
  SELECT f.family_id, hits.doc_id, hits.pos,
         hits.pos - ROW_NUMBER() OVER (
           PARTITION BY f.family_id, hits.doc_id
           ORDER BY hits.pos ASC) AS grp
  FROM hits JOIN fam f ON f.h = hits.h
),
spans AS (
  SELECT family_id, doc_id,
         CAST(MIN(pos) AS BIGINT) AS span_start,
         CAST(COUNT(*) + {DUP_SPAN_GRAM - 1} AS BIGINT) AS span_tokens
  FROM runs GROUP BY family_id, doc_id, grp
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY family_id
           ORDER BY doc_id ASC, span_start ASC) AS rn
  FROM spans
)
SELECT family_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
         AS keeper_doc_id,
       CAST(MAX(CASE WHEN rn = 1 THEN span_start END) AS BIGINT)
         AS keeper_span_start,
       CAST(MAX(CASE WHEN rn = 1 THEN span_tokens END) AS BIGINT)
         AS keeper_tokens,
       CAST(SUM(span_tokens) - MAX(CASE WHEN rn = 1 THEN span_tokens END)
            AS BIGINT) AS strip_tokens
FROM ranked
GROUP BY family_id
ORDER BY strip_tokens DESC NULLS LAST, family_id ASC NULLS FIRST
"""


@register(
    "text_template_keeper",
    oracle=_keeper_oracle(),
    doc="Template-family keeper policy — the action leg of"
    " text_template_mining (what a pipeline executes after the"
    " enumeration): per family, merge each document's consecutive"
    " gram positions into strip SPANS (pos - row_number run grouping,"
    f" each covering run+{DUP_SPAN_GRAM - 1} words), keep the canonical"
    " span with the smallest (doc_id, span_start) — a"
    " partial-aggregatable MIN(struct), the dedup_keeper_select"
    " policy — and report per family the keeper location, span/doc"
    " coverage, and the exact token volume stripping every other span"
    " saves.  Scale shape: hit-table-sized throughout, no pair-space"
    " join, the only window partitions by (family, doc) — single-"
    "document-bounded.",
)
def text_template_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits, fam = family_hits(spark, sf_dir)
    runs = hits.join(fam, "h").select(
        "family_id",
        "doc_id",
        "pos",
        (
            F.col("pos").cast("long")
            - F.row_number().over(
                Window.partitionBy("family_id", "doc_id").orderBy(
                    F.col("pos").asc()
                )
            )
        ).alias("grp"),
    )
    spans = runs.groupBy("family_id", "doc_id", "grp").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.count(F.lit(1)) + F.lit(DUP_SPAN_GRAM - 1))
        .cast("long")
        .alias("span_tokens"),
    )
    # keeper argmin without a family-level window: MIN over the struct
    # (doc_id, span_start, span_tokens) — map-side combinable
    per = spans.groupBy("family_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.min(
            F.struct(
                F.col("doc_id").alias("d"),
                F.col("span_start").alias("s"),
                F.col("span_tokens").alias("t"),
            )
        ).alias("k"),
        F.sum("span_tokens").cast("long").alias("tot_tokens"),
    )
    return per.select(
        "family_id",
        "n_spans",
        "n_docs",
        F.col("k.d").cast("long").alias("keeper_doc_id"),
        F.col("k.s").alias("keeper_span_start"),
        F.col("k.t").alias("keeper_tokens"),
        (F.col("tot_tokens") - F.col("k.t")).alias("strip_tokens"),
    ).orderBy(
        F.col("strip_tokens").desc_nulls_last(),
        F.col("family_id").asc_nulls_first(),
    )
