"""Trigram language-model document scoring with Stupid Backoff.

Completes the LM-filter ladder: ``text_unigram_lm_score`` (order 0) →
``text_bigram_lm_score`` (order 1) → this (order 2, the smallest order
where Stupid Backoff's recursive chain actually recurses: trigram →
bigram → unigram, Brants et al. 2007).  score(w3|w1,w2) =
c(w1,w2,w3)/c(w1,w2) when the trigram is a model cell, else
ALPHA * score(w3|w2), which in turn backs off to ALPHA * p_uni(w3) —
no discounting, so every model cell is a ratio of two corpus counts
and the whole model is trivially distributable.

Scale shape (all model tables are count aggregates with map-side
combine, then bounded broadcasts):
- unigram / bigram / trigram counts: three slim keyed shuffles whose
  rows are (token[, token[, token]], count) — raw text never crosses
  an exchange; n-grams generate ROW-LOCAL from each doc's token array
  (no positional self-join);
- model cells: top-V / top-B / top-T via TakeOrderedAndProject
  (bounded heap), so the broadcast model is V + B + T rows at ANY
  corpus size; conditional probabilities come from joining each cell
  table against its CONTEXT count table (trigram cells / bigram
  counts, bigram cells / unigram counts);
- scoring: one pass over (doc_id, w1, w2, w3) rows with three
  broadcast left joins, then one keyed per-doc aggregation.

Cross-engine determinism (the ``text_bigram_lm_score`` contract,
reused verbatim): per-token scores are fixed-point BIGINTs
(floor(SCALE * -ln p + 0.5)) so doc sums are exact and order-free;
the backoff penalty -ln(ALPHA) is injected as the PRE-COMPUTED integer
literal S_BACKOFF into both engines; model-cell selection ties break
on (count desc, context asc, token asc).

Reference parity: the reference (SQL2ALL, src/lib.rs:76-90) delegates
arbitrary SQL to the backing engine; n-gram LM scoring is the
corpus-curation extension family (SURVEY §2.B "LLM-ext"), same public
algorithm as CCNet/KenLM perplexity filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.cache import persist_tracked
from sql2all_spark.operators.lm import BACKOFF_ALPHA, LM_SCALE, S_BACKOFF
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

VOCAB_TOP = 4096
BIGRAM_TOP = 512
TRIGRAM_TOP = 512


@register(
    "text_trigram_lm_score",
    oracle=f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 1
),
pr AS (
  SELECT doc_id,
         CASE WHEN i > 2 THEN w[i - 2] END AS w1,
         CASE WHEN i > 1 THEN w[i - 1] END AS w2,
         w[i] AS w3
  FROM (SELECT doc_id, w, UNNEST(range(1, len(w) + 1)) AS i FROM d)
),
counts AS (
  SELECT w3 AS token, COUNT(*) AS c FROM pr GROUP BY w3
),
tot AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS t FROM counts
),
vocab AS (
  SELECT token, c FROM counts
  ORDER BY c DESC NULLS LAST, token ASC NULLS FIRST
  LIMIT {VOCAB_TOP}
),
uscored AS (
  SELECT token,
         CAST(FLOOR({LM_SCALE}.0 * -LN(CAST(c AS DOUBLE) / t) + 0.5)
              AS BIGINT) AS s_uni
  FROM vocab, tot
),
bcounts AS (
  SELECT w2, w3, COUNT(*) AS c23 FROM pr WHERE w2 IS NOT NULL
  GROUP BY w2, w3
),
btop AS (
  SELECT w2, w3, c23 FROM bcounts
  ORDER BY c23 DESC NULLS LAST, w2 ASC NULLS FIRST, w3 ASC NULLS FIRST
  LIMIT {BIGRAM_TOP}
),
bscored AS (
  SELECT b.w2, b.w3,
         CAST(FLOOR({LM_SCALE}.0 *
                    -LN(CAST(b.c23 AS DOUBLE) / CAST(u.c AS DOUBLE)) + 0.5)
              AS BIGINT) AS s_bi
  FROM btop b JOIN counts u ON u.token = b.w2
),
tcounts AS (
  SELECT w1, w2, w3, COUNT(*) AS c123 FROM pr WHERE w1 IS NOT NULL
  GROUP BY w1, w2, w3
),
ttop AS (
  SELECT w1, w2, w3, c123 FROM tcounts
  ORDER BY c123 DESC NULLS LAST, w1 ASC NULLS FIRST,
           w2 ASC NULLS FIRST, w3 ASC NULLS FIRST
  LIMIT {TRIGRAM_TOP}
),
tscored AS (
  SELECT tt.w1, tt.w2, tt.w3,
         CAST(FLOOR({LM_SCALE}.0 *
                    -LN(CAST(tt.c123 AS DOUBLE) / CAST(bc.c23 AS DOUBLE))
                    + 0.5) AS BIGINT) AS s_tri
  FROM ttop tt JOIN bcounts bc ON bc.w2 = tt.w1 AND bc.w3 = tt.w2
),
tok AS (
  SELECT pr.doc_id,
         CASE WHEN ts.s_tri IS NOT NULL THEN 1 ELSE 0 END AS trigram_hit,
         CASE WHEN ts.s_tri IS NULL AND bs.s_bi IS NOT NULL THEN 1 ELSE 0
         END AS bigram_hit,
         CASE WHEN ts.s_tri IS NOT NULL THEN ts.s_tri
              WHEN bs.s_bi IS NOT NULL THEN
                bs.s_bi
                + CASE WHEN pr.w1 IS NOT NULL THEN {S_BACKOFF} ELSE 0 END
              ELSE COALESCE(us.s_uni,
                            CAST(FLOOR({LM_SCALE}.0 * -LN(1.0 / t) + 0.5)
                                 AS BIGINT))
                   + CASE WHEN pr.w1 IS NOT NULL THEN {S_BACKOFF} ELSE 0 END
                   + CASE WHEN pr.w2 IS NOT NULL THEN {S_BACKOFF} ELSE 0 END
         END AS s
  FROM pr
  CROSS JOIN tot
  LEFT JOIN tscored ts
         ON ts.w1 = pr.w1 AND ts.w2 = pr.w2 AND ts.w3 = pr.w3
  LEFT JOIN bscored bs ON bs.w2 = pr.w2 AND bs.w3 = pr.w3
  LEFT JOIN uscored us ON us.token = pr.w3
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(trigram_hit) AS BIGINT) AS n_trigram_hits,
       CAST(SUM(bigram_hit) AS BIGINT) AS n_bigram_hits,
       CAST((2 * SUM(s) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
         / {LM_SCALE}.0 AS avg_neglogp
FROM tok GROUP BY doc_id
""",
    doc=f"Stupid-Backoff trigram LM score: top-{TRIGRAM_TOP} trigram model"
    f" cells conditioned on their context bigram counts, backing off by"
    f" {BACKOFF_ALPHA}× per level to the top-{BIGRAM_TOP} bigram model,"
    f" then the top-{VOCAB_TOP} unigram vocabulary, then the 1/total OOV"
    " floor — the order-2 KenLM perplexity-band filter, and the smallest"
    " order where the backoff chain actually recurses.  Model tables are"
    " bounded broadcasts (V + B + T rows at any corpus size); n-grams"
    " generate row-local; per-token scores are fixed-point BIGINTs so"
    " doc sums are exact and order-free; the per-level backoff penalty"
    " is a precomputed integer literal in both engines.",
)
def text_trigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # materialized split + filter, then ONE select with the explode
    # inline (CollapseProject / Generate re-eval traps — see
    # text_contamination_check and text_bigram_lm_score)
    w = d.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= 1
    )
    pr = w.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w")),
                lambda i: F.struct(
                    F.when(i > 2, F.element_at(F.col("w"), i - 2)).alias("w1"),
                    F.when(i > 1, F.element_at(F.col("w"), i - 1)).alias("w2"),
                    F.element_at(F.col("w"), i).alias("w3"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2", "p.w3")

    counts = (
        pr.groupBy(F.col("w3").alias("token"))
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(persist_tracked)
    )
    # LAZY 1-row total broadcast (the ADVICE-r8 pattern): plan
    # construction runs no job; reads the persisted counts, not the corpus
    tot = counts.agg(F.sum("c").cast("double").alias("t"))
    scale = F.lit(float(LM_SCALE))
    uscored = (
        counts.orderBy(F.col("c").desc_nulls_last(), F.col("token").asc_nulls_first())
        .limit(VOCAB_TOP)
        .join(F.broadcast(tot), F.lit(True))
        .select(
            "token",
            F.floor(scale * -F.log(F.col("c").cast("double") / F.col("t")) + F.lit(0.5))
            .cast("long")
            .alias("s_uni"),
        )
    )
    bcounts = (
        pr.filter(F.col("w2").isNotNull())
        .groupBy("w2", "w3")
        .agg(F.count(F.lit(1)).alias("c23"))
        .transform(persist_tracked)
    )
    btop = bcounts.orderBy(
        F.col("c23").desc_nulls_last(),
        F.col("w2").asc_nulls_first(),
        F.col("w3").asc_nulls_first(),
    ).limit(BIGRAM_TOP)
    bscored = btop.join(
        counts.select(F.col("token").alias("w2"), F.col("c").alias("c2")), "w2"
    ).select(
        "w2",
        "w3",
        F.floor(
            scale * -F.log(F.col("c23").cast("double") / F.col("c2").cast("double"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("s_bi"),
    )
    ttop = (
        pr.filter(F.col("w1").isNotNull())
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c123"))
        .orderBy(
            F.col("c123").desc_nulls_last(),
            F.col("w1").asc_nulls_first(),
            F.col("w2").asc_nulls_first(),
            F.col("w3").asc_nulls_first(),
        )
        .limit(TRIGRAM_TOP)
    )
    # context counts for the trigram conditionals: bigram count of
    # (w1, w2), i.e. bcounts keyed on (prev=w1, cur=w2)
    tscored = ttop.join(
        bcounts.select(
            F.col("w2").alias("w1"), F.col("w3").alias("w2"), F.col("c23").alias("c12")
        ),
        ["w1", "w2"],
    ).select(
        "w1",
        "w2",
        "w3",
        F.floor(
            scale * -F.log(F.col("c123").cast("double") / F.col("c12").cast("double"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("s_tri"),
    )
    oov = F.floor(scale * -F.log(F.lit(1.0) / F.col("t")) + F.lit(0.5)).cast("long")
    back1 = F.when(F.col("w1").isNotNull(), S_BACKOFF).otherwise(0)
    back2 = F.when(F.col("w2").isNotNull(), S_BACKOFF).otherwise(0)
    tok = (
        pr.join(F.broadcast(tscored), ["w1", "w2", "w3"], "left")
        .join(F.broadcast(bscored), ["w2", "w3"], "left")
        .join(F.broadcast(uscored.withColumnRenamed("token", "w3")), "w3", "left")
        .join(F.broadcast(tot), F.lit(True))
        .select(
            "doc_id",
            F.when(F.col("s_tri").isNotNull(), 1).otherwise(0).alias("trigram_hit"),
            F.when(
                F.col("s_tri").isNull() & F.col("s_bi").isNotNull(), 1
            )
            .otherwise(0)
            .alias("bigram_hit"),
            F.when(F.col("s_tri").isNotNull(), F.col("s_tri"))
            .when(F.col("s_bi").isNotNull(), F.col("s_bi") + back1)
            .otherwise(F.coalesce(F.col("s_uni"), oov) + back1 + back2)
            .alias("s"),
        )
    )
    return tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("trigram_hit").cast("long").alias("n_trigram_hits"),
        F.sum("bigram_hit").cast("long").alias("n_bigram_hits"),
        # exact integer half-up average (the kn_trigram.py pattern;
        # ROUND(double, 6) is the NOTES.md r15 halfway TRAP — conversion
        # proven value-neutral on all four fixture SFs)
        (
            F.expr("(2 * sum(s) + count(1)) div (2 * count(1))").cast(
                "double"
            )
            / F.lit(float(LM_SCALE))
        ).alias("avg_neglogp"),
    )
