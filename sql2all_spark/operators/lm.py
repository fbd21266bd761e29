"""Bigram language-model document scoring with Stupid Backoff.

Completes the LM-filter family: ``text_unigram_lm_score`` is the order-0
KenLM stand-in; this is the order-1 version actually used for perplexity-
band filtering (Brants et al. 2007 "Stupid Backoff": score(w2|w1) =
count(w1,w2)/count(w1) when the bigram is in the model, else
ALPHA * p_unigram(w2) — no discounting, which is exactly what makes it
distributable: every model cell is a ratio of two corpus counts).

Scale shape (all three model tables are count aggregates with map-side
combine, then bounded broadcasts):
- unigram counts: one slim (token, count) shuffle; top-V vocabulary via
  TakeOrderedAndProject (bounded heap);
- bigram counts: bigrams generated ROW-LOCAL from each doc's token array
  (no positional self-join), one slim (w1, w2, count) shuffle, top-B
  model cells via bounded heap, conditional probabilities from a join
  against the unigram counts;
- scoring: one pass over (doc_id, prev, cur) rows, two broadcast left
  joins, one keyed per-doc aggregation.  Raw text never crosses an
  exchange; the model size is V + B rows regardless of corpus size.

Cross-engine determinism: per-token scores are fixed-point BIGINTs
(floor(SCALE * -ln p + 0.5)) so doc sums are exact and order-free; the
backoff penalty -ln(ALPHA) is injected as a PRE-COMPUTED integer literal
into both engines (never re-derived from a float literal, whose ln could
differ in the last ulp); model-cell selection ties break on (count desc,
w1 asc, w2 asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.cache import persist_tracked
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

BIGRAM_TOP = 512  # model cells kept — small enough that backoff is LIVE
                  # at every test SF (sf0.01 has ~2.5k distinct bigrams)
LM_SCALE = 1_000_000
BACKOFF_ALPHA = 0.4
# floor(LM_SCALE * -ln(0.4) + 0.5), precomputed so BOTH engines add the
# identical integer instead of each taking ln of a float literal
S_BACKOFF = 916291


@register(
    "text_bigram_lm_score",
    oracle=f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 1
),
pr AS (
  SELECT doc_id,
         CASE WHEN i > 1 THEN w[i - 1] END AS w1,
         w[i] AS w2
  FROM (SELECT doc_id, w, UNNEST(range(1, len(w) + 1)) AS i FROM d)
),
counts AS (
  SELECT w2 AS token, COUNT(*) AS c FROM pr GROUP BY w2
),
tot AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS t FROM counts
),
vocab AS (
  SELECT token, c FROM counts
  ORDER BY c DESC NULLS LAST, token ASC NULLS FIRST
  LIMIT 4096
),
scored AS (
  SELECT token,
         CAST(FLOOR({LM_SCALE}.0 * -LN(CAST(c AS DOUBLE) / t) + 0.5)
              AS BIGINT) AS s_uni
  FROM vocab, tot
),
bcounts AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM pr WHERE w1 IS NOT NULL
  GROUP BY w1, w2
),
btop AS (
  SELECT w1, w2, c12 FROM bcounts
  ORDER BY c12 DESC NULLS LAST, w1 ASC NULLS FIRST, w2 ASC NULLS FIRST
  LIMIT {BIGRAM_TOP}
),
bscored AS (
  SELECT b.w1, b.w2,
         CAST(FLOOR({LM_SCALE}.0 *
                    -LN(CAST(b.c12 AS DOUBLE) / CAST(u.c AS DOUBLE)) + 0.5)
              AS BIGINT) AS s_bi
  FROM btop b JOIN counts u ON u.token = b.w1
),
tok AS (
  SELECT pr.doc_id,
         CASE WHEN bs.s_bi IS NOT NULL THEN 1 ELSE 0 END AS bigram_hit,
         CASE WHEN bs.s_bi IS NOT NULL THEN bs.s_bi
              ELSE COALESCE(sc.s_uni,
                            CAST(FLOOR({LM_SCALE}.0 * -LN(1.0 / t) + 0.5)
                                 AS BIGINT))
                   + CASE WHEN pr.w1 IS NOT NULL THEN {S_BACKOFF} ELSE 0 END
         END AS s
  FROM pr
  CROSS JOIN tot
  LEFT JOIN bscored bs ON bs.w1 = pr.w1 AND bs.w2 = pr.w2
  LEFT JOIN scored sc ON sc.token = pr.w2
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(bigram_hit) AS BIGINT) AS n_bigram_hits,
       CAST((2 * SUM(s) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
         / {LM_SCALE}.0 AS avg_neglogp
FROM tok GROUP BY doc_id
""",
    doc=f"Stupid-Backoff bigram LM score: top-{BIGRAM_TOP} bigram model"
    " cells (MLE conditional probabilities), backoff to"
    f" {BACKOFF_ALPHA} × unigram for unmodeled bigrams, pure unigram for"
    " each document's first token, OOV floor 1/total.  Low scores ="
    " predictable boilerplate, high = gibberish — the order-1 KenLM"
    " perplexity-band filter.  Model tables are bounded broadcasts"
    " (V + B rows at any corpus size); bigrams generate row-local;"
    " per-token scores are fixed-point BIGINTs so doc sums are exact and"
    " order-free; the backoff penalty is a precomputed integer literal"
    " in both engines.",
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # materialized split + filter (the CollapseProject recipe) then ONE
    # select with the explode inline (the Generate per-element re-eval
    # trap — see text_contamination_check)
    w = d.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= 1
    )
    pr = w.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w")),
                lambda i: F.struct(
                    F.when(i > 1, F.element_at(F.col("w"), i - 1)).alias("w1"),
                    F.element_at(F.col("w"), i).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")

    counts = (
        pr.groupBy(F.col("w2").alias("token"))
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(persist_tracked)
    )
    # Corpus total: a LAZY 1-row aggregate broadcast onto both consumers
    # (the sim_neardup_pairs ppb pattern) — plan construction runs no job
    # and the total reflects execution-time state (ADVICE r8).  The
    # aggregate reads the persisted (token, count) table, not the corpus.
    tot = counts.agg(F.sum("c").cast("double").alias("t"))
    scale = F.lit(float(LM_SCALE))
    scored = (
        counts.orderBy(F.col("c").desc_nulls_last(), F.col("token").asc_nulls_first())
        .limit(4096)
        .join(F.broadcast(tot), F.lit(True))
        .select(
            "token",
            F.floor(scale * -F.log(F.col("c").cast("double") / F.col("t")) + F.lit(0.5))
            .cast("long")
            .alias("s_uni"),
        )
    )
    btop = (
        pr.filter(F.col("w1").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .orderBy(
            F.col("c12").desc_nulls_last(),
            F.col("w1").asc_nulls_first(),
            F.col("w2").asc_nulls_first(),
        )
        .limit(BIGRAM_TOP)
    )
    bscored = btop.join(
        counts.select(F.col("token").alias("w1"), F.col("c").alias("c1")), "w1"
    ).select(
        "w1",
        "w2",
        F.floor(
            scale * -F.log(F.col("c12").cast("double") / F.col("c1").cast("double"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("s_bi"),
    )
    oov = F.floor(scale * -F.log(F.lit(1.0) / F.col("t")) + F.lit(0.5)).cast("long")
    tok = (
        pr.join(F.broadcast(bscored), ["w1", "w2"], "left")
        .join(
            F.broadcast(scored.withColumnRenamed("token", "w2")), "w2", "left"
        )
        .join(F.broadcast(tot), F.lit(True))
        .select(
            "doc_id",
            F.when(F.col("s_bi").isNotNull(), 1).otherwise(0).alias("bigram_hit"),
            F.when(F.col("s_bi").isNotNull(), F.col("s_bi"))
            .otherwise(
                F.coalesce(F.col("s_uni"), oov)
                + F.when(F.col("w1").isNotNull(), S_BACKOFF).otherwise(0)
            )
            .alias("s"),
        )
    )
    return tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("bigram_hit").cast("long").alias("n_bigram_hits"),
        # exact integer half-up average (the kn_trigram.py pattern;
        # ROUND(double, 6) is the NOTES.md r15 halfway TRAP — conversion
        # proven value-neutral on all four fixture SFs)
        (
            F.expr("(2 * sum(s) + count(1)) div (2 * count(1))").cast(
                "double"
            )
            / scale
        ).alias("avg_neglogp"),
    )
