"""Bitext mining: margin-based parallel-pair extraction across two
embedding "languages" — the LASER/CCMatrix pipeline step that mines
parallel training corpora from comparable ones (Artetxe & Schwenk 2019,
"Margin-based Parallel Corpus Mining with Multilingual Sentence
Embeddings"; Schwenk et al. 2021 CCMatrix).

Raw cosine is a poor mining criterion because some sentences are
"hubs" — similar to everything — so the paper scores a candidate pair
by its MARGIN over each side's average similarity to its k nearest
neighbors.  This module implements the paper's *distance* margin
(§3.2):

    margin(x, y) = cos(x, y) − (avgk(x) + avgk(y)) / 2

where avgk(s) is the mean cosine of s's top-k candidate neighbors on
the opposite side.  A pair is accepted when its margin clears a floor
AND y is x's margin-argmax (forward selection).

The label column stands in for the language id (SRC_LABEL vs
TGT_LABEL — the fixture's 10 balanced classes give two ~50-vector
sides at sf0.01).

Scale shape (the 100 TB story): candidate pairs come from the shared
6-bit hyperplane signature split into 2 OR-amplified 3-bit bands — two
equi-joins on band keys, never a src×tgt cross product; the kNN
averages are computed over the SAME banded candidate set (exactly the
ANN-kNN approximation the production systems use — FAISS kNN, not
exact); per-side aggregates are bounded top-k windows keyed on the
pair's own join keys.  Everything after candidate mining is linear in
the candidate count.

Reference parity: SQL2ALL has no vector surface (658-line core
delegates SQL to the attached DB — src/db/sqlite.rs:79); LLM-pipeline
extension surface (SURVEY.md §2 extension table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.cache import persist_tracked
from sql2all_spark.functions.embed import (
    cosine,
    cosine_sql,
    dbl,
    sign_bucket,
    sign_bucket_sql,
)
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

SRC_LABEL = 0
TGT_LABEL = 1
BITEXT_KNN = 4  # k for each side's neighborhood average
MARGIN_FLOOR = 0.05  # acceptance floor on the distance margin
# Determinism: the margin arithmetic runs in micro-unit BIGINTs — each
# side's kNN average is FLOOR(1e6·avg + 0.5) (the lm.py fixed-point
# discipline; ROUND on a raw double hits the Spark-vs-DuckDB shortest-
# repr midpoint trap, observed as a 1-ulp margin mismatch at sf0.01),
# and margin_u2 = 2e6·margin is an EXACT integer: 2·cos_u − ax_u − ay_u.
MARGIN_U2_FLOOR = int(MARGIN_FLOOR * 2_000_000)  # floor in margin_u2 units


def _bitext_oracle() -> str:
    cos = cosine_sql("s.v", "t.v")
    return f"""
WITH sigs AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         {sign_bucket_sql("CAST(embedding AS DOUBLE[])")} AS sig
  FROM embeddings WHERE label IN ({SRC_LABEL}, {TGT_LABEL})
),
sides AS (
  SELECT vec_id, label, v,
         substr(sig, 1, 3) AS b1, substr(sig, 4, 3) AS b2
  FROM sigs
),
cand AS (
  SELECT DISTINCT s.vec_id AS src_id, t.vec_id AS tgt_id,
         ROUND({cos}, 6) AS cosine
  FROM sides s JOIN sides t
    ON (s.b1 = t.b1 OR s.b2 = t.b2)
  WHERE s.label = {SRC_LABEL} AND t.label = {TGT_LABEL}
),
ax AS (
  SELECT src_id,
         CAST(FLOOR(1000000.0 *
                (CAST(SUM(CAST(cosine AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*)) + 0.5) AS BIGINT) AS avg_src_u
  FROM (
    SELECT src_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY src_id
                              ORDER BY cosine DESC NULLS LAST,
                                       tgt_id ASC) AS rk
    FROM cand
  ) WHERE rk <= {BITEXT_KNN}
  GROUP BY src_id
),
ay AS (
  SELECT tgt_id,
         CAST(FLOOR(1000000.0 *
                (CAST(SUM(CAST(cosine AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*)) + 0.5) AS BIGINT) AS avg_tgt_u
  FROM (
    SELECT tgt_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY tgt_id
                              ORDER BY cosine DESC NULLS LAST,
                                       src_id ASC) AS rk
    FROM cand
  ) WHERE rk <= {BITEXT_KNN}
  GROUP BY tgt_id
),
scored AS (
  SELECT c.src_id, c.tgt_id, c.cosine,
         2 * CAST(FLOOR(1000000.0 * c.cosine + 0.5) AS BIGINT)
           - ax.avg_src_u - ay.avg_tgt_u AS margin_u2
  FROM cand c JOIN ax USING (src_id) JOIN ay USING (tgt_id)
),
best AS (
  SELECT src_id, tgt_id, cosine, margin_u2,
         ROW_NUMBER() OVER (PARTITION BY src_id
                            ORDER BY margin_u2 DESC NULLS LAST,
                                     tgt_id ASC) AS rk
  FROM scored
)
SELECT src_id, tgt_id, cosine,
       margin_u2 / 2000000.0 AS margin,
       CASE WHEN margin_u2 >= {MARGIN_U2_FLOOR} THEN 1 ELSE 0 END AS accepted
FROM best WHERE rk = 1
"""


@register(
    "sim_bitext_margin_mine",
    oracle=_bitext_oracle(),
    doc="Margin-based bitext mining (Artetxe & Schwenk 2019, distance"
    f" margin, k={BITEXT_KNN}): for each source-side vector, its best"
    " target-side candidate scored by cos(x,y) minus the mean of both"
    " sides' k-nearest-candidate cosines — the hubness correction that"
    " raw cosine mining lacks.  Candidates come from 2 OR-amplified"
    " 3-bit hyperplane bands (two equi-joins, never src×tgt all-pairs);"
    " the kNN averages run over the same banded set (the production"
    " ANN-kNN approximation); per-side averages are bounded top-k"
    f" windows; accepted = margin >= {MARGIN_FLOOR}.",
)
def sim_bitext_margin_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "embeddings")
    sides = (
        e.filter(F.col("label").isin(SRC_LABEL, TGT_LABEL))
        .select(
            "vec_id",
            "label",
            dbl(F.col("embedding")).alias("v"),
            sign_bucket(dbl(F.col("embedding"))).alias("sig"),
        )
        .select(
            "vec_id",
            "label",
            "v",
            F.substring("sig", 1, 3).alias("b1"),
            F.substring("sig", 4, 3).alias("b2"),
        )
        .transform(persist_tracked)
    )
    src = sides.filter(F.col("label") == SRC_LABEL).select(
        F.col("vec_id").alias("src_id"),
        F.col("v").alias("sv"),
        F.col("b1").alias("sb1"),
        F.col("b2").alias("sb2"),
    )
    tgt = sides.filter(F.col("label") == TGT_LABEL).select(
        F.col("vec_id").alias("tgt_id"),
        F.col("v").alias("tv"),
        F.col("b1").alias("tb1"),
        F.col("b2").alias("tb2"),
    )
    # OR-amplified banding as TWO equi-joins (the dedup_minhash pattern):
    # a disjunctive join predicate would plan as a nested-loop product
    pairs = (
        src.join(tgt, F.col("sb1") == F.col("tb1"))
        .select("src_id", "tgt_id", "sv", "tv")
        .unionByName(
            src.join(tgt, F.col("sb2") == F.col("tb2")).select(
                "src_id", "tgt_id", "sv", "tv"
            )
        )
        .dropDuplicates(["src_id", "tgt_id"])
    )
    cand = pairs.select(
        "src_id",
        "tgt_id",
        F.round(cosine(F.col("sv"), F.col("tv")), 6).alias("cosine"),
    ).transform(persist_tracked)

    def side_avg(key: str, other: str, out: str) -> DataFrame:
        rk = F.row_number().over(
            Window.partitionBy(key).orderBy(
                F.col("cosine").desc_nulls_last(), F.col(other).asc()
            )
        )
        avg = (
            F.sum(F.col("cosine").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        )
        return (
            cand.withColumn("rk", rk)
            .filter(F.col("rk") <= BITEXT_KNN)
            .groupBy(key)
            .agg(
                F.floor(F.lit(1000000.0) * avg + F.lit(0.5))
                .cast("long")
                .alias(out)
            )
        )

    ax = side_avg("src_id", "tgt_id", "avg_src_u")
    ay = side_avg("tgt_id", "src_id", "avg_tgt_u")
    cos_u = F.floor(F.lit(1000000.0) * F.col("cosine") + F.lit(0.5)).cast(
        "long"
    )
    margin_u2 = (
        F.lit(2) * cos_u - F.col("avg_src_u") - F.col("avg_tgt_u")
    ).alias("margin_u2")
    best_rk = F.row_number().over(
        Window.partitionBy("src_id").orderBy(
            F.col("margin_u2").desc_nulls_last(), F.col("tgt_id").asc()
        )
    )
    return (
        cand.join(ax, "src_id")
        .join(ay, "tgt_id")
        .select("src_id", "tgt_id", "cosine", margin_u2)
        .withColumn("rk", best_rk)
        .filter(F.col("rk") == 1)
        .select(
            "src_id",
            "tgt_id",
            "cosine",
            (F.col("margin_u2") / F.lit(2000000.0)).alias("margin"),
            F.when(F.col("margin_u2") >= MARGIN_U2_FLOOR, 1)
            .otherwise(0)
            .alias("accepted"),
        )
    )
