"""Looped PQ codebook training: N k-means rounds per subspace, then the
full ADC + exact-refine query — the production version of pq.py's single
refinement round (VERDICT r10 next-round item 5; Jégou et al. 2011 §III
train their codebooks to k-means convergence).

Loop discipline (the sim_kmeans_iteration / bpe_train pattern): each
round is one assign→recompute unit over the persisted subvector frame;
the new codebook — M×K = 256 slim rows — is collected to the driver and
re-created as a LITERAL frame, which truncates lineage AND makes every
round's physical plan identical (broadcast of a local relation into the
same assign aggregate; pinned by tests/test_plans.py).  A 256-row
collect is an O(1) driver scalar in the repo's escape-hatch taxonomy,
exactly like bpe_train's 1-row merge argmax.

k-means monotonicity: both loop steps are non-increasing in total
quantization error (assignment picks the argmin; the mean minimizes
within-cluster squared distance), so total assigned d2 per round is a
tested invariant (6dp centroid rounding bounds the wobble).  Measured
recall and quantization error per round are recorded in PERF_NOTES.

Cross-engine parity: the oracle unrolls the N rounds as CTE chains —
assign_k joins cb_{k-1}, cb_k re-aggregates per-dim DECIMAL(28,12)
means rounded to 6dp — byte-identical arithmetic to the Spark loop
(collected literals carry the exact rounded doubles).

Reference parity: SQL2ALL has no vector surface (658-line core delegates
SQL to the attached DB — src/db/sqlite.rs:79); LLM-pipeline extension
surface (SURVEY.md §2 extension table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.cache import persist_tracked
from sql2all_spark.functions.embed import DIM, dbl
from sql2all_spark.functions.pqmath import (
    PQ_M,
    PQ_SEED_IDS,
    PQ_SUB,
    adc_score,
    adc_table,
    assign_nearest,
    dist2,
    dist2_sql,
    encode,
    recompute_codebook,
    seed_codebook,
    subvector_frame,
)
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

PQ_TRAIN_ROUNDS = 3
TRAIN_PROBE_ID = 0
TRAIN_SHORTLIST = 100
TRAIN_TOPK = 10


def train_codebook(
    spark: SparkSession, subs: DataFrame, rounds: int = PQ_TRAIN_ROUNDS
) -> DataFrame:
    """N assign→recompute k-means rounds; returns the final (m, c, cv)
    codebook as a literal frame (lineage-free, plan-stable per round)."""
    cb = seed_codebook(subs)
    for _ in range(rounds):
        cb_rows = recompute_codebook(assign_nearest(subs, cb)).collect()
        cb = spark.createDataFrame(
            cb_rows, "m int, c int, cv array<double>"
        )
    return cb


def _train_oracle() -> str:
    seeds = ", ".join(str(i) for i in PQ_SEED_IDS)
    full = dist2_sql("v.v", "qv.v", DIM)
    rounds_sql = []
    for k in range(1, PQ_TRAIN_ROUNDS + 1):
        d2k = dist2_sql("s.sv", f"c.cv{k - 1}")
        rounds_sql.append(f"""
a{k} AS (
  SELECT s.vec_id, s.m, s.sv, c.c,
         ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                            ORDER BY ROUND({d2k}, 6) ASC, c.c ASC) AS rk
  FROM subs s JOIN cb{k - 1} c ON s.m = c.m
),
cb{k} AS (
  SELECT m, c, list(mean_val ORDER BY dim) AS cv{k}
  FROM (
    SELECT m, c, dim,
           ROUND(CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_val
    FROM (
      SELECT m, c, UNNEST(range(1, {PQ_SUB} + 1)) AS dim, UNNEST(sv) AS val
      FROM a{k} WHERE rk = 1
    ) GROUP BY m, c, dim
  ) GROUP BY m, c
)""")
    r = PQ_TRAIN_ROUNDS
    d2enc = dist2_sql("s.sv", f"c.cv{r}")
    qd2 = dist2_sql("q.sv", f"c.cv{r}")
    return f"""
WITH vecs AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
subs AS (
  SELECT vec_id, m,
         list_slice(v, m * {PQ_SUB} + 1, (m + 1) * {PQ_SUB}) AS sv
  FROM vecs, (SELECT UNNEST(range(0, {PQ_M})) AS m)
),
cb0 AS (
  SELECT s.m, ROW_NUMBER() OVER (PARTITION BY s.m ORDER BY s.vec_id) - 1 AS c,
         s.sv AS cv0
  FROM subs s WHERE s.vec_id IN ({seeds})
),{",".join(rounds_sql)},
enc AS (
  SELECT s.vec_id, s.m, c.c,
         ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                            ORDER BY ROUND({d2enc}, 6) ASC, c.c ASC) AS rk
  FROM subs s JOIN cb{r} c ON s.m = c.m
),
codes AS (SELECT vec_id, m, c FROM enc WHERE rk = 1),
adctab AS (
  SELECT q.m, c.c, ROUND({qd2}, 6) AS qd2
  FROM subs q JOIN cb{r} c ON q.m = c.m
  WHERE q.vec_id = {TRAIN_PROBE_ID}
),
scored AS (
  SELECT k.vec_id,
         string_agg(CAST(k.c AS VARCHAR), '-' ORDER BY k.m) AS pq_code,
         ROUND(CAST(SUM(CAST(a.qd2 AS DECIMAL(18,6))) AS DOUBLE), 6)
           AS adc_dist2
  FROM codes k JOIN adctab a ON k.m = a.m AND k.c = a.c
  GROUP BY k.vec_id
),
shortlist AS (
  SELECT vec_id, pq_code, adc_dist2 FROM scored
  WHERE vec_id != {TRAIN_PROBE_ID}
  ORDER BY adc_dist2 ASC, vec_id ASC
  LIMIT {TRAIN_SHORTLIST}
)
SELECT s.vec_id, v.label, s.pq_code, s.adc_dist2,
       ROUND({full}, 6) AS exact_dist2
FROM shortlist s
JOIN vecs v ON s.vec_id = v.vec_id
CROSS JOIN (SELECT v FROM vecs WHERE vec_id = {TRAIN_PROBE_ID}) qv
ORDER BY exact_dist2 ASC, s.vec_id ASC
LIMIT {TRAIN_TOPK}
"""


@register(
    "sim_pq_train_loop",
    oracle=_train_oracle(),
    doc=f"PQ+ADC+refine with codebooks trained for {PQ_TRAIN_ROUNDS} k-means"
    " rounds instead of pq.py's single refinement (Jégou et al. train to"
    " convergence): per round, one broadcast assign + one slim partial-"
    " aggregated recompute; the 256-row codebook collects to the driver and"
    " re-enters as a literal, so lineage stays flat and every round's plan"
    " is IDENTICAL (plan-pinned).  Total quantization error is non-"
    " increasing per round (k-means monotonicity, tested); the unrolled-CTE"
    " oracle proves the full chain including the final ANN answer.",
)
def sim_pq_train_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id", "label", dbl(F.col("embedding")).alias("v")
    ).transform(persist_tracked)
    subs = subvector_frame(vecs).transform(persist_tracked)
    cb = train_codebook(spark, subs)
    codes = encode(subs, cb)
    adctab = adc_table(subs, cb, TRAIN_PROBE_ID)
    shortlist = (
        adc_score(codes, adctab)
        .filter(F.col("vec_id") != TRAIN_PROBE_ID)
        .orderBy(
            F.col("adc_dist2").asc_nulls_last(),
            F.col("vec_id").asc_nulls_first(),
        )
        .limit(TRAIN_SHORTLIST)
    )
    qv = vecs.filter(F.col("vec_id") == TRAIN_PROBE_ID).select(
        F.col("v").alias("pv")
    )
    return (
        vecs.join(F.broadcast(shortlist), "vec_id")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            "pq_code",
            "adc_dist2",
            F.round(dist2(F.col("v"), F.col("pv")), 6).alias("exact_dist2"),
        )
        .orderBy(
            F.col("exact_dist2").asc_nulls_last(),
            F.col("vec_id").asc_nulls_first(),
        )
        .limit(TRAIN_TOPK)
    )
