"""Radius (range) similarity search: all neighbors within a cosine
threshold, for a batch of query vectors.

Completes the similarity-search family: top-k answers "the k nearest"
(``sim_topk_bruteforce`` / ``sim_grouped_ann``); range search answers
"EVERYTHING closer than θ" — the primitive behind duplicate screening at
a fixed similarity bar, recall-complete contamination sweeps, and
density estimation around probe points.

Scale shape — deliberately NOT the banded-candidate plan: a radius query
must be recall-COMPLETE at θ, and for a small probe batch the optimal
distributed plan is exactly one scan: broadcast the Q probes (bounded),
score every (corpus row, probe) pair ROW-LOCAL inside whole-stage
codegen (Q cosine folds per row, no Python), filter ≥ θ, emit.  No
shuffle touches the corpus — the only exchange is the final
presentation sort of the (small) result.  At 100 TB this is an
embarrassingly parallel single pass; LSH banding (``sim_neardup_pairs``)
is the right tool only when the PROBE SET is the corpus itself.

Determinism: float32 → double before arithmetic, identical left-to-right
fold in both engines, rounded to 6 dp before the threshold compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.functions.embed import (
    cosine as _cosine,
    cosine_sql as _cosine_sql,
    dbl as _dbl,
)
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

RANGE_N_PROBES = 10  # probe batch: vec_ids 0..9
RANGE_THETA = 0.25  # cosine radius (fixture-calibrated; ~0.95 in prod)


@register(
    "sim_range_search",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {RANGE_N_PROBES}
),
c AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= {RANGE_N_PROBES}
)
SELECT q.query_id, c.vec_id, c.label,
       ROUND({_cosine_sql("c.v", "q.qv")}, 6) AS cosine
FROM c CROSS JOIN q
WHERE ROUND({_cosine_sql("c.v", "q.qv")}, 6) >= {RANGE_THETA}
ORDER BY query_id ASC NULLS FIRST, vec_id ASC NULLS FIRST
""",
    doc=f"Radius similarity search: every corpus vector within rounded"
    f" cosine >= {RANGE_THETA} of each of {RANGE_N_PROBES} probe"
    " vectors.  The recall-complete counterpart of grouped top-k ANN:"
    " probes broadcast (bounded batch), scoring is row-local JVM folds"
    " inside whole-stage codegen, the corpus is scanned exactly once"
    " with NO shuffle (the only exchange is the presentation sort of"
    " the small result) — the embarrassingly-parallel single-pass plan"
    " that holds unchanged at any corpus size.  Probe-set pushdown"
    " (vec_id < N) reaches the parquet scan on the broadcast side.",
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < RANGE_N_PROBES).select(
        F.col("vec_id").alias("query_id"), _dbl(F.col("embedding")).alias("qv")
    )
    c = e.filter(F.col("vec_id") >= RANGE_N_PROBES).select(
        "vec_id", "label", _dbl(F.col("embedding")).alias("v")
    )
    cos = F.round(_cosine(F.col("v"), F.col("qv")), 6)
    return (
        c.join(F.broadcast(q), F.lit(True))
        .select("query_id", "vec_id", "label", cos.alias("cosine"))
        .filter(F.col("cosine") >= RANGE_THETA)
        .orderBy(
            F.col("query_id").asc_nulls_first(), F.col("vec_id").asc_nulls_first()
        )
    )
