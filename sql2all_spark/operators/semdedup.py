"""Semantic deduplication (SemDeDup-style) over the embedding column.

The embedding-space counterpart of ``dedup_minhash_lsh``/``dedup_simhash``
(surface-form near-dup) and the missing member of the LLM-curation dedup
family: two documents whose EMBEDDINGS are nearly parallel are semantic
duplicates even when their token n-grams share nothing (translations,
paraphrases, templated rewrites).  SemDeDup (Abbas et al. 2023,
arXiv:2303.09540) prunes them by clustering the embedding space and
dropping, within each cluster, all but one member of every
cosine-threshold neighborhood.

Pipeline composition — every stage reuses a soak-proven primitive:

1. **Cluster assignment**: argmax-cosine against K=8 fixed seed
   centroids, broadcast to every task (the exact assignment step of
   ``sim_kmeans_iteration``/``sim_ivf_topk``; at 100 TB the assignment is
   k-means-trained and stored as a partition column).
2. **Candidate generation**: adaptive LSH banding from
   ``sim_neardup_pairs`` (bits-per-band grows with corpus size via a lazy
   1-row count broadcast) — SemDeDup at scale generates within-cluster
   candidates by ANN, never all-pairs; this is that, with the recall
   contract of OR-amplified bands.  A fixed-K all-pairs-within-cluster
   formulation would be corpus²/K at any fixed K — the banding keeps the
   pair space linear-ish (sf1-soaked at 24s for the unfiltered variant).
3. **Verification + keeper policy**: exact cosine on candidates only;
   within a cluster, a vector is DROPPED when some lower-id vector in the
   same cluster is within the threshold (keep-lowest-id — deterministic
   stand-in for the paper's keep-farthest-from-centroid).  One governance
   row per dropped vector: its cluster, its keeper, the evidence cosine.

Determinism: float32 → double before arithmetic, left-to-right fold
cosines identical in both engines, rounded to 6 dp before every
comparison, id tiebreaks everywhere.

The threshold is fixture-calibrated (synthetic embeddings top out near
cosine 0.40 between distinct vectors; production SemDeDup uses ~0.95 on
real encoder output) — the parameter, not the plan, changes in
deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql2all_spark.cache import persist_tracked
from sql2all_spark.functions.embed import (
    NEARDUP_REGION,
    cosine as _cosine,
    cosine_sql as _cosine_sql,
    dbl as _dbl,
    dot as _dot,
    neardup_bucket,
    neardup_bucket_sql,
    neardup_ppb_col,
    neardup_ppb_sql,
)
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

SEM_K = 8  # seed centroids (vec_ids 1..K; matches sim_kmeans/sim_ivf seeds)
SEM_TAU = 0.35  # drop threshold on rounded cosine (fixture-calibrated)
_N_BANDS = 2  # OR-amplified band count, same scheme as sim_neardup_pairs


def _semdedup_oracle() -> str:
    band_keys = ", ".join(
        f"'{j}:' || substr(bucket, {j * NEARDUP_REGION + 1}, ppb)"
        for j in range(_N_BANDS)
    )
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {neardup_bucket_sql("CAST(embedding AS DOUBLE[])")} AS bucket
  FROM embeddings
),
pp AS ({neardup_ppb_sql("embeddings")}),
banded AS (
  SELECT vec_id, UNNEST([{band_keys}]) AS band_key FROM v, pp
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM banded a JOIN banded b USING (band_key)
  WHERE a.vec_id < b.vec_id
),
cents AS (
  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id BETWEEN 1 AND {SEM_K}
),
assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT v.vec_id, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY ROUND({_cosine_sql("v.v", "c.cv")}, 6) DESC,
                      c.cent_id ASC) AS rk
    FROM v CROSS JOIN cents c) t
  WHERE rk = 1
),
p AS (
  SELECT cand.vec_b, aa.cent_id, cand.vec_a,
         ROUND({_cosine_sql("va.v", "vb.v")}, 6) AS cosine
  FROM cand
  JOIN assign aa ON aa.vec_id = cand.vec_a
  JOIN assign bb ON bb.vec_id = cand.vec_b AND bb.cent_id = aa.cent_id
  JOIN v va ON va.vec_id = cand.vec_a
  JOIN v vb ON vb.vec_id = cand.vec_b
  WHERE ROUND({_cosine_sql("va.v", "vb.v")}, 6) >= {SEM_TAU}
)
SELECT vec_b AS vec_id, cent_id, MIN(vec_a) AS keeper,
       MAX(cosine) AS max_cosine
FROM p GROUP BY vec_b, cent_id
ORDER BY vec_id ASC NULLS FIRST
"""


@register(
    "dedup_semantic",
    oracle=_semdedup_oracle(),
    doc=f"SemDeDup-style semantic dedup: assign every embedding to its"
    f" max-cosine seed centroid (K={SEM_K}, broadcast — the"
    " sim_kmeans_iteration assignment step), generate candidate pairs via"
    " the adaptive LSH banding of sim_neardup_pairs (bits-per-band from a"
    " lazy 1-row count broadcast; never all-pairs, within clusters or"
    " not), then verify exact cosine on candidates and drop every vector"
    f" that has a LOWER-id same-cluster neighbor at rounded cosine >="
    f" {SEM_TAU} — one governance row per dropped vector (cluster,"
    " keeper, evidence cosine).  Scale shape: K-row broadcast for"
    " assignment, slim (vec_id, band_key) rows into the candidate"
    " equi-join, vectors hydrate candidates only, partial-agg keeper"
    " rollup.  The oracle replays assignment + banding + policy exactly,"
    " so the driver check proves the banded plan loses no drops.",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # lazy corpus count steers band specificity (action-free plan build)
    n = e.agg(F.count(F.lit(1)).alias("n_vec"))
    ppb = neardup_ppb_col("n_vec")
    emb = _dbl(F.col("embedding"))
    v = e.select(
        "vec_id",
        emb.alias("v"),
        F.sqrt(_dot(emb, emb)).alias("norm"),
        neardup_bucket(emb).alias("bucket"),
    ).transform(persist_tracked)

    cents = e.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= SEM_K)
    ).select(F.col("vec_id").alias("cent_id"), _dbl(F.col("embedding")).alias("cv"))
    # argmax-cosine via partial-aggregatable struct MIN on (negated
    # rounded cosine, cent_id) — identical to ranking by ROUND(cos,6)
    # DESC, cent_id ASC and keeping rk=1 (the domain_core.assigned_domains
    # pattern), but map-side combine collapses the K candidate rows per
    # vector BEFORE the exchange instead of shuffling and sorting all K
    # (guide §2.3 "aggregate before you shuffle").
    assign = (
        v.select("vec_id", "v")
        .crossJoin(F.broadcast(cents))
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    (-F.round(_cosine(F.col("v"), F.col("cv")), 6)).alias(
                        "nc"
                    ),
                    F.col("cent_id").alias("cent_id"),
                )
            ).alias("b")
        )
        .select("vec_id", F.col("b.cent_id").alias("cent_id"))
        .transform(persist_tracked)
    )

    banded = v.join(F.broadcast(n), F.lit(True)).select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{j}:"),
                        F.col("bucket").substr(
                            F.lit(j * NEARDUP_REGION + 1), ppb
                        ),
                    )
                    for j in range(_N_BANDS)
                ]
            )
        ).alias("band_key"),
    )
    cand = (
        banded.select(F.col("vec_id").alias("vec_a"), "band_key")
        .join(banded.select(F.col("vec_id").alias("vec_b"), "band_key"), "band_key")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )

    aa = assign.select(F.col("vec_id").alias("vec_a"), "cent_id")
    bb = assign.select(F.col("vec_id").alias("vec_b"), F.col("cent_id").alias("cent_b"))
    va = v.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("norm").alias("norm_a"))
    vb = v.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("norm").alias("norm_b"))
    cos = F.round(
        _dot(F.col("va"), F.col("vb")) / (F.col("norm_a") * F.col("norm_b")), 6
    )
    p = (
        cand.join(aa, "vec_a")
        .join(bb, "vec_b")
        .filter(F.col("cent_id") == F.col("cent_b"))
        .join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", "cent_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= SEM_TAU)
    )
    return (
        p.groupBy(F.col("vec_b").alias("vec_id"), "cent_id")
        .agg(
            F.min("vec_a").alias("keeper"),
            F.max("cosine").alias("max_cosine"),
        )
        .orderBy(F.col("vec_id").asc_nulls_first())
    )
