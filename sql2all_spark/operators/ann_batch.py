"""Grouped (batched) approximate-nearest-neighbor retrieval.

``sim_lsh_ann`` answers ONE probe; RAG serving answers a BATCH of queries
per request — "for each of these Q query embeddings, give me the top-k
corpus neighbors".  This operator is that shape: a query batch (held-out
vectors) LSH-joins the corpus on hyperplane-sign band keys, exact cosine
scores the candidates, and a window partitioned BY QUERY keeps the top-k
per probe.

Scale shape: the query batch is small and broadcasts end-to-end (banded
keys for candidate generation, vectors for scoring) — corpus embeddings
never shuffle for candidates; the only exchange after scoring is the
per-query top-k window, whose input is already bounded by bucket
occupancy × batch size.  At 100 TB the corpus streams through one
broadcast-probe pass per batch: O(corpus) work, O(batch) memory, and the
top-k heap per query is k-bounded.  Reference parity: the reference
delegates vector work entirely (SURVEY §2 extension surface); this is the
batched twin of its single-probe path.

The oracle mirrors the banding (blocking-aware form, like
``sim_embed_contamination``) so the driver hash-verifies candidate
geometry and exact cosines cell-for-cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql2all_spark.functions.embed import (
    N_PLANES,
    cosine,
    cosine_sql,
    dbl,
    sign_bucket,
    sign_bucket_sql,
)
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

QUERY_MOD = 23  # vec_id % 23 == 0 -> ~4.3% of vectors form the query batch
N_BANDS = 2
PLANES_PER_BAND = N_PLANES // N_BANDS
TOP_K = 5


def _band_keys_sql() -> str:
    return ", ".join(
        f"'{j}:' || substr(bucket, {j * PLANES_PER_BAND + 1}, {PLANES_PER_BAND})"
        for j in range(N_BANDS)
    )


def _band_keys_spark() -> F.Column:
    return F.array(
        *[
            F.concat(
                F.lit(f"{j}:"),
                F.substring("bucket", j * PLANES_PER_BAND + 1, PLANES_PER_BAND),
            )
            for j in range(N_BANDS)
        ]
    )


def _oracle() -> str:
    cos = cosine_sql("cv.v", "qv.v")
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {sign_bucket_sql("CAST(embedding AS DOUBLE[])")} AS bucket
  FROM embeddings
),
qb AS (
  SELECT vec_id, UNNEST([{_band_keys_sql()}]) AS band_key
  FROM v WHERE vec_id % {QUERY_MOD} = 0
),
cb AS (
  SELECT vec_id, UNNEST([{_band_keys_sql()}]) AS band_key
  FROM v WHERE vec_id % {QUERY_MOD} <> 0
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id
  FROM cb c JOIN qb q ON c.band_key = q.band_key
),
scored AS (
  SELECT cand.query_id, cand.corpus_id,
         ROUND({cos}, 6) AS cosine
  FROM cand
  JOIN v cv ON cv.vec_id = cand.corpus_id
  JOIN v qv ON qv.vec_id = cand.query_id
),
ranked AS (
  SELECT query_id, corpus_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, corpus_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, corpus_id, cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id ASC NULLS FIRST, rank ASC NULLS FIRST
"""


def embedding_view(e: DataFrame) -> DataFrame:
    """(vec_id, v, bucket) projection shared by the batch operator and the
    streaming leg (``streaming.jobs.grouped_ann_stream``)."""
    emb = dbl(F.col("embedding"))
    return e.select("vec_id", emb.alias("v"), sign_bucket(emb).alias("bucket"))


def grouped_ann(queries: DataFrame, corpus: DataFrame) -> DataFrame:
    """Top-``TOP_K`` corpus neighbors for every query vector.

    Both inputs are ``embedding_view`` projections.  The query side is
    assumed small (a serving batch) and broadcasts end-to-end."""
    qb = queries.select(
        F.col("vec_id").alias("query_id"),
        F.explode(_band_keys_spark()).alias("band_key"),
    )
    cb = corpus.select(
        F.col("vec_id").alias("corpus_id"),
        F.explode(_band_keys_spark()).alias("band_key"),
    )
    cand = (
        cb.join(F.broadcast(qb), "band_key")
        .select("query_id", "corpus_id")
        .distinct()
    )
    qv = queries.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    scored = (
        cand.join(
            corpus.select(F.col("vec_id").alias("corpus_id"), "v"), "corpus_id"
        )
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "corpus_id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "corpus_id", "cosine")
        .orderBy(
            F.col("query_id").asc_nulls_first(), F.col("rank").asc_nulls_first()
        )
    )


@register(
    "sim_grouped_ann",
    oracle=_oracle(),
    doc=f"Batched ANN retrieval (the RAG serving shape): every query in"
    f" the batch (vec_id % {QUERY_MOD} == 0) gets its top-{TOP_K} corpus"
    f" neighbors from {N_BANDS}-band × {PLANES_PER_BAND}-bit hyperplane"
    " LSH candidate generation + exact cosine verification, ranked on the"
    " ROUNDED cosine with a corpus-id tiebreak (the cross-engine-"
    "deterministic form).  The batch broadcasts end-to-end — corpus"
    " embeddings never shuffle for candidates; the per-query window's"
    " input is bucket-bounded, not corpus-bounded.",
)
def sim_grouped_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = embedding_view(load_table(spark, sf_dir, "embeddings"))
    return grouped_ann(
        v.filter(F.col("vec_id") % QUERY_MOD == 0),
        v.filter(F.col("vec_id") % QUERY_MOD != 0),
    )


K_NEG = 5  # hard negatives per anchor


def _labeled_view(e: DataFrame) -> DataFrame:
    emb = dbl(F.col("embedding"))
    return e.select(
        "vec_id", "label", emb.alias("v"), sign_bucket(emb).alias("bucket")
    )


def _negatives_oracle() -> str:
    cos = cosine_sql("cv.v", "qv.v")
    return f"""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         {sign_bucket_sql("CAST(embedding AS DOUBLE[])")} AS bucket
  FROM embeddings
),
qb AS (
  SELECT vec_id, label, UNNEST([{_band_keys_sql()}]) AS band_key
  FROM v WHERE vec_id % {QUERY_MOD} = 0
),
cb AS (
  SELECT vec_id, label, UNNEST([{_band_keys_sql()}]) AS band_key
  FROM v WHERE vec_id % {QUERY_MOD} <> 0
),
cand AS (
  SELECT DISTINCT q.vec_id AS anchor_id, q.label AS anchor_label,
                  c.vec_id AS negative_id, c.label AS negative_label
  FROM cb c JOIN qb q ON c.band_key = q.band_key
  WHERE c.label <> q.label
),
scored AS (
  SELECT cand.anchor_id, cand.anchor_label,
         cand.negative_id, cand.negative_label,
         ROUND({cos}, 6) AS cosine
  FROM cand
  JOIN v cv ON cv.vec_id = cand.negative_id
  JOIN v qv ON qv.vec_id = cand.anchor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                               ORDER BY cosine DESC, negative_id ASC)
              AS rank
  FROM scored
)
SELECT anchor_id, anchor_label, CAST(rank AS INT) AS rank,
       negative_id, negative_label, cosine
FROM ranked WHERE rank <= {K_NEG}
ORDER BY anchor_id ASC NULLS FIRST, rank ASC NULLS FIRST
"""


@register(
    "sim_hard_negatives",
    oracle=_negatives_oracle(),
    doc=f"Hard-negative mining (the metric-learning/embedding-training"
    f" step): for every anchor in the batch (vec_id % {QUERY_MOD} == 0),"
    f" the top-{K_NEG} most-cosine-similar corpus vectors with a"
    " DIFFERENT label — the near-miss impostors a contrastive loss"
    " learns the most from.  Same LSH band candidate generation as"
    " sim_grouped_ann (candidates ARE the high-similarity region, which"
    " is exactly where hard negatives live), label exclusion applied at"
    " the candidate stage before any scoring work, exact-cosine"
    " verification, per-anchor bounded top-k.  Scale shape: the anchor"
    " batch broadcasts end-to-end; corpus embeddings never shuffle for"
    " candidates; label filtering drops same-class candidates before"
    " the (already bucket-bounded) scoring join.",
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _labeled_view(load_table(spark, sf_dir, "embeddings"))
    anchors = v.filter(F.col("vec_id") % QUERY_MOD == 0)
    corpus = v.filter(F.col("vec_id") % QUERY_MOD != 0)
    qb = anchors.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.explode(_band_keys_spark()).alias("band_key"),
    )
    cb = corpus.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.explode(_band_keys_spark()).alias("band_key"),
    )
    cand = (
        cb.join(F.broadcast(qb), "band_key")
        .filter(F.col("negative_label") != F.col("anchor_label"))
        .select("anchor_id", "anchor_label", "negative_id", "negative_label")
        .distinct()
    )
    qv = anchors.select(
        F.col("vec_id").alias("anchor_id"), F.col("v").alias("qv")
    )
    scored = (
        cand.join(
            corpus.select(F.col("vec_id").alias("negative_id"), "v"),
            "negative_id",
        )
        .join(F.broadcast(qv), "anchor_id")
        .select(
            "anchor_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K_NEG)
        .select(
            "anchor_id",
            "anchor_label",
            F.col("rank").cast("int").alias("rank"),
            "negative_id",
            "negative_label",
            "cosine",
        )
        .orderBy(
            F.col("anchor_id").asc_nulls_first(),
            F.col("rank").asc_nulls_first(),
        )
    )
