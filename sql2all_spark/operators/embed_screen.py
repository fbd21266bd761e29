"""Embedding-space eval-contamination screen.

The third leg of the contamination family: ``text_contamination_check``
catches verbatim/near-verbatim n-gram overlap and ``dedup_incremental_screen``
catches shingle-level near-dups of new arrivals; neither catches a
PARAPHRASED eval item whose embedding still sits next to a training
document.  This operator screens the corpus against a small probe set
(held-out eval embeddings) in cosine space, LSH-banded so the pair space
stays bucket-local at any corpus size.

Scale shape (the asymmetric-broadcast design of text_contamination_check,
reused in embedding space): the probe side is tiny and its banded keys
broadcast; the corpus computes sign-buckets row-locally and equi-joins on
band keys — corpus embeddings never shuffle for candidate generation, and
exact cosine verification touches candidates only.  At 100 TB the corpus
side streams through one broadcast-probe pass: O(corpus) work, O(probe)
memory, no corpus×corpus term anywhere.

The oracle mirrors the banding (the established blocking-aware form used by
``sim_neardup_pairs``), so the driver hash-verifies the candidate geometry
and the exact cosines cell-for-cell.
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

PROBE_MOD = 29  # vec_id % 29 == 0 -> ~3.4% of vectors form the probe set
N_BANDS = 2
PLANES_PER_BAND = N_PLANES // N_BANDS
COS_THRESHOLD = 0.3


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
    cos = cosine_sql("cv.v", "pv.v")
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {sign_bucket_sql("CAST(embedding AS DOUBLE[])")} AS bucket
  FROM embeddings
),
pb AS (
  SELECT vec_id, UNNEST([{_band_keys_sql()}]) AS band_key
  FROM v WHERE vec_id % {PROBE_MOD} = 0
),
cb AS (
  SELECT vec_id, UNNEST([{_band_keys_sql()}]) AS band_key
  FROM v WHERE vec_id % {PROBE_MOD} <> 0
),
cand AS (
  SELECT DISTINCT c.vec_id AS corpus_id, p.vec_id AS probe_id
  FROM cb c JOIN pb p ON c.band_key = p.band_key
),
scored AS (
  SELECT cand.corpus_id, cand.probe_id,
         ROUND({cos}, 6) AS cosine
  FROM cand
  JOIN v cv ON cv.vec_id = cand.corpus_id
  JOIN v pv ON pv.vec_id = cand.probe_id
),
best AS (
  SELECT corpus_id, probe_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY corpus_id
                            ORDER BY cosine DESC, probe_id ASC) AS rn
  FROM scored
  WHERE cosine >= {COS_THRESHOLD}
)
SELECT corpus_id, probe_id, cosine
FROM best WHERE rn = 1
ORDER BY corpus_id ASC NULLS FIRST
"""


@register(
    "sim_embed_contamination",
    oracle=_oracle(),
    doc="Screen corpus embeddings against a held-out probe set (eval items,"
    f" vec_id % {PROBE_MOD} == 0) for cosine-space contamination:"
    f" {N_BANDS} bands × {PLANES_PER_BAND} hyperplane sign bits block the"
    " candidate space (OR-amplified), exact cosine verifies candidates"
    f" only, and each contaminated corpus doc reports its best (≥"
    f" {COS_THRESHOLD}) probe match — rank on the ROUNDED cosine with a"
    " probe-id tiebreak, the cross-engine-deterministic form.  The probe"
    " side broadcasts end-to-end: banded keys for candidate generation,"
    " vectors for verification — corpus embeddings never shuffle.",
)
def sim_embed_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    emb = dbl(F.col("embedding"))
    v = e.select("vec_id", emb.alias("v"), sign_bucket(emb).alias("bucket"))
    probe = v.filter(F.col("vec_id") % PROBE_MOD == 0)
    corpus = v.filter(F.col("vec_id") % PROBE_MOD != 0)

    pb = probe.select(
        F.col("vec_id").alias("probe_id"),
        F.explode(_band_keys_spark()).alias("band_key"),
    )
    cb = corpus.select(
        F.col("vec_id").alias("corpus_id"),
        F.explode(_band_keys_spark()).alias("band_key"),
    )
    cand = (
        cb.join(F.broadcast(pb), "band_key")
        .select("corpus_id", "probe_id")
        .distinct()
    )
    pv = probe.select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
    )
    scored = (
        cand.join(corpus.select(F.col("vec_id").alias("corpus_id"), "v"), "corpus_id")
        .join(F.broadcast(pv), "probe_id")
        .select(
            "corpus_id",
            "probe_id",
            F.round(cosine(F.col("v"), F.col("pv")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= COS_THRESHOLD)
    )
    w = Window.partitionBy("corpus_id").orderBy(
        F.col("cosine").desc(), F.col("probe_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("corpus_id", "probe_id", "cosine")
        .orderBy(F.col("corpus_id").asc_nulls_first())
    )
