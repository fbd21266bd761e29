"""Similarity search over the embedding column (``array<float>``, dim 64):
brute-force cosine top-k (baseline), random-hyperplane LSH bucketing (the
scale path), and threshold near-dup pair mining.

Design for 100 TB:
- the query vector is a one-row DataFrame joined with an explicit
  ``broadcast()`` — the scan side streams, nothing shuffles;
- cosine is a JVM higher-order fold (``zip_with`` + ``aggregate``), no
  Python, no UDF — it runs inside whole-stage codegen;
- top-k is ``orderBy().limit(k)`` → Spark's TakeOrderedAndProject:
  per-partition bounded heaps + single merge, never a global sort;
- the LSH variant reduces the scanned candidate set to one bucket
  (~1/2^bits of the corpus): signatures are computed row-locally, and a
  real deployment would write them as a partition/bucket column so queries
  prune at the parquet level.

Determinism: float32 components are cast to double *before* any arithmetic,
folds run left-to-right in both engines (identical IEEE sequence), and
scores are rounded to 6 dp before ordering/comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Shared cross-engine embedding arithmetic (moved to functions/embed.py so
# front-window modules like embed_screen can use it without triggering this
# module's registrations at import time); aliased to keep call sites stable.
from sql2all_spark.functions.embed import DIM, N_PLANES
from sql2all_spark.functions.embed import HYPERPLANES as _HYPERPLANES
from sql2all_spark.functions.embed import cosine as _cosine
from sql2all_spark.functions.embed import cosine_sql as _cosine_sql
from sql2all_spark.functions.embed import dbl as _dbl
from sql2all_spark.functions.embed import dot as _dot
from sql2all_spark.functions.embed import dot_sql as _dot_sql
from sql2all_spark.functions.embed import sign_bucket as _bucket_spark
from sql2all_spark.functions.embed import sign_bucket_sql as _bucket_sql
from sql2all_spark.cache import persist_tracked
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table


BRUTE_TOPK_ORACLE = f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT e.vec_id, e.label,
         ROUND({_cosine_sql("CAST(e.embedding AS DOUBLE[])", "q.qv")}, 6) AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 0
)
SELECT vec_id, label, cosine
FROM scored
ORDER BY cosine DESC NULLS LAST, vec_id ASC NULLS FIRST
LIMIT 10
"""


@register(
    "sim_topk_bruteforce",
    oracle=BRUTE_TOPK_ORACLE,
    doc="Brute-force cosine top-10 for a query vector (vec_id 0): broadcast"
    " 1-row query × streamed scan, JVM fold for the dot product,"
    " TakeOrderedAndProject for the top-k.  The exact-search baseline every"
    " ANN variant is measured against.",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(_dbl(F.col("embedding")).alias("qv"))
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(_cosine(_dbl(F.col("embedding")), F.col("qv")), 6).alias(
                "cosine"
            ),
        )
    )
    return scored.orderBy(
        F.col("cosine").desc_nulls_last(), F.col("vec_id").asc_nulls_first()
    ).limit(10)


# Shared by sim_lsh_ann (computes signatures at query time) and
# sim_lsh_ann_indexed (reads them back from a bucket-partitioned store):
# same buckets, same exact in-bucket ranking, same fixpoint.
LSH_ANN_ORACLE = f"""
WITH sigs AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         {_bucket_sql("CAST(embedding AS DOUBLE[])")} AS bucket
  FROM embeddings
),
q AS (SELECT v AS qv, bucket AS qbucket FROM sigs WHERE vec_id = 0)
SELECT s.vec_id, s.label, s.bucket,
       ROUND({_cosine_sql("s.v", "q.qv")}, 6) AS cosine
FROM sigs s CROSS JOIN q
WHERE s.bucket = q.qbucket AND s.vec_id <> 0
ORDER BY cosine DESC NULLS LAST, vec_id ASC NULLS FIRST
"""


@register(
    "sim_lsh_ann",
    oracle=LSH_ANN_ORACLE,
    doc="ANN via random-hyperplane LSH: 6 sign bits → bucket id; search"
    " touches only the query's bucket (~corpus/2^6 expected) and ranks"
    " exactly inside it.  Scale path: persist `bucket` as a partition column"
    " so the parquet scan prunes to one bucket — the brute-force baseline"
    " (sim_topk_bruteforce) is the recall yardstick.",
)
def sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    sigs = e.select(
        "vec_id",
        "label",
        _dbl(F.col("embedding")).alias("v"),
        _bucket_spark(_dbl(F.col("embedding"))).alias("bucket"),
    )
    q = sigs.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    return (
        sigs.crossJoin(F.broadcast(q))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != 0))
        .select(
            "vec_id",
            "label",
            "bucket",
            F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc_nulls_last(), F.col("vec_id").asc_nulls_first())
    )


ANN_INDEX_ROOT = "/tmp/sql2all_spark_ann_index"

# Explicit read schema for the index: partition-column TYPE INFERENCE would
# otherwise parse a bit-string like '010110' as the integer 10110 (leading
# zero dropped) and corrupt the bucket keys.
ANN_INDEX_SCHEMA = "vec_id bigint, label int, v array<double>, bucket string"


def _signature_frame(emb: DataFrame) -> DataFrame:
    """(vec_id, label, v double[], bucket) — the stored-index row shape."""
    return emb.select(
        "vec_id",
        "label",
        _dbl(F.col("embedding")).alias("v"),
        _bucket_spark(_dbl(F.col("embedding"))).alias("bucket"),
    )


def build_ann_index(
    spark: SparkSession,
    sf_dir: str,
    source: DataFrame | None = None,
    suffix: str = "",
) -> str:
    """Materialize the LSH signature table bucket-partitioned on disk —
    the storage layout the sim_lsh_ann docstring promises at scale: one
    Hive-style ``bucket=<sig>`` directory per signature, so a query's scan
    partition-prunes to 1/2^bits of the corpus at the parquet level.

    ``source`` defaults to the full embeddings table; pass a subset to
    build a base index that :func:`refresh_ann_index` later extends.
    ``suffix`` separates index variants (the refresh demo must not clobber
    the index whose build/query split bench.py times)."""
    from sql2all_spark.sinks import write_output

    e = source if source is not None else load_table(spark, sf_dir, "embeddings")
    sigs = _signature_frame(e)
    path = f"{ANN_INDEX_ROOT}/{sf_dir.strip('/').replace('/', '_')}{suffix}.parquet"
    write_output(sigs, path, partition_by=["bucket"])
    return path


def refresh_ann_index(path: str, new_batch: DataFrame) -> str:
    """Incrementally merge a batch of newly-arrived embeddings into an
    ALREADY-BUILT bucket-partitioned index — the 100 TB operational story:
    a full rebuild rereads the whole corpus, while this signs only the
    batch and APPENDS files into exactly the ``bucket=<sig>`` directories
    the batch touches (dynamic Hive-style partition append).  Cost is
    O(batch), not O(corpus); existing partitions' files are never
    rewritten or read.  The resulting small files per bucket are exactly
    the compaction debt ``incremental_file_compaction`` plans for — run it
    on the index dir when the file count per bucket exceeds its bin size."""
    sigs = _signature_frame(new_batch)
    sigs.write.mode("append").partitionBy("bucket").parquet(path)
    return path


@register(
    "sim_lsh_ann_indexed",
    oracle=LSH_ANN_ORACLE,
    doc="The stored-index form of sim_lsh_ann: signatures are materialized"
    " ONCE as a bucket-partitioned parquet dataset (build_ann_index), and"
    " the query reads back ONLY the matching bucket=<sig> partition — the"
    " scan shows PartitionFilters and touches 1/2^bits of the files"
    " (asserted in tests/test_plans.py).  The query's own bucket is a"
    " driver-side scalar (one 1-row lookup, same class as the kmeans"
    " convergence scalars), which makes the pruning STATIC — no join, no"
    " DPP dependency.  Same oracle as sim_lsh_ann: storing the index must"
    " not change a single result row.",
)
def sim_lsh_ann_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = build_ann_index(spark, sf_dir)
    return query_ann_index(spark, sf_dir, path)


def query_ann_index(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """The read-only leg of sim_lsh_ann_indexed: rank inside the query's
    bucket of an ALREADY-BUILT index.  Split out so bench.py can report
    build vs query separately — the build is a one-time cost amortized over
    every query, and folding it into the query latency made the round-3
    bench read as if the pruned scan cost 7s (VERDICT r3 perf audit).

    The 1-row collect below is deliberate: resolving the single probe's
    bucket to a driver scalar makes the partition pruning STATIC (a
    PartitionFilters entry on the scan — asserted in test_plans) without
    needing dynamic partition pruning.  It is O(1) at any corpus size,
    but it is a SINGLE-probe design: a multi-probe/batch variant must
    switch to a join on the bucket column (the sim_grouped_ann shape)
    rather than loop this collect per probe."""
    e = load_table(spark, sf_dir, "embeddings")
    qrow = (
        e.filter(F.col("vec_id") == 0)
        .select(
            _dbl(F.col("embedding")).alias("qv"),
            _bucket_spark(_dbl(F.col("embedding"))).alias("qbucket"),
        )
        .collect()[0]
    )
    qv = F.array(*[F.lit(float(x)) for x in qrow.qv])
    idx = spark.read.schema(ANN_INDEX_SCHEMA).parquet(path)
    return (
        idx.filter(
            (F.col("bucket") == qrow.qbucket) & (F.col("vec_id") != 0)
        )
        .select(
            "vec_id",
            "label",
            "bucket",
            F.round(_cosine(F.col("v"), qv), 6).alias("cosine"),
        )
        .orderBy(
            F.col("cosine").desc_nulls_last(), F.col("vec_id").asc_nulls_first()
        )
    )


@register(
    "sim_ann_index_refresh",
    oracle=LSH_ANN_ORACLE,
    doc="Incremental ANN index refresh: build the bucket-partitioned LSH"
    " index from a base corpus (3/4 of the vectors), then merge the"
    " remaining 1/4 as a newly-arrived batch via refresh_ann_index —"
    " signatures computed for the batch only, files appended into only the"
    " bucket=<sig> partitions the batch touches, no existing file read or"
    " rewritten.  Shares LSH_ANN_ORACLE with sim_lsh_ann_indexed (the"
    " from-scratch rebuild), so the oracle gate IS the refresh==rebuild"
    " equivalence: an appended index must not change a single result row.",
)
def sim_ann_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 4 != 3)
    batch = e.filter(F.col("vec_id") % 4 == 3)  # the "newly arrived" chunk
    # overwrite-build the base index each run so the append is idempotent
    # (re-running the query must not accumulate duplicate batch rows)
    path = build_ann_index(spark, sf_dir, source=base, suffix="_refresh")
    refresh_ann_index(path, batch)
    return query_ann_index(spark, sf_dir, path)


IVF_CENTROID_IDS = list(range(1, 9))  # deterministic "trained" centroids
IVF_NPROBE = 2


def _ivf_oracle() -> str:
    cents = ", ".join(str(i) for i in IVF_CENTROID_IDS)
    cos = _cosine_sql("v.v", "c.cv")
    return f"""
WITH vecs AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cents AS (
  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id IN ({cents})
),
assign AS (
  SELECT v.vec_id, v.label, v.v, c.cent_id,
         ROW_NUMBER() OVER (
           PARTITION BY v.vec_id
           ORDER BY ROUND({cos}, 6) DESC, c.cent_id ASC) AS rk
  FROM vecs v CROSS JOIN cents c
),
probes AS (
  SELECT cent_id FROM assign WHERE vec_id = 0 AND rk <= {IVF_NPROBE}
),
q AS (SELECT v AS qv FROM vecs WHERE vec_id = 0)
SELECT a.vec_id, a.label, a.cent_id,
       ROUND({_cosine_sql("a.v", "q.qv")}, 6) AS cosine
FROM assign a
JOIN probes p ON a.cent_id = p.cent_id AND a.rk = 1
CROSS JOIN q
WHERE a.vec_id <> 0
ORDER BY cosine DESC NULLS LAST, vec_id ASC NULLS FIRST
LIMIT 10
"""


@register(
    "sim_ivf_topk",
    oracle=_ivf_oracle(),
    doc="IVF-style ANN: every vector is assigned to its nearest of 8 fixed"
    " coarse centroids (argmax cosine, centroid-id tiebreak); the query"
    " probes its nprobe=2 nearest centroid lists and ranks exactly within"
    " them.  The centroid pass is a broadcast cross of 8 rows (no shuffle);"
    " at 100 TB the assignment is a stored partition column, so a probe scan"
    " prunes to nprobe/K of the corpus at the parquet level.",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", "label", _dbl(F.col("embedding")).alias("v"))
    cents = (
        e.filter(F.col("vec_id").isin(IVF_CENTROID_IDS))
        .select(F.col("vec_id").alias("cent_id"), _dbl(F.col("embedding")).alias("cv"))
    )
    # Argmax-cosine cell assignment as a partial-aggregatable struct MIN
    # on (negated rounded cosine, cent_id) — the r11 pqmath pattern:
    # map-side combine collapses the 8 broadcast-joined candidate rows
    # per vector to ONE before the exchange (a row_number window here
    # shuffled and sorted all 8).  Negating the 6dp-rounded cosine turns
    # the (cos DESC, cent_id ASC) ranking into a plain lexicographic MIN.
    scored = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "nc", -F.round(_cosine(F.col("v"), F.col("cv")), 6)
    )
    cells = (
        scored.groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    F.col("nc").alias("nc"),
                    F.col("cent_id").alias("cent_id"),
                    F.col("label").alias("label"),
                    F.col("v").alias("v"),
                )
            ).alias("b")
        )
        .select(
            "vec_id",
            F.col("b.label").alias("label"),
            F.col("b.v").alias("v"),
            F.col("b.cent_id").alias("cent_id"),
        )
    )
    # the probe's nprobe-cell route: bounded heap over its 8 candidates
    probes = (
        scored.filter(F.col("vec_id") == 0)
        .orderBy(F.col("nc").asc(), F.col("cent_id").asc())
        .limit(IVF_NPROBE)
        .select("cent_id")
    )
    q = vecs.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    return (
        cells.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probes), "cent_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            "cent_id",
            F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc_nulls_last(), F.col("vec_id").asc_nulls_first())
        .limit(10)
    )


def _kmeans_oracle() -> str:
    cents = ", ".join(str(i) for i in IVF_CENTROID_IDS)
    cos = _cosine_sql("v.v", "c.cv")
    return f"""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cents AS (
  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id IN ({cents})
),
assign AS (
  SELECT v.vec_id, v.v, c.cent_id,
         ROW_NUMBER() OVER (
           PARTITION BY v.vec_id
           ORDER BY ROUND({cos}, 6) DESC, c.cent_id ASC) AS rk
  FROM vecs v CROSS JOIN cents c
),
member AS (SELECT vec_id, v, cent_id FROM assign WHERE rk = 1),
dims AS (
  SELECT cent_id,
         UNNEST(range(1, {DIM} + 1)) AS dim,
         UNNEST(v) AS val
  FROM member
)
SELECT cent_id, CAST(dim AS INT) AS dim,
       ROUND(CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)
         AS mean_val,
       COUNT(*) AS n_members
FROM dims
GROUP BY cent_id, dim
"""


@register(
    "sim_kmeans_iteration",
    oracle=_kmeans_oracle(),
    doc="One k-means update step over embeddings: assign every vector to"
    " its max-cosine centroid (8 seed centroids, id tiebreak), then"
    " recompute each centroid as the member mean per dimension.  The"
    " assign→recompute round-trip is the building block of distributed"
    " iterative algorithms: broadcast the (tiny) centroid set, one shuffle"
    " on (cent_id, dim) with partial aggregation, decimal-routed sums so"
    " the means are order-independent.  Iterating = re-broadcasting the"
    " output — the plan per step is identical at any corpus size.",
)
def sim_kmeans_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", _dbl(F.col("embedding")).alias("v"))
    cents = (
        e.filter(F.col("vec_id").isin(IVF_CENTROID_IDS))
        .select(F.col("vec_id").alias("cent_id"), _dbl(F.col("embedding")).alias("cv"))
    )
    # struct-MIN assignment (see sim_ivf_topk): one row per vector over
    # the exchange instead of 8, no per-group sort
    member = (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("nc", -F.round(_cosine(F.col("v"), F.col("cv")), 6))
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    F.col("nc").alias("nc"),
                    F.col("cent_id").alias("cent_id"),
                    F.col("v").alias("v"),
                )
            ).alias("b")
        )
        .select("vec_id", F.col("b.v").alias("v"), F.col("b.cent_id").alias("cent_id"))
    )
    dims = member.select(
        "cent_id",
        F.posexplode("v").alias("dim0", "val"),
    ).select("cent_id", (F.col("dim0") + 1).alias("dim"), "val")
    return dims.groupBy("cent_id", F.col("dim").cast("int").alias("dim")).agg(
        F.round(
            F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_val"),
        F.count(F.lit(1)).alias("n_members"),
    )


# Near-dup mining blocks on LSH band keys over the 12-bit EXTENDED
# signature (functions/embed.py NEARDUP_PLANES): 2 bands whose
# bits-per-band ADAPTS to corpus size — 3 bits (the historical scheme,
# bit-identical band keys) up to NEARDUP_REF vectors, one more bit per
# corpus doubling beyond, capped at the 6-bit region.  A fixed scheme let
# bucket occupancy grow linearly and the block-local pair space
# quadratically (measured 25x at the 10x sf1 soak); adaptive specificity
# holds expected occupancy ~constant.  A pair is a candidate if it agrees
# on EITHER band (OR-amplification).  The oracle mirrors both the banding
# and the integer ppb derivation exactly, so the driver check proves the
# Spark plan finds precisely the banded pair set.
N_NEARDUP_BANDS = 2


def _neardup_oracle() -> str:
    from sql2all_spark.functions.embed import (
        NEARDUP_REGION,
        neardup_bucket_sql,
        neardup_ppb_sql,
    )

    band_keys = ", ".join(
        f"'{j}:' || substr(bucket, {j * NEARDUP_REGION + 1}, ppb)"
        for j in range(N_NEARDUP_BANDS)
    )
    cos = _cosine_sql("va.v", "vb.v")
    return f"""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         {neardup_bucket_sql("CAST(embedding AS DOUBLE[])")} AS bucket
  FROM embeddings
),
pp AS ({neardup_ppb_sql("embeddings")}),
banded AS (
  SELECT vec_id, UNNEST([{band_keys}]) AS band_key FROM v, pp
),
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM banded a JOIN banded b
    ON a.band_key = b.band_key AND a.vec_id < b.vec_id
)
SELECT p.vec_a, p.vec_b, va.label AS label_a, vb.label AS label_b,
       ROUND({cos}, 6) AS cosine
FROM pairs p
JOIN v va ON va.vec_id = p.vec_a
JOIN v vb ON vb.vec_id = p.vec_b
WHERE {cos} > 0.3
"""


@register(
    "sim_neardup_pairs",
    oracle=_neardup_oracle(),
    doc="Embedding-cosine near-duplicate mining, LSH-blocked: candidates"
    " come from an equi-join on hyperplane-sign band keys (2 bands over"
    " the 12-bit extended signature, OR-amplified), then exact cosine"
    " verification on candidates only.  Bits-per-band adapts to corpus"
    " size (3 bits up to 2k vectors — the historical scheme — plus one"
    " per doubling, capped at 6) so bucket occupancy, and with it the"
    " block-local O(n_b²) candidate space, stays ~constant as the corpus"
    " grows; the r7 sf1 soak measured the fixed scheme going superlinear."
    "  Only slim (vec_id, band_key) rows enter the candidate join;"
    " vectors and norms join back onto the candidate set afterwards.  The"
    " blocking key is derived from the vectors themselves — labels are"
    " payload, so the pair space is bucket-local at any corpus size"
    " (the round-1 version blocked on a fixture label: corpus²-in-the-"
    "largest-label at scale).",
)
def sim_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql2all_spark.functions.embed import (
        NEARDUP_REGION,
        neardup_bucket,
        neardup_ppb_col,
    )

    e = load_table(spark, sf_dir, "embeddings")
    # Corpus size steers band specificity.  Derived LAZILY: a 1-row count
    # aggregate broadcast onto the band build (the same COUNT(*) the
    # oracle's ppb CTE performs), so constructing the plan runs no job and
    # ppb reflects the corpus at execution time, not build time (ADVICE r7).
    n = e.agg(F.count(F.lit(1)).alias("n_vec"))
    ppb = neardup_ppb_col("n_vec")
    # Norm precomputed once per vector: each verified pair folds a single
    # dot product instead of three.  Persisted because three consumers read
    # it (band build + both hydration sides of the verify join).
    emb = _dbl(F.col("embedding"))
    # §2.5 re-spread: the per-vector norm + sign-bucket math below is the
    # scan-side CPU mass and the fixture embeddings table is one
    # unsplittable row group; no-op on multi-split layouts.  Per-row
    # exact math — partition-order independent.
    from sql2all_spark.spread import spread_fanout

    v = spread_fanout(e.select("vec_id", "label", "embedding")).select(
        "vec_id",
        "label",
        emb.alias("v"),
        F.sqrt(_dot(emb, emb)).alias("norm"),
        neardup_bucket(emb).alias("bucket"),
    ).transform(persist_tracked)
    # The count attaches as a 1-row broadcast (nested-loop with a single
    # build row = effectively free at any scale; at bench scale it costs
    # ~0.8s of fixed AQE stage overhead — the price of action-free plan
    # construction, measured and accepted).
    banded = (
        v.join(F.broadcast(n), F.lit(True))
        .select(
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
                        for j in range(N_NEARDUP_BANDS)
                    ]
                )
            ).alias("band_key"),
        )
    )
    a = banded.select(F.col("vec_id").alias("vec_a"), "band_key")
    b = banded.select(F.col("vec_id").alias("vec_b"), "band_key")
    pairs = (
        a.join(b, "band_key")  # equi-join on the derived bucket, not label
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    va = v.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("label_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("norm_a"),
    )
    vb = v.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("norm_b"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("norm_a") * F.col("norm_b"))
    return (
        pairs.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", "label_a", "label_b", cos.alias("cos_raw"))
        .filter(F.col("cos_raw") > 0.3)
        .select(
            "vec_a",
            "vec_b",
            "label_a",
            "label_b",
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


@register(
    "sim_doc_retrieval",
    oracle=f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT e.vec_id AS doc_id,
         ROUND({_cosine_sql("CAST(e.embedding AS DOUBLE[])", "q.qv")}, 6) AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 0
),
topk AS (
  SELECT doc_id, cosine FROM scored
  ORDER BY cosine DESC NULLS LAST, doc_id ASC NULLS FIRST
  LIMIT 5
)
SELECT t.doc_id, t.cosine, d.lang, d.source, d.n_chars,
       substr(d.text, 1, 40) AS preview
FROM topk t JOIN documents d ON d.doc_id = t.doc_id
""",
    doc="RAG-style retrieval: embedding top-k for the query document, then"
    " hydrate the winners with document metadata/preview.  The crucial"
    " ordering: rank on the slim (id, score) set FIRST, join text LAST —"
    " only k documents' text is ever read (at 100 TB, a broadcast join of"
    " the k-row result against the corpus, with the text scan pruned to"
    " matching files by the id predicate).",
)
def sim_doc_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    q = e.filter(F.col("vec_id") == 0).select(_dbl(F.col("embedding")).alias("qv"))
    topk = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(_cosine(_dbl(F.col("embedding")), F.col("qv")), 6).alias(
                "cosine"
            ),
        )
        .orderBy(F.col("cosine").desc_nulls_last(), F.col("doc_id").asc_nulls_first())
        .limit(5)
    )
    return F.broadcast(topk).join(d, "doc_id").select(
        "doc_id",
        "cosine",
        "lang",
        "source",
        "n_chars",
        F.substring("text", 1, 40).alias("preview"),
    )


@register(
    "sim_embed_quantize",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
s AS (
  SELECT vec_id, label, v,
         list_reduce(list_transform(v, x -> abs(x)),
                     (a, b) -> GREATEST(a, b)) AS scale
  FROM v
)
SELECT vec_id, label,
       ROUND(scale, 6) AS scale,
       array_to_string(list_transform(v, x ->
         CAST(FLOOR(x * 127 / scale + 0.5) AS INT)), ',') AS q8,
       CAST(len(list_filter(v, x -> ABS(x) * 127 / scale < 0.5)) AS INT)
         AS n_zeros
FROM s
WHERE scale > 0
""",
    doc="Symmetric int8 quantization per embedding (q = round(x*127/max|x|))"
    " — the storage-compression step that shrinks a vector corpus 4x before"
    " ANN indexing.  Row-local JVM higher-order folds, no shuffle, no UDF;"
    " rounding is floor(x+0.5) SPELLED OUT in both engines because round()"
    " half-case semantics differ across engines.  Quantized vectors are"
    " serialized to CSV strings (driver hashing cannot canonicalize raw"
    " array cells).",
)
def sim_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    emb = _dbl(F.col("embedding"))
    # the raw scale gets an internal name distinct from the rounded output
    # column: Spark's LATERAL COLUMN ALIAS resolution would otherwise bind
    # the `scale` reference inside the quantize lambda to the *rounded*
    # alias earlier in the same select list — flipping floor half-cases
    s = e.select(
        "vec_id",
        "label",
        emb.alias("v"),
        F.aggregate(emb, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))).alias(
            "scale_raw"
        ),
    ).filter(F.col("scale_raw") > 0)
    q = F.transform(
        F.col("v"),
        lambda x: F.floor(x * 127 / F.col("scale_raw") + 0.5)
        .cast("int")
        .cast("string"),
    )
    zeroish = F.filter(
        F.col("v"), lambda x: F.abs(x) * 127 / F.col("scale_raw") < 0.5
    )
    return s.select(
        "vec_id",
        "label",
        F.round("scale_raw", 6).alias("scale"),
        F.array_join(q, ",").alias("q8"),
        F.size(zeroish).alias("n_zeros"),
    )


def _ann_recall_oracle() -> str:
    return f"""
WITH brute AS ({BRUTE_TOPK_ORACLE}),
lsh10 AS (
  SELECT vec_id FROM ({LSH_ANN_ORACLE}) t
  ORDER BY cosine DESC NULLS LAST, vec_id ASC NULLS FIRST
  LIMIT 10
),
ivf10 AS (SELECT vec_id FROM ({_ivf_oracle()}) t)
SELECT method, n_hits,
       ROUND(CAST(n_hits AS DOUBLE) / 10.0, 6) AS recall_at_10
FROM (
  SELECT 'ivf' AS method, COUNT(*) AS n_hits FROM ivf10
  WHERE vec_id IN (SELECT vec_id FROM brute)
  UNION ALL
  SELECT 'lsh' AS method, COUNT(*) AS n_hits FROM lsh10
  WHERE vec_id IN (SELECT vec_id FROM brute)
)
ORDER BY method ASC NULLS FIRST
"""


@register(
    "sim_ann_recall",
    oracle=_ann_recall_oracle(),
    doc="Recall@10 of the two ANN paths against the exact brute-force"
    " baseline — the number that justifies (or indicts) an approximate"
    " index.  Both sides are fully deterministic (fixed hyperplanes,"
    " fixed centroids, exact in-candidate ranking), so recall is an"
    " oracle-checkable VALUE, not a statistic: each ANN top-10 left-semi"
    " joins the broadcast 10-row exact top-10 and counts survivors."
    "  sim_lsh_ann_indexed shares sim_lsh_ann's oracle (same rows by"
    " construction), so its recall is the lsh row.  At 100 TB the ANN"
    " legs scan one bucket / nprobe lists while brute force scans the"
    " corpus — this query is how you check the cheap path is good"
    " enough before switching retrieval over to it.",
)
def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    brute_ids = sim_topk_bruteforce(spark, sf_dir).select("vec_id")
    lsh10 = sim_lsh_ann(spark, sf_dir).limit(10).select("vec_id")
    ivf10 = sim_ivf_topk(spark, sf_dir).select("vec_id")

    def leg(df: DataFrame, name: str) -> DataFrame:
        return (
            df.join(F.broadcast(brute_ids), "vec_id", "left_semi")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(
                F.lit(name).alias("method"),
                "n_hits",
                F.round(
                    F.col("n_hits").cast("double") / F.lit(10.0), 6
                ).alias("recall_at_10"),
            )
        )

    return (
        leg(ivf10, "ivf")
        .unionByName(leg(lsh10, "lsh"))
        .orderBy(F.col("method").asc_nulls_first())
    )
