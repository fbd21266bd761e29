"""Approximate string-similarity join under a bounded edit distance —
the near-dup URL/title fuzzy-matching family (VERDICT r11 #4), via the
Ed-Join prefix filter (Xiao, Wang & Lin, VLDB 2008).

The naive form is an all-pairs ``levenshtein(a, b) <= t`` — O(N²)
distance computations, a non-starter at corpus scale.  Ed-Join's prefix
principle bounds the candidates instead:

  ed(a, b) <= t  ⇒  the q-gram multisets of a and b overlap in at least
  max(|a|,|b|) − q + 1 − q·t grams  (each edit destroys <= q grams)
  ⇒  sorting every string's grams by ONE global order, the first
  q·t + 1 grams of a and of b must share a value.

So the candidate generator is an EQUI-join of two (q·t+1)-gram prefix
indexes — never a pair-space product.  The global order is ascending
document frequency (rarest grams first, the Ed-Join heuristic): common
grams fall out of the prefixes, which is what bounds the join fanout on
skewed natural-language text.  We take the first q·t+1 DISTINCT grams
per string — a superset of the sorted multiset prefix's value set, so
completeness is preserved (slightly looser pruning, far simpler plan).
Verification runs Spark's banded-DP ``levenshtein(a, b, t)`` (JVM-side,
early-exit above the threshold) on candidates ONLY.

Scale shape: the prefix index is (q·t+1)·N slim rows; the gram-df table
is vocabulary-bounded; the candidate join is an equi-join on (gram)
with a length-difference band in the condition; the O(t·L) distance DP
touches candidate pairs only.  At 100 TB the prefix index is the stored
artifact (like the LSH/IVFPQ indexes) and refreshes by appending the
batch's prefixes.

Caveat (documented, both engines agree): keys shorter than q chars
produce a single whole-string gram, so sub-q keys pair only on exact
equality — the filter is complete for keys of length >= q, which a
title/URL key always satisfies in practice.

Reference parity: SQL2ALL has no similarity-join surface (658-line core
delegates SQL to the attached DB — src/db/sqlite.rs:79); LLM-pipeline
extension surface (SURVEY.md §2 extension table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.cache import persist_tracked
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

# q tunes to the KEY'S ENTROPY, not a universal default: the fixture's
# ~20-word vocabulary makes short grams near-useless (q=3 prefixes left
# 93% of all pairs as candidates at sf0.1), while q=10 grams span two
# words and prune to 2.6% with identical results — measured sweep in
# PERF_NOTES.  Real URL/title corpora are higher-entropy and take q=3-5.
FUZZY_KEY_LEN = 120  # chars of the document head used as the join key
FUZZY_Q = 10  # q-gram width
FUZZY_T = 4  # edit-distance threshold
FUZZY_PREFIX = FUZZY_Q * FUZZY_T + 1  # Ed-Join prefix length (41)


def _fuzzy_oracle() -> str:
    q, t, p, kl = FUZZY_Q, FUZZY_T, FUZZY_PREFIX, FUZZY_KEY_LEN
    return f"""
WITH t0 AS (
  SELECT doc_id, lower(substr(text, 1, {kl})) AS title FROM documents
),
g AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           UNNEST(CASE WHEN len(title) >= {q}
                  THEN list_transform(range(1, len(title) - {q} + 2),
                                      i -> substr(title, i, {q}))
                  ELSE [title] END) AS gram
    FROM t0
  )
),
df AS (SELECT gram, COUNT(*) AS gdf FROM g GROUP BY gram),
pfx AS (
  SELECT doc_id, gram FROM (
    SELECT g.doc_id, g.gram,
           ROW_NUMBER() OVER (PARTITION BY g.doc_id
                              ORDER BY d.gdf ASC, g.gram ASC) AS rk
    FROM g JOIN df d USING (gram)
  ) WHERE rk <= {p}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pfx a JOIN pfx b ON a.gram = b.gram AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(ta.title, tb.title) AS INT) AS edit_dist
FROM cand c
JOIN t0 ta ON ta.doc_id = c.doc_a
JOIN t0 tb ON tb.doc_id = c.doc_b
WHERE abs(len(ta.title) - len(tb.title)) <= {t}
  AND levenshtein(ta.title, tb.title) <= {t}
ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST
"""


def _grams() -> F.Column:
    """q-grams of the ``title`` column (whole string when shorter than
    q) — the SQL expression form because substring's position argument
    is a lambda variable."""
    return F.expr(
        f"CASE WHEN length(title) >= {FUZZY_Q}"
        f" THEN transform(sequence(1, length(title) - {FUZZY_Q} + 1),"
        f"                i -> substring(title, i, {FUZZY_Q}))"
        f" ELSE array(title) END"
    )


@register(
    "dedup_fuzzy_editdist",
    oracle=_fuzzy_oracle(),
    doc=f"Bounded-edit-distance fuzzy self-join (Ed-Join prefix filter,"
    f" Xiao et al. 2008): pairs of document head-keys ({FUZZY_KEY_LEN}"
    f" chars) within Levenshtein {FUZZY_T}.  Candidates come from an"
    f" equi-join of {FUZZY_PREFIX}-gram rarest-first prefix indexes —"
    " never a pair-space product (plan-pinned) — and the banded-DP"
    " levenshtein runs on candidates only, JVM-side, with the length"
    " band applied first.",
)
def dedup_fuzzy_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql2all_spark.spread import spread_fanout

    d = load_table(spark, sf_dir, "documents")
    # §2.5 re-spread before the q-gram explode/distinct (the scan-side
    # CPU mass; the fixture scan is one unsplittable row group — four
    # ~1 s single-task jobs measured before).  No-op at production split
    # counts.
    titles = spread_fanout(d.select("doc_id", "text")).select(
        "doc_id",
        F.lower(F.substring("text", 1, FUZZY_KEY_LEN)).alias("title"),
    ).transform(persist_tracked)
    grams = (
        titles.select("doc_id", F.explode(_grams()).alias("gram"))
        .distinct()
    )
    gdf = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("gdf"))
    from pyspark.sql.window import Window

    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("gdf").asc(), F.col("gram").asc()
        )
    )
    pfx = (
        grams.join(gdf, "gram")
        .withColumn("rk", rk)
        .filter(F.col("rk") <= FUZZY_PREFIX)
        .select("doc_id", "gram")
        .transform(persist_tracked)
    )
    cand = (
        pfx.select(F.col("doc_id").alias("doc_a"), "gram")
        .join(
            pfx.select(F.col("doc_id").alias("doc_b"), "gram"),
            "gram",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ta = titles.select(
        F.col("doc_id").alias("doc_a"), F.col("title").alias("title_a")
    )
    tb = titles.select(
        F.col("doc_id").alias("doc_b"), F.col("title").alias("title_b")
    )
    dist = F.levenshtein(F.col("title_a"), F.col("title_b"), FUZZY_T)
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(
            F.abs(F.length("title_a") - F.length("title_b")) <= FUZZY_T
        )
        .withColumn("edit_dist", dist)
        .filter(F.col("edit_dist") >= 0)  # -1 = early-exit above threshold
        .select("doc_a", "doc_b", F.col("edit_dist").cast("int").alias("edit_dist"))
        .orderBy(
            F.col("doc_a").asc_nulls_first(), F.col("doc_b").asc_nulls_first()
        )
    )
