"""Cross-corpus n-gram NOVELTY scoring — the inverse of contamination.

Per document: the fraction of its DISTINCT word trigrams that appear in
no other document.  High novelty marks genuinely fresh content; low
novelty marks documents assembled from corpus-common boilerplate — the
standard signal for (a) prioritising novel data in mixing weights and
(b) catching template farms that per-doc repetition scores miss because
the repetition lives ACROSS documents, not inside one.

Scale shape (the ``text_dup_ngram_spans`` inverted-index family): only
slim ``(doc_id, hash64)`` rows ever shuffle — raw text never crosses an
exchange.  Per-doc de-dup of grams is a partial-aggregatable DISTINCT;
cross-doc uniqueness is the min/max-doc trick (a gram is novel iff
``MIN(doc_id) == MAX(doc_id)``), a plain partial agg with NO
distinct-count Expand and NO join back to the gram table — novel counts
re-aggregate by the surviving ``MIN(doc_id)`` itself.  The final
doc-level join is per-doc-slim x per-doc-slim.  At 100 TB the exchanges
carry ~tokens-per-doc 16-byte rows and the widest state is one row per
distinct gram hash.

Reference parity note: SQL2ALL has no curation surface (its SQL passes
through verbatim — src/db/sqlite.rs:79); this belongs to the
LLM-pipeline extension family (SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.cache import persist_tracked
from sql2all_spark.functions.hashing import base_hash, base_hash_sql
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

NOVELTY_GRAM = 3  # word n-gram length


@register(
    "text_ngram_novelty",
    oracle=f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= {NOVELTY_GRAM}
),
g AS (
  SELECT DISTINCT doc_id,
         {base_hash_sql(f"array_to_string(w[pos:pos + {NOVELTY_GRAM - 1}], ' ')")} AS h
  FROM (
    SELECT doc_id, w,
           UNNEST(range(1, len(w) - {NOVELTY_GRAM - 1} + 1)) AS pos
    FROM d
  )
),
tot AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id
),
uniq AS (
  SELECT MIN(doc_id) AS doc_id, CAST(1 AS BIGINT) AS novel
  FROM g GROUP BY h HAVING MIN(doc_id) = MAX(doc_id)
),
nov AS (
  SELECT doc_id, CAST(SUM(novel) AS BIGINT) AS n_novel
  FROM uniq GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(t.n_grams AS BIGINT) AS n_grams,
       COALESCE(n.n_novel, 0) AS n_novel,
       ROUND(CAST(COALESCE(n.n_novel, 0) AS DOUBLE) / t.n_grams, 6)
         AS novelty
FROM tot t LEFT JOIN nov n ON n.doc_id = t.doc_id
""",
    doc=f"Cross-corpus novelty score: per document, the fraction of its"
    f" distinct word {NOVELTY_GRAM}-grams that no OTHER document contains"
    " — the inverse of contamination, used to up-weight fresh content and"
    " catch cross-document template farms.  Scale shape: inverted-index"
    " family — only (doc_id, hash64) rows shuffle; per-doc gram de-dup is"
    " a partial-agg DISTINCT; uniqueness is the min/max-doc partial agg"
    " (no distinct-count Expand); novel counts re-group by the surviving"
    " MIN(doc_id) with NO join back to the gram table.",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = NOVELTY_GRAM
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    ).filter(F.size("w") >= n)
    pos = F.explode(F.sequence(F.lit(1), F.size("w") - (n - 1))).alias("pos")
    grams = (
        w.select("doc_id", "w", pos)
        .select(
            "doc_id",
            base_hash(
                F.array_join(F.slice(F.col("w"), F.col("pos"), n), " ")
            ).alias("h"),
        )
        .dropDuplicates(["doc_id", "h"])
        .transform(persist_tracked)
    )
    tot = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    nov = (
        grams.groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"), F.max("doc_id").alias("d1"))
        .filter(F.col("doc_id") == F.col("d1"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        tot.join(nov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias(
                "n_novel"
            ),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0)).cast("double")
                / F.col("n_grams"),
                6,
            ).alias("novelty"),
        )
    )
