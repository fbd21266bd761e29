"""Cross-document EXACT-SUBSTRING dedup (suffix-array-style maximal
matches), the standard complement of document-level MinHash dedup in
production corpus curation (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better": remove 50+-token spans repeated verbatim
across documents).

How this differs from ``text_dup_ngram_spans`` (text.py): that operator
unions positions whose k-gram is duplicated in ANY other document, so a
reported span need not occur contiguously in any single other document
(position i can match doc X while i+1 matches doc Y).  This operator
reports maximal spans shared between a SPECIFIC ordered pair of documents
— the suffix-array semantics — via sorted-k-gram DIAGONAL CHAINING:

  1. k-gram inverted index with a stop-gram df cap (as dedup_containment:
     the cap bounds candidate fanout per gram to df² <= cap², keeping the
     self-join linear in corpus size — production suffix-array dedup
     applies the same cap to pathological grams);
  2. occurrence pairs (doc_a < doc_b, pos_a, pos_b) from the capped
     index self-join;
  3. within (doc_a, doc_b, diag = pos_a - pos_b), consecutive pos_a
     values chain into maximal runs (gaps-and-islands) — a run of m
     consecutive matching k-gram starts on one diagonal IS a shared
     substring of exactly m + k - 1 tokens, and maximal runs are maximal
     matches (a longer shared substring would extend the run).  This is
     the distributed equivalent of walking a suffix array's LCP
     intervals, with O(matches) work instead of a global sort.

Stop-gram cap caveat (ADVICE r10): a gram with df > SUB_DF_CAP inside a
long verbatim-shared passage is dropped from the inverted index, which
splits the diagonal run at that position — so a reported span can be
extensible across a capped gram, and a long duplicated span whose capped
fragments each fall below SUB_MIN_SPAN is not reported.  Both engines
apply the identical cap (the cross-engine gate compares like with like),
and production suffix-array dedup accepts the same trade: pathological
grams (boilerplate, stop phrases) are exactly the spans one does NOT
want driving dedup.  The maximality invariant is therefore "maximal
modulo capped grams": tests/test_invariants.py verifies that any
textually-possible extension of a reported span is blocked by a gram
whose corpus df exceeds the cap.

Scale shape: grams are 60-bit md5-derived ints BEFORE any exchange
(strings never shuffle); the gram table is computed once and persisted
(df-count + self-join both read it); the chain window's (doc_a, doc_b,
diag) exchange carries only int triples; the span groupBy reuses that
partitioning (group keys are a superset of the window keys).  No
all-pairs anywhere.

Reference parity note: SQL2ALL itself has no dedup operators (its SQL is
executed verbatim by the attached DB — src/db/sqlite.rs:79); this module
belongs to the LLM-pipeline extension surface the 100 TB north star
requires (SURVEY.md §2 extension table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.cache import persist_tracked
from sql2all_spark.functions.hashing import base_hash, base_hash_sql
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

SUB_GRAM = 5  # seed k-gram length (tokens); chains extend to maximal
SUB_DF_CAP = 50  # stop-gram cap on gram document frequency
# report pair-spans of at least this many tokens.  Production exact-
# substring dedup uses ~50 BPE tokens (Lee et al. 2022 §3); the fixture's
# documents are short word-soup, so the threshold is scaled down with the
# fixture — the plan shape is threshold-independent.
SUB_MIN_SPAN = 8


def _substring_oracle() -> str:
    k = SUB_GRAM
    g = base_hash_sql(f"array_to_string(w[pos:pos + {k - 1}], ' ')")
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= {k}
),
p AS (
  SELECT doc_id, w, UNNEST(range(1, len(w) - {k - 1} + 1)) AS pos
  FROM d
),
g AS (
  SELECT doc_id, CAST(pos AS INT) AS pos, {g} AS h
  FROM p
),
df AS (SELECT h, COUNT(*) AS c FROM g GROUP BY h),
gi AS (SELECT g.doc_id, g.pos, g.h FROM g JOIN df USING (h)
       WHERE df.c <= {SUB_DF_CAP}),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
  FROM gi a JOIN gi b USING (h)
  WHERE a.doc_id < b.doc_id
),
runs AS (
  SELECT doc_a, doc_b, pa - pb AS diag, pa,
         pa - ROW_NUMBER() OVER (
           PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa ASC) AS grp
  FROM pr
)
SELECT doc_a, doc_b,
       CAST(MIN(pa) AS INT) AS a_start,
       CAST(MIN(pa) - diag AS INT) AS b_start,
       CAST(COUNT(*) + {k - 1} AS INT) AS span_len,
       CAST(COUNT(*) AS BIGINT) AS n_grams
FROM runs
GROUP BY doc_a, doc_b, diag, grp
HAVING COUNT(*) + {k - 1} >= {SUB_MIN_SPAN}
"""


@register(
    "text_exact_substring_dedup",
    oracle=_substring_oracle(),
    doc=f"Suffix-array-style exact-substring dedup (Lee et al. 2022):"
    f" maximal token spans >= {SUB_MIN_SPAN} shared VERBATIM between a"
    " specific document pair, found by chaining consecutive duplicated"
    f" {SUB_GRAM}-gram seeds along each (doc_a, doc_b, diagonal) — the"
    " pair-local maximality text_dup_ngram_spans' any-doc union cannot"
    f" express.  df <= {SUB_DF_CAP} stop-gram cap bounds the inverted-"
    " index self-join fanout (linear in corpus, never all-pairs); grams"
    " are 60-bit ints before any exchange; the chain window and span"
    " groupBy share one (doc_a, doc_b, diag) exchange.",
)
def text_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    k = SUB_GRAM
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= k
    )
    pos = F.explode(F.sequence(F.lit(1), F.size("w") - (k - 1))).alias("pos")
    grams = (
        w.select("doc_id", "w", pos)
        .select(
            "doc_id",
            F.col("pos").cast("int").alias("pos"),
            base_hash(F.array_join(F.slice("w", F.col("pos"), k), " ")).alias(
                "h"
            ),
        )
        .transform(persist_tracked)
    )
    df_tbl = grams.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    gi = grams.join(df_tbl.filter(F.col("c") <= SUB_DF_CAP), "h").select(
        "doc_id", "pos", "h"
    )
    pr = (
        gi.select(
            F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "h"
        )
        .join(
            gi.select(
                F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "h"
            ),
            "h",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    win = Window.partitionBy("doc_a", "doc_b", "diag").orderBy(
        F.col("pa").asc()
    )
    runs = pr.withColumn("grp", F.col("pa") - F.row_number().over(win))
    return (
        runs.groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(F.min("pa").alias("a0"), F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") + (k - 1) >= SUB_MIN_SPAN)
        .select(
            "doc_a",
            "doc_b",
            F.col("a0").cast("int").alias("a_start"),
            (F.col("a0") - F.col("diag")).cast("int").alias("b_start"),
            (F.col("m") + (k - 1)).cast("int").alias("span_len"),
            F.col("m").cast("long").alias("n_grams"),
        )
    )
