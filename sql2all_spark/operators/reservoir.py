"""Weighted reservoir sampling per group (Efraimidis–Spirakis A-ES).

Completes the sampling family in ``operators/sampling.py``: uniform hash
sampling, stratified caps, and rate-mixing exist; this adds WEIGHTED
sampling without replacement — "give me m documents per source, where a
document's selection probability is proportional to its length" — the
composition step for loss-weighted or importance-weighted training mixes.

Algorithm (Efraimidis & Spirakis 2006): each item draws u ~ U(0,1] and
gets key u^(1/w); the m largest keys per group are an exact weighted
sample without replacement.  Ranking on ln(u)/w is order-equivalent
(ln is monotone, w > 0) and numerically tamer, so that's the ranked key.
Determinism across engines: u derives from the md5 hash recipe (60-bit
int + 1, scaled by 2^-60, so u is the SAME double in both engines), and
the key is ROUNDED to 9dp before ranking with a doc_id tiebreak — ln may
differ in the last ulp between libm and the JVM, never at 1e-9.

Scale shape: one row-local projection (hash, ln — no shuffle), then one
per-group top-m window whose partition key is the group — m-bounded heap
per group, no global sort.  At 100 TB this is the textbook one-pass
distributed weighted sampler: no per-row Python, no driver state, and
group skew is bounded because the window only materializes m survivors
per partition after the rank filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql2all_spark.functions.hashing import base_hash, base_hash_sql
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

RES_M = 5  # sample size per source
_SEED = "res8:"  # hash domain separator
_TWO60 = float(1 << 60)


@register(
    "sample_reservoir_weighted",
    oracle=f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         ROUND(LN((CAST({base_hash_sql(f"'{_SEED}' || CAST(doc_id AS VARCHAR)")} AS DOUBLE) + 1)
                  / {_TWO60!r})
               / CAST(n_chars AS DOUBLE), 9) AS key
  FROM documents
  WHERE n_chars >= 1
),
ranked AS (
  SELECT source, doc_id, n_chars, key,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY key DESC, doc_id ASC) AS rank
  FROM keyed
)
SELECT source, CAST(rank AS INT) AS rank, doc_id, CAST(n_chars AS BIGINT) AS n_chars, key
FROM ranked WHERE rank <= {RES_M}
ORDER BY source ASC NULLS FIRST, rank ASC NULLS FIRST
""",
    doc=f"Efraimidis–Spirakis weighted reservoir sample: top-{RES_M}"
    " documents per source with selection probability ∝ n_chars, ranked"
    " on round(ln(u)/w, 9) with a doc_id tiebreak (u from the md5 hash"
    " recipe, identical doubles in both engines; 9dp rounding absorbs"
    " last-ulp ln differences).  One row-local keying pass + one"
    " m-bounded per-group window — the one-pass distributed weighted"
    " sampler; no global sort, no driver state.",
)
def sample_reservoir_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A-ES keys are undefined for w <= 0, and ln(u)/0 disagrees across
    # engines (Spark NULL vs DuckDB -inf), so zero-length docs are
    # excluded on BOTH sides (ADVICE r8).
    d = (
        load_table(spark, sf_dir, "documents")
        .select("source", "doc_id", "n_chars")
        .filter(F.col("n_chars") >= 1)
    )
    u = (
        base_hash(F.concat(F.lit(_SEED), F.col("doc_id").cast("string"))).cast(
            "double"
        )
        + 1
    ) / F.lit(_TWO60)
    keyed = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.round(F.log(u) / F.col("n_chars").cast("double"), 9).alias("key"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("key").desc(), F.col("doc_id").asc()
    )
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= RES_M)
        .select(
            "source",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            "key",
        )
        .orderBy(F.col("source").asc_nulls_first(), F.col("rank").asc_nulls_first())
    )
