"""User-defined function surface: vectorized scalar pandas UDF, grouped-map
UDAF (``applyInPandas``), and a Python UDTF (lateral table function).

The reference's bundled engines expose UDF registration hooks (e.g. SQLite
``create_scalar_function``) that SQL2ALL itself never uses (SURVEY.md §2.B
"UDF surface"); here each Spark UDF flavor is exercised end-to-end with a
DuckDB oracle twin.

Scale notes: all three are the *sanctioned* Python paths — Arrow-batched
(pandas UDF / applyInPandas) or generator-based (UDTF) — never row-at-a-time
``F.udf``.  The scalar UDF and UDTF are row-local (no shuffle); the
grouped-map UDAF shuffles once on the group key, and each group must fit a
worker's memory — at 100 TB you salt or pre-aggregate oversized groups.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from sql2all_spark.registry import register
from sql2all_spark.tables import load_table


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group z-score of n_chars (two-pass mean/std, ddof=1)."""
    mu = pdf["n_chars"].mean()
    sd = pdf["n_chars"].std(ddof=1)
    out = pdf[["doc_id", "lang", "n_chars"]].copy()
    out["z_chars"] = ((pdf["n_chars"] - mu) / sd).round(6)
    return out


@register(
    "udaf_zscore_group",
    oracle="""
SELECT doc_id, lang, n_chars,
       ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
             / STDDEV_SAMP(n_chars) OVER (PARTITION BY lang), 6) AS z_chars
FROM documents
""",
    doc="Grouped-map UDAF via applyInPandas: per-language z-score of doc"
    " length.  One shuffle on the group key; each language's rows arrive as"
    " one pandas frame.  (Expressible as window SQL too — the point is the"
    " applyInPandas path for aggregations that AREN'T, e.g. per-group model"
    " fits.)  Rounded to 6dp: pandas' two-pass std and the engines' stddev"
    " differ in the last ulp.",
)
def udaf_zscore_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", "n_chars").groupBy("lang").applyInPandas(
        _zscore_group,
        schema="doc_id long, lang string, n_chars long, z_chars double",
    )


@udtf(returnType="pos: int, sentence: string")
class _SentenceSplit:
    """Lateral table function: one output row per '. '-delimited sentence."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, s in enumerate(text.split(". ")):
            yield i + 1, s


@register(
    "udtf_sentence_split",
    oracle="""
SELECT doc_id,
       unnest(range(1, len(string_split(text, '. ')) + 1)) AS pos,
       unnest(string_split(text, '. ')) AS sentence
FROM documents
""",
    doc="Python UDTF (Spark 3.5+ table function) applied laterally: splits"
    " each document into numbered sentences.  Generator-based row expansion"
    " without exploding an intermediate array column; row-local, no shuffle.",
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.udtf.register("sentence_split", _SentenceSplit)
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.sentence
        FROM documents d, LATERAL sentence_split(d.text) t
        """
    )
