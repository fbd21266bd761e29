"""Scalar function families: string, date/time, math, conditional (in
relational.py), array (higher-order), JSON.

All row-level → whole-stage-codegen'd JVM expressions, zero Python.  Each
query covers one family so a coverage reader can map SURVEY.md §2.B function
rows to a single entry.

Dialect notes baked into the oracle twins (Spark ↔ DuckDB):
- ``date_trunc`` returns timestamp in Spark, date in DuckDB → cast both to date
- ``ceil`` returns bigint in Spark, double in DuckDB → cast
- ``signum`` returns double in Spark, int in DuckDB → cast to int
- transcendentals (exp/ln/pow) can differ in the last ulp between java.lang.Math
  and libm → ROUND(.., 6)
- array fold: cast float32 → double *before* multiplying, then left-to-right
  fold — both engines then run the identical IEEE double sequence
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.registry import register
from sql2all_spark.tables import load_table


@register(
    "func_array_family",
    oracle="""
SELECT vec_id, label,
       LEN(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_component,
       array_to_string(list_transform(CAST(embedding[1:4] AS DOUBLE[]),
                                      x -> printf('%.6f', x)), ',') AS head4,
       list_reduce(
         list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
         (a, b) -> a + b) AS sq_norm,
       LEN(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS n_positive
FROM embeddings
WHERE vec_id % 10 = 0
""",
    doc="Array family incl. higher-order transform/filter/fold over the"
    " embedding column.  float32→double cast happens before any arithmetic"
    " so both engines run the same IEEE double sequence left-to-right."
    " Array-typed outputs are serialized to a CSV string (rounded 6dp) —"
    " the driver's pandas canonicalizer cannot hash raw list cells"
    " (CORRECTNESS_r01: unhashable type 'list').",
)
def func_array_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        F.array_join(
            F.transform(F.slice(dbl, 1, 4), lambda x: F.format_string("%.6f", x)),
            ",",
        ).alias("head4"),
        F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x).alias("sq_norm"),
        F.size(F.filter(dbl, lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "func_string_family",
    oracle="""
SELECT c_custkey,
       LOWER(c_name) AS name_lower,
       UPPER(c_mktsegment) AS seg_upper,
       TRIM(c_name) AS name_trim,
       SUBSTRING(c_name, 1, 8) AS name_prefix,
       REPLACE(c_name, '#', '-') AS name_dashed,
       LENGTH(c_name) AS name_len,
       c_name || ':' || c_mktsegment AS name_seg,
       LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
       STRPOS(c_name, '#') AS hash_pos,
       LEN(string_split(c_name, '#')) AS n_parts,
       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
       regexp_replace(c_name, '[0-9]', 'N', 'g') AS masked
FROM customer
WHERE c_custkey <= 200
""",
    doc="String family: lower/upper/trim/substring/replace/length/concat/"
    "lpad/instr/split/regexp_extract/regexp_replace.",
)
def func_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.lower(name).alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.trim(name).alias("name_trim"),
        F.substring(name, 1, 8).alias("name_prefix"),
        F.replace(name, F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.length(name).alias("name_len"),
        F.concat(name, F.lit(":"), F.col("c_mktsegment")).alias("name_seg"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.instr(name, "#").alias("hash_pos"),
        F.size(F.split(name, "#")).alias("n_parts"),
        F.regexp_extract(name, "([0-9]+)", 1).alias("digits"),
        F.regexp_replace(name, "[0-9]", "N").alias("masked"),
    )


@register(
    "func_date_family",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
       YEAR(o_orderdate) AS order_year,
       MONTH(o_orderdate) AS order_month,
       DAY(o_orderdate) AS order_day,
       QUARTER(o_orderdate) AS order_quarter,
       CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS TIMESTAMP) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       strftime(o_orderdate, '%Y-%m') AS year_month
FROM orders
WHERE o_orderkey % 200 = 0
""",
    doc="Date/time family: extract parts, date_trunc, date arithmetic,"
    " datediff, formatting.  Date-typed results are cast back to timestamp"
    " on both sides: pandas renders Spark DATE as datetime.date but DuckDB"
    " DATE as midnight datetime64, which breaks value comparison on a"
    " column that is semantically identical.",
)
def func_date_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 200 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        d.cast("date").cast("timestamp").alias("order_date"),
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.quarter(d).alias("order_quarter"),
        F.date_trunc("month", d).cast("date").cast("timestamp").alias("month_start"),
        F.date_add(d.cast("date"), 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias(
            "days_to_y2k"
        ),
        F.date_format(d, "yyyy-MM").alias("year_month"),
    )


@register(
    "func_math_family",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ABS(l_extendedprice - 30000) AS abs_dev,
       CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
       ROUND(l_extendedprice) AS price_round,
       SQRT(l_extendedprice) AS price_sqrt,
       ROUND(LN(l_extendedprice), 6) AS price_ln,
       ROUND(LOG10(l_extendedprice), 6) AS price_log10,
       ROUND(EXP(l_discount), 6) AS disc_exp,
       ROUND(POW(1 + l_discount, 3), 6) AS disc_compound,
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
       CAST(SIGN(l_extendedprice - 30000) AS INT) AS dev_sign
FROM lineitem
WHERE l_orderkey % 500 = 0
""",
    doc="Math family: abs/ceil/floor/round/sqrt/ln/log10/exp/pow/mod/sign."
    " Transcendentals rounded to 6 dp (JVM vs libm last-ulp divergence).",
)
def func_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    p = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(p - 30000).alias("abs_dev"),
        F.ceil(p).alias("price_ceil"),
        F.floor(p).alias("price_floor"),
        F.round(p, 0).alias("price_round"),
        F.sqrt(p).alias("price_sqrt"),
        F.round(F.log(p), 6).alias("price_ln"),
        F.round(F.log10(p), 6).alias("price_log10"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.pow(F.lit(1) + F.col("l_discount"), 3), 6).alias("disc_compound"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.signum(p - 30000).cast("int").alias("dev_sign"),
    )


@register(
    "func_json_family",
    oracle="""
SELECT event_id, event_type,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_field,
       CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k_doubled
FROM events
WHERE event_id % 20 = 0
""",
    doc="JSON family over events.props (JSON-encoded string column):"
    " path extraction, typed cast, missing-key null.",
)
def func_json_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        "event_type",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
        (k.cast("int") * 2).alias("k_doubled"),
    )


@register(
    "func_struct_map",
    oracle="""
SELECT o_orderkey,
       {'status': o_orderstatus, 'price': o_totalprice}.price AS price_from_struct,
       {'status': o_orderstatus, 'price': o_totalprice}.status AS status_from_struct,
       CAST((MAP {'lo': 0.0, 'hi': 500000.0}['hi'])[1] AS DOUBLE) AS hi_bound
FROM orders
WHERE o_orderkey % 1000 = 0
""",
    doc="Struct construction + field access + map lookup (absent in the"
    " reference's type system entirely; needed for nested 100 TB data)."
    " Only the *accessed* scalars are projected: raw struct cells render as"
    " Row vs dict in the two engines' pandas bridges.",
)
def func_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 1000 == 0)
    info = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_totalprice").alias("price")
    )
    return o.select(
        "o_orderkey",
        info.getField("price").alias("price_from_struct"),
        info.getField("status").alias("status_from_struct"),
        F.element_at(
            F.create_map(F.lit("lo"), F.lit(0.0), F.lit("hi"), F.lit(500000.0)),
            F.lit("hi"),
        ).alias("hi_bound"),
    )


@register(
    "func_variant_json",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k_int,
       CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
       CASE WHEN json_extract(props, '$.missing') IS NULL THEN 1 ELSE 0 END
         AS missing_is_null
FROM events
WHERE event_id < 2000
""",
    doc="VariantType (Spark 4): parse_json once into a binary variant, then"
    " typed path extraction with try_variant_get — the shredded-JSON path"
    " that beats per-field get_json_object string re-parsing when many"
    " fields are read from the same document.  try_* semantics: missing"
    " paths yield NULL, never errors.",
)
def func_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return e.select(
        "event_id",
        k.alias("k_int"),
        (k % 10).alias("k_bucket"),
        F.when(F.try_variant_get(v, "$.missing", "string").isNull(), 1)
        .otherwise(0)
        .alias("missing_is_null"),
    )


@register(
    "func_regexp_family",
    oracle=r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z]+ed\b')) AS n_past_ish,
       regexp_extract(text, '([a-z]{8,})', 1) AS first_long_word,
       CASE WHEN regexp_matches(text, '[0-9]') THEN 1 ELSE 0 END AS has_digit,
       split_part(text, ' ', 3) AS third_word
FROM documents
WHERE doc_id < 300
""",
    doc="Regexp function family: extract-all counting, group extraction,"
    " boolean match, and split_part — all JVM-side regex (no UDF),"
    " restricted to the syntax subset Java and DuckDB regex dialects"
    " interpret identically (classes, quantifiers, \\b, groups).",
)
def func_regexp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    text = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_count(text, F.lit(r"[a-z]+ed\b")).alias("n_past_ish"),
        F.regexp_extract(text, r"([a-z]{8,})", 1).alias("first_long_word"),
        F.when(text.rlike("[0-9]"), 1).otherwise(0).alias("has_digit"),
        F.split_part(text, F.lit(" "), F.lit(3)).alias("third_word"),
    )
