"""Distributed quality-classifier training: logistic regression by
batch gradient descent over corpus-level features — the fastText/DCLM
quality-filter training stand-in (Joulin et al. 2017 train a linear
text classifier; DCLM and FineWeb train quality filters over doc
features and score the whole corpus with them).

Loop discipline (the pq_train / bpe_train pattern): the feature frame
is computed once and persisted; each GD round is ONE slim aggregate —
per-feature gradient sums in DECIMAL(28,12) (order-free, exact) — whose
4 updated weights are collected and re-entered as LITERALS, so every
round's physical plan is identical and lineage never grows.  A 4-value
collect per round is an O(1) driver scalar in the repo's escape-hatch
taxonomy.  At 100 TB each round is one partial-aggregatable scan of a
slim (x1, x2, x3, y) projection — the classic distributed batch-GD
shape (map-side gradient combine, no shuffle of rows, 1 reduce row).

Cross-engine determinism (the lm.py / bitext.py fixed-point ledger):

- features are deterministic doubles (integer counts and ROUND(·, 6)
  ratios — IEEE arithmetic on identical inputs is engine-identical);
- the sigmoid is the ONLY transcendental: its output is immediately
  quantized to a fixed-point BIGINT ``p_fx = FLOOR(1e6·σ(z) + 0.5)``
  (the lm.py FLOOR(x+0.5) discipline — a 1-ulp exp() divergence flips
  the floor only within ~1e-10 of a boundary), and all downstream
  arithmetic uses the EXACT double ``p_fx / 1e6``;
- gradient sums go through DECIMAL(28,12) (order-free), means and
  weight updates are ROUND(·, 6) — byte-identical in both engines.

The fixture gold label is a length-gate quality proxy (n_chars >= 280)
— production quality filters likewise train against heuristic gold
(FineWeb-Edu scores, wiki-reference membership).  Measured: lang='en'
as the label sits at the base rate (surface stats are iid across the
fixture's langs), while the length gate LEARNS — accuracy 270 -> 444
of 500 over 4 rounds at sf0.01 with monotone log-loss (pinned in
tests).  The contract under test is the distributed training loop and
its cross-engine trajectory — the oracle hash-pins all ROUNDS rows of
(weights, train accuracy).

Reference parity: SQL2ALL has no ML surface (658-line core delegates
SQL to the attached DB — src/db/sqlite.rs:79); LLM-pipeline extension
surface (SURVEY.md §2 extension table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.cache import persist_tracked
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

CLF_ROUNDS = 4
CLF_LR = 2.0
CLF_GOLD_CHARS = 280  # heuristic gold label: length-gate quality proxy
CLF_SCALE = 1_000_000  # sigmoid fixed-point scale
CLF_HALF = CLF_SCALE // 2


def _feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, x1, x2, x3, y): deterministic surface features.

    x1 = tokens/64, x2 = chars-per-token/8, x3 = distinct-token ratio —
    each a ROUND(·,6) of integer ratios, so both engines hold identical
    doubles.  y = 1.0 iff n_chars >= CLF_GOLD_CHARS (length-gate gold).
    """
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    toks = F.size(w).cast("double")
    return d.select(
        "doc_id",
        F.round(toks / F.lit(64.0), 6).alias("x1"),
        F.round(
            F.col("n_chars").cast("double") / (toks * F.lit(8.0)), 6
        ).alias("x2"),
        F.round(F.size(F.array_distinct(w)).cast("double") / toks, 6).alias(
            "x3"
        ),
        F.when(F.col("n_chars") >= CLF_GOLD_CHARS, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
    )


_FEATS_SQL = """
feats AS (
  SELECT doc_id,
         ROUND(CAST(len(string_split(text, ' ')) AS DOUBLE) / 64.0, 6) AS x1,
         ROUND(CAST(n_chars AS DOUBLE)
               / (CAST(len(string_split(text, ' ')) AS DOUBLE) * 8.0),
               6) AS x2,
         ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS x3,
         CASE WHEN n_chars >= 280 THEN 1.0 ELSE 0.0 END AS y
  FROM documents
)"""


def _p_fx(z: F.Column) -> F.Column:
    """Fixed-point sigmoid: FLOOR(1e6/(1+exp(-z)) + 0.5) as BIGINT."""
    return (
        F.floor(
            F.lit(float(CLF_SCALE)) / (F.lit(1.0) + F.exp(-z)) + F.lit(0.5)
        )
    ).cast("long")


def _p_fx_sql(z: str) -> str:
    return (
        f"CAST(FLOOR({CLF_SCALE}.0 / (1.0 + EXP(-({z}))) + 0.5) AS BIGINT)"
    )


def _z(w: list[float]):
    return (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
    )


def _clf_oracle() -> str:
    """Unrolled GD rounds as CTE chains: w{k} derives from w{k-1} via the
    same DECIMAL(28,12) gradient sums and ROUND(·,6) updates the Spark
    loop performs; c{k} recounts train accuracy under w{k}."""
    parts = [f"WITH {_FEATS_SQL.strip()}"]
    parts.append(
        ",\nw0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"
    )
    for k in range(1, CLF_ROUNDS + 1):
        zk = (
            f"w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3"
        )
        grads = ", ".join(
            f"ROUND(CAST(SUM(CAST(({_p_fx_sql(zk)} / {CLF_SCALE}.0 - f.y)"
            f" * {xj} AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS g{j}"
            for j, xj in enumerate(["1.0", "f.x1", "f.x2", "f.x3"])
        )
        ws = ", ".join(
            f"ROUND(w.w{j} - {CLF_LR} * g.g{j}, 6) AS w{j}" for j in range(4)
        )
        parts.append(
            f""",
g{k} AS (SELECT {grads} FROM feats f, w{k - 1} w),
w{k} AS (SELECT {ws} FROM w{k - 1} w, g{k} g),
c{k} AS (
  SELECT COUNT(*) FILTER (
           WHERE ({_p_fx_sql(zk)} >= {CLF_HALF}) = (f.y = 1.0)
         ) AS n_correct,
         COUNT(*) AS n_rows
  FROM feats f, w{k} w
)"""
        )
    rounds = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS INT) AS round, w.w0, w.w1, w.w2, w.w3,"
        f" CAST(c.n_correct AS BIGINT) AS n_correct,"
        f" CAST(c.n_rows AS BIGINT) AS n_rows"
        f" FROM w{k} w, c{k} c"
        for k in range(1, CLF_ROUNDS + 1)
    )
    return "".join(parts) + f"\n{rounds}\nORDER BY round"


@register(
    "text_quality_classifier_train",
    oracle=_clf_oracle(),
    doc=f"Distributed quality-classifier training: {CLF_ROUNDS} batch-GD"
    " rounds of logistic regression over deterministic surface features"
    " (tokens, chars-per-token, distinct-token ratio -> a length-gate"
    " gold label), the fastText/DCLM quality-filter stand-in.  Each"
    " round is ONE slim"
    " partial-aggregatable scan (DECIMAL gradient sums, map-side"
    " combine); the 4 weights re-enter as literals (pq_train pattern) so"
    " per-round plans are identical and lineage never grows.  The result"
    " hash-pins the whole trajectory: per round, the ROUND(·,6) weights"
    " and the train accuracy under them.  Sigmoid outputs are fixed-point"
    " BIGINTs (lm.py discipline), so both engines walk byte-identical"
    " weight paths.",
)
def text_quality_classifier_train(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    feats = _feats(spark, sf_dir).transform(persist_tracked)
    w = [0.0, 0.0, 0.0, 0.0]
    out: list[tuple] = []
    for k in range(1, CLF_ROUNDS + 1):
        p = _p_fx(_z(w)).cast("double") / F.lit(float(CLF_SCALE))
        resid = p - F.col("y")
        xs = [F.lit(1.0), F.col("x1"), F.col("x2"), F.col("x3")]
        def upd(j: int):
            grad = F.round(
                F.sum((resid * xs[j]).cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            )
            return F.round(F.lit(w[j]) - F.lit(CLF_LR) * grad, 6).alias(
                f"w{j}"
            )

        new_w = feats.agg(*[upd(j) for j in range(4)]).collect()[0]
        w = [new_w[f"w{j}"] for j in range(4)]
        pk = _p_fx(_z(w))
        acc = feats.agg(
            F.count_if(
                (pk >= F.lit(CLF_HALF)) == (F.col("y") == F.lit(1.0))
            ).alias("n_correct"),
            F.count(F.lit(1)).alias("n_rows"),
        ).collect()[0]
        out.append((k, *w, acc["n_correct"], acc["n_rows"]))
    return spark.createDataFrame(
        out,
        "round int, w0 double, w1 double, w2 double, w3 double,"
        " n_correct bigint, n_rows bigint",
    ).orderBy(F.col("round").asc_nulls_first())
