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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql2all_spark.cache import persist_tracked
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

CLF_ROUNDS = 4
CLF_LR = 2.0
CLF_GOLD_CHARS = 280  # heuristic gold label: length-gate quality proxy
CLF_SCALE = 1_000_000  # sigmoid fixed-point scale
CLF_HALF = CLF_SCALE // 2


def _feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, source, x1, x2, x3, y): deterministic features.

    x1 = tokens/CLF_TOK_SCALE, x2 = chars-per-token/CLF_CPT_SCALE,
    x3 = distinct-token ratio — each a ROUND(·,6) of integer ratios, so
    both engines hold identical doubles.  y = 1.0 iff n_chars >=
    CLF_GOLD_CHARS (length-gate gold).  lang/source ride along for the
    scoring legs' profiles (pruned by Catalyst where unused).
    """
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    toks = F.size(w).cast("double")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.round(toks / F.lit(CLF_TOK_SCALE), 6).alias("x1"),
        F.round(
            F.col("n_chars").cast("double") / (toks * F.lit(CLF_CPT_SCALE)),
            6,
        ).alias("x2"),
        F.round(F.size(F.array_distinct(w)).cast("double") / toks, 6).alias(
            "x3"
        ),
        F.when(F.col("n_chars") >= CLF_GOLD_CHARS, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
    )


# Feature scales shared by the Spark builder (_feats) and the oracle —
# interpolated so a constant change can never desynchronize the engines.
CLF_TOK_SCALE = 64.0
CLF_CPT_SCALE = 8.0

_FEATS_SQL = f"""
feats AS (
  SELECT doc_id, lang, source,
         ROUND(CAST(len(string_split(text, ' ')) AS DOUBLE)
               / {CLF_TOK_SCALE}, 6) AS x1,
         ROUND(CAST(n_chars AS DOUBLE)
               / (CAST(len(string_split(text, ' ')) AS DOUBLE)
                  * {CLF_CPT_SCALE}),
               6) AS x2,
         ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS x3,
         CASE WHEN n_chars >= {CLF_GOLD_CHARS} THEN 1.0 ELSE 0.0 END AS y
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


def _w_chain_sql(with_acc: bool = True) -> str:
    """Shared unrolled-GD CTE chain ``WITH feats, w0, g1, w1 [, c1] …``
    ending at w{CLF_ROUNDS}: w{k} derives from w{k-1} via the same
    DECIMAL(28,12) gradient sums and ROUND(·,6) updates the Spark loop
    performs; with_acc adds c{k} accuracy recounts under w{k}.  The
    scoring-leg oracles (filter / source caps) reuse the chain without
    the accuracy CTEs."""
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
        acc = (
            f""",
c{k} AS (
  SELECT COUNT(*) FILTER (
           WHERE ({_p_fx_sql(zk)} >= {CLF_HALF}) = (f.y = 1.0)
         ) AS n_correct,
         COUNT(*) AS n_rows
  FROM feats f, w{k} w
)"""
            if with_acc
            else ""
        )
        parts.append(
            f""",
g{k} AS (SELECT {grads} FROM feats f, w{k - 1} w),
w{k} AS (SELECT {ws} FROM w{k - 1} w, g{k} g){acc}"""
        )
    return "".join(parts)


def _clf_oracle() -> str:
    """Training-trajectory oracle: the shared chain + per-round rows."""
    rounds = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS INT) AS round, w.w0, w.w1, w.w2, w.w3,"
        f" CAST(c.n_correct AS BIGINT) AS n_correct,"
        f" CAST(c.n_rows AS BIGINT) AS n_rows"
        f" FROM w{k} w, c{k} c"
        for k in range(1, CLF_ROUNDS + 1)
    )
    return _w_chain_sql(with_acc=True) + f"\n{rounds}\nORDER BY round"


def _upd_cols(w: list[float]) -> list[F.Column]:
    """The 4 updated-weight aggregate columns under current weights ``w``:
    w{j} := ROUND(w[j] - LR * ROUND(mean((p - y) * x_j), 6), 6), with the
    gradient sum routed through DECIMAL(28,12) (order-free, exact) and
    every rounding done ENGINE-SIDE (Spark ROUND is half-up like the
    oracle's; Python round is half-even and must not touch weights)."""
    p = _p_fx(_z(w)).cast("double") / F.lit(float(CLF_SCALE))
    resid = p - F.col("y")
    xs = [F.lit(1.0), F.col("x1"), F.col("x2"), F.col("x3")]
    cols = []
    for j in range(4):
        grad = F.round(
            F.sum((resid * xs[j]).cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        )
        cols.append(
            F.round(F.lit(w[j]) - F.lit(CLF_LR) * grad, 6).alias(f"w{j}")
        )
    return cols


def _acc_cols(w: list[float]) -> list[F.Column]:
    """Train-accuracy aggregate columns under weights ``w``."""
    pk = _p_fx(_z(w))
    return [
        F.count_if(
            (pk >= F.lit(CLF_HALF)) == (F.col("y") == F.lit(1.0))
        ).alias("n_correct"),
        F.count(F.lit(1)).alias("n_rows"),
    ]


def train_weights(feats: DataFrame) -> list[float]:
    """Run the CLF_ROUNDS batch-GD loop and return the final weights.

    Always trains live (CLF_ROUNDS slim aggregate jobs); the scoring
    legs go through :func:`trained_weights` instead, which consults the
    session weight cache first — see its docstring."""
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(CLF_ROUNDS):
        row = feats.agg(*_upd_cols(w)).collect()[0]
        w = [row[f"w{j}"] for j in range(4)]
    return w


# Session-scoped trained-weights store, keyed on the REAL path of
# sf_dir (ADVICE r14: raw-string keying made ./sf0.01 vs /abs/sf0.01
# two entries, and a regenerated fixture dir would silently serve stale
# weights — the fixture dirs are immutable in this harness, so realpath
# keying fully determines the weights; anyone regenerating a fixture
# mid-session must call clear_weights_cache()).  This is
# the stored-weights artifact of the train-once / score-everything
# production shape (VERDICT r13 #2; the ivfpq stored-index sidecar is
# the on-disk analogue): the training query — or the first scoring leg
# to run — pays the CLF_ROUNDS GD jobs once, and every later scoring
# leg in the session re-enters the weights as literals with ZERO
# training jobs (pinned in tests/test_classifier.py).  Values are
# byte-identical either way: the cache holds the exact ROUND(·,6)
# floats the live loop produces, and cache hit vs miss is pinned
# value-identical in tests.
_WEIGHTS_CACHE: dict[str, list[float]] = {}


def clear_weights_cache() -> None:
    """Invalidate the session weight store.  Call after regenerating a
    fixture dir in-place (the cache assumes corpus immutability)."""
    _WEIGHTS_CACHE.clear()


def trained_weights(feats: DataFrame, sf_dir: str) -> list[float]:
    """w{CLF_ROUNDS} for this corpus: cached if any leg (or the training
    query) already derived them this session, else trained live and
    stored.  Each query stays self-contained — a scoring leg run in a
    fresh session simply pays the one-time training cost itself."""
    key = os.path.realpath(sf_dir)
    w = _WEIGHTS_CACHE.get(key)
    if w is None:
        w = train_weights(feats)
        _WEIGHTS_CACHE[key] = list(w)
    return list(w)


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
    " weight paths.  Round k's single aggregate computes BOTH the"
    " gradients under w{k-1} AND the train accuracy under w{k-1} —"
    " the accuracy that fills round k-1's output row — so the loop runs"
    " CLF_ROUNDS+1 jobs, not 2 per round (one trailing accuracy-only"
    " aggregate scores the final weights).  Output values are identical"
    " to the unfused loop: row k still reports accuracy under w{k}.",
)
def text_quality_classifier_train(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    feats = _feats(spark, sf_dir).transform(persist_tracked)
    w = [0.0, 0.0, 0.0, 0.0]
    weights: list[list[float]] = []
    accs: list[tuple] = []
    for k in range(1, CLF_ROUNDS + 1):
        row = feats.agg(*_upd_cols(w), *_acc_cols(w)).collect()[0]
        # accuracy was evaluated under w{k-1} = the weights row k-1
        # reported; round 1's accuracy under the all-zero w0 is not an
        # output row (the ledger starts at w1).
        if k > 1:
            accs.append((row["n_correct"], row["n_rows"]))
        w = [row[f"w{j}"] for j in range(4)]
        weights.append(list(w))
    final = feats.agg(*_acc_cols(w)).collect()[0]
    accs.append((final["n_correct"], final["n_rows"]))
    # Seed the session weight store: the training query IS the build leg
    # of the stored-weights artifact, so scoring legs that run after it
    # re-enter these exact floats with zero training jobs.
    _WEIGHTS_CACHE[sf_dir] = list(w)
    out = [
        (k, *weights[k - 1], *accs[k - 1])
        for k in range(1, CLF_ROUNDS + 1)
    ]
    return spark.createDataFrame(
        out,
        "round int, w0 double, w1 double, w2 double, w3 double,"
        " n_correct bigint, n_rows bigint",
    ).orderBy(F.col("round").asc_nulls_first())


# ---------------------------------------------------------------------------
# Scoring legs: the filter that actually filters (FineWeb keeps score >= tau;
# DCLM scores the whole corpus with the trained fastText filter) and the
# RefinedWeb-style per-source cap against over-represented domains.
# ---------------------------------------------------------------------------

CAP_N = 5  # per-source keep budget for text_source_quality_caps

_Z_W_SQL = "w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3"


def _filter_oracle() -> str:
    return (
        _w_chain_sql(with_acc=False)
        + f""",
scored AS (
  SELECT f.lang, {_p_fx_sql(_Z_W_SQL)} AS p_fx
  FROM feats f, w{CLF_ROUNDS} w
)
SELECT lang,
       CAST(p_fx >= {CLF_HALF} AS INTEGER) AS kept,
       COUNT(*) AS n_docs,
       CAST(SUM(p_fx) AS BIGINT) AS sum_p_fx,
       MIN(p_fx) AS min_p_fx,
       MAX(p_fx) AS max_p_fx
FROM scored
GROUP BY lang, kept
ORDER BY lang ASC NULLS FIRST, kept ASC NULLS FIRST
"""
    )


@register(
    "text_quality_filter",
    oracle=_filter_oracle(),
    doc="Quality-classifier SCORING leg: apply the trained round-"
    f"{CLF_ROUNDS} weights (literals — the pq_train re-entry pattern;"
    " production trains once and stores them) to EVERY document in one"
    " row-local scan — per-doc fixed-point score p_fx and a kept/dropped"
    " decision at p >= 0.5 (the FineWeb keep-if-score>=tau shape) —"
    " then profile per (lang, kept): doc counts and exact BIGINT score"
    " sums/extrema.  The scoring scan has no join and no exchange before"
    " the profile aggregation (plan-pinned): at 100 TB this is the"
    " cheapest possible corpus pass, a projection + map-side partial agg.",
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _feats(spark, sf_dir).transform(persist_tracked)
    w = trained_weights(feats, sf_dir)
    return (
        feats.select(
            "lang",
            _p_fx(_z(w)).alias("p_fx"),
        )
        .withColumn("kept", (F.col("p_fx") >= F.lit(CLF_HALF)).cast("int"))
        .groupBy("lang", "kept")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("p_fx").alias("sum_p_fx"),
            F.min("p_fx").alias("min_p_fx"),
            F.max("p_fx").alias("max_p_fx"),
        )
        .orderBy(
            F.col("lang").asc_nulls_first(), F.col("kept").asc_nulls_first()
        )
    )


def _caps_oracle() -> str:
    return (
        _w_chain_sql(with_acc=False)
        + f""",
scored AS (
  SELECT f.source, f.doc_id, {_p_fx_sql(_Z_W_SQL)} AS p_fx
  FROM feats f, w{CLF_ROUNDS} w
),
ranked AS (
  SELECT source, doc_id, p_fx,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY p_fx DESC, doc_id ASC) AS rn
  FROM scored
),
kept AS (
  SELECT source,
         COUNT(*) AS n_kept,
         CAST(SUM(p_fx) AS BIGINT) AS sum_kept_p_fx,
         MIN(p_fx) AS min_kept_p_fx
  FROM ranked WHERE rn <= {CAP_N}
  GROUP BY source
),
totals AS (SELECT source, COUNT(*) AS n_docs FROM scored GROUP BY source)
SELECT t.source, t.n_docs, k.n_kept,
       t.n_docs - k.n_kept AS n_dropped,
       k.sum_kept_p_fx, k.min_kept_p_fx
FROM totals t JOIN kept k ON t.source = k.source
ORDER BY t.source ASC NULLS FIRST
"""
    )


@register(
    "text_source_quality_caps",
    oracle=_caps_oracle(),
    doc="RefinedWeb-style per-source quality cap: keep only the top"
    f" {CAP_N} documents per source by trained quality score (score"
    " DESC, doc_id tiebreak) — the standard guard against over-"
    "represented domains — and report per-source kept/dropped stats."
    " The rank-filter compiles to WindowGroupLimit (plan-pinned): a"
    " BOUNDED per-source heap on both the map and reduce side of the"
    " source shuffle, never a global sort and never a full per-group"
    " sort, so at 100 TB a source with 10^9 docs still costs O(n) scan"
    f" + O({CAP_N}) state.  Weights re-enter as literals (train-once /"
    " score-everything; see text_quality_filter).",
)
def text_source_quality_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _feats(spark, sf_dir).transform(persist_tracked)
    w = trained_weights(feats, sf_dir)
    scored = feats.select("source", "doc_id", _p_fx(_z(w)).alias("p_fx"))
    win = Window.partitionBy("source").orderBy(
        F.col("p_fx").desc(), F.col("doc_id").asc()
    )
    kept = (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= CAP_N)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("p_fx").alias("sum_kept_p_fx"),
            F.min("p_fx").alias("min_kept_p_fx"),
        )
    )
    totals = scored.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        totals.join(kept, "source")
        .select(
            "source",
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept")).alias("n_dropped"),
            "sum_kept_p_fx",
            "min_kept_p_fx",
        )
        .orderBy(F.col("source").asc_nulls_first())
    )


N_CAL_BANDS = 10  # fixed-width score bands for the calibration profile


def _cal_oracle() -> str:
    return (
        _w_chain_sql(with_acc=False)
        + f""",
scored AS (
  SELECT f.y, {_p_fx_sql(_Z_W_SQL)} AS p_fx
  FROM feats f, w{CLF_ROUNDS} w
)
SELECT CAST(LEAST(p_fx * {N_CAL_BANDS} // {CLF_SCALE},
                  {N_CAL_BANDS - 1}) AS INT) AS band,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(y AS BIGINT)) AS BIGINT) AS n_pos,
       CAST(SUM(p_fx) AS BIGINT) AS sum_p_fx
FROM scored
GROUP BY band
ORDER BY band ASC NULLS FIRST
"""
    )


@register(
    "text_quality_calibration",
    oracle=_cal_oracle(),
    doc="Classifier calibration profile (reliability diagram): bucket"
    f" every document's fixed-point score into {N_CAL_BANDS} FIXED-WIDTH"
    " bands (row-local integer floor-divide — NOT a rank NTILE, which"
    " would globally sort the corpus) and emit per-band doc count,"
    " positive-gold count, and exact score sum.  n_pos/n_docs vs"
    " sum_p_fx/(n_docs*SCALE) per band is the calibration curve / ECE"
    " input a filter-tuning run reads before choosing tau.  One"
    " column-pruned scan + a <=10-group aggregate: the identical plan"
    " at 100 TB.",
)
def text_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _feats(spark, sf_dir).transform(persist_tracked)
    w = trained_weights(feats, sf_dir)
    p = _p_fx(_z(w))
    band = F.least(
        (p * N_CAL_BANDS / F.lit(CLF_SCALE)).cast("long"),
        F.lit(N_CAL_BANDS - 1),
    ).cast("int")
    return (
        feats.select(
            band.alias("band"),
            F.col("y"),
            p.alias("p_fx"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("y").cast("long")).alias("n_pos"),
            F.sum("p_fx").alias("sum_p_fx"),
        )
        .orderBy(F.col("band").asc_nulls_first())
    )
