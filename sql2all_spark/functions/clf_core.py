"""Shared quality-classifier machinery (features, fixed-point sigmoid,
unrolled-GD chain, session weight store).

Extracted from ``operators/classifier.py`` so the per-domain quality
profile (``operators/quality_profile.py``) can compose the scoring leg
WITHOUT importing the registering classifier module (the
``functions/sp_core.py`` / ``functions/bm25.py`` import-order-decoupling
precedent: registry window positions depend on module import order and
``register()`` evaluates oracles eagerly).  All semantics documented in
operators/classifier.py's module docstring.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.tables import load_table

CLF_ROUNDS = 4
CLF_LR = 2.0
CLF_GOLD_CHARS = 280  # heuristic gold label: length-gate quality proxy
CLF_SCALE = 1_000_000  # sigmoid fixed-point scale
CLF_HALF = CLF_SCALE // 2
# Per-source keep budget for text_source_quality_caps and the tau x caps
# composition (operators/tau_caps.py).  Lives here, not in classifier.py,
# so composing operators can import it without dragging the classifier
# module's registrations into the driver window (the r15 shared-core
# import-order discipline).
CAP_N = 5


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


def _w_chain_sql(with_acc: bool = True, with_kw: bool = True) -> str:
    """Shared unrolled-GD CTE chain ``WITH feats, w0, g1, w1 [, c1] …``
    ending at w{CLF_ROUNDS}: w{k} derives from w{k-1} via the same
    DECIMAL(28,12) gradient sums and ROUND(·,6) updates the Spark loop
    performs; with_acc adds c{k} accuracy recounts under w{k}.  The
    scoring-leg oracles (filter / source caps) reuse the chain without
    the accuracy CTEs.  ``with_kw=False`` omits the leading ``WITH`` so
    callers already inside a WITH [RECURSIVE] list can append the chain
    structurally (never slice the assembled SQL — the ADVICE r15 rule)."""
    head = f"WITH {_FEATS_SQL.strip()}" if with_kw else _FEATS_SQL.strip()
    parts = [head]
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


def store_weights(sf_dir: str, w: list[float]) -> None:
    """Seed the session store (the training query is the build leg)."""
    _WEIGHTS_CACHE[os.path.realpath(sf_dir)] = list(w)


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


_Z_W_SQL = "w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3"
