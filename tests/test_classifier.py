"""Invariants for the GD quality-classifier loop and CCNet buckets."""

from __future__ import annotations

import math
import re

import numpy as np
from pyspark.sql import functions as F


def _collect_feats(spark, sf_dir):
    from sql2all_spark.operators.classifier import _feats

    rows = _feats(spark, sf_dir).collect()
    X = np.array([[1.0, r.x1, r.x2, r.x3] for r in rows])
    y = np.array([r.y for r in rows])
    return X, y


def _logloss(X, y, w):
    p = np.floor(1e6 / (1 + np.exp(-(X @ np.array(w)))) + 0.5) / 1e6
    p = np.clip(p, 1e-9, 1 - 1e-9)
    return float(-np.mean(y * np.log(p) + (1 - y) * np.log(1 - p)))


def test_classifier_loss_monotone_and_learns(spark, sf_dir):
    """Train log-loss strictly decreases every round and final accuracy
    beats the base rate — GD actually optimizes, not just terminates."""
    from sql2all_spark.operators.classifier import (
        text_quality_classifier_train,
    )

    traj = text_quality_classifier_train(spark, sf_dir).collect()
    X, y = _collect_feats(spark, sf_dir)
    losses = [_logloss(X, y, [0.0, 0.0, 0.0, 0.0])] + [
        _logloss(X, y, [r.w0, r.w1, r.w2, r.w3]) for r in traj
    ]
    assert all(
        b < a for a, b in zip(losses, losses[1:])
    ), f"log-loss not monotone: {losses}"
    base = max(int(y.sum()), int((1 - y).sum()))
    assert traj[-1].n_correct > base, (traj[-1].n_correct, base)
    # trajectory internally consistent
    assert [r.round for r in traj] == list(range(1, len(traj) + 1))
    assert all(r.n_rows == len(y) for r in traj)


def test_classifier_round_plans_identical(spark, sf_dir):
    """Weights re-enter as literals, so every round's gradient-aggregate
    physical plan is identical (lineage truncation, pq_train pattern)."""
    from sql2all_spark.operators.classifier import (
        CLF_LR,
        CLF_SCALE,
        _feats,
        _p_fx,
        _z,
    )
    from sql2all_spark.plans import physical_plan

    def shape(plan: str) -> list[str]:
        ops = re.findall(
            r"^\s*[+:*-]*\s*\(?\d*\)?\s*([A-Za-z]+[A-Za-z ]*)", plan, re.M
        )
        return [o.strip() for o in ops if o.strip()]

    feats = _feats(spark, sf_dir).persist()
    try:
        w = [0.0, 0.0, 0.0, 0.0]
        shapes = []
        for _ in range(3):
            p = _p_fx(_z(w)).cast("double") / F.lit(float(CLF_SCALE))
            resid = p - F.col("y")
            xs = [F.lit(1.0), F.col("x1"), F.col("x2"), F.col("x3")]
            agg = feats.agg(
                *[
                    F.round(
                        F.lit(w[j])
                        - F.lit(CLF_LR)
                        * F.round(
                            F.sum(
                                (resid * xs[j]).cast("decimal(28,12)")
                            ).cast("double")
                            / F.count(F.lit(1)),
                            6,
                        ),
                        6,
                    ).alias(f"w{j}")
                    for j in range(4)
                ]
            )
            shapes.append(shape(physical_plan(agg)))
            row = agg.collect()[0]
            w = [row[f"w{j}"] for j in range(4)]
        assert all(s == shapes[0] for s in shapes[1:]), shapes
        # the gradient aggregate is partial-aggregatable (two HashAggregate
        # levels around the exchange, no sort/window)
        flat = " ".join(shapes[0])
        assert "HashAggregate" in flat, flat
        assert "Window" not in flat and "Sort" not in flat, flat
    finally:
        feats.unpersist()


def test_perplexity_buckets_partition_docs(spark, sf_dir):
    """Buckets tile each language exactly: per-lang doc counts sum to the
    lang's doc count and terciles differ by at most 1 doc."""
    from sql2all_spark.operators.ccnet import text_perplexity_buckets
    from sql2all_spark.tables import load_table

    got = text_perplexity_buckets(spark, sf_dir).collect()
    lang_total = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_lang: dict[str, list] = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == set(lang_total)
    for lang, rows in by_lang.items():
        assert sorted(r.bucket for r in rows) == ["head", "middle", "tail"]
        counts = [r.n_docs for r in rows]
        assert sum(counts) == lang_total[lang]
        assert max(counts) - min(counts) <= 1, (lang, counts)
        # head scores strictly below tail scores (score bands ordered)
        band = {r.bucket: (r.min_score, r.max_score) for r in rows}
        assert band["head"][1] <= band["middle"][0]
        assert band["middle"][1] <= band["tail"][0]


def test_classifier_train_runs_fused_job_count(spark, sf_dir):
    """Round k's single aggregate computes gradients AND the accuracy
    that fills row k-1 (VERDICT r12 #6): the whole loop runs exactly
    CLF_ROUNDS+1 jobs (CLF_ROUNDS fused aggregates + one trailing
    accuracy-only pass for the final weights), not 2 per round."""
    from sql2all_spark.operators.classifier import (
        CLF_ROUNDS,
        text_quality_classifier_train,
    )
    from sql2all_spark.tables import load_table

    load_table(spark, sf_dir, "documents")
    text_quality_classifier_train(spark, sf_dir)  # warm caches/footers
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup())
    text_quality_classifier_train(spark, sf_dir)
    ran = len(set(st.getJobIdsForGroup()) - before)
    # AQE materializes each aggregate's shuffle stage as its own job, so
    # one collect = up to 2 jobs; the fused loop runs CLF_ROUNDS+1
    # collects <= 10 jobs, while the unfused loop's 2*CLF_ROUNDS collects
    # ran 16 — the bound separates the two shapes under either AQE mode.
    assert ran <= 2 * (CLF_ROUNDS + 1), (
        f"expected <= {2 * (CLF_ROUNDS + 1)} jobs"
        f" ({CLF_ROUNDS + 1} collects), ran {ran}"
    )


def test_quality_filter_partitions_corpus(spark, sf_dir, duck):
    """kept/dropped is a partition of documents and the fixed-point
    threshold is honored on both sides of the cut."""
    from sql2all_spark.operators.classifier import CLF_HALF, text_quality_filter

    rows = text_quality_filter(spark, sf_dir).collect()
    total = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        if r.kept == 1:
            assert r.min_p_fx >= CLF_HALF
        else:
            assert r.max_p_fx < CLF_HALF
    # the filter actually filters: both classes exist corpus-wide
    kinds = {r.kept for r in rows}
    assert kinds == {0, 1}, kinds


def test_source_caps_bounded_and_consistent(spark, sf_dir, duck):
    """Every source appears, keeps at most CAP_N docs, and the
    kept/dropped ledger adds up."""
    from sql2all_spark.operators.classifier import CAP_N, text_source_quality_caps

    rows = text_source_quality_caps(spark, sf_dir).collect()
    n_sources = duck.execute(
        "SELECT COUNT(DISTINCT source) FROM documents"
    ).fetchone()[0]
    assert len(rows) == n_sources
    for r in rows:
        assert 1 <= r.n_kept <= CAP_N
        assert r.n_docs == r.n_kept + r.n_dropped
        assert r.n_dropped >= 0


def test_calibration_bands_tile_and_track_gold(spark, sf_dir, duck):
    """The band profile partitions the corpus, respects band arithmetic,
    and the top band is purer than the bottom (the classifier learned,
    so calibration must slope upward end to end)."""
    from sql2all_spark.operators.classifier import (
        CLF_SCALE,
        N_CAL_BANDS,
        text_quality_calibration,
    )

    rows = text_quality_calibration(spark, sf_dir).collect()
    total = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert 0 <= r.band < N_CAL_BANDS
        assert 0 <= r.n_pos <= r.n_docs
        # mean score lies inside the band's [lo, hi) range (modulo the
        # top band absorbing p_fx == SCALE)
        lo = r.band * CLF_SCALE // N_CAL_BANDS
        hi = (r.band + 1) * CLF_SCALE // N_CAL_BANDS
        mean_p = r.sum_p_fx / r.n_docs
        assert lo <= mean_p <= (CLF_SCALE if r.band == N_CAL_BANDS - 1 else hi)
    first, last = rows[0], rows[-1]
    assert last.n_pos / last.n_docs > first.n_pos / first.n_docs


def test_weight_cache_hit_identical_and_jobless(spark, sf_dir):
    """The stored-weights artifact (VERDICT r13 #2): a scoring leg with a
    warm session cache (a) re-enters byte-identical weights — collected
    output equals the cold-cache run exactly — and (b) BUILDS with zero
    Spark jobs (training collects are gone; only the deferred scan/agg
    plan remains).  The training query seeds the cache, so a full suite
    run trains the GD loop exactly once."""
    import os

    from sql2all_spark.functions import clf_core as CC
    from sql2all_spark.operators import classifier as C

    key = os.path.realpath(sf_dir)  # ADVICE r14: realpath-keyed store
    # cold: clear the cache, run the filter leg (trains live)
    CC.clear_weights_cache()
    cold = C.text_quality_filter(spark, sf_dir).collect()
    assert key in CC._WEIGHTS_CACHE  # the miss stored the weights
    w_cold = CC._WEIGHTS_CACHE[key]

    # warm: building the leg again must launch NO jobs at all
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup())
    df = C.text_quality_filter(spark, sf_dir)
    ran = len(set(st.getJobIdsForGroup()) - before)
    assert ran == 0, f"warm-cache build launched {ran} training jobs"
    assert df.collect() == cold  # values byte-identical, hit vs miss

    # the training query re-derives the same floats and re-seeds
    CC.clear_weights_cache()
    traj = C.text_quality_classifier_train(spark, sf_dir).collect()
    last = traj[-1]
    assert CC._WEIGHTS_CACHE[key] == [last.w0, last.w1, last.w2, last.w3]
    assert CC._WEIGHTS_CACHE[key] == w_cold
    # path aliasing resolves to the SAME entry (the realpath fix)
    alias = sf_dir.rstrip("/") + "/."
    assert CC.trained_weights(None, alias) == w_cold


def test_suite_trains_once(spark, sf_dir):
    """train + all three scoring legs = exactly one GD loop: after the
    training query runs, the three legs build with zero additional
    jobs (the train-once / score-everything production shape)."""
    from sql2all_spark.functions import clf_core as CC
    from sql2all_spark.operators import classifier as C

    CC.clear_weights_cache()
    C.text_quality_classifier_train(spark, sf_dir)  # pays the GD loop
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup())
    C.text_quality_filter(spark, sf_dir)
    C.text_source_quality_caps(spark, sf_dir)
    C.text_quality_calibration(spark, sf_dir)
    ran = len(set(st.getJobIdsForGroup()) - before)
    assert ran == 0, f"scoring legs launched {ran} jobs after training"
