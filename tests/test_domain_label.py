"""Invariants for the seeded nearest-centroid domain labeler family."""

from __future__ import annotations


def test_domain_label_confusion_partitions_corpus(spark, sf_dir, duck):
    """Confusion counts tile the embeddings table exactly: every vector
    is assigned to exactly one predicted domain, labels stay in range,
    and every true label appears."""
    from sql2all_spark.operators.domain_label import embed_domain_label

    rows = embed_domain_label(spark, sf_dir).collect()
    total, n_labels = duck.execute(
        "SELECT COUNT(*), COUNT(DISTINCT label) FROM embeddings"
    ).fetchone()
    assert sum(r.n_vecs for r in rows) == total
    labels = duck.execute(
        "SELECT DISTINCT label FROM embeddings"
    ).fetchall()
    label_set = {l[0] for l in labels}
    assert {r.true_label for r in rows} == label_set
    assert {r.pred_label for r in rows} <= label_set
    assert len(label_set) == n_labels


def test_domain_mix_weights_rebalance_toward_uniform(spark, sf_dir, duck):
    """Weights invert the count skew: over-represented domains get
    weight < SCALE, under-represented > SCALE, counts sum to the corpus,
    and expected post-resample counts land near the uniform target."""
    from sql2all_spark.operators.domain_label import (
        MIX_SCALE,
        embed_domain_mix_weights,
    )

    rows = embed_domain_mix_weights(spark, sf_dir).collect()
    total = duck.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    assert sum(r.n_vecs for r in rows) == total
    target = total / len(rows)
    for r in rows:
        if r.n_vecs > target:
            assert r.weight_fx < MIX_SCALE, (r.domain, r.n_vecs, r.weight_fx)
        elif r.n_vecs < target:
            assert r.weight_fx > MIX_SCALE, (r.domain, r.n_vecs, r.weight_fx)
        # n_after = n * weight rounds to the uniform target within 1
        assert abs(r.n_after - target) <= 1, (r.domain, r.n_after, target)


def test_mix_novelty_weights_recompute_and_reduce(spark, sf_dir):
    """The novelty-weighted targets are self-consistent: weight_fx
    recomputes exactly from the output's own columns (share = domain
    mean novelty over the summed means), n_after follows from
    weight_fx, the domain partition covers every embedding, and the
    novelty steering points the right way — among domains of similar
    size, higher mean novelty never gets a lower weight."""
    import math

    from sql2all_spark.operators.domain_label import MIX_SCALE
    from sql2all_spark.registry import all_specs
    from sql2all_spark.tables import load_table

    rows = (
        all_specs()["embed_domain_mix_novelty"]
        .builder(spark, sf_dir)
        .collect()
    )
    n_total = sum(r.n_vecs for r in rows)
    assert n_total == load_table(spark, sf_dir, "embeddings").count()
    nov_tot = float(
        sum(__import__("decimal").Decimal(str(r.mean_novelty)) for r in rows)
    )
    for r in rows:
        assert 0.0 <= r.mean_novelty <= 1.0
        w = math.floor(
            MIX_SCALE * (n_total * (r.mean_novelty / nov_tot)) / r.n_vecs
            + 0.5
        )
        assert r.weight_fx == w, (r, w)
        assert r.n_after == math.floor(
            r.n_vecs * (r.weight_fx / MIX_SCALE) + 0.5
        )
    for a in rows:
        for b in rows:
            if a.n_vecs == b.n_vecs and a.mean_novelty > b.mean_novelty:
                assert a.weight_fx >= b.weight_fx, (a, b)
