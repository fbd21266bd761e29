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
