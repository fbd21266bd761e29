"""Semantic invariants the oracle differential cannot express.

The oracle gate proves Spark ≡ DuckDB — but both sides could share a bug.
These tests pin properties that follow from the ALGORITHM's published
guarantees, independently of either engine's output agreeing with the
other.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from sql2all_spark.registry import all_specs


def test_bloom_filter_has_zero_false_negatives(spark, sf_dir):
    """A Bloom filter may report false positives but NEVER false
    negatives: every true member must probe positive, so
    bloom_positive − false_positive == members exactly."""
    row = (
        all_specs()["agg_bloom_filter_probe"].builder(spark, sf_dir).collect()[0]
    )
    assert row["n_bloom_positive"] - row["n_false_positive"] == row["n_members"]
    assert 0 < row["n_members"] <= row["n_probed"]
    # the bitmap is actually in use (not degenerate all-zero / all-one)
    from sql2all_spark.operators.sketches import BF_M

    assert 0 < row["n_bits_set"] < BF_M


def test_winnow_fingerprint_coverage_guarantee(spark, sf_dir):
    """Winnowing's defining property (Schleimer et al. §4): every window
    of w consecutive k-grams contributes at least one selected
    fingerprint, so the gap between consecutive selected positions within
    a document is at most w.  A violation means a whole window went
    unfingerprinted and a t-token copy could be missed."""
    from sql2all_spark.operators.text import WINNOW_W

    fp = (
        all_specs()["text_winnow_fingerprint"]
        .builder(spark, sf_dir)
        .select("doc_id", "fp_pos")
        .toPandas()
    )
    assert len(fp), "fixture docs must produce fingerprints"
    bad = 0
    for _, g in fp.groupby("doc_id"):
        pos = sorted(g["fp_pos"])
        # first selection must come from the first window
        if pos[0] > WINNOW_W:
            bad += 1
        if any(b - a > WINNOW_W for a, b in zip(pos, pos[1:])):
            bad += 1
    assert bad == 0
