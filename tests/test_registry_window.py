"""Rotation-window invariant for the driver's correctness gate.

The driver's CORRECTNESS_r{N}.json checks only the FIRST 50 registered
queries.  Rounds 2 and 3 both mis-hand-counted module positions in
registry.py comments and ended rounds with queries that had never received
a driver-green row (VERDICT r3 "What's wrong" #1).  This test replaces the
comment arithmetic with an enforced invariant:

  every registered query that lacks a driver-green row in the committed
  ledger (tools/driver_green.json) must sit at registration position <= 50,

plus an explicit pin of this round's rotation targets.  The ledger's
``green_rounds`` is regenerated from the CORRECTNESS_r*.json artifacts by
``tools/update_green_ledger.py`` (run it after every round's artifact
lands — never hand-edit); ``stale`` lists queries whose RESULT VALUES
changed after their last green row (they must re-verify, so they count as
unverified here).
"""

from __future__ import annotations

import json
from pathlib import Path

DRIVER_WINDOW = 50

REPO = Path(__file__).resolve().parent.parent

# Queries the CURRENT round explicitly rotated into the window — update
# this set each round alongside registry._QUERY_MODULES (the per-round
# rotation contract; prior rounds' sets live in git history).  Round 13:
# the NEW operators lead — the quality-filter scoring leg + per-source
# caps (classifier module; the r12 train query re-attests because the
# accuracy-pass fusion changed its ledger construction) and the seeded
# nearest-centroid domain labeler (domain_label, NEW module) — then the
# 28 r09-green queries owed a slot since r12 (dedup / graph / semdedup /
# multimodal / reservoir / range_search / tokenize / timeseries), and
# the oldest all-r10 modules (incremental, sampling, batch_twins,
# mm_cluster, retention, bpe_train) fill the window to exactly 50 —
# the ann_multiprobe + pq r10 singles were displaced mid-round by the
# two late NEW queries (calibration + mix weights).
ROTATION_TARGETS = {
    # new or value-changed this round (never attested in current form)
    "text_ngram_novelty",
    "text_sp_unigram_em",
    "text_quality_filter",
    "text_source_quality_caps",
    "text_quality_calibration",
    "embed_domain_label",
    "embed_domain_mix_weights",
    "text_quality_classifier_train",
    # newest green row r09
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_containment",
    "dedup_exact",
    "dedup_incremental_screen",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_semantic",
    "dedup_simhash",
    "graph_pagerank_suppliers",
    "mm_audio_energy",
    "mm_binary_metadata",
    "mm_decode_features",
    "mm_frame_sample",
    "mm_phash_neardup",
    "mm_resize",
    "sample_reservoir_weighted",
    "sim_range_search",
    "text_bpe_encode",
    "text_bpe_merge_mine",
    "text_length_buckets",
    "text_vocab_coverage",
    "ts_anomaly_zscore",
    "ts_funnel_conversion",
    "ts_gap_fill",
    "ts_minmax_decimate",
    "ts_rollup_hierarchy",
    "ts_sessionize",
    # newest green row r10 (whole-module fillers)
    "change_capture_diff",
    "incremental_file_compaction",
    "merge_upsert",
    "scd2_apply_changes",
    "sample_hash_deterministic",
    "sample_split_assign",
    "sample_stratified_cap",
    "sample_temperature_mix",
    "sample_weighted_mix",
    "stream_sliding_window",
    "stream_tumbling_window",
    "mm_phash_clusters",
    "ts_retention_cohorts",
    "text_bpe_train",
}


import functools
import subprocess
import sys


@functools.lru_cache(maxsize=1)
def _positions() -> dict[str, int]:
    """Registration order AS THE DRIVER SEES IT — in a fresh interpreter.

    In-process order would lie here: ``register()`` runs at first import,
    so any earlier test that imported an operator module directly (e.g.
    test_streaming importing streaming.jobs) would shift positions.  The
    driver imports __spark_entry__ in a clean process, so measure that.
    """
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, sys.argv[1]);"
            "from sql2all_spark import registry;"
            "print('\\n'.join(registry.all_specs()))",
            str(REPO),
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    names = out.stdout.split()
    return {name: i + 1 for i, name in enumerate(names)}


def _ledger() -> dict:
    with open(REPO / "tools" / "driver_green.json") as f:
        return json.load(f)


def test_ledger_names_are_registered():
    """The ledger only speaks about queries that exist (catches renames)."""
    pos = _positions()
    ledger = _ledger()
    unknown = [n for n in ledger["green_rounds"] if n not in pos]
    unknown += [n for n in ledger["stale"] if n not in pos]
    assert not unknown, f"ledger entries for unregistered queries: {unknown}"


def test_unverified_queries_sit_inside_driver_window():
    """Every query without a (non-stale) driver-green row must be in the
    first DRIVER_WINDOW registrations, or the round ends unverified."""
    pos = _positions()
    ledger = _ledger()
    verified = set(ledger["green_rounds"]) - set(ledger["stale"])
    offenders = {
        name: p
        for name, p in pos.items()
        if name not in verified and p > DRIVER_WINDOW
    }
    assert not offenders, (
        f"queries with no driver-green row outside the first "
        f"{DRIVER_WINDOW} registrations (rotate them forward in "
        f"registry._QUERY_MODULES): {offenders}"
    )


def test_rotation_targets_in_window():
    pos = _positions()
    out = {n: pos.get(n) for n in ROTATION_TARGETS if pos.get(n, 10**9) > DRIVER_WINDOW}
    assert not out, f"rotation targets outside the window: {out}"


def test_rotation_targets_registered():
    """Each pinned target must actually exist (catches typos/renames)."""
    pos = _positions()
    missing = sorted(n for n in ROTATION_TARGETS if n not in pos)
    assert not missing, f"rotation targets not registered: {missing}"


def test_window_is_full():
    """>= 50 registered queries exist, so the window claim is meaningful."""
    assert len(_positions()) >= DRIVER_WINDOW
