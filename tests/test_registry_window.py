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
# rotation contract; prior rounds' sets live in git history).  Round 10:
# the three new operators lead; the text family re-attests alongside
# (operators.dsir imports operators.text at module scope, so the whole
# family registers at dsir's position — see registry._QUERY_MODULES);
# then the oldest remaining attestations (r05-green incremental/tpch,
# r06-green asof_range + stream twins) and the r07-green sampling/
# relational/skew/udf/pipeline/profiling/layout families fill the
# window.
ROTATION_TARGETS = {
    # new this round (never attested — lead the window)
    "sim_ann_multiprobe",
    "sim_pq_adc_topk",
    "mm_phash_clusters",
    "text_exact_substring_dedup",
    "text_bpe_train",
    "text_importance_resample",
    "text_trigram_lm_score",
    # lm family (registers at lm_trigram's position; bigram green r08)
    "text_bigram_lm_score",
    # text family (registers at dsir's position; oldest greens r07)
    "text_language_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "text_pii_scrub",
    "text_heavy_hitters",
    "text_chunk_windows",
    "text_pack_sequences",
    "text_repetition_score",
    "text_contamination_check",
    "text_unigram_lm_score",
    "text_dup_ngram_spans",
    "text_pmi_collocations",
    "text_winnow_fingerprint",
    # newest green row r05 (incremental + tpch)
    "merge_upsert",
    "change_capture_diff",
    "scd2_apply_changes",
    "incremental_file_compaction",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q4_order_priority",
    "tpch_q21_suppliers_who_kept_waiting",
    "tpch_q18_large_volume_customers",
    # newest green row r06 (asof/range joins + stream twins)
    "join_asof_attribution",
    "join_range_interval",
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
    "stream_dedup_watermark",
    # r07-green freshness rotation
    "sample_hash_deterministic",
    "sample_stratified_cap",
    "sample_weighted_mix",
    "sample_temperature_mix",
    "sample_split_assign",
    "q1_pricing_summary",
    "projection_expressions",
    "filter_predicates",
    "sort_limit_offset",
    "distinct_values",
    "case_when_conditional",
    # join_skew_salted + udf_pandas_readability + pipeline_curation
    # rotated back out mid-round (all r07-green, verified) to make room
    # for sim_ann_multiprobe + sim_pq_adc_topk + mm_phash_clusters at
    # the front.
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
