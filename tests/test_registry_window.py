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
# rotation contract; prior rounds' sets live in git history).  Round 15
# (VERDICT r14 #1): case_when_conditional — the one r10-aged survivor,
# displaced to slot 51 by r14's late KN query — re-enters FIRST (its
# five r14-green relational siblings ride along); retrieval carries the
# TF-IDF broadcast-hint fix (VERDICT r14 #2, values identical) plus the
# r11-aged BM25; then the full r11-aged set: every single-query module
# (VERDICT's priority list), sketches, ann_batch, and the joins /
# tpch_extra / setops blocks.  curation's four r11-aged queries did NOT
# fit the 50-slot window — they stay r11 and LEAD the r16 window
# (disclosed in NOTES.md).  Tail fillers (fuzzy r12, semdedup /
# range_search / bpe_train r13) hold the last slots until this round's
# NEW operators land and displace them.
ROTATION_TARGETS = {
    # new this round (never attested)
    "text_kn_trigram_score",
    "text_sp_unigram_train",
    "text_sp_encode",
    "text_template_keeper",
    "text_template_strip",
    "embed_domain_quality_profile",
    "embed_domain_tau_apply",
    # module-scope rider of the keeper (r14-green, re-attests)
    "text_template_mining",
    # the r10-aged survivor (leads the rotation)
    "case_when_conditional",
    # retrieval: TF-IDF fix re-attest + r11-aged BM25
    "text_tfidf_topterms",
    "text_bm25_retrieval",
    # r11-aged singles and small families
    "agg_bloom_filter_probe",
    "agg_cms_heavy_hitters",
    "join_skew_salted",
    "layout_bucketed_join",
    # layout_zorder_cluster (r11) was displaced by the late tau_apply —
    # never-attested elimination outranks soft re-attestation (the
    # r12-r14 precedent); it joins curation at the front of the r16
    # window.
    # pipeline_curation (r11) was displaced by the late
    # text_template_strip; profile_corpus (r11) by text_sp_encode —
    # same precedent as layout_zorder_cluster above; r16 front window.
    "sample_group_kfold",
    "sim_bitext_margin_mine",
    "sim_embed_contamination",
    "sim_grouped_ann",
    "sim_hard_negatives",
    "sim_pq_train_loop",
    "udf_pandas_readability",
    # r11-aged joins block
    "join_inner_fact_fact",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_nonequi_theta",
    "join_multiway_revenue",
    # r11-aged tpch_extra block
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_dormant_customers",
    # r11-aged setops block
    "setop_union_all_distinct",
    "setop_intersect_except",
    "setop_intersect_except_all",
    "subquery_scalar_and_in",
    "subquery_correlated_cte",
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
