"""Connected-components machinery: the alternating large-star/small-star
variant must converge logarithmically on deep chains (the pathological case
for min-label propagation, whose round count is the graph diameter)."""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

from sql2all_spark.operators.graph import star_components


def test_star_converges_log_rounds_on_deep_chain(spark):
    """A 64-node chain has diameter 63: label propagation needs ~63 rounds,
    alternating star must stay within log2(diameter)+2 contractions —
    +2 more for the r17 pair-batched convergence check (signatures are
    taken every OTHER contraction, so detection can overshoot by one
    no-op pair)."""
    n = 64
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "u long, v long"
    )
    labels, rounds = star_components(chain)
    assert rounds <= math.log2(n - 1) + 4, rounds
    got = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_star_matches_components_on_multi_cluster_graph(spark):
    """Mixed shapes — a triangle, a 5-chain, a pair, star-of-4 — all label
    to their component minimum."""
    edges = [
        (1, 2), (2, 3), (3, 1),           # triangle → 1
        (10, 11), (11, 12), (12, 13), (13, 14),  # chain → 10
        (20, 21),                          # pair → 20
        (30, 31), (30, 32), (30, 33),      # star → 30
    ]
    df = spark.createDataFrame(edges, "u long, v long")
    labels, _ = star_components(df)
    got = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        20: 20, 21: 20,
        30: 30, 31: 30, 32: 30, 33: 30,
    }


def test_star_and_propagation_same_fixpoint(spark, sf_dir):
    """The registered star query returns exactly the same rows as the
    propagation-based dedup_clusters on the real near-dup graph."""
    from sql2all_spark.registry import all_specs

    specs = all_specs()
    a = specs["dedup_clusters"].builder(spark, sf_dir)
    b = specs["dedup_clusters_star"].builder(spark, sf_dir)
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert rows(a) == rows(b)


def test_star_handles_duplicate_and_reversed_edges(spark):
    df = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 1), (3, 2)], "u long, v long"
    )
    labels, _ = star_components(df)
    got = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_star_empty_edges(spark):
    df = spark.createDataFrame([], "u long, v long")
    labels, rounds = star_components(df)
    assert labels.count() == 0
    assert rounds <= 4  # one converged contraction pair (r17 batching)


def test_truncate_lineage_uses_reliable_checkpoint_when_configured(sf_dir):
    """With a checkpoint dir configured, the iterative operators route
    lineage truncation through executor-loss-safe checkpoint() instead of
    localCheckpoint(), without changing a single result value.

    Runs in its OWN interpreter: setCheckpointDir is SparkContext-level and
    cannot be unset, so doing this on the shared session fixture would
    silently switch every later test to reliable checkpoints."""
    import subprocess
    import sys

    script = """
import sys, glob, shutil, tempfile
sys.path.insert(0, "/root/repo")
from sql2all_spark.registry import all_specs
from sql2all_spark.session import get_spark
spark = get_spark("cktest", master="local[4]", shuffle_partitions=4)
sf_dir = sys.argv[1]
build = all_specs()["dedup_clusters"].builder
baseline = sorted(map(tuple, build(spark, sf_dir).collect()))
ckdir = tempfile.mkdtemp(prefix="sql2all_ck_")
spark.sparkContext.setCheckpointDir(ckdir)
assert spark.sparkContext.getCheckpointDir() is not None
rows = sorted(map(tuple, build(spark, sf_dir).collect()))
assert rows == baseline, "values changed under reliable checkpointing"
assert glob.glob(ckdir + "/*/rdd-*"), "no checkpoint written to dir"
shutil.rmtree(ckdir, ignore_errors=True)
print("CKPT_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script, sf_dir],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "CKPT_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
