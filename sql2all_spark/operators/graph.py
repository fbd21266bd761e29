"""Dedup clustering: connected components over the near-duplicate pair
graph — the step that turns pairwise similarity into actionable dedup
decisions (one keeper per cluster, drop the rest).

Algorithm: iterative min-label propagation (Pregel-style in DataFrames).
Every doc starts as its own component; each round, every node adopts the
minimum component id among itself and its neighbors; converged when no
label changes.  Rounds needed = graph diameter of the largest cluster —
near-dup clusters are shallow (dups of a common source), so this converges
in a handful of rounds even at corpus scale.  Each round is one join + one
groupBy on the edge list; labels persist between rounds and the previous
round's cache is released.

This is the driver-side-loop iterative pattern (like sim_kmeans_iteration)
— no collect() of data, only a scalar convergence count per round.

Oracle: DuckDB recursive CTE computes the transitive closure and takes the
min reachable id per node — exact same fixpoint, declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.operators.dedup import NGRAM_PAIRS_ORACLE, dedup_ngram_jaccard
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

MAX_ROUNDS = 25  # safety bound ≫ any real near-dup cluster diameter

# Clustering uses a HIGH similarity floor: 0.05 (the pair-mining floor)
# links barely-overlapping docs into one giant dense component (~200k edges
# at sf0.1 — a hairball, not duplicate groups); 0.4 keeps only genuine
# near-duplicate edges, so components are the actual dup clusters and the
# propagation loop converges in a few cheap rounds.
CLUSTER_JACCARD_FLOOR = 0.4


@register(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE
pairs AS (
  SELECT * FROM ({NGRAM_PAIRS_ORACLE}) all_pairs
  WHERE jaccard >= {CLUSTER_JACCARD_FLOOR}
),
und AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(u, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT und.u, reach.r FROM und JOIN reach ON und.v = reach.u
),
comp AS (
  SELECT u AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY u
)
SELECT doc_id, cluster_id,
       CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS is_keeper,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp
""",
    doc="Connected components over the n-gram-Jaccard near-dup graph via"
    " iterative min-label propagation; every document gets a cluster_id"
    " (= min doc_id in its component), a keeper flag, and the cluster"
    " size.  Singletons are their own keeper.  The oracle computes the"
    " same fixpoint with a recursive-CTE transitive closure.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = (
        dedup_ngram_jaccard(spark, sf_dir)
        .filter(F.col("jaccard") >= CLUSTER_JACCARD_FLOOR)
        .select("doc_a", "doc_b")
    )
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .persist()
    )
    # Only nodes that HAVE an edge participate in propagation: with a high
    # similarity floor almost every doc is a singleton, so the loop runs
    # over hundreds of rows, not the corpus.  Singletons rejoin at the end
    # as their own keeper with cluster_size 1.
    connected = edges.select(F.col("u").alias("doc_id")).distinct()
    # localCheckpoint each round: iterative plans grow multiplicatively in
    # lineage (round N references round N-1 twice), which blows up Catalyst
    # planning long before execution — truncating lineage per round keeps
    # every round's plan constant-size.  (On a cluster, checkpoint to a
    # reliable store instead if executor loss during the loop matters.)
    labels = connected.select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]

    for _ in range(MAX_ROUNDS):
        # each node's best neighbor label this round
        nbr = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels.doc_id == nbr.u, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce("nbr_min", F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        # labels only ever decrease, so an unchanged sum ⇔ a fixpoint —
        # one scalar aggregate instead of a join-and-count per round
        new_sum = new_labels.agg(F.sum("cluster_id")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:  # pragma: no cover - MAX_ROUNDS is far above any real diameter
        raise RuntimeError(f"label propagation did not converge in {MAX_ROUNDS} rounds")

    from pyspark.sql.window import Window

    # singletons (no edges) are their own keeper; union with the converged
    # connected-component labels
    singles = docs.join(connected, "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    )
    all_labels = labels.unionByName(singles)
    return all_labels.select(
        "doc_id",
        "cluster_id",
        F.when(F.col("doc_id") == F.col("cluster_id"), 1).otherwise(0).alias(
            "is_keeper"
        ),
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster_id"))
        .alias("cluster_size"),
    )
