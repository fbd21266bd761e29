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
from pyspark.sql.window import Window

from sql2all_spark.operators.dedup import dedup_ngram_jaccard
from sql2all_spark.operators.dedup_shared import (
    CLUSTER_JACCARD_FLOOR,
    NGRAM_PAIRS_ORACLE,
)
from sql2all_spark.cache import persist_tracked
from sql2all_spark.registry import register
from sql2all_spark.tables import load_table

MAX_ROUNDS = 25  # safety bound ≫ any real near-dup cluster diameter


def _truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Checkpoint an iterative intermediate, picking the storage that fits
    the deployment.

    ``eager=False`` (local mode only): truncate the Catalyst lineage NOW
    but let the caller's next action materialize the blocks — a loop
    that immediately runs a convergence aggregate over the result then
    pays ONE job per round instead of two (localCheckpoint persists
    blocks as the RDD computes, so nothing is recomputed).  Reliable
    checkpoints ignore the flag: a non-eager reliable checkpoint
    re-runs the whole lineage a second time to write the files.

    Iterative plans grow multiplicatively in lineage (round N references
    round N-1 twice), which blows up Catalyst planning long before
    execution — every loop here truncates per round.  But localCheckpoint
    blocks live on EXECUTORS: on a real cluster with dynamic allocation, a
    decommissioned executor permanently loses them and the job dies
    mid-loop.  So: if the session has a reliable checkpoint dir configured
    (``spark.sparkContext.setCheckpointDir`` to a shared filesystem), use
    a real checkpoint; otherwise (local mode, tests) localCheckpoint is
    both safe and faster.

    Deployment note: Spark does NOT clean reliable checkpoint files by
    default, so repeated invocations accumulate ``rdd-*`` dirs on the
    shared filesystem.  Cluster deployments that route through this path
    should set ``spark.cleaner.referenceTracking.cleanCheckpoints=true``
    (cleans when the RDD is GC'd) or prune the checkpoint dir between
    jobs."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    if has_dir:
        return df.checkpoint()
    return df.localCheckpoint(eager=eager)

# CLUSTER_JACCARD_FLOOR (0.4, vs the 0.05 pair-mining floor) now lives in
# dedup_shared.py with its rationale; imported above.


CLUSTERS_ORACLE = f"""
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
"""


@register(
    "dedup_clusters",
    oracle=CLUSTERS_ORACLE,
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
        .transform(persist_tracked)
    )
    # Only nodes that HAVE an edge participate in propagation: with a high
    # similarity floor almost every doc is a singleton, so the loop runs
    # over hundreds of rows, not the corpus.  Singletons rejoin at the end
    # as their own keeper with cluster_size 1.
    connected = edges.select(F.col("u").alias("doc_id")).distinct()
    # truncate lineage each round (see _truncate_lineage: reliable
    # checkpoint when a dir is configured, localCheckpoint otherwise)
    labels = _truncate_lineage(
        connected.select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    prev_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]

    # Loop shuffles sized from the materialized edge count (looputil):
    # the propagation rounds re-shuffle a slim bounded edge/label set.
    from sql2all_spark.looputil import loop_shuffle_partitions

    def _propagate(lbl: DataFrame) -> DataFrame:
        # each node's best neighbor label this round
        nbr = (
            edges.join(lbl, edges.v == lbl.doc_id)
            .groupBy("u")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        return lbl.join(nbr, lbl.doc_id == nbr.u, "left").select(
            "doc_id",
            F.least(
                F.col("cluster_id"),
                F.coalesce("nbr_min", F.col("cluster_id")),
            ).alias("cluster_id"),
        )

    with loop_shuffle_partitions(edges):
        for _ in range(0, MAX_ROUNDS, 2):
            # TWO propagation rounds per convergence check (r17, the
            # star_components pattern): each round is truncated
            # individually (eager=False — the next round builds on a
            # leaf RDD, no plan composition), but the sum-aggregate runs
            # every OTHER round; labels are monotone non-increasing, so
            # an unchanged sum across a double round still ⇔ fixpoint,
            # at half the driver round trips.  The first round's
            # checkpoint blocks materialize lazily inside the pair's one
            # job.
            new_labels = _truncate_lineage(
                _propagate(
                    _truncate_lineage(_propagate(labels), eager=False)
                ),
                eager=False,
            )
            # labels only ever decrease, so an unchanged sum ⇔ a fixpoint —
            # one scalar aggregate instead of a join-and-count per round
            new_sum = new_labels.agg(F.sum("cluster_id")).collect()[0][0]
            labels = new_labels
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        else:  # pragma: no cover - MAX_ROUNDS ≫ any real diameter
            raise RuntimeError(
                f"label propagation did not converge in {MAX_ROUNDS} rounds"
            )

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


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in MapReduce
    and Beyond"): every node connects its STRICTLY LARGER neighbors to the
    minimum of its neighborhood (incl. itself).  Output edges are directed
    (larger, smaller); no self-loops possible since min ≤ u < v.

    The neighborhood minimum is a window MIN over the symmetrized edge
    list instead of the groupBy-then-self-join formulation: one exchange
    per round where the join formulation needed three (group, join
    probe, output distinct).  Output rows may repeat — the small-star
    half's terminal distinct dedups once per round, which is cheaper
    than a distinct per half (guide §2.4: fewer exchanges outright)."""
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    return (
        sym.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every node connects ALL its smaller-or-equal
    neighbors (and itself) to the minimum among them.

    Same window-MIN restructuring as :func:`_large_star` (the window is
    insensitive to the duplicate rows large-star may now emit), with the
    ONE terminal distinct of the combined round: 3 exchanges per
    large+small round total, versus 7 for the groupBy/join/distinct
    formulation."""
    d = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    wd = d.withColumn("m", F.min("v").over(Window.partitionBy("u")))
    out = wd.select(F.col("v").alias("u"), F.col("m").alias("v")).filter(
        F.col("u") != F.col("v")
    ).unionByName(wd.select("u", F.col("m").alias("v")))
    return out.distinct()


def star_components(edges: DataFrame, max_rounds: int = MAX_ROUNDS) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star connected components: converges in
    O(log d) rounds (d = component diameter) versus min-label propagation's
    O(d) — the scale-safe variant when clusters can be deep chains.

    ``edges``: (u, v) pair DataFrame (direction irrelevant).  Returns
    ``(labels, n_rounds)`` where labels is (doc_id, cluster_id) for every
    node that appears in an edge, cluster_id = min node id of its component.

    Convergence detection: the edge set only moves "downhill" (every round
    replaces edges with edges to smaller targets), so an unchanged
    (count, hash-sum) signature ⇔ a fixpoint — two scalar aggregates per
    round, no data collect (same discipline as dedup_clusters)."""
    e = _truncate_lineage(edges.select("u", "v"))
    prev_sig = None
    rounds = 0
    # Loop shuffles sized from the materialized edge count (looputil):
    # the session width is for corpus-scale frames, and every round here
    # re-shuffles a slim bounded edge set O(log d) times.
    from sql2all_spark.looputil import loop_shuffle_partitions

    with loop_shuffle_partitions(e):
        while rounds < max_rounds:
            # eager=False: each round's lineage is truncated NOW (the
            # next round builds on a leaf RDD — plans never compose, so
            # no subtree duplication) but the blocks materialize inside
            # whichever job first executes them.
            e = _truncate_lineage(
                _small_star(_large_star(e)), eager=False
            )
            rounds += 1
            # Convergence signature every OTHER round (r17, VERDICT r16
            # #6): the loop's cost at small edge sets is the per-round
            # driver floor (job scheduling + the collect round trip —
            # measured ~0.4 s against ~0.1 s of executor work), and
            # contraction is idempotent at the fixpoint, so checking
            # every second round halves the job count at the cost of at
            # most one extra (no-op) contraction.  The skipped round's
            # checkpoint blocks materialize lazily inside the next
            # signature job (one job per pair, both rounds' stages).
            # NOTE: composing the two contractions into one un-truncated
            # plan instead was tried and measured 2x WORSE — each
            # contraction references its input several times (sym union,
            # window reuse), so an un-truncated pair re-executes the
            # inner contraction combinatorially.
            if rounds % 2 == 1 and rounds < max_rounds:
                continue
            # bit_xor, not sum: xor of 64-bit hashes cannot overflow under
            # ANSI mode; the edge set is distinct so xor-of-set detects change
            sig = e.agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(u, v))").alias("h"),
            ).collect()[0]
            sig = (sig.n, sig.h)
            if sig == prev_sig:
                break
            prev_sig = sig
        else:  # pragma: no cover - log2(diameter) ≪ max_rounds
            raise RuntimeError(
                f"star rounds did not converge in {max_rounds}"
            )
    # Fixpoint edge set is a star forest: (member, center) for every
    # non-center member.  Centers label themselves.
    members = e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    centers = e.select(F.col("v").alias("doc_id")).distinct().select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    )
    return members.unionByName(centers).distinct(), rounds


@register(
    "dedup_clusters_star",
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
    doc="Connected components over the same near-dup graph as dedup_clusters"
    " but via alternating large-star/small-star (Kiveris et al.) — O(log d)"
    " rounds instead of O(d), the variant to reach for when dup clusters can"
    " be long chains (e.g. drifted successive revisions).  Same oracle, same"
    " fixpoint; a pytest proves the round bound on a deliberately deep"
    " chain.",
)
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = (
        dedup_ngram_jaccard(spark, sf_dir)
        .filter(F.col("jaccard") >= CLUSTER_JACCARD_FLOOR)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    labels, _ = star_components(pairs)
    singles = docs.join(
        labels.select("doc_id"), "doc_id", "left_anti"
    ).select("doc_id", F.col("doc_id").alias("cluster_id"))
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


PR_SCALE = 1_000_000_000  # ranks as scaled integers → exact in both engines
PR_ITERS = 3
PR_TOP = 20


@register(
    "graph_pagerank_suppliers",
    oracle=f"""
WITH e0 AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM deg),
r1 AS (
  SELECT e.dst AS node,
         CAST({15 * PR_SCALE // 100} + 85 * SUM(r0.rank // d.outdeg) // 100 AS BIGINT) AS rank
  FROM e JOIN r0 ON e.src = r0.node JOIN deg d ON d.node = e.src
  GROUP BY e.dst
),
r2 AS (
  SELECT e.dst AS node,
         CAST({15 * PR_SCALE // 100} + 85 * SUM(r1.rank // d.outdeg) // 100 AS BIGINT) AS rank
  FROM e JOIN r1 ON e.src = r1.node JOIN deg d ON d.node = e.src
  GROUP BY e.dst
),
r3 AS (
  SELECT e.dst AS node,
         CAST({15 * PR_SCALE // 100} + 85 * SUM(r2.rank // d.outdeg) // 100 AS BIGINT) AS rank
  FROM e JOIN r2 ON e.src = r2.node JOIN deg d ON d.node = e.src
  GROUP BY e.dst
)
SELECT CAST((node - 1) // 2 AS BIGINT) AS suppkey, rank
FROM r3 WHERE node % 2 = 1
ORDER BY rank DESC NULLS LAST, suppkey ASC NULLS FIRST
LIMIT {PR_TOP}
""",
    doc=f"PageRank ({PR_ITERS} fixed iterations, damping 0.85) over the"
    " bipartite customer↔supplier purchase graph — graph centrality on"
    " relational data, the second iterative-algorithm shape next to"
    " sim_kmeans_iteration.  Cross-engine EXACT by construction: ranks are"
    f" scaled integers (×{PR_SCALE}) and every step is integer"
    " multiply/divide (floor semantics identical in both engines), so no"
    " float summation order can differ.  Each iteration is one slim"
    " (node, rank) join + partial-aggregated shuffle; edges and degrees"
    " are computed once and persisted.  The oracle unrolls the same"
    " iterations as chained CTEs.",
)
def graph_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    # The edge list is slim (two longs/row) and iterated 3×: pre-partition
    # it ONCE on the join key at a width matched to its size, and fold the
    # degree in as a column — each iteration is then exactly one co-
    # partitioned join + one partial-aggregated shuffle, with no extra
    # exchange for degrees.  (At cluster scale raise the width or drop the
    # explicit repartition and let the shuffle conf govern; the plan shape
    # is unchanged.)
    e = (
        e0.unionByName(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition(8, "src")
        .transform(persist_tracked)
    )
    ed = e.join(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")), "src"
    ).transform(persist_tracked)
    ranks = (
        ed.select("src").distinct().select("src", F.lit(PR_SCALE).cast("long").alias("rank"))
    )
    base = 15 * PR_SCALE // 100
    for _ in range(PR_ITERS):
        contrib = (
            ed.join(ranks.withColumnRenamed("src", "node"), ed.src == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.expr("rank div outdeg")).alias("c"))
        )
        ranks = contrib.select(
            F.col("dst").alias("src"),
            (F.lit(base) + F.expr("85 * c div 100")).alias("rank"),
        )
    result = (
        ranks.filter(F.col("src") % 2 == 1)
        .select(
            ((F.col("src") - 1) / 2).cast("long").alias("suppkey"), "rank"
        )
        .orderBy(F.col("rank").desc_nulls_last(), F.col("suppkey").asc_nulls_first())
        .limit(PR_TOP)
    )
    # Materialize the (tiny, PR_TOP-row) result eagerly so the cached edge
    # blocks can be freed NOW: without this, repeated invocations in one
    # session accumulate e/ed blocks in the BlockManager for the life of the
    # session ("block already exists" warnings on re-run).  local-mode ONLY:
    # localCheckpoint stores blocks on executors, so on a real cluster with
    # dynamic allocation an executor decommission silently loses them (and
    # this eager variant runs a job at plan-construction time).  On a
    # cluster the plain plan is returned; callers needing re-invocation
    # hygiene there should use reliable checkpoint() to a shared dir.
    sc = result.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    if sc.master.startswith("local"):
        result = result.localCheckpoint(eager=True)
    elif has_dir:
        # cluster with a reliable checkpoint dir: same eager hygiene,
        # executor-loss-safe storage
        result = result.checkpoint(eager=True)
    if sc.master.startswith("local") or has_dir:
        # result is materialized, so the iterative plan no longer needs the
        # cached edge blocks — free them now.
        ed.unpersist()
        e.unpersist()
    # otherwise leave e/ed persisted — the returned plan still references
    # them once per iteration, and unpersisting a not-yet-run plan would
    # force the edge build to recompute every round.  Blocks age out via
    # the session's LRU / caller-side unpersist.
    return result
