"""Duplicate-cluster resolution: connected components over near-dup pairs.

Pairwise near-dup output (MinHash/SimHash/n-gram Jaccard) is not what a
training pipeline consumes — keep/drop decisions need the transitive
closure: if A~B and B~C, then {A,B,C} is ONE duplicate cluster even when
(A,C) never collided. This operator turns the pair table into
``(node, cluster_id)`` labels with hash-min label propagation:

* every node starts labeled with its own id;
* each round, every node adopts the minimum label among itself and its
  neighbors (one join edges→labels + one groupBy-min = two shuffles);
* fixpoint when no label changes — certified by ``sum(label)`` (as
  DECIMAL(38,0): int64 node ids times billions of nodes overflow BIGINT,
  and under ANSI mode that would abort the round), strictly decreasing
  until convergence, so one scalar aggregate per round detects it with
  no row-level diff. Non-convergence within ``max_iter`` raises instead
  of returning partially-propagated labels.

Scale shape (the 100 TB lens): rounds needed = graph diameter. Near-dup
graphs are overwhelmingly tiny dense cliques (diameter 1-2), so this
converges in 2-3 rounds of well-partitioned hash joins on node id. For
adversarial long-chain graphs, after ``escalate_after`` rounds without a
fixpoint each subsequent round ALSO pointer-jumps (``label(x) :=
label(label(x))`` — one extra self-join of the label table, the classic
Shiloach–Vishkin shortcutting), which halves label-chain depth per round
→ O(log diameter) total. The escalation is not the default-from-round-0
because its extra join buys nothing on diameter-1-2 duplicate-cluster
workloads (the plan for those is unchanged). Each round is checkpointed:
iterative lineage otherwise grows the plan unboundedly and re-executes
prior rounds at every action.

The driver-side loop is control flow only (one scalar per round crosses
the boundary); all data movement is distributed joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 50,
    escalate_after: int = 8,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``edges``.

    ``cluster_id`` is the minimum node id of the component — deterministic,
    join-able back to the source table, and stable under edge order.

    Rounds past ``escalate_after`` add pointer-jumping (see module doc):
    a graph whose diameter exceeds ``escalate_after`` converges in
    ``escalate_after + O(log diameter)`` rounds instead of ``diameter``.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # The edge relation is STATIC across rounds: cache it pre-partitioned
    # on the join key so every round's join reuses the partitioning
    # instead of re-exchanging it (verified in the physical plan: the
    # edges side reads the InMemoryRelation with hashpartitioning(a)
    # preserved; localCheckpoint would drop it to UnknownPartitioning).
    # Two long columns — the columnar cache is compact here, unlike the
    # array-column caches avoided elsewhere (see dedup/ngram.py).
    e = e.repartition(F.col("a")).persist()
    e.count()  # materialize once, outside the timed rounds

    # labels are REBUILT every round — localCheckpoint cuts the growing
    # lineage (persist would re-analyze an ever-deeper plan each round)
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    cert = F.sum(F.col("label").cast("decimal(38,0)"))  # overflow-free
    prev_sum = labels.agg(cert).collect()[0][0]

    converged = False
    try:
        for rnd in range(max_iter):
            msgs = e.join(labels, e["a"] == labels["node"]).select(
                F.col("b").alias("node"), F.col("label")
            )
            labels = (
                labels.unionByName(msgs)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            )
            if rnd >= escalate_after:
                # pointer-jump: adopt the label OF the label. Labels are
                # always node ids (min over ids), and every node id has a
                # label row, so the inner-join form is total; coalesce
                # guards the invariant anyway. label(y) <= y for all y
                # keeps the sum certificate monotone, so convergence
                # detection is unchanged.
                parents = labels.select(
                    F.col("node").alias("__pn"), F.col("label").alias("__pl")
                )
                labels = labels.join(
                    parents, labels["label"] == parents["__pn"], "left"
                ).select(
                    "node",
                    F.coalesce(F.col("__pl"), F.col("label")).alias("label"),
                )
            labels = labels.localCheckpoint(eager=True)
            cur_sum = labels.agg(cert).collect()[0][0]
            if cur_sum == prev_sum:  # monotone certificate: no label moved
                converged = True
                break
            prev_sum = cur_sum
    finally:
        e.unpersist()  # labels are materialized; edges no longer needed

    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(pointer-jumping active after round {escalate_after}; "
            f"2^{max_iter - escalate_after} exceeds any real diameter — "
            "this indicates label oscillation, not a long chain)"
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


def cluster_sizes(labels: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) from a (node, cluster_id) label
    table — split out so callers holding cached CC labels (the shared
    pair-graph cache in plans/pipeline_queries.py) can annotate sizes
    without re-running the closure.

    ``cluster_size`` comes from a window over ``cluster_id`` — safe
    because duplicate clusters are small by construction (a window over an
    unbounded partition would be the global-window anti-pattern).
    """
    from pyspark.sql import Window

    return labels.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count("*").over(Window.partitionBy("cluster_id")).alias("cluster_size"),
    )


def dup_clusters(
    pairs: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) from a near-dup pair table."""
    return cluster_sizes(connected_components(pairs, id1, id2))
