"""Iterative graph operators — connected components for dedup
clustering (SURVEY.md §2.11 extension).

Near-dup detection emits PAIRS; acting on them (keep one canonical doc
per duplicate group) needs the transitive closure: connected
components. The classic Spark shape is iterative min-label
propagation: every node adopts the minimum label among itself and its
neighbors until fixpoint. Iterations = graph diameter, and dup
clusters are shallow (near-cliques), so this converges in a handful of
rounds.

Scale notes (100 TB): each round is one equi-join + one hash
aggregate — both shuffle on the node id, so successive rounds reuse
the same hash partitioning. ``localCheckpoint`` truncates the plan
lineage every round; without it the plan doubles per iteration and
the driver chokes on analysis long before the executors sweat. For
web-scale graphs (billions of edges, high skew)
``connected_components_star`` implements the large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond") — same DataFrame machinery, O(log² n) rounds on the
shrinking edge set instead of O(diameter) on the full graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components_star(edges: DataFrame, a_col: str = "a",
                              b_col: str = "b",
                              max_iter: int = 25) -> DataFrame:
    """(node, cluster_id) via LARGE-STAR / SMALL-STAR (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — the skewed-graph
    scale path next to plain min-label propagation: label propagation
    needs O(diameter) rounds and keeps the full edge set live every
    round; star-contraction converges in O(log² n) rounds ON THE EDGE
    SET ITSELF, collapsing each component toward a star rooted at its
    minimum node, so long chains and high-degree hubs both shrink
    geometrically.

    Per round (all DataFrame ops, shuffles keyed on the node id):
    - large-star: for each node u, every LARGER neighbor v > u is
      re-pointed at m(u) = min(Γ(u) ∪ {u});
    - small-star: orient edges (big → small); each node u and its
      smaller neighbors all re-point at their collective minimum.
    Fixpoint = the edge set stops changing; then every edge (u, v) IS
    the final (node → component-min) assignment. Equivalence with
    ``connected_components`` is pinned in tests on chain / clique /
    random graphs."""
    e = (edges.select(F.greatest(a_col, b_col).alias("u"),
                      F.least(a_col, b_col).alias("v"))
              .filter(F.col("u") != F.col("v"))
              .distinct().localCheckpoint())
    n_prev = e.count()
    for _ in range(max_iter):
        # --- large-star over the symmetric neighborhood
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                   .select("u", F.least("mn", "u").alias("m")))
        ls = (sym.filter(F.col("v") > F.col("u"))
                 .join(mins, "u")
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .filter(F.col("u") != F.col("v"))
                 .distinct())
        # --- small-star over (big → small) oriented edges
        o = (ls.select(F.greatest("u", "v").alias("u"),
                       F.least("u", "v").alias("v")).distinct())
        m2 = o.groupBy("u").agg(F.min("v").alias("mn"))
        e2 = (o.join(m2, "u")
               .select(F.col("v").alias("u"), F.col("mn").alias("v"))
               .filter(F.col("u") != F.col("v"))
               .union(m2.select("u", F.col("mn").alias("v")))
               .distinct().localCheckpoint())
        # Fixpoint probe WITHOUT the 2× exceptAll shuffle of the whole
        # edge set: both sides are checkpointed + distinct, so set
        # equality ⇔ equal counts AND empty one-sided difference. The
        # count is a map-side-partial aggregate over checkpointed
        # blocks (no wide shuffle); the anti-join probe only runs in
        # the round where the counts first agree — at 100 TB that is
        # one short-circuit probe total, not two full-set shuffles per
        # round.
        n_new = e2.count()
        changed = 1
        if n_new == n_prev:
            changed = (e2.join(e, ["u", "v"], "left_anti")
                         .limit(1).count())
        e, n_prev = e2, n_new
        if changed == 0:
            break
    return (e.select(F.col("u").alias("n"), F.col("v").alias("cluster_id"))
             .union(e.select(F.col("v").alias("n"),
                             F.col("v").alias("cluster_id")))
             .distinct())


def connected_components(edges: DataFrame, a_col: str = "a",
                         b_col: str = "b", max_iter: int = 25) -> DataFrame:
    """(node, cluster_id) for every node in ``edges``; cluster_id is
    the MINIMUM node id reachable in the component (so the canonical
    representative is deterministic, matching a recursive-CTE oracle).

    Only nodes that appear in at least one edge are labeled — callers
    union isolated nodes back as their own singletons if needed.
    """
    sym = (edges.select(F.col(a_col).alias("n"), F.col(b_col).alias("m"))
                .union(edges.select(F.col(b_col).alias("n"),
                                    F.col(a_col).alias("m")))
           ).distinct().localCheckpoint()
    labels = sym.select("n").distinct().withColumn("lbl", F.col("n"))

    def _lbl_sum(df: DataFrame) -> object:
        # decimal(38,0): exact at any node count (a raw BIGINT sum of
        # 64-bit ids overflows on billion-node graphs)
        return df.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))
                       .alias("s")).collect()[0]["s"]

    prev_sum = None
    for _ in range(max_iter):
        neighbor_min = (sym.join(labels.select(F.col("n").alias("m"),
                                               F.col("lbl").alias("mlbl")),
                                 "m")
                           .groupBy("n").agg(F.min("mlbl").alias("nlbl")))
        new_labels = (labels.join(neighbor_min, "n", "left")
                            .select("n", F.least(
                                "lbl", F.coalesce("nlbl", "lbl"))
                                .alias("lbl"))
                            .localCheckpoint())
        # Fixpoint probe with ZERO extra joins: each node's label is
        # monotonically non-increasing (least of old label and
        # neighbor min), so the label vector changed iff its total sum
        # strictly decreased. One map-side-partial aggregate over the
        # freshly checkpointed labels — vs the old self-join + filter
        # + count that reshuffled the full label set every round.
        new_sum = _lbl_sum(new_labels)
        labels = new_labels
        if prev_sum is not None and new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(F.col("n"), F.col("lbl").alias("cluster_id"))
