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
web-scale graphs (billions of edges, high skew) swap this for the
large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond") — same DataFrame machinery,
fewer rounds on skewed degree distributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
        changed = (new_labels.alias("x")
                   .join(labels.alias("y"), "n")
                   .filter(F.col("x.lbl") != F.col("y.lbl")).count())
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("n"), F.col("lbl").alias("cluster_id"))
