"""Iterative connected components (union-find by min-label propagation) —
the transitive closure of duplicate-pair edges into clusters (SURVEY.md §2.3;
the reference's analog is the implicit duplicate-cluster graph its trie
collapses eagerly).

Catalyst cannot express fixpoints, so the loop lives on the driver
(SURVEY.md §4 item 2): each round joins the current label table with the
edge list, takes the min label over each node's neighborhood (including
itself), and checks convergence by counting changed labels. Lineage is
truncated every round with ``localCheckpoint`` — without it the plan doubles
per iteration and the job dies at scale. Candidate edges come from salted
stars around bucket minima (buckets.py), so component diameters are small
and the loop converges in O(log diameter)-ish rounds, not O(n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _truncate(df: DataFrame) -> DataFrame:
    """Cut lineage between iterations. Uses reliable (disk) checkpointing
    when the SparkContext has a checkpoint dir — localCheckpoint blocks live
    on executors and die with them, which is exactly the failure mode an
    iterative job must survive on a real cluster. Falls back to
    localCheckpoint for quick local runs."""
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().checkpointDir().isDefined():
        return df.checkpoint()
    return df.localCheckpoint()


def connected_components(
    edges: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """edges(id_a, id_b) -> (uid, cluster_id) for every endpoint.

    cluster_id is the min uid reachable; isolated nodes are absent (callers
    union them back as singletons).
    """
    # symmetric adjacency, self-loop so a node keeps its own label in the min
    adj = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    adj = _truncate(adj)
    labels = _truncate(
        adj.select(F.col("src").alias("uid"))
        .distinct()
        .withColumn("cluster_id", F.col("uid"))
    )

    for it in range(max_iterations):
        # min label over each node's neighborhood; old + new computed in one
        # pass so the convergence probe reads the checkpointed result only
        neighbor_min = (
            adj.join(labels, adj["dst"] == labels["uid"], "inner")
            .groupBy("src")
            .agg(F.min("cluster_id").alias("_nmin"))
        )
        merged = (
            labels.join(neighbor_min, labels["uid"] == neighbor_min["src"], "left")
            .select(
                "uid",
                F.col("cluster_id").alias("_old"),
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("_nmin"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
        merged = _truncate(merged)
        labels = merged.select("uid", "cluster_id")
        # candidate edges are hub-stars (buckets.py), so components converge
        # in a few hops — probe convergence on alternate rounds to halve the
        # driver-side barrier count
        if it % 2 == 1 or it == max_iterations - 1:
            changed = merged.filter(
                F.col("cluster_id") != F.col("_old")
            ).limit(1).count()
            if changed == 0:
                break
    return labels
