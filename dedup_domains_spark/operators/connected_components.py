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
        .localCheckpoint()
    )
    labels = (
        adj.select(F.col("src").alias("uid"))
        .distinct()
        .withColumn("cluster_id", F.col("uid"))
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        # min label over each node's neighborhood
        neighbor_min = (
            adj.join(labels, adj["dst"] == labels["uid"], "inner")
            .groupBy("src")
            .agg(F.min("cluster_id").alias("_nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["uid"] == neighbor_min["src"], "left")
            .select(
                "uid",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("_nmin"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "uid")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
