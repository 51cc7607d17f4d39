"""Skew-safe candidate-pair generation from bucket keys.

Shared by LSH band buckets and SimHash Hamming blocks. The core scale
problem: bucket populations are Zipf-skewed (boilerplate/license files form
mega-buckets — FIXTURES.md plants one on purpose), and naive within-bucket
pair emission is quadratic. Strategy (SURVEY.md §4 item 1, BASELINE.json
"salted repartitioning on band-hash keys with explicit skew splitting"):

  1. bucket sizes via a window count over the bucket key (ONE shuffle — the
     r01 version used a groupBy + self-join, a second full shuffle of the
     member table for no information gain);
  2. salt members of oversized buckets into ceil(size/cap) subgroups;
  3. within each (bucket, salt) subgroup emit a STAR around the min id —
     O(size) edges, never O(size^2); the subgroup window reuses the bucket
     hash partitioning (same key prefix), so no extra exchange;
  4. bridge subgroups by a second star over the subgroup hubs around the
     bucket-wide min hub — keeps each bucket one connected component with
     diameter ≤ 4, so min-label propagation converges in a few rounds.

Connectivity, not the full pair set, is what connected components needs;
edges here are *candidates* that the verify stage re-checks pairwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pairs_from_buckets(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str = "uid",
    max_bucket_size: int = 64,
) -> DataFrame:
    """df: one row per (bucket member). Returns candidate edges (id_a, id_b),
    id_a < id_b, distinct."""
    bw = Window.partitionBy(*bucket_cols)
    members = df.withColumn("_bsz", F.count(F.lit(1)).over(bw)).filter(
        F.col("_bsz") >= 2  # buckets of one generate nothing
    )

    # deterministic salt: spreads a mega-bucket over ceil(size/cap) subgroups
    nsplit = F.ceil(F.col("_bsz") / F.lit(max_bucket_size)).cast("int")
    members = members.withColumn(
        "_salt",
        F.when(nsplit <= 1, F.lit(0)).otherwise(
            F.pmod(F.xxhash64(F.col(id_col)), nsplit).cast("int")
        ),
    )

    # subgroup hub + bucket hub in one pass: the (bucket, salt) window shares
    # the bucket partitioning, so Catalyst plans both windows on one exchange
    grp = Window.partitionBy(*bucket_cols, "_salt")
    members = members.withColumn("_hub", F.min(id_col).over(grp)).withColumn(
        "_bucket_hub", F.min(id_col).over(bw)
    )
    star = (
        members.filter(F.col(id_col) != F.col("_hub"))
        .select(F.col("_hub").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    # bridge subgroup hubs: star around the bucket-wide min hub
    bridges = (
        members.filter(
            (F.col(id_col) == F.col("_hub")) & (F.col("_hub") != F.col("_bucket_hub"))
        )
        .select(F.col("_bucket_hub").alias("id_a"), F.col("_hub").alias("id_b"))
    )

    edges = star.unionByName(bridges)
    return (
        edges.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
