"""Exact-duplicate collapse over the code corpus — reference rule D1
(src/domaintree.c:259-294) generalized to content-hash identity.

Spark shape: one hash-aggregate shuffle on ``content_sha256``; the
representative is elected by a deterministic total order (min lexicographic
(repo, path, commit) — FIXTURES.md's stand-in for the reference's sequential
first-inserted-wins at domaintree.c:267). Wide stages carry (uid, sha) only,
never ``content`` (SURVEY.md §4: shuffle-volume discipline).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class ExactDedupResult:
    survivors: DataFrame   # representative rows (all input columns)
    cluster_map: DataFrame # uid, content_sha256, rep_uid, is_rep
    metrics: DataFrame     # stage, count


def exact_dedup(df: DataFrame) -> ExactDedupResult:
    """df must carry (uid, content_sha256) — see sources.with_row_identity."""
    w = Window.partitionBy("content_sha256").orderBy("repo", "path", "commit")
    # rep_uid via first() over the SAME window — one shuffle total; the r01
    # version re-joined ranked against the rank-1 rows, a second full
    # shuffle of the id table for no information gain
    cluster_map = (
        df.select("uid", "content_sha256", "repo", "path", "commit")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("rep_uid", F.first("uid").over(w))
        .select(
            "uid", "content_sha256", "rep_uid",
            (F.col("_rn") == 1).alias("is_rep"),
        )
    )
    survivors = df.join(
        cluster_map.filter("is_rep").select("uid"), "uid", "leftsemi"
    )
    metrics = (
        df.select(F.lit("input").alias("stage")).groupBy("stage").count()
        .unionByName(
            survivors.select(F.lit("exact_survivors").alias("stage"))
            .groupBy("stage").count()
        )
    )
    return ExactDedupResult(survivors=survivors, cluster_map=cluster_map, metrics=metrics)
