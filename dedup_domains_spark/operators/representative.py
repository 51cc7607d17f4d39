"""Representative election per cluster — reference rules D1/D3 (first-wins +
stronger-wins, src/domaintree.c:259-294) replayed as a deterministic total
order so the result is insertion-order independent (SURVEY.md §4 item 4).

Priority: electable (not subsumed-by-containment) first, then lexicographic
min (repo, path, commit) — the FIXTURES.md oracle order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def elect_representatives(
    members: DataFrame,
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """members: (uid, cluster_id, electable:boolean, repo, path, commit).
    Returns members + is_rep + rep_uid."""
    w = Window.partitionBy(cluster_col).orderBy(
        F.col("electable").desc(), F.col("repo").asc(), F.col("path").asc(),
        F.col("commit").asc(),
    )
    ranked = members.withColumn("_rn", F.row_number().over(w))
    reps = ranked.filter(F.col("_rn") == 1).select(
        F.col(cluster_col).alias("_rc"), F.col("uid").alias("rep_uid")
    )
    return (
        ranked.join(reps, ranked[cluster_col] == reps["_rc"], "inner")
        .drop("_rc", "_rn")
        .withColumn("is_rep", F.col("uid") == F.col("rep_uid"))
    )
