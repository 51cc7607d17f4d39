"""Output sinks: survivors + cluster map + lineage + metrics as partitioned
parquet tables (Iceberg-shaped layout) plus a run manifest.

Reference analog: the order-preserving merge-skip sink (O2,
pfb_prune.c:666-728) — generalized to a table write where per-source
ordering is a sort-within-partitions, and byte fidelity is the sha256
invariant column instead of line replay.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from dedup_domains_spark.plans.pipeline import PipelineResult


def write_survivors_text(survivors, out_dir: str) -> None:
    """Distributed O2 sink for domain mode: one ordered text file per source
    feed (reference pfb_prune.c:666-728 writes per-file survivors in line
    order; here each source is written by exactly one task).

    ``repartition(source)`` puts every key in exactly one task;
    ``sortWithinPartitions`` restores line order; ``partitionBy`` then emits
    a single part file per source directory. No driver-side collect — this
    is the scale path behind the fixture-scale write_survivor_files."""
    (
        survivors.select(
            F.regexp_extract(F.col("source_file"), r"([^/]+)$", 1).alias("source"),
            "linenumber", "raw_line",
        )
        .repartition("source")
        .sortWithinPartitions("source", "linenumber")
        .withColumnRenamed("raw_line", "value")
        .select("source", "value")
        .write.mode("overwrite").partitionBy("source").text(out_dir)
    )


def write_results(
    result: PipelineResult,
    out_dir: str,
    partition_by: str | None = "lang",
    config_hash: str = "",
) -> dict:
    """Write all pipeline outputs; returns the manifest dict.

    Survivors are partitioned (default by lang — at 100 TB this would be the
    Iceberg partition spec) and sorted within partitions by (repo, path) so
    downstream scans are clustered; cluster_map/lineage/metrics are plain
    tables keyed by uid.
    """
    os.makedirs(out_dir, exist_ok=True)

    surv = result.survivors.sortWithinPartitions("repo", "path")
    w = surv.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(f"{out_dir}/survivors")

    result.cluster_map.write.mode("overwrite").parquet(f"{out_dir}/cluster_map")
    result.lineage.write.mode("overwrite").parquet(f"{out_dir}/lineage")
    result.metrics.write.mode("overwrite").parquet(f"{out_dir}/metrics")

    metrics = {
        r.stage: r["count"] for r in result.metrics.collect()
    }
    manifest = {
        "written_at": time.time(),
        "config_hash": config_hash,
        "tables": ["survivors", "cluster_map", "lineage", "metrics"],
        "partition_by": partition_by,
        "metrics": metrics,
        "sha256_invariant_violations": int(
            result.survivors.filter(
                F.sha2(F.col("content"), 256) != F.col("content_sha256")
            ).count()
        ),
    }
    with open(f"{out_dir}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
