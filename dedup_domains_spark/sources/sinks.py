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


def write_survivor_text_files(
    survivors,
    inputs: list[str],
    out_dir: str,
    out_ext: str,
    order_cols: tuple[str, ...] = ("linenumber",),
) -> int:
    """Distributed dnsbl CLI sink with reference output naming.

    Executors write one ordered text part per input feed
    (``repartition(file_order)`` + ``sortWithinPartitions`` + ``partitionBy``
    — the write_survivors_text shape, keyed by the numeric CLI position so
    partition directory names never need URL-decoding); the driver then only
    RENAMES each part to ``<base><out_ext>`` (reference naming,
    pfb_prune.c outputfilename / pfb_dnsbl_prune.py:331-333) and creates
    empty outputs for feeds with no survivors. No row ever passes through
    the driver. Returns the survivor line count.
    """
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, "._dnsbl_text_tmp")
    sel = (
        survivors.select("file_order", *order_cols,
                         F.col("raw_line").alias("value"))
        .repartition("file_order")
        .sortWithinPartitions("file_order", *order_cols)
        .select("file_order", "value")
    )
    sel.write.mode("overwrite").partitionBy("file_order").text(tmp)

    total = 0
    for order, src in enumerate(inputs):
        base = os.path.splitext(os.path.basename(src))[0]
        dest = os.path.join(out_dir, base + out_ext)
        part_dir = os.path.join(tmp, f"file_order={order}")
        parts = (
            sorted(
                os.path.join(part_dir, f)
                for f in os.listdir(part_dir)
                if f.startswith("part-")
            )
            if os.path.isdir(part_dir)
            else []
        )
        # repartition("file_order") puts a key in exactly one task, so one
        # part per feed; the loop tolerates a multi-part layout anyway
        with open(dest, "wb") as out:
            for p in parts:
                with open(p, "rb") as f:
                    data = f.read()
                total += data.count(b"\n")
                out.write(data)
    shutil.rmtree(tmp, ignore_errors=True)
    return total


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
