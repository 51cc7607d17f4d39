"""Per-stage checkpointing — resumability (BASELINE.json: 'resumable from
per-stage checkpoints with per-partition lineage and metrics tables').

Each stage writes an idempotent parquet table keyed by (stage name, config
hash). A rerun with the same config finds the table and reads it back
instead of recomputing — the reference has no analog (it reruns from
scratch); this is mandated new capability. In production the same layout is
an Iceberg table per stage; parquet is the sandbox stand-in.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class CheckpointContext:
    spark: SparkSession
    base_dir: str | None      # None -> checkpointing disabled
    config_hash: str
    # fingerprint of the INPUT (plan-derived, e.g. semanticHash of the source
    # DataFrame): a rerun over a different corpus must not reuse stage tables
    # computed for the old one (ADVICE r01). Note the limit: data overwritten
    # IN PLACE at the same path keeps the same plan hash — pass an explicit
    # content-derived fingerprint for mutable sources.
    input_fingerprint: str = ""

    def path(self, stage: str) -> str:
        key = f"{stage}_{self.config_hash}"
        if self.input_fingerprint:
            key += f"_{self.input_fingerprint}"
        return os.path.join(self.base_dir, key)

    def stage(self, df: DataFrame, stage: str) -> DataFrame:
        """Materialize df under the stage key (or reuse an existing run)."""
        if self.base_dir is None:
            return df
        p = self.path(stage)
        marker = os.path.join(p, "_SUCCESS")
        if not os.path.exists(marker):
            df.write.mode("overwrite").parquet(p)
        return self.spark.read.parquet(p)

    def has(self, stage: str) -> bool:
        return self.base_dir is not None and os.path.exists(
            os.path.join(self.path(stage), "_SUCCESS")
        )
