"""Source adapter for the production code-file corpus.

Input shape per BASELINE.json input_hint: an Iceberg table with columns
(repo, path, commit, lang, content). In this sandbox we read parquet; the
loader tries an Iceberg catalog first and falls back. The reference analog is
the multi-file CSV source feeding one shared trie (reference
src/pfb_prune.c:219-261, src/main.c:110-134) — here N files/splits feed one
logical DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLS = ["repo", "path", "commit", "lang", "content"]


def load_code_corpus(spark: SparkSession, source: str, fmt: str | None = None) -> DataFrame:
    """Load the corpus table from an Iceberg table name or a file path.

    fmt overrides format detection; paths ending .csv/.json/.jsonl load via
    the corresponding reader (header CSV, JSON-lines) with the corpus schema
    enforced; everything else is parquet. Iceberg table names (dotted, no
    slash) go through the Iceberg catalog when a runtime is present."""
    if fmt is None:
        if "/" not in source and "." in source:
            try:
                return spark.read.format("iceberg").load(source)
            except Exception:
                pass  # no Iceberg runtime in this sandbox — parquet fallback
        low = source.rstrip("/").lower()
        fmt = (
            "csv" if low.endswith(".csv")
            else "json" if low.endswith((".json", ".jsonl"))
            else "parquet"
        )
    schema = "repo string, path string, commit string, lang string, content string"
    if fmt == "csv":
        return spark.read.schema(schema).option("header", "true").option(
            "multiLine", "true"
        ).option("escape", '"').csv(source)
    if fmt == "json":
        return spark.read.schema(schema).json(source)
    return spark.read.parquet(source)


def with_row_identity(df: DataFrame) -> DataFrame:
    """Attach the stable row identity columns every downstream stage keys on.

    * ``content_sha256`` — the per-row byte-fidelity invariant
      (BASELINE.json: 'content sha256 equality for every surviving record';
      reference analog: survivors are byte-identical replays,
      rw_pfb_csv.c:418-479).
    * ``uid`` — a deterministic 64-bit id from (repo, path, commit); used as
      the join/cluster key so wide shuffles never carry ``content``.
    """
    return df.withColumn("content_sha256", F.sha2(F.col("content"), 256)).withColumn(
        "uid", F.xxhash64(F.col("repo"), F.col("path"), F.col("commit"))
    )
