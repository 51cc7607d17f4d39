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


def load_code_corpus(spark: SparkSession, source: str) -> DataFrame:
    """Load the corpus table from an Iceberg table name or a parquet path."""
    if "/" not in source and "." in source:
        try:
            return spark.read.format("iceberg").load(source)
        except Exception:
            pass  # no Iceberg runtime in this sandbox — parquet fallback
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
