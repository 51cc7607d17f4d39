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
    enforced; everything else is parquet. Table names (dotted or bare, no
    slash) first try the Iceberg catalog (the input_hint shape; runtime jars
    absent in this sandbox), then the session catalog — which covers
    Spark-managed tables including the BUCKETED layout
    ``save_corpus_table`` writes."""
    if fmt is None:
        if "/" not in source:
            try:
                return spark.read.format("iceberg").load(source)
            except Exception:
                pass  # no Iceberg runtime in this sandbox
            if spark.catalog.tableExists(source):
                return spark.read.table(source)
            if "." not in source:
                raise ValueError(
                    f"table {source!r} not found in the session catalog"
                )
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


def save_corpus_table(
    df: DataFrame, name: str, buckets: int = 64, location: str | None = None,
) -> None:
    """Write the corpus as a catalog-managed BUCKETED table — the sandbox
    stand-in for the input_hint's Iceberg table (runtime jars absent here;
    on a real cluster the same writer shape targets
    ``.format("iceberg")`` with a bucket partition transform).

    Bucketing by ``repo`` (sorted by path within buckets) is the layout the
    repo-granularity operators want at 10^12 files: groupBy(repo) and
    repo-vs-repo joins read co-located buckets with NO shuffle (Spark's
    bucket join elides the Exchange when both sides share the bucketing),
    and a single-repo lookup prunes to one bucket instead of scanning the
    corpus. The dedup pipeline itself is indifferent (it repartitions on
    uid hash), so the layout is chosen for the query side."""
    writer = (
        df.select(*CORPUS_COLS)
        .write.mode("overwrite")
        .bucketBy(buckets, "repo")
        .sortBy("repo", "path")
    )
    if location:
        writer = writer.option("path", location)
    writer.saveAsTable(name)


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
