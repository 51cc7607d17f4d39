"""pfBlockerNG CSV source — reference-parity ingest, fully distributed.

Parses the reference's 7-column CSV feeds (shape documented at reference
tests/001_inputs/e_adaway.fat, columns decoded at src/pfb_prune.c:132-164 and
pfb_dnsbl_prune.py:208-230) into the dnsbl_lines DataFrame schema.

Validity rule = the strict Python rule (SURVEY.md §1.2): column count must be
6 or 7; a 6-column row defaults to strength 0 (WEAK); col 6 must parse as an
int in {0,1,2}; rows violating either are counted as *ignored*. Line framing
normalizes \\r\\n, a final unterminated line still counts, and over-long
lines are truncated at max_line_bytes (reference rw_pfb_csv.c:28-32,147-154,
390-403). Labels over 255 bytes fail the row (reference src/domain.c:276-287).

Scale shape: ``spark.read.text`` + ``input_file_name()`` + a per-file window
over ``monotonically_increasing_id()`` reconstructs 1-based line numbers —
the executors read and parse; the driver never opens a feed file. The id is
(partitionIndex << 33 | rowInPartition); Spark assigns file splits to
partition indices in split order (splitFiles emits offsets ascending and the
size-descending packing sort is stable, so equal-size splits of one file keep
offset order and the short tail split — the file's last — packs after them),
so ordering by the id within a file is ordering by byte offset. All column
parsing is Catalyst (split/element_at/rlike) — no per-row Python.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DNSBL_SCHEMA = StructType([
    StructField("source_file", StringType(), False),
    StructField("file_order", IntegerType(), False),
    StructField("linenumber", LongType(), False),
    StructField("domain", StringType(), True),
    StructField("listname", StringType(), True),
    StructField("groupname", StringType(), True),
    StructField("match_strength", IntegerType(), True),
    StructField("raw_line", StringType(), False),
    StructField("valid", StringType(), False),  # 'ok' | ignore reason
])

MAX_LINE_BYTES = 2048  # reference rw_pfb_csv.c:28-32 truncation cap


def parse_dnsbl_line(line: str, lenient: bool = False) -> tuple:
    """(domain, listname, groupname, strength, validity) for one CSV line.

    Driver-side twin of the Catalyst expressions in load_dnsbl_files — kept
    for unit tests and as executable documentation of the validity rule.
    ``lenient=True`` applies the C binary's schema rules instead of the
    strict Python-tool rules (see load_dnsbl_files)."""
    cols = line.split(",")
    if lenient:
        if len(cols) < 2:
            return None, None, None, None, "bad_column_count"
        domain = cols[1]
        listname = cols[4] if len(cols) > 4 else None
        groupname = cols[5] if len(cols) > 5 else None
        if len(cols) >= 7:
            c7 = cols[6]
            if len(c7) != 1 or c7 not in "012":
                return domain, listname, groupname, None, "bogus_strength"
            strength = int(c7)
        else:
            strength = 0
        if not domain:
            return domain, listname, groupname, strength, "bad_domain"
        if any(len(lbl.encode()) > 255 for lbl in domain.split(".")):
            return domain, listname, groupname, strength, "label_too_long"
        return domain, listname, groupname, strength, "ok"
    if len(cols) not in (6, 7):
        return None, None, None, None, "bad_column_count"
    domain = cols[1]
    listname = cols[4] if len(cols) > 4 else None
    groupname = cols[5] if len(cols) > 5 else None
    if len(cols) == 7:
        import re

        s = cols[6].strip()
        if not re.fullmatch(r"-?[0-9]+", s):
            return domain, listname, groupname, None, "bad_strength"
        strength = int(s)
        if strength < 0 or strength > 2:
            return domain, listname, groupname, None, "bad_strength"
    else:
        strength = 0
    # per-label hard limit: a label >255 bytes fails the row
    # (reference src/domain.c:276-287)
    if domain and any(len(lbl.encode()) > 255 for lbl in domain.split(".")):
        return domain, listname, groupname, strength, "label_too_long"
    return domain, listname, groupname, strength, "ok"


def load_dnsbl_files(
    spark: SparkSession, paths: list[str], lenient: bool = False
) -> DataFrame:
    """Read N CSV feed files (in CLI order — order defines the first-wins
    tie-break, reference src/main.c:110-134) into one dnsbl_lines DataFrame.

    Distributed end to end: executors scan (spark.read.text), line numbers
    come from a per-file window, and parsing/validity are pure Catalyst.

    ``lenient=True`` switches the validity rule from the strict Python-tool
    schema (default; SURVEY.md §1.2) to the C binary's
    (reference src/pfb_prune.c:132-164 + domaintree.c:355-369):
      * fewer than 7 columns → accepted at strength WEAK (the strict rule
        requires exactly 6 or 7 columns);
      * a 7th column longer than one character → MATCH_BOGUS, row skipped;
      * one-column lines and empty domains → skipped (the C path fails
        update_DomainView and skips the insert);
      * a single-character 7th column outside '0'..'2' is also treated as
        bogus here — the C binary would insert it with the raw
        ``char - '0'`` arithmetic value; no reference fixture contains one.
    """
    # map the scan's file URI back to the caller's path + CLI position
    uri_map = [(Path(p).absolute().as_uri(), p, order)
               for order, p in enumerate(paths)]
    uri_df = spark.createDataFrame(
        pd.DataFrame(uri_map, columns=["_uri", "source_file", "file_order"])
    ).withColumn("file_order", F.col("file_order").cast("int"))

    # Line order within a file: a feed larger than maxPartitionBytes scans as
    # SEVERAL splits, and Spark packs splits into partitions by SIZE, not by
    # file offset — monotonically_increasing_id alone would interleave them.
    # Ordering by (block byte offset, id-within-split) is correct for any
    # split geometry: block_start orders the splits, the partition-local id
    # orders rows inside each split.
    lines = spark.read.text([u for u, _, _ in uri_map]).select(
        F.input_file_name().alias("_uri"),
        F.input_file_block_start().alias("_blk"),
        F.monotonically_increasing_id().alias("_mid"),
        F.col("value"),
    )
    w = Window.partitionBy("_uri").orderBy("_blk", "_mid")
    lines = lines.withColumn(
        "linenumber", F.row_number().over(w).cast("long")
    ).drop("_blk")

    # framing: strip trailing \r, truncate over-long lines, drop blank frames
    # AFTER numbering (blank lines advance the line counter in the reference,
    # rw_pfb_csv.c:237-416, but emit no row)
    raw = F.regexp_replace(F.col("value"), "\r$", "")
    raw = F.when(
        F.octet_length(raw) > MAX_LINE_BYTES, F.substring(raw, 1, MAX_LINE_BYTES)
    ).otherwise(raw)
    lines = lines.withColumn("raw_line", raw).filter(F.col("raw_line") != "")

    cols = F.split(F.col("raw_line"), ",", -1)
    n = F.size(cols)
    domain = F.element_at(cols, 2)
    label_too_long = F.exists(
        F.split(domain, r"\."), lambda lbl: F.octet_length(lbl) > 255
    )

    if lenient:
        col7 = F.element_at(cols, 7)
        c7_ok = (F.length(col7) == 1) & col7.isin("0", "1", "2")
        parsed = lines.select(
            "_uri",
            "linenumber",
            "raw_line",
            F.when(n >= 2, domain).alias("domain"),
            F.when(n >= 5, F.element_at(cols, 5)).alias("listname"),
            F.when(n >= 6, F.element_at(cols, 6)).alias("groupname"),
            F.when((n >= 2) & (n < 7), F.lit(0))
            .when(c7_ok, col7.cast("int"))
            .alias("match_strength"),
            F.when(n < 2, F.lit("bad_column_count"))
            .when((n >= 7) & ~c7_ok, F.lit("bogus_strength"))
            .when(domain == "", F.lit("bad_domain"))
            .when(label_too_long, F.lit("label_too_long"))
            .otherwise(F.lit("ok"))
            .alias("valid"),
        )
        return parsed.join(F.broadcast(uri_df), "_uri").select(
            *[f.name for f in DNSBL_SCHEMA.fields]
        )

    strength_str = F.trim(F.element_at(cols, 7))
    strength_ok = strength_str.rlike(r"^-?[0-9]+$")
    strength_val = F.when(strength_ok, strength_str.cast("int"))

    parsed = lines.select(
        "_uri",
        "linenumber",
        "raw_line",
        F.when(n.isin(6, 7), domain).alias("domain"),
        F.when(n.isin(6, 7), F.element_at(cols, 5)).alias("listname"),
        F.when(n.isin(6, 7), F.element_at(cols, 6)).alias("groupname"),
        F.when(~n.isin(6, 7), F.lit(None).cast("int"))
        .when(n == 6, F.lit(0))
        .when(
            strength_ok & (strength_val >= 0) & (strength_val <= 2), strength_val
        )
        .alias("match_strength"),
        F.when(~n.isin(6, 7), F.lit("bad_column_count"))
        .when(
            (n == 7)
            & (~strength_ok | (strength_val < 0) | (strength_val > 2)),
            F.lit("bad_strength"),
        )
        .when(label_too_long, F.lit("label_too_long"))
        .otherwise(F.lit("ok"))
        .alias("valid"),
    )
    return parsed.join(F.broadcast(uri_df), "_uri").select(
        *[f.name for f in DNSBL_SCHEMA.fields]
    )


def dnsbl_df_from_pandas(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Wrap a datagen.gen_dnsbl_lines frame (already validated) as a DataFrame."""
    pdf = pdf.copy()
    pdf["valid"] = "ok"
    pdf["file_order"] = pdf["file_order"].astype("int32")
    pdf["match_strength"] = pdf["match_strength"].astype("Int32")
    return spark.createDataFrame(pdf, schema=DNSBL_SCHEMA)
