"""pfBlockerNG CSV source — reference-parity ingest.

Parses the reference's 7-column CSV feeds (shape documented at reference
tests/001_inputs/e_adaway.fat, columns decoded at src/pfb_prune.c:132-164 and
pfb_dnsbl_prune.py:208-230) into the dnsbl_lines DataFrame schema.

Validity rule = the strict Python rule (SURVEY.md §1.2): column count must be
6 or 7; a 6-column row defaults to strength 0 (WEAK); col 6 must parse as an
int in {0,1,2}; rows violating either are counted as *ignored*. Line framing
normalizes \\r\\n and a final unterminated line still counts (reference
rw_pfb_csv.c:390-403).

Fixture files are tiny, so parsing happens driver-side into an Arrow-backed
DataFrame; at 100 TB the same schema is produced by ``spark.read.csv`` over
the source plus a per-file line-id column materialized at ingest (Iceberg row
lineage), never a driver collect.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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


def parse_dnsbl_line(line: str) -> tuple:
    """(domain, listname, groupname, strength, validity) for one CSV line."""
    cols = line.split(",")
    if len(cols) not in (6, 7):
        return None, None, None, None, "bad_column_count"
    domain = cols[1]
    listname = cols[4] if len(cols) > 4 else None
    groupname = cols[5] if len(cols) > 5 else None
    if len(cols) == 7:
        s = cols[6].strip()
        if not (s.lstrip("-").isdigit()):
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


def load_dnsbl_files(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Read N CSV feed files (in CLI order — order defines the first-wins
    tie-break, reference src/main.c:110-134) into one dnsbl_lines DataFrame."""
    rows = []
    for order, p in enumerate(paths):
        with open(p, "rb") as f:
            data = f.read()
        text = data.decode("utf-8", errors="replace")
        # frame on \n, tolerate \r\n, final unterminated line counts
        lines = text.split("\n")
        if lines and lines[-1] == "":
            lines = lines[:-1]
        for ln, raw in enumerate(lines, start=1):
            raw = raw.rstrip("\r")
            if raw == "":
                continue  # reference skips blank frames (rw_pfb_csv.c:237-416)
            domain, listname, groupname, strength, valid = parse_dnsbl_line(raw)
            rows.append((p, order, ln, domain, listname, groupname,
                         strength, raw, valid))
    pdf = pd.DataFrame(rows, columns=[f.name for f in DNSBL_SCHEMA.fields])
    if len(pdf) == 0:
        return spark.createDataFrame([], schema=DNSBL_SCHEMA)
    pdf["match_strength"] = pdf["match_strength"].astype("Int32")
    return spark.createDataFrame(pdf, schema=DNSBL_SCHEMA)


def dnsbl_df_from_pandas(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Wrap a datagen.gen_dnsbl_lines frame (already validated) as a DataFrame."""
    pdf = pdf.copy()
    pdf["valid"] = "ok"
    pdf["file_order"] = pdf["file_order"].astype("int32")
    pdf["match_strength"] = pdf["match_strength"].astype("Int32")
    return spark.createDataFrame(pdf, schema=DNSBL_SCHEMA)
