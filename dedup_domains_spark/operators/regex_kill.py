"""D4 regex-kill pass (reference pfb_dnsbl_prune.py:36-57,187-190, opt-in
--prune-regex): every strength-2 row's col-1 is a regex; after dedup, any
*survivor* whose domain matches any regex is dropped. Regex rows themselves
are always kept. The pattern list is small (a blocklist has tens of regexes),
so it broadcasts; matching is vectorized per Arrow batch with Python ``re``
to preserve the reference's exact regex dialect.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def regex_kill(survivors: DataFrame, patterns: list[str]) -> DataFrame:
    """Drop non-regex survivors whose domain matches any pattern."""
    if not patterns:
        return survivors
    compiled = [p for p in patterns if p]

    @F.pandas_udf(BooleanType())
    def _matches_any(domains: pd.Series) -> pd.Series:
        regs = [re.compile(p) for p in compiled]
        return domains.map(
            lambda d: bool(d) and any(r.search(d) for r in regs)
        ).astype(bool)

    return survivors.filter(
        (F.col("match_strength") == 2) | ~_matches_any(F.col("domain"))
    )


def collect_patterns(df: DataFrame) -> list[str]:
    """Global regex list = col-1 of every strength-2 row across all files
    (reference collects them across read_csv calls, pfb_dnsbl_prune.py:230)."""
    return [
        r.domain
        for r in df.filter(
            (F.col("valid") == "ok") & (F.col("match_strength") == 2)
        ).select("domain").collect()
    ]
