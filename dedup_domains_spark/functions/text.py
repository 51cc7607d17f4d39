"""Text-analysis functions for training-data pipelines — language-ID
heuristic, quality scoring, token counting, document fingerprinting.

All pure Catalyst expressions (`pyspark.sql.functions` compositions), so they
stay inside whole-stage codegen — no UDFs. Each has an exact ANSI-SQL twin in
plans/queries.py for DuckDB cross-checking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Heuristic English stopword set — shared with the oracle SQL verbatim.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")


def tokens(col: Column) -> Column:
    """Whitespace tokens."""
    return F.split(col, " ")


def regex_tokens(col: Column) -> Column:
    """BPE-ish tokenizer: word chars runs (matches DuckDB regexp_extract_all)."""
    return F.regexp_extract_all(col, F.lit(r"\w+"), 0)


def token_count(col: Column) -> Column:
    return F.size(regex_tokens(col))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(F.lower(col))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are neither word chars nor whitespace."""
    return F.length(F.regexp_replace(col, r"[\w\s]", "")) / F.greatest(
        F.length(col), F.lit(1)
    )


def is_english(col: Column, threshold: float = 0.05) -> Column:
    return stopword_ratio(col) >= threshold


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality: length saturation + stopword presence +
    low punctuation noise. Weights mirror common pretraining filters."""
    length_part = F.least(token_count(col) / F.lit(100.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_part
        + F.lit(0.3) * F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(col))
    )


def doc_fingerprint(col: Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    whitespace token set. Stable across engines (DuckDB md5 == Spark md5)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


def ngram_shingles(col: Column, n: int = 3) -> Column:
    """Distinct n-gram (token) shingle strings, pure Catalyst."""
    toks = tokens(col)
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )
