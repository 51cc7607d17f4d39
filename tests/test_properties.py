"""Property-based and randomized-oracle tests.

1. The vectorized byte-level tokenizer must agree with its regex
   specification (``\\w+|[^\\w\\s]``) on token COUNTS for ASCII text
   (hypothesis-generated).
2. Randomized domain tables: the Spark domain-mode dedup must match an
   independent in-test oracle implementing the reference's semantics
   (max-strength election, first-wins ties, FULL-ancestor subsumption) —
   written from SURVEY.md §2 semantics, not from reference code.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup_domains_spark.functions.tokenize_np import batch_token_hashes

_SPEC = re.compile(r"\w+|[^\w\s]", re.ASCII)

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=400
)


@given(st.lists(ascii_text, min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_tokenizer_counts_match_regex_spec(texts):
    th, doc_of = batch_token_hashes(texts)
    counts = np.bincount(doc_of, minlength=len(texts))
    for i, t in enumerate(texts):
        assert counts[i] == len(_SPEC.findall(t)), repr(t)


@given(ascii_text, ascii_text)
@settings(max_examples=100, deadline=None)
def test_token_hash_equality_iff_token_equality_mostly(a, b):
    """Identical texts hash identically; token hashes are order-preserving."""
    th1, _ = batch_token_hashes([a, a])
    half = len(th1) // 2
    assert list(th1[:half]) == list(th1[half:])


# ---------------------------------------------------------------------------
# randomized domain-mode oracle
# ---------------------------------------------------------------------------

def _oracle(rows):
    """Reference dedup semantics, independently implemented:
    rows: list of (file_order, linenumber, domain, strength) in insertion
    order. Returns surviving (file_order, linenumber) keys."""
    keep_regex = [(f, ln) for f, ln, d, s in rows if s == 2]
    best: dict[str, tuple[int, tuple]] = {}
    for f, ln, d, s in rows:
        if s == 2:
            continue
        cur = best.get(d)
        if cur is None or s > cur[0]:
            best[d] = (s, (f, ln))
    full = {d for d, (s, _) in best.items() if s == 1}

    def subsumed(d: str) -> bool:
        labels = d.split(".")
        return any(
            ".".join(labels[i:]) in full for i in range(1, len(labels))
        )

    survivors = {key for d, (s, key) in best.items() if not subsumed(d)}
    return survivors | set(keep_regex)


def _random_rows(seed: int, n: int):
    rng = np.random.default_rng(seed)
    rows = []
    ln_per_file = {}
    for i in range(n):
        f = int(rng.integers(0, 3))
        ln_per_file[f] = ln_per_file.get(f, 0) + 1
        depth = int(rng.integers(1, 4))
        labels = [f"l{rng.integers(0, 6)}" for _ in range(depth)] + ["com"]
        s = int(rng.choice([0, 0, 0, 1, 1, 2], p=[0.45, 0.15, 0.1, 0.15, 0.1, 0.05]))
        rows.append((f, ln_per_file[f], ".".join(labels), s))
    # insertion order: file_order then linenumber (multi-file CLI order)
    rows.sort(key=lambda r: (r[0], r[1]))
    return rows


@pytest.mark.parametrize("seed", [7, 42, 1337])
def test_random_tables_match_oracle(spark, seed):
    from dedup_domains_spark.datagen import make_dnsbl_row
    from dedup_domains_spark.operators.domain_mode import dedup_dnsbl
    from dedup_domains_spark.sources.dnsbl import dnsbl_df_from_pandas

    rows = _random_rows(seed, 500)
    pdf = pd.DataFrame(
        [
            (f"file_{f}", f, ln, d, "lst", "grp", s, make_dnsbl_row(d, s))
            for (f, ln, d, s) in rows
        ],
        columns=["source_file", "file_order", "linenumber", "domain",
                 "listname", "groupname", "match_strength", "raw_line"],
    )
    df = dnsbl_df_from_pandas(spark, pdf)
    res = dedup_dnsbl(df)
    got = {
        (r.file_order, r.linenumber)
        for r in res.survivors.select("file_order", "linenumber").collect()
    }
    want = _oracle(rows)
    assert got == want, (
        f"seed {seed}: extra={sorted(got - want)[:5]} "
        f"missing={sorted(want - got)[:5]}"
    )
