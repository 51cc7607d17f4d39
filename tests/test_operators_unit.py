"""Unit tests for the candidate-generation machinery and the generators."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup_domains_spark.config import DedupConfig
from dedup_domains_spark.datagen import gen_code_corpus, gen_dnsbl_lines
from dedup_domains_spark.operators.buckets import pairs_from_buckets


def _edges_connect(pairs: set[tuple], members: list) -> bool:
    """All members in one component?"""
    parent = {m: m for m in members}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a in parent and b in parent:
            parent[find(a)] = find(b)
    return len({find(m) for m in members}) == 1


def test_mega_bucket_salted_star_stays_connected_and_bounded(spark):
    # one bucket with 500 members, cap 16 -> salting must split it while
    # keeping the bucket a single connected component with O(n) edges
    pdf = pd.DataFrame({"b": [1] * 500, "uid": list(range(500))})
    df = spark.createDataFrame(pdf)
    pairs = pairs_from_buckets(df, ["b"], id_col="uid", max_bucket_size=16)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert len(got) <= 2 * 500  # linear, never quadratic (124,750 pairs)
    assert _edges_connect(got, list(range(500)))


def test_small_buckets_emit_stars(spark):
    pdf = pd.DataFrame({"b": [1, 1, 1, 2, 2, 3], "uid": [10, 11, 12, 20, 21, 30]})
    df = spark.createDataFrame(pdf)
    got = {(r.id_a, r.id_b) for r in pairs_from_buckets(df, ["b"], "uid", 64).collect()}
    assert got == {(10, 11), (10, 12), (20, 21)}  # singleton bucket 3 silent


def test_datagen_prefix_stability():
    small = gen_code_corpus(60)
    big = gen_code_corpus(120)
    assert small.files.equals(big.files.iloc[:60].reset_index(drop=True))


def test_datagen_determinism():
    a = gen_code_corpus(40)
    b = gen_code_corpus(40)
    assert a.files.equals(b.files)
    assert a.pairs.equals(b.pairs)


def test_dnsbl_gen_has_structural_cases():
    pdf = gen_dnsbl_lines(n_files=2, rows_per_file=100)
    assert (pdf.match_strength == 2).any()          # regex rows
    assert (pdf.match_strength == 1).any()          # FULL rows
    assert pdf.groupby("source_file").linenumber.is_monotonic_increasing.all()


def test_minhash_estimate_tracks_true_jaccard():
    import numpy as np

    from dedup_domains_spark.functions.signatures import (
        _batch_signatures, shingle_hashes,
    )

    cfg = DedupConfig()
    corpus = gen_code_corpus(100)
    f = corpus.files
    sigs = _batch_signatures(f.content, cfg)
    for a, b, kind in corpus.pairs.itertuples(index=False):
        sa = set(shingle_hashes(f.content[a], cfg.shingle_k).tolist())
        sb = set(shingle_hashes(f.content[b], cfg.shingle_k).tolist())
        true_j = len(sa & sb) / len(sa | sb)
        est = float(np.mean(np.array(sigs.minhash[a]) == np.array(sigs.minhash[b])))
        assert abs(est - true_j) < 0.2, (a, b, kind, true_j, est)
