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


def test_probes_only_batch_matches_full_signatures():
    """_batch_probes_arrow must be bit-identical to the full path on the
    fields it shares (n_tokens, n_shingles, probes) — containment treats a
    probes-only signature table as interchangeable with the full one."""
    import pyarrow as pa

    from dedup_domains_spark.functions.signatures import (
        _batch_probes_arrow, _batch_signatures_arrow,
    )

    cfg = DedupConfig()
    corpus = gen_code_corpus(120)
    arr = pa.array(corpus.files.content.tolist(), type=pa.string())
    full = _batch_signatures_arrow(arr, cfg)
    probe = _batch_probes_arrow(arr, cfg)
    for fld in ("n_tokens", "n_shingles", "probes"):
        assert probe.field(fld).equals(full.field(fld)), fld
    assert [f.name for f in probe.type] == ["n_tokens", "n_shingles", "probes"]
    # empty batch shape
    empty = _batch_probes_arrow(pa.array([], type=pa.string()), cfg)
    assert len(empty) == 0


# ---------------------------------------------------------------------------
# Suffix array (operators/suffix_array.py)
# ---------------------------------------------------------------------------

def test_suffix_array_matches_sorted_suffixes():
    import random
    import numpy as np
    from dedup_domains_spark.operators.suffix_array import build_suffix_array

    rng = random.Random(11)
    for _ in range(60):
        n = rng.randint(0, 120)
        s = bytes(rng.choice(b"abAB {}();\n") for _ in range(n))
        sa = build_suffix_array(s)
        truth = sorted(range(n), key=lambda i: s[i:])
        assert list(sa) == truth


def test_sa_contains_matches_python_in():
    import random
    from dedup_domains_spark.operators.suffix_array import (
        build_suffix_array, sa_contains,
    )

    rng = random.Random(12)
    for _ in range(40):
        s = bytes(rng.choice(b"xyz ") for _ in range(rng.randint(1, 80)))
        sa = build_suffix_array(s)
        for _ in range(15):
            m = rng.randint(0, 6)
            if rng.random() < 0.5 and len(s) > m:
                start = rng.randint(0, len(s) - m)
                p = s[start:start + m]
            else:
                p = bytes(rng.choice(b"xyzw ") for _ in range(m))
            assert sa_contains(s, sa, p) == (p in s)


def test_suffix_verify_agrees_with_scan_verify(spark):
    """Per-container suffix-array verify must keep exactly the pairs the
    plain-scan verifier keeps."""
    from dedup_domains_spark.operators.containment import verify_containment
    from dedup_domains_spark.operators.suffix_array import suffix_verify_containment

    docs = [
        (1, "def f(x): return x + 1"),
        (2, "header\ndef f(x): return x + 1\nfooter"),
        (3, "completely different content here"),
        (4, "return x"),
    ]
    df = spark.createDataFrame(docs, ["uid", "content"])
    cand = spark.createDataFrame(
        [(1, 2), (3, 2), (4, 1), (4, 3)], ["small_id", "big_id"]
    )
    a = {tuple(r) for r in verify_containment(cand, df).collect()}
    b = {tuple(r) for r in suffix_verify_containment(cand, df).collect()}
    assert a == b == {(1, 2), (4, 1)}


def test_suffix_verify_mega_fanin_salted(spark):
    """A container probed by many candidates is salted into subgroups
    (ADVICE r02): with max_fanin far below the fan-in, results must be
    identical to the unsalted path — every true containee kept, every
    non-containee dropped, no duplicates."""
    from dedup_domains_spark.operators.suffix_array import suffix_verify_containment

    carrier = " ".join(f"tok{i}" for i in range(400))
    docs = [(1000, carrier)]
    # 60 true substrings + 60 non-substrings probing the same container
    for i in range(60):
        docs.append((i, " ".join(f"tok{j}" for j in range(i, i + 5))))
        docs.append((100 + i, f"absent{i} zz qq"))
    df = spark.createDataFrame(docs, ["uid", "content"])
    cand = spark.createDataFrame(
        [(i, 1000) for i in range(60)] + [(100 + i, 1000) for i in range(60)],
        ["small_id", "big_id"],
    )
    got = sorted(
        tuple(r) for r in
        suffix_verify_containment(cand, df, max_fanin=16).collect()
    )
    assert got == [(i, 1000) for i in range(60)]


# ---------------------------------------------------------------------------
# Bloom prefilter (functions/bloom.py)
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_low_fp():
    import numpy as np
    from dedup_domains_spark.functions.bloom import (
        _positions, _set_bits, _test_bits, bloom_params,
    )

    rng = np.random.default_rng(5)
    members = rng.integers(-2**62, 2**62, size=2000, dtype=np.int64)
    others = rng.integers(-2**62, 2**62, size=20000, dtype=np.int64)
    others = np.setdiff1d(others, members)
    m, k = bloom_params(len(members), fp_rate=0.01)
    bitmap = np.zeros(m // 8, dtype=np.uint8)
    _set_bits(bitmap, _positions(members, m, k))
    assert _test_bits(bitmap, _positions(members, m, k)).all()  # no false negatives
    fp = _test_bits(bitmap, _positions(others, m, k)).mean()
    assert fp < 0.03, fp


def test_bloom_prefilter_anti_join_is_exact(spark):
    from pyspark.sql import functions as F
    from dedup_domains_spark.functions.bloom import bloom_prefilter_anti_join

    corpus = spark.range(0, 300).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    new = spark.range(200, 500).select(
        F.col("id").alias("new_id"), F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    out = bloom_prefilter_anti_join(new, corpus, "key")
    got = sorted(r.new_id for r in out.collect())
    assert got == list(range(300, 500))


def test_probe_filter_collection_fails_loudly_past_cap(spark, monkeypatch):
    """collect_probe_filter must raise (pointing at the shuffle regime)
    instead of OOMing the driver when the distinct probe set exceeds the
    broadcast-regime ceiling (VERDICT r05 nit 2)."""
    import pytest
    from pyspark.sql import functions as F
    from dedup_domains_spark import operators
    from dedup_domains_spark.config import DedupConfig
    from dedup_domains_spark.functions.signatures import add_signatures
    from dedup_domains_spark.operators import containment

    docs = spark.range(0, 50).select(
        F.col("id").alias("uid"),
        F.concat_ws(
            " ", *[F.concat(F.lit(f"w{i}x"), F.col("id")) for i in range(40)]
        ).alias("content"),
    )
    sig = add_signatures(docs, DedupConfig(), probes_only=True, repartition=4)
    monkeypatch.setattr(containment, "MAX_PROBE_FILTER_ROWS", 10)
    with pytest.raises(RuntimeError, match="broadcast-probes regime"):
        containment.collect_probe_filter(sig, DedupConfig())
