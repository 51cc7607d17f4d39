"""Vectorized signature computation — shingling, MinHash, SimHash, bottom-k
containment probes — in ONE Arrow batch pass over ``content``.

This is the generalization of the reference's per-row label decomposition
(reference src/domain.c:236-318) to code shingles (SURVEY.md §2.3, T1).
Tokenization + shingle hashing is whole-batch numpy (tokenize_np.py); MinHash
uses 31-bit universal hashing ((a*x+b) mod 2^31-1, Mersenne reduction, no
division) vectorized with minimum.reduceat over per-doc segments; SimHash is
64-bit with unpackbits-based per-bit majority. No per-row Python anywhere
(BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from dedup_domains_spark.config import DedupConfig
from dedup_domains_spark.functions.tokenize_np import batch_shingle_segments

_MERSENNE31 = (1 << 31) - 1
_P31 = np.uint64(_MERSENNE31)

SIGNATURE_STRUCT = StructType([
    StructField("n_tokens", IntegerType()),
    StructField("n_shingles", IntegerType()),
    StructField("minhash", ArrayType(LongType())),
    StructField("simhash", LongType()),
    StructField("probes", ArrayType(LongType())),
])
# NOTE: the full shingle set is deliberately NOT emitted/cached — materializing
# ~500 longs/doc through Arrow and the block cache costs far more (heap
# pressure poisons every downstream stage) than re-deriving postings with
# explode_shingles_udf where containment needs them.


def _perm_params(cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(cfg.seed)
    a = rng.integers(1, _MERSENNE31, size=cfg.num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE31, size=cfg.num_perm, dtype=np.uint64)
    return a, b


def _mod_mersenne31(v: np.ndarray) -> np.ndarray:
    """v mod (2^31 - 1) without integer division (valid for v < 2^62)."""
    v = (v & _P31) + (v >> np.uint64(31))
    v = (v & _P31) + (v >> np.uint64(31))
    v[v >= _P31] -= _P31
    return v


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct (sorted, uint64) shingle hashes of one document — singleton
    wrapper over the batch path; used by tests and exact-Jaccard verify."""
    sh, offsets, counts, _ = batch_shingle_segments([text], k)
    return sh[offsets[0]:offsets[0] + counts[0]]


_EMPTY_SIG = pd.DataFrame({
    "n_tokens": pd.Series([], dtype="int32"),
    "n_shingles": pd.Series([], dtype="int32"),
    "minhash": pd.Series([], dtype=object),
    "simhash": pd.Series([], dtype="int64"),
    "probes": pd.Series([], dtype=object),
})


# Cache-block size for the minhash/simhash passes, in shingles. The perm
# loop makes num_perm (128) passes over the shingle array: run whole-batch
# (~24 MB flat for a 10k-doc Arrow batch) that is ~19 GB of DRAM traffic per
# batch and the stage becomes memory-bandwidth-bound — cores contend on the
# bus instead of computing (measured: 0.10 scaling efficiency at 8->32
# procs). Blocked at 16 K shingles (128 KB + temps, L2-resident) the same
# arithmetic runs from cache: 5.3x faster single-threaded and 0.84 scaling
# efficiency on the same host. Bit-identical output by construction — the
# block boundary falls only between doc segments.
_CHUNK_SHINGLES = 16384


def _minhash_simhash(
    flat: np.ndarray, flat31: np.ndarray, offsets: np.ndarray,
    counts: np.ndarray, a: np.ndarray, b: np.ndarray, num_perm: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Segmented MinHash + SimHash over doc-chunks of ~_CHUNK_SHINGLES.

    MinHash: one segmented min per permutation (reduceat needs non-empty
    segments — batch_shingle_segments guarantees counts >= 1). SimHash:
    per-bit ones-count per doc; strided segmented sums (reduceat axis=0 /
    cumsum axis=0) are catastrophically slow in numpy — transpose to
    contiguous rows and run 64 cheap 1-D reduceats instead."""
    ndocs = len(counts)
    sig = np.empty((ndocs, num_perm), dtype=np.int64)
    sim = np.zeros(ndocs, dtype=np.uint64)
    ends = offsets + counts
    d0 = 0
    while d0 < ndocs:
        # smallest doc range ending at/after target shingles (a single doc
        # larger than the target forms its own chunk)
        d1 = int(np.searchsorted(ends, offsets[d0] + _CHUNK_SHINGLES)) + 1
        d1 = min(max(d1, d0 + 1), ndocs)
        s0, s1 = int(offsets[d0]), int(ends[d1 - 1])
        off_c = (offsets[d0:d1] - s0).astype(np.intp)
        f31 = flat31[s0:s1]
        for p in range(num_perm):
            v = _mod_mersenne31(a[p] * f31 + b[p])
            sig[d0:d1, p] = np.minimum.reduceat(v, off_c).astype(np.int64)
        bytes_t = np.ascontiguousarray(flat[s0:s1].view(np.uint8).reshape(-1, 8).T)
        bits_t = np.unpackbits(bytes_t, axis=0, bitorder="little")  # (64, n)
        nd = d1 - d0
        ones = np.empty((nd, 64), dtype=np.int64)
        for bit in range(64):
            ones[:, bit] = np.add.reduceat(bits_t[bit], off_c, dtype=np.int32)
        simbits = (ones * 2 > counts[d0:d1, None]).astype(np.uint64)
        sm = np.zeros(nd, dtype=np.uint64)
        for bit in range(64):
            sm |= simbits[:, bit] << np.uint64(bit)
        sim[d0:d1] = sm
        d0 = d1
    return sig, sim.view(np.int64)


def _batch_signatures(texts: pd.Series, cfg: DedupConfig) -> pd.DataFrame:
    if len(texts) == 0:  # empty Arrow batch (e.g. empty partition)
        return _EMPTY_SIG.copy()
    a, b = _perm_params(cfg)
    flat, offsets, counts, n_tokens = batch_shingle_segments(
        texts.tolist(), cfg.shingle_k
    )
    ndocs = len(counts)
    minhashes: list = [None] * ndocs
    probes: list = [None] * ndocs

    flat31 = flat % _P31
    sig, simhashes = _minhash_simhash(
        flat, flat31, offsets, counts, a, b, cfg.num_perm
    )

    signed = flat.view(np.int64)
    s = cfg.containment_probe_shingles
    for i in range(ndocs):
        minhashes[i] = sig[i]
        seg = signed[offsets[i]:offsets[i] + counts[i]]
        probes[i] = seg[:min(s, len(seg))]  # segment already sorted unsigned

    return pd.DataFrame({
        "n_tokens": pd.Series(n_tokens, dtype="int32"),
        "n_shingles": pd.Series(counts, dtype="int32"),
        "minhash": minhashes,
        "simhash": pd.Series(simhashes, dtype="int64"),
        "probes": probes,
    })


def add_signatures(df: DataFrame, cfg: DedupConfig, repartition: int | None = None) -> DataFrame:
    """Attach (n_tokens, n_shingles, minhash, simhash, probes).

    Fans out before the UDF when the input is under-partitioned: a narrow
    parquet scan or an AQE-coalesced projection can arrive in a handful of
    partitions, which would serialize the CPU-heavy signature computation
    onto a few cores. But when upstream already carries >= cluster
    parallelism partitions (the usual case — the exact-dedup rep stage is a
    shuffle output with `shuffle_partitions` partitions), repartitioning
    again would re-shuffle the FULL content column for nothing; content is
    the widest column in the pipeline and that shuffle was ~a third of this
    stage's wall. Pass `repartition` explicitly to force a specific fan-out.
    """
    if repartition is not None:
        df = df.repartition(repartition)
    else:
        target = df.sparkSession.sparkContext.defaultParallelism * 2
        # partition count is known from the physical plan without running it
        if df.rdd.getNumPartitions() < max(target // 2, 1):
            df = df.repartition(target)

    @F.pandas_udf(SIGNATURE_STRUCT)
    def _sig(texts: pd.Series) -> pd.DataFrame:
        return _batch_signatures(texts, cfg)

    return (
        df.withColumn("_sig", _sig(F.col("content")))
        .select("*", "_sig.*")
        .drop("_sig")
    )


def explode_shingles_udf(cfg: DedupConfig, keep_only: np.ndarray | None = None):
    """pandas_udf: content -> array of distinct 64-bit shingle hashes (as
    signed longs). Used only by the containment inverted index — derived
    map-side, flows straight into the postings join, never cached.

    keep_only: optional sorted int64 array (the distinct containment-probe
    shingles); when given, only matching hashes are emitted, shrinking the
    posting mass executor-side before any shuffle. The array ships in the
    UDF closure — valid exactly in the broadcast-probes regime where the
    probe set is driver-sized by definition."""

    @F.pandas_udf(ArrayType(LongType()))
    def _sh(texts: pd.Series) -> pd.Series:
        flat, offsets, counts, _ = batch_shingle_segments(
            texts.tolist(), cfg.shingle_k
        )
        signed = flat.view(np.int64)
        if keep_only is None:
            return pd.Series(
                [signed[offsets[i]:offsets[i] + counts[i]] for i in range(len(counts))]
            )
        if len(keep_only) == 0:
            return pd.Series([signed[:0]] * len(counts))
        # membership via searchsorted on the sorted filter (whole-batch)
        pos = np.searchsorted(keep_only, signed)
        pos[pos >= len(keep_only)] = 0
        hit = keep_only[pos] == signed
        out = []
        for i in range(len(counts)):
            seg = slice(offsets[i], offsets[i] + counts[i])
            out.append(signed[seg][hit[seg]])
        return pd.Series(out)

    return _sh
