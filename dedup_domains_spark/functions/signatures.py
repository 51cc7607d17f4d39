"""Vectorized signature computation — shingling, MinHash, SimHash, bottom-k
containment probes — in ONE Arrow batch pass over ``content``.

This is the generalization of the reference's per-row label decomposition
(reference src/domain.c:236-318) to code shingles (SURVEY.md §2.3, T1).
Everything is numpy over Arrow batches: no per-row Python in the hot path
(BASELINE.json input_hint). MinHash uses 31-bit universal hashing
((a*x+b) mod p, p = 2^31-1) so products stay inside uint64; SimHash is
64-bit over the raw shingle hashes.
"""

from __future__ import annotations

import re

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

_MERSENNE31 = (1 << 31) - 1
_TOKEN_RE = re.compile(r"\w+|[^\w\s]")

SIGNATURE_STRUCT = StructType([
    StructField("n_tokens", IntegerType()),
    StructField("n_shingles", IntegerType()),
    StructField("minhash", ArrayType(LongType())),
    StructField("simhash", LongType()),
    StructField("probes", ArrayType(LongType())),
])


def _perm_params(cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(cfg.seed)
    a = rng.integers(1, _MERSENNE31, size=cfg.num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE31, size=cfg.num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct 64-bit shingle hashes of a document (k-token shingles).

    Documents shorter than k tokens fall back to a single whole-text shingle
    so exact duplicates still co-bucket.
    """
    toks = _TOKEN_RE.findall(text) if text else []
    if len(toks) >= k:
        sh = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    else:
        sh = [text or ""]
    arr = pd.util.hash_array(np.asarray(sh, dtype=object))  # uint64, stable
    return np.unique(arr)


def _batch_signatures(texts: pd.Series, cfg: DedupConfig) -> pd.DataFrame:
    a, b = _perm_params(cfg)
    n_tokens, n_shingles, minhashes, simhashes, probes = [], [], [], [], []

    all_shingles: list[np.ndarray] = []
    for t in texts:
        toks = _TOKEN_RE.findall(t) if t else []
        n_tokens.append(len(toks))
        sh = shingle_hashes(t or "", cfg.shingle_k)
        n_shingles.append(len(sh))
        all_shingles.append(sh)

    if all_shingles:
        flat = np.concatenate(all_shingles)
        lengths = np.array([len(s) for s in all_shingles])
        offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        flat31 = flat % np.uint64(_MERSENNE31)

        # MinHash: one reduceat per permutation over the whole batch.
        sig = np.empty((len(all_shingles), cfg.num_perm), dtype=np.int64)
        for j in range(cfg.num_perm):
            v = (a[j] * flat31 + b[j]) % np.uint64(_MERSENNE31)
            sig[:, j] = np.minimum.reduceat(v, offsets).astype(np.int64)

        # SimHash: ±1 per bit of each 64-bit shingle hash, summed per doc.
        bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        contrib = bits.astype(np.int32) * 2 - 1
        sums = np.add.reduceat(contrib, offsets, axis=0)
        simbits = (sums > 0).astype(np.uint64)
        sim = np.zeros(len(all_shingles), dtype=np.uint64)
        for bit in range(64):
            sim |= simbits[:, bit] << np.uint64(bit)
        simhashes = sim.view(np.int64).tolist()

        for i, sh in enumerate(all_shingles):
            minhashes.append(sig[i].tolist())
            s = min(cfg.containment_probe_shingles, len(sh))
            probes.append(np.sort(sh)[:s].view(np.int64).tolist())

    return pd.DataFrame({
        "n_tokens": pd.Series(n_tokens, dtype="int32"),
        "n_shingles": pd.Series(n_shingles, dtype="int32"),
        "minhash": minhashes,
        "simhash": pd.Series(simhashes, dtype="int64"),
        "probes": probes,
    })


def add_signatures(df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Attach (n_tokens, n_shingles, minhash, simhash, probes) columns."""

    @F.pandas_udf(SIGNATURE_STRUCT)
    def _sig(texts: pd.Series) -> pd.DataFrame:
        return _batch_signatures(texts, cfg)

    return (
        df.withColumn("_sig", _sig(F.col("content")))
        .select("*", "_sig.*")
        .drop("_sig")
    )


def explode_shingles_udf(cfg: DedupConfig):
    """pandas_udf: content -> array of distinct 64-bit shingle hashes (as
    signed longs). Used only by the containment inverted index."""

    @F.pandas_udf(ArrayType(LongType()))
    def _sh(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: shingle_hashes(t or "", cfg.shingle_k).view(np.int64).tolist()
        )

    return _sh
