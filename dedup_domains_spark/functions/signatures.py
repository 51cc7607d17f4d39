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
    # int32, not long: every MinHash value is < 2^31-1 (mod-Mersenne31
    # universal hashing), and minhash is the fattest column crossing the
    # candidate/verify shuffles — 128 values/doc at 4 bytes instead of 8
    # halves the dominant shuffle payload at 10^12-file scale. probes stay
    # int64 (they are raw 64-bit shingle hashes).
    StructField("minhash", ArrayType(IntegerType())),
    StructField("simhash", LongType()),
    StructField("probes", ArrayType(LongType())),
])

# Catalyst cannot prune columns INSIDE a UDF, so a caller that used the
# full struct would pay the 128-permutation MinHash loop and the SimHash
# bit transpose for fields it drops. add_signatures(fields=...) emits only
# the requested signature fields and the kernel skips the arithmetic behind
# the omitted ones: containment needs only probes (tokenize + head-slice),
# the SimHash block sweep needs only simhash (skips the perm loop), the LSH
# band sweep needs only minhash (skips the bit transpose). Every emitted
# field is bit-identical across variants — same tokenizer, same math.
_FIELD_TYPES = {
    "minhash": ArrayType(IntegerType()),
    "simhash": LongType(),
    "probes": ArrayType(LongType()),
}
_ALL_FIELDS = ("minhash", "simhash", "probes")


def _sig_struct(fields: tuple[str, ...]) -> StructType:
    return StructType(
        [
            StructField("n_tokens", IntegerType()),
            StructField("n_shingles", IntegerType()),
        ]
        + [StructField(f, _FIELD_TYPES[f]) for f in _ALL_FIELDS if f in fields]
    )


PROBE_STRUCT = _sig_struct(("probes",))
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
    want_minhash: bool = True, want_simhash: bool = True,
) -> tuple[np.ndarray | None, np.ndarray | None]:
    """Segmented MinHash + SimHash over doc-chunks of ~_CHUNK_SHINGLES.

    MinHash: one segmented min per permutation (reduceat needs non-empty
    segments — batch_shingle_segments guarantees counts >= 1). SimHash:
    per-bit ones-count per doc; strided segmented sums (reduceat axis=0 /
    cumsum axis=0) are catastrophically slow in numpy — transpose to
    contiguous rows and run 64 cheap 1-D reduceats instead.

    want_minhash/want_simhash skip the respective arithmetic entirely for
    callers that drop the field (the chunk walk itself is free); emitted
    values are bit-identical regardless of which flags are on."""
    ndocs = len(counts)
    sig = np.empty((ndocs, num_perm), dtype=np.int32) if want_minhash else None
    sim = np.zeros(ndocs, dtype=np.uint64) if want_simhash else None
    ends = offsets + counts
    d0 = 0
    while d0 < ndocs:
        # smallest doc range ending at/after target shingles (a single doc
        # larger than the target forms its own chunk)
        d1 = int(np.searchsorted(ends, offsets[d0] + _CHUNK_SHINGLES)) + 1
        d1 = min(max(d1, d0 + 1), ndocs)
        s0, s1 = int(offsets[d0]), int(ends[d1 - 1])
        off_c = (offsets[d0:d1] - s0).astype(np.intp)
        if want_minhash:
            f31 = flat31[s0:s1]
            for p in range(num_perm):
                v = _mod_mersenne31(a[p] * f31 + b[p])
                sig[d0:d1, p] = np.minimum.reduceat(v, off_c).astype(np.int32)
        if want_simhash:
            bytes_t = np.ascontiguousarray(
                flat[s0:s1].view(np.uint8).reshape(-1, 8).T
            )
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
    return sig, sim.view(np.int64) if want_simhash else None


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


def _segment_take_indices(
    offsets: np.ndarray, take: np.ndarray
) -> np.ndarray:
    """Flat gather indices selecting the first take[i] elements of each
    segment starting at offsets[i] — vectorized per-doc head-slice."""
    total = int(take.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(take)
    within = np.arange(total, dtype=np.int64) - np.repeat(ends - take, take)
    return np.repeat(offsets.astype(np.int64), take) + within


def _batch_signatures_arrow(arr, cfg: DedupConfig,
                            fields: tuple[str, ...] = _ALL_FIELDS):
    """Arrow-native signature batch: pyarrow string Array in, pyarrow
    StructArray out. Zero-copy on BOTH sides — the tokenizer reads the
    Arrow UTF-8 buffer directly (no Python str materialization, no
    re-encode) and minhash/probes are emitted as ListArrays built from the
    flat numpy outputs (no per-row list building, no pandas assembly).
    Hash-identical to _batch_signatures: both tokenize the same bytes.

    ``fields`` limits the emitted signature columns AND the arithmetic:
    without "minhash" the 128-permutation loop is skipped, without
    "simhash" the bit transpose is skipped, without "probes" the
    head-slice gather is skipped. Emitted values are bit-identical across
    variants (same tokenizer output feeds the same math)."""
    import pyarrow as pa

    from dedup_domains_spark.functions.tokenize_np import (
        batch_shingle_segments_arrow,
    )

    ndocs = len(arr)
    flat, offsets, counts, n_tokens = batch_shingle_segments_arrow(
        arr, cfg.shingle_k
    )
    want_mh, want_sh = "minhash" in fields, "simhash" in fields
    sig = simhashes = None
    if ndocs == 0:
        sig = np.empty((0, cfg.num_perm), dtype=np.int32)
        simhashes = np.empty(0, dtype=np.int64)
    elif want_mh or want_sh:
        a, b = _perm_params(cfg)
        flat31 = flat % _P31 if want_mh else None
        sig, simhashes = _minhash_simhash(
            flat, flat31, offsets, counts, a, b, cfg.num_perm,
            want_minhash=want_mh, want_simhash=want_sh,
        )
    children = [
        pa.array(n_tokens.astype(np.int32)),
        pa.array(counts.astype(np.int32)),
    ]
    names = ["n_tokens", "n_shingles"]
    if want_mh:
        children.append(pa.ListArray.from_arrays(
            pa.array(np.arange(ndocs + 1, dtype=np.int32) * cfg.num_perm),
            pa.array(sig.ravel(), type=pa.int32()),
        ))
        names.append("minhash")
    if want_sh:
        children.append(pa.array(simhashes, type=pa.int64()))
        names.append("simhash")
    if "probes" in fields:
        take = np.minimum(counts, cfg.containment_probe_shingles)
        probe_vals = flat.view(np.int64)[_segment_take_indices(offsets, take)]
        children.append(pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(take))).astype(np.int32)),
            pa.array(probe_vals, type=pa.int64()),
        ))
        names.append("probes")
    return pa.StructArray.from_arrays(children, names=names)


def _batch_probes_arrow(arr, cfg: DedupConfig):
    """Probes-only Arrow batch — kept as a named entry point for tests; the
    field-pruned kernel above does the work (no MinHash permutation loop,
    no SimHash bit transpose; probe values BIT-IDENTICAL to the full
    variant's: same tokenizer, same head-slice of the same segments)."""
    return _batch_signatures_arrow(arr, cfg, fields=("probes",))


def add_signatures(
    df: DataFrame, cfg: DedupConfig, repartition: int | None = None,
    probes_only: bool = False, fields: tuple[str, ...] | None = None,
) -> DataFrame:
    """Attach (n_tokens, n_shingles, minhash, simhash, probes) — or, with
    ``fields=(...)`` (subset of minhash/simhash/probes), just the named
    signature columns, with the kernel skipping the arithmetic behind the
    omitted ones: no "minhash" drops the 128-permutation loop, no
    "simhash" drops the bit transpose, no "probes" drops the head-slice.
    ``probes_only=True`` is the legacy spelling of fields=("probes",) —
    the containment scale path. Emitted values are bit-identical across
    variants, so any field-pruned table is interchangeable with the full
    one for the fields it carries.

    Repartitions before the UDF by default: upstream can arrive arbitrarily
    unbalanced — AQE coalesces small projections, and a parquet scan of a
    few large row groups yields mostly-EMPTY splits (a single-row-group
    file puts every row in one partition while getNumPartitions() still
    reports the split count, so partition COUNT is not a balance signal —
    measured: the signature stage ran 6x slower on one fat cached
    partition). Pass ``repartition=0`` to skip the exchange ONLY when the
    caller guarantees balanced input (e.g. it just repartitioned and cached
    the projection itself — the pipeline and the bench kernel leg do); any
    other int forces that exact fan-out.
    """
    if repartition is None:
        repartition = df.sparkSession.sparkContext.defaultParallelism * 2
    if repartition:
        df = df.repartition(repartition)

    from pyspark.sql.functions import arrow_udf

    if fields is None:
        fields = ("probes",) if probes_only else _ALL_FIELDS
    unknown = set(fields) - set(_ALL_FIELDS)
    if unknown:
        raise ValueError(f"unknown signature fields: {sorted(unknown)}")
    fields = tuple(f for f in _ALL_FIELDS if f in fields)

    @arrow_udf(_sig_struct(fields))
    def _sig(texts):
        return _batch_signatures_arrow(texts, cfg, fields)

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
    from pyspark.sql.functions import arrow_udf

    @arrow_udf(ArrayType(LongType()))
    def _sh(texts):
        import pyarrow as pa

        from dedup_domains_spark.functions.tokenize_np import (
            batch_shingle_segments_arrow,
        )

        flat, offsets, counts, _ = batch_shingle_segments_arrow(
            texts, cfg.shingle_k
        )
        signed = flat.view(np.int64)
        if keep_only is None or len(keep_only) == 0:
            if keep_only is not None:
                signed = signed[:0]
                counts = np.zeros_like(counts)
            out_off = np.concatenate(([0], np.cumsum(counts)))
        else:
            # membership via searchsorted on the sorted filter (whole-batch)
            pos = np.searchsorted(keep_only, signed)
            pos[pos >= len(keep_only)] = 0
            hit = keep_only[pos] == signed
            kept = (
                np.add.reduceat(hit, offsets) if len(signed) else
                np.zeros(len(counts), dtype=np.int64)
            )
            out_off = np.concatenate(([0], np.cumsum(kept)))
            signed = signed[hit]
        return pa.ListArray.from_arrays(
            pa.array(out_off.astype(np.int32)),
            pa.array(signed, type=pa.int64()),
        )

    return _sh
