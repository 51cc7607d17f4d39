"""Broadcast Bloom prefilter for incremental exact dedup.

The recurring production shape: a new batch of documents must be deduped
against a reference corpus that is orders of magnitude larger. A plain
anti-join shuffles the whole batch against the whole corpus key set; a Bloom
filter built over the corpus keys and broadcast to the batch splits the batch
map-side into

  * bloom-negative rows — DEFINITELY new (Bloom filters have no false
    negatives): they skip the join entirely, and
  * bloom-positive rows — a small candidate fraction (true duplicates plus
    the fp-rate of the filter) that pays the exact semi-join.

The final answer is exactly the anti-join's. The filter itself is built
distributedly: each corpus partition computes a local bitmap over its keys
(`mapInPandas`, numpy bit-ops), and the driver ORs the per-partition bitmaps
— every executor ships m/8 bytes regardless of corpus size, the classic
aggregate-a-sketch pattern.

Hashing is double hashing over Spark's own xxhash64 (JVM-side): bit index i
= (h1 + i*h2) mod m with h2 forced odd — k derived positions from one
64-bit hash, no Python hashing of row values anywhere.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, BooleanType, StructField, StructType

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _positions(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(h), k) bit positions via double hashing; h is int64 xxhash64."""
    h1 = h.astype(np.int64).view(np.uint64)
    h2 = (h1 * _MIX) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(np.int64)


def _set_bits(bitmap: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def _test_bits(bitmap: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """All-k-bits-set test; pos is (n, k)."""
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def bloom_params(n_items: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) for the target false-positive rate; m rounded up to a
    whole byte."""
    n = max(n_items, 1)
    m = max(64, int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2))))
    m = (m + 7) & ~7
    k = max(1, round(m / n * math.log(2)))
    return m, k


def build_bloom(corpus: DataFrame, key_col: str, n_items: int,
                fp_rate: float = 0.01) -> tuple[bytes, int, int]:
    """Distributed Bloom build over ``corpus[key_col]``: per-partition numpy
    bitmaps (mapInPandas), OR-merged at the driver. Returns (bitmap, m, k)."""
    m, k = bloom_params(n_items, fp_rate)
    hashed = corpus.select(F.xxhash64(key_col).alias("_h"))

    def _partition_bitmap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmap = np.zeros(m // 8, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                _set_bits(bitmap, _positions(pdf["_h"].to_numpy(np.int64), m, k))
        if any_rows:
            yield pd.DataFrame({"bm": [bitmap.tobytes()]})

    parts = hashed.mapInPandas(
        _partition_bitmap, schema=StructType([StructField("bm", BinaryType())])
    ).collect()
    merged = np.zeros(m // 8, dtype=np.uint8)
    for row in parts:
        merged |= np.frombuffer(row.bm, dtype=np.uint8)
    return merged.tobytes(), m, k


def might_contain_udf(spark, bitmap: bytes, m: int, k: int):
    """Vectorized membership test against a broadcast bitmap; feed it
    xxhash64(key) columns."""
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf(BooleanType())
    def _might_contain(h: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        if h.empty:
            return pd.Series([], dtype=bool)
        return pd.Series(_test_bits(bm, _positions(h.to_numpy(np.int64), m, k)))

    return _might_contain


def bloom_prefilter_anti_join(
    new: DataFrame, corpus: DataFrame, key_col: str, fp_rate: float = 0.01,
    n_items: int | None = None, eager: bool = False,
) -> DataFrame:
    """Rows of ``new`` whose ``key_col`` does NOT occur in ``corpus`` —
    exact anti-join semantics, Bloom-prefiltered so only bloom-positive
    candidates reach the join.

    The corpus key set is distinct-ed once and persisted: the count (bloom
    sizing), the bitmap build, and the candidate semi-join all read the
    cached keys — one pass over the corpus lineage, not three. ``new`` is
    likewise persisted before the bloom split so its lineage (and the UDF)
    run once, not once per branch. Pass ``n_items`` when the corpus
    cardinality is already known to skip the count job entirely.

    Cache lifecycle (ADVICE r02): with ``eager=True`` the result is
    localCheckpoint-ed (lineage cut + blocks materialized) and both interim
    caches are released before returning — use this in recurring
    incremental-batch loops, where lazily-held caches would otherwise
    accumulate until the ContextCleaner ran. With ``eager=False`` (lazy
    plan returned), the caches must outlive the returned DataFrame's
    consumption; callers should materialize the result and then release
    them via ``result.sparkSession.catalog.clearCache()`` or by calling
    this with ``eager=True`` instead."""
    from pyspark.storagelevel import StorageLevel

    spark = new.sparkSession
    keys = corpus.select(key_col).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    flagged = None
    try:
        n = n_items if n_items is not None else keys.count()
        bitmap, m, k = build_bloom(keys, key_col, n, fp_rate)
        mc = might_contain_udf(spark, bitmap, m, k)

        flagged = new.withColumn("_bloom_hit", mc(F.xxhash64(key_col))).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        definite_new = flagged.filter(~F.col("_bloom_hit")).drop("_bloom_hit")
        candidates = flagged.filter(F.col("_bloom_hit")).drop("_bloom_hit")
        survived = candidates.join(keys, key_col, "leftanti")
        result = definite_new.unionByName(survived)
        if eager:
            result = result.localCheckpoint(eager=True)
            keys.unpersist()
            flagged.unpersist()
        return result
    except Exception:
        keys.unpersist()
        if flagged is not None:
            flagged.unpersist()
        raise
