"""SimHash Hamming-bucket candidate generation — the second, complementary
candidate sweep (SURVEY.md §2.3; BASELINE.json north_star).

Pigeonhole blocking: split the 64-bit fingerprint into (hamming_max + 1)
blocks; any pair within Hamming distance d shares at least one block intact.
Bucket key = (block index, block value); the same salted-star machinery
bounds skew. Pairs are verified exactly with ``bit_count(a XOR b) <= d``
JVM-side before being emitted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup_domains_spark.config import DedupConfig
from dedup_domains_spark.operators.buckets import pairs_from_buckets


def simhash_block_table(sig_df: DataFrame, cfg: DedupConfig, id_col: str = "uid") -> DataFrame:
    """(uid, block, block_val) — one row per pigeonhole block per doc."""
    nblocks = cfg.simhash_hamming_max + 1
    width = 64 // nblocks
    blocks = []
    for i in range(nblocks):
        lo = i * width
        w = width if i < nblocks - 1 else 64 - lo  # last block takes remainder
        mask = ((1 << w) - 1) if w < 64 else -1    # -1 = all 64 bits set
        blocks.append(
            F.struct(
                F.lit(i).alias("block"),
                F.shiftrightunsigned(F.col("simhash"), lo).bitwiseAND(F.lit(mask)).alias("block_val"),
            )
        )
    return (
        sig_df.select(id_col, F.explode(F.array(*blocks)).alias("_b"))
        .select(id_col, "_b.block", "_b.block_val")
    )


def simhash_candidate_pairs(
    sig_df: DataFrame, cfg: DedupConfig, id_col: str = "uid"
) -> DataFrame:
    """Candidate edges within Hamming distance simhash_hamming_max."""
    bt = simhash_block_table(sig_df, cfg, id_col)
    cand = pairs_from_buckets(
        bt, ["block", "block_val"], id_col=id_col, max_bucket_size=cfg.max_bucket_size
    )
    sims = sig_df.select(F.col(id_col).alias("_sid"), F.col("simhash").alias("_sh"))
    cand = (
        cand.join(sims.withColumnRenamed("_sid", "id_a").withColumnRenamed("_sh", "_sh_a"), "id_a")
        .join(sims.withColumnRenamed("_sid", "id_b").withColumnRenamed("_sh", "_sh_b"), "id_b")
        .filter(
            F.bit_count(F.col("_sh_a").bitwiseXOR(F.col("_sh_b")))
            <= cfg.simhash_hamming_max
        )
        .select("id_a", "id_b")
    )
    return cand
