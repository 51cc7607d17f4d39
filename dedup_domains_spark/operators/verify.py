"""Candidate-pair verification (SURVEY.md §2.3 'candidate verification').

Default path is pure Catalyst: the MinHash Jaccard estimate is the fraction
of equal signature positions — ``zip_with`` + ``aggregate`` over the two
arrays, no Python, no content shuffled. The optional exact path joins
``content`` back for the (bounded) candidate set and computes true
shingle-set Jaccard per Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from dedup_domains_spark.config import DedupConfig
from dedup_domains_spark.functions.tokenize_np import batch_shingle_segments


def attach_minhash_estimate(
    pairs: DataFrame, sig_df: DataFrame, cfg: DedupConfig, id_col: str = "uid"
) -> DataFrame:
    """pairs(id_a, id_b) -> + est_jaccard column (MinHash position-match)."""
    sigs = sig_df.select(F.col(id_col).alias("_sid"), F.col("minhash").alias("_mh"))
    j = (
        pairs.join(
            sigs.withColumnRenamed("_sid", "id_a").withColumnRenamed("_mh", "_mh_a"), "id_a"
        )
        .join(
            sigs.withColumnRenamed("_sid", "id_b").withColumnRenamed("_mh", "_mh_b"), "id_b"
        )
    )
    matches = F.aggregate(
        F.zip_with("_mh_a", "_mh_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return j.withColumn(
        "est_jaccard", matches / F.lit(cfg.num_perm)
    ).drop("_mh_a", "_mh_b")


def verify_pairs_estimate(
    pairs: DataFrame, sig_df: DataFrame, cfg: DedupConfig, id_col: str = "uid"
) -> DataFrame:
    """Keep candidate pairs whose estimated Jaccard >= threshold."""
    return (
        attach_minhash_estimate(pairs, sig_df, cfg, id_col)
        .filter(F.col("est_jaccard") >= cfg.jaccard_threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def verify_pairs_exact(
    pairs: DataFrame, content_df: DataFrame, cfg: DedupConfig, id_col: str = "uid"
) -> DataFrame:
    """Exact shingle-set Jaccard over the candidate pairs (joins content —
    use only after candidate generation has bounded the pair count)."""
    c = content_df.select(F.col(id_col).alias("_cid"), F.col("content").alias("_ct"))
    j = (
        pairs.join(c.withColumnRenamed("_cid", "id_a").withColumnRenamed("_ct", "_ct_a"), "id_a")
        .join(c.withColumnRenamed("_cid", "id_b").withColumnRenamed("_ct", "_ct_b"), "id_b")
    )

    @F.pandas_udf(DoubleType())
    def _jac(a: pd.Series, b: pd.Series) -> pd.Series:
        # whole-batch numpy shingling (one tokenizer pass per column), then
        # per-pair sorted-array intersection — no Python int sets
        sha, offa, cnta, _ = batch_shingle_segments(a.tolist(), cfg.shingle_k)
        shb, offb, cntb, _ = batch_shingle_segments(b.tolist(), cfg.shingle_k)
        out = np.empty(len(a))
        for i in range(len(a)):
            xa = sha[offa[i]:offa[i] + cnta[i]]
            xb = shb[offb[i]:offb[i] + cntb[i]]
            inter = np.intersect1d(xa, xb, assume_unique=True).size
            u = xa.size + xb.size - inter
            out[i] = (inter / u) if u else 1.0
        return pd.Series(out)

    return (
        j.withColumn("exact_jaccard", _jac(F.col("_ct_a"), F.col("_ct_b")))
        .filter(F.col("exact_jaccard") >= cfg.jaccard_threshold)
        .select("id_a", "id_b", F.col("exact_jaccard").alias("est_jaccard"))
    )
