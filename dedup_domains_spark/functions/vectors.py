"""Embedding similarity — brute-force cosine as the correctness baseline and
an LSH-bucketed variant as the scale path (SURVEY.md 'similarity search').

Dot products are pure Catalyst (`zip_with` + `aggregate` over
array<float/double>), so the quadratic baseline stays JVM-side; the scale
path buckets by random-hyperplane signs (SimHash-for-vectors) so candidate
sets shrink from O(N) to a bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self). Correctness
    baseline: O(|Q|*|C|) — use the LSH variant for large Q."""
    from pyspark.sql import Window

    # norms are precomputed per SIDE before the crossJoin: cosine() inline
    # would recompute l2_norm(q) once per corpus row and l2_norm(c) once per
    # query row — norm passes are the same O(dim) as the dot product, so
    # that is 2/3 of the join's arithmetic for the same result (identical
    # doubles: same ops in the same order, just evaluated once per row).
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "_cos",
            dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def hyperplane_bucket_udf(dim: int, n_planes: int = 12, seed: int = 42):
    """pandas_udf mapping an embedding to a random-hyperplane sign bucket.
    Vectors in the same bucket are cosine-close with high probability; use
    multiple independent tables (vary seed) to trade recall for cost."""
    from pyspark.sql.types import IntegerType

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    @F.pandas_udf(IntegerType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        signs = (m @ planes) > 0
        out = np.zeros(len(m), dtype=np.int32)
        for j in range(n_planes):
            out |= signs[:, j].astype(np.int32) << j
        return pd.Series(out)

    return _bucket


def hyperplane_buckets_udf(dim: int, n_planes: int, n_tables: int,
                           seed: int = 42):
    """ALL tables' buckets in one pandas pass: array<int> of length
    n_tables, entry t bit-identical to hyperplane_bucket_udf(dim, n_planes,
    seed + t) (same per-table GEMM, same accumulation) — one UDF node +
    posexplode replaces n_tables separate UDF invocations per side and the
    n_tables-way unioned join (r06: at 16 tables the union shape cost 32
    Arrow round trips and a 16-branch plan per query)."""
    from pyspark.sql.types import ArrayType, IntegerType

    all_planes = [
        np.random.default_rng(seed + t).standard_normal((dim, n_planes))
        for t in range(n_tables)
    ]

    @F.pandas_udf(ArrayType(IntegerType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        out = np.zeros((len(m), n_tables), dtype=np.int32)
        for t, planes in enumerate(all_planes):
            signs = (m @ planes) > 0
            for j in range(n_planes):
                out[:, t] |= signs[:, j].astype(np.int32) << j
        return pd.Series(list(out))

    return _buckets


def bucketed_near_dup_pairs(
    vectors: DataFrame, dim: int, threshold: float = 0.9,
    n_planes: int = 8, n_tables: int = 2, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs via hyperplane-bucket blocking — the
    scale path for embedding-cosine dedup (replaces the O(n²) crossJoin the
    brute-force twin uses). Candidates = pairs sharing a bucket in ANY of
    the n_tables independent hyperplane tables; exact cosine is computed
    only within buckets. Output: (id_a, id_b, cos_sim), id_a < id_b.

    Scale shape: the self-join key is (table, bucket) — a shuffle on a
    bounded-cardinality key, never a cartesian. Collinear vectors (cos = 1)
    share every bucket deterministically; recall for looser pairs rises
    with n_tables / falls with n_planes (standard LSH trade-off).
    """
    bu = hyperplane_buckets_udf(dim, n_planes, n_tables, seed)
    # per-side norm precompute — same rationale as brute_force_topk: an
    # inline cosine() would redo both norm passes per candidate pair. One
    # posexplode over the all-tables bucket array replaces the per-table
    # unioned joins (candidate set identical: pairs sharing (table, bucket)
    # for ANY table, deduped below).
    side = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
        F.posexplode(bu(F.col(vec_col))).alias("_t", "_bkt"),
    )
    a = side.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
                    F.col("_n").alias("_na"), "_t", "_bkt")
    b = side.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
                    F.col("_n").alias("_nb"), "_t", "_bkt")
    cand = (
        a.join(b, ["_t", "_bkt"]).filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        cand.withColumn("_cos", cos)
        .filter(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round(F.col("_cos"), 4).alias("cos_sim"))
    )


def ann_topk_lsh(
    queries: DataFrame, corpus: DataFrame, dim: int, k: int = 5,
    n_planes: int = 10, n_tables: int = 4, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: union of per-table hyperplane-bucket joins, then
    exact cosine rank within candidates. Scale path for ANN search."""
    from pyspark.sql import Window

    bu = hyperplane_buckets_udf(dim, n_planes, n_tables, seed)
    # per-side norm precompute + one posexplode over the all-tables bucket
    # array — see bucketed_near_dup_pairs; candidate set identical to the
    # per-table unioned joins this replaces
    qb = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
        F.posexplode(bu(F.col(vec_col))).alias("_t", "_bkt"),
    )
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        l2_norm(F.col(vec_col)).alias("_cn"),
        F.posexplode(bu(F.col(vec_col))).alias("_t", "_bkt"),
    )
    cand = (
        qb.join(cb, ["_t", "_bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "_cos", dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
