"""Edge cases: empty inputs, exact-Jaccard verify path, tiny corpora."""

from __future__ import annotations

import pandas as pd
import pytest

from dedup_domains_spark.config import DedupConfig
from dedup_domains_spark.datagen import gen_code_corpus
from dedup_domains_spark.functions.signatures import _batch_signatures
from dedup_domains_spark.plans.pipeline import run_pipeline


def test_empty_batch_signatures():
    out = _batch_signatures(pd.Series([], dtype=object), DedupConfig())
    assert len(out) == 0
    assert list(out.columns) == ["n_tokens", "n_shingles", "minhash", "simhash", "probes"]


def test_pipeline_on_empty_corpus(spark):
    empty = spark.createDataFrame(
        [], "repo string, path string, commit string, lang string, content string"
    )
    res = run_pipeline(spark, empty, DedupConfig())
    assert res.survivors.count() == 0
    assert res.cluster_map.count() == 0


def test_pipeline_single_row(spark):
    one = spark.createDataFrame(
        [("o/r", "a.py", "c" * 40, "python", "def f(): return 1")],
        "repo string, path string, commit string, lang string, content string",
    )
    res = run_pipeline(spark, one, DedupConfig())
    assert res.survivors.count() == 1


def test_exact_jaccard_verify_path(spark):
    cfg = DedupConfig(use_exact_jaccard=True)
    corpus = gen_code_corpus(100)
    files = spark.createDataFrame(corpus.files)
    res = run_pipeline(spark, files, cfg)
    # exact verification must still catch the planted near pairs
    from dedup_domains_spark.sources.code_corpus import with_row_identity
    from pyspark.sql import functions as F

    exp = spark.createDataFrame(corpus.expected).withColumnRenamed("uid", "planted_uid")
    ident = (
        with_row_identity(files).withColumnRenamed("uid", "engine_uid")
        .join(exp, ["repo", "path", "commit"])
        .select("engine_uid", "planted_uid")
    )
    cmap = res.cluster_map.select(
        F.col("uid").alias("engine_uid"), "cluster_id"
    ).join(ident, "engine_uid")
    rows = {r.planted_uid: r.cluster_id for r in cmap.collect()}
    pairs = list(corpus.pairs.itertuples(index=False))
    hit = sum(1 for p in pairs if rows.get(p.id_a) == rows.get(p.id_b))
    assert hit / len(pairs) >= 0.99


def test_bloom_prefilter_empty_corpus(spark):
    """Dedup against an EMPTY reference corpus: everything is new, and the
    zero-item bloom build must not divide by zero."""
    from pyspark.sql import functions as F

    from dedup_domains_spark.functions.bloom import bloom_prefilter_anti_join

    corpus = spark.createDataFrame([], "key string")
    new = spark.range(0, 10).select(
        F.col("id").alias("new_id"), F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    out = bloom_prefilter_anti_join(new, corpus, "key")
    assert out.count() == 10


def test_suffix_verify_empty_candidates(spark):
    from dedup_domains_spark.operators.suffix_array import suffix_verify_containment

    df = spark.createDataFrame([(1, "abc")], ["uid", "content"])
    cand = spark.createDataFrame([], "small_id long, big_id long")
    assert suffix_verify_containment(cand, df).count() == 0


def test_suffix_array_unicode_content(spark):
    """Multi-byte UTF-8 content: the byte-level suffix array must agree with
    Python's substring semantics (utf-8 byte containment == str containment
    for whole-string patterns)."""
    from dedup_domains_spark.operators.suffix_array import suffix_verify_containment

    docs = [
        (1, "naïve café ☕"),
        (2, "prefix naïve café ☕ suffix 日本語"),
        (3, "日本語テキスト"),
    ]
    df = spark.createDataFrame(docs, ["uid", "content"])
    cand = spark.createDataFrame([(1, 2), (3, 2), (1, 3)], ["small_id", "big_id"])
    got = {tuple(r) for r in suffix_verify_containment(cand, df).collect()}
    assert got == {(1, 2)}


def test_suffix_verify_null_and_empty_content(spark):
    """Null/empty content must be REJECTED, never raise — the same contract
    as the scan verifier (containment.py `bool(s) and bool(b)`)."""
    from dedup_domains_spark.operators.containment import verify_containment
    from dedup_domains_spark.operators.suffix_array import suffix_verify_containment

    df = spark.createDataFrame(
        [(1, "abc def"), (2, None), (3, ""), (4, "xx abc def yy")],
        "uid long, content string",
    )
    cand = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (1, 2), (1, 3)], ["small_id", "big_id"]
    )
    a = {tuple(r) for r in verify_containment(cand, df).collect()}
    b = {tuple(r) for r in suffix_verify_containment(cand, df).collect()}
    assert a == b == {(1, 4)}


def test_config_rejects_bad_containment_verify():
    import pytest as _pytest

    from dedup_domains_spark.config import DedupConfig

    with _pytest.raises(ValueError, match="containment_verify"):
        DedupConfig(containment_verify="suffix-array")
