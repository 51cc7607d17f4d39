"""End-to-end CLI tests: the spark-submit surface (C1) driving both modes,
and the sink manifest/invariants."""

from __future__ import annotations

import json
import os

import pytest

from dedup_domains_spark.datagen import gen_code_corpus


def test_cli_code_mode(spark, tmp_path):
    corpus_path = str(tmp_path / "corpus.parquet")
    gen_code_corpus(200).files.to_parquet(corpus_path)
    out = str(tmp_path / "out")

    from dedup_domains_spark.__main__ import main

    rc = main([
        "code", "--input", corpus_path, "--output", out,
        "--parallelism", "8",
    ])
    assert rc == 0
    manifest = json.load(open(f"{out}/manifest.json"))
    assert manifest["sha256_invariant_violations"] == 0
    assert manifest["metrics"]["input"] == 200
    assert manifest["metrics"]["survivors"] < 200
    surv = spark.read.parquet(f"{out}/survivors")
    assert surv.count() == manifest["metrics"]["survivors"]
    # partitioned layout on disk
    assert any(d.startswith("lang=") for d in os.listdir(f"{out}/survivors"))
    lineage = spark.read.parquet(f"{out}/lineage")
    assert lineage.count() == 200


def test_cli_dnsbl_mode(tmp_path):
    ref = "/root/reference/tests/unit_pfb_prune"
    out = str(tmp_path / "dnsbl_out")

    from dedup_domains_spark.__main__ import main

    rc = main([
        "dnsbl",
        "--inputs",
        f"{ref}/E2ETestInput_1.txt",
        f"{ref}/E2ETest_Empty.txt",
        "--output", out,
    ])
    assert rc == 0
    with open(f"{out}/E2ETestInput_1.txt.pruned") as f:
        got = [l for l in f.read().split("\n") if l]
    with open(f"{ref}/E2ETestInput_1.fulle2e") as f:
        want = [l for l in f.read().split("\n") if l]
    assert got == want
