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
    # reference naming: final extension REPLACED (pfb_prune.c outputfilename)
    with open(f"{out}/E2ETestInput_1.pruned") as f:
        got = [l for l in f.read().split("\n") if l]
    with open(f"{ref}/E2ETestInput_1.fulle2e") as f:
        want = [l for l in f.read().split("\n") if l]
    assert got == want
    # empty input still produces an (empty) output file, like the reference
    assert os.path.exists(f"{out}/E2ETest_Empty.pruned")


def test_cli_dnsbl_directory_mode(tmp_path):
    """--dir processes *<in-ext> files in sorted order and writes
    <base><out-ext> next to them (reference pfb_dnsbl_prune.py:329-351)."""
    import shutil

    ref = "/root/reference/tests/unit_pfb_prune"
    d = tmp_path / "feeds"
    d.mkdir()
    shutil.copy(f"{ref}/E2ETestInput_1.txt", d / "a.fat")
    shutil.copy(f"{ref}/E2ETestInput_1.txt", d / "b.fat")

    from dedup_domains_spark.__main__ import main

    rc = main(["dnsbl", "--dir", str(d)])
    assert rc == 0
    with open(d / "a.pruned") as f:
        got_a = [l for l in f.read().split("\n") if l]
    with open(f"{ref}/E2ETestInput_1.fulle2e") as f:
        want = [l for l in f.read().split("\n") if l]
    assert got_a == want
    # duplicate file: every line is an exact dup of file a → all collapsed
    with open(d / "b.pruned") as f:
        assert [l for l in f.read().split("\n") if l] == []


def test_cli_dnsbl_lenient_schema_and_telemetry(tmp_path):
    """--lenient-schema applies the C binary's column rules (<7 cols → WEAK,
    multi-char col 7 → skipped; pfb_prune.c:132-164), and the -L/-E/-s
    analogs write the run log / errlog and silence stdout."""
    feed = tmp_path / "feed.fat"
    lines = [
        ",a.example.com,,0,list,group,1",   # normal FULL row
        ",b.example.com,,0,list",           # 5 cols: strict=ignored, lenient=WEAK
        ",c.example.com,,0,list,group,10",  # multi-char col7: bogus both ways
        ",a.example.com,,0,list,group,0",   # weaker duplicate of row 1
    ]
    feed.write_text("\n".join(lines) + "\n")

    from dedup_domains_spark.__main__ import main

    out_s = tmp_path / "strict"
    rc = main(["dnsbl", "--inputs", str(feed), "--output", str(out_s)])
    assert rc == 0
    strict_out = (out_s / "feed.pruned").read_text().splitlines()
    assert strict_out == [lines[0]]

    out_l = tmp_path / "lenient"
    log = tmp_path / "run.log"
    errlog = tmp_path / "err.log"
    rc = main([
        "dnsbl", "--inputs", str(feed), "--output", str(out_l),
        "--lenient-schema", "--log-file", str(log),
        "--errlog-file", str(errlog), "--silent",
    ])
    assert rc == 0
    lenient_out = (out_l / "feed.pruned").read_text().splitlines()
    assert lenient_out == [lines[0], lines[1]]

    logged = json.loads(log.read_text())
    assert logged["survivors"] == 2
    assert logged["metrics"]["ignored"] == 1  # only the bogus col7 row
    err = errlog.read_text()
    assert f"{feed}:3: ignored:bogus_strength" in err
    assert f"{feed}:4: exact_or_weaker_duplicate" in err


def test_distributed_text_sink(spark, tmp_path):
    """write_survivors_text: one ordered part file per source, no driver
    collect (VERDICT r01 item 5 — the O2 scale path)."""
    import glob

    from dedup_domains_spark.operators.domain_mode import dedup_dnsbl
    from dedup_domains_spark.sources.dnsbl import load_dnsbl_files
    from dedup_domains_spark.sources.sinks import write_survivors_text

    ref = "/root/reference/tests/unit_pfb_prune"
    paths = [f"{ref}/E2ETestInput_1.txt"]
    res = dedup_dnsbl(load_dnsbl_files(spark, paths))
    out = str(tmp_path / "textsink")
    write_survivors_text(res.survivors, out)

    part_files = glob.glob(f"{out}/source=E2ETestInput_1.txt/part-*")
    assert len(part_files) == 1  # exactly one task wrote this source
    with open(part_files[0]) as f:
        got = [l for l in f.read().split("\n") if l]
    with open(f"{ref}/E2ETestInput_1.fulle2e") as f:
        want = [l for l in f.read().split("\n") if l]
    assert got == want
