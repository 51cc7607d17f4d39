"""CLI entry point — the reference's C1 surface (inputargs.c:273-352 /
pfb_dnsbl_prune.py argparse) re-expressed for spark-submit:

  spark-submit --py-files dedup_domains_spark.zip -m dedup_domains_spark ...
  # or locally:
  python -m dedup_domains_spark code --input corpus.parquet --output out/
  python -m dedup_domains_spark dnsbl --inputs a.fat b.fat --output out/
                                      [--prune-regex]

Subcommands:
  code   — the full near-dup pipeline over a (repo, path, commit, lang,
           content) table.
  dnsbl  — reference-parity domain mode over pfBlockerNG CSV feeds.
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_spark_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--parallelism", type=int, default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--master", default=None,
                   help="e.g. local[8] or local-cluster[4,8,6144]")
    p.add_argument("--checkpoint-dir", default=None,
                   help="per-stage resume tables (plans/checkpoint.py)")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dedup_domains_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pc = sub.add_parser("code", help="near-dup pipeline over a code corpus")
    pc.add_argument("--input", required=True, help="parquet path or Iceberg table")
    pc.add_argument("--output", required=True)
    pc.add_argument("--passthrough", default="lang = 'binary'",
                    help="SQL predicate routing rows around dedup (F2)")
    pc.add_argument("--shingle-k", type=int, default=7)
    pc.add_argument("--num-perm", type=int, default=128)
    pc.add_argument("--bands", type=int, default=32)
    pc.add_argument("--jaccard", type=float, default=0.5)
    pc.add_argument("--exact-jaccard", action="store_true")
    _add_spark_args(pc)

    pd_ = sub.add_parser("dnsbl", help="reference-parity domain mode")
    pd_.add_argument("--inputs", nargs="+", required=True)
    pd_.add_argument("--output", required=True)
    pd_.add_argument("--prune-regex", action="store_true")
    _add_spark_args(pd_)

    args = ap.parse_args(argv)

    from dedup_domains_spark import get_spark

    spark = get_spark(
        f"dedup-{args.cmd}", parallelism=args.parallelism,
        shuffle_partitions=args.shuffle_partitions, master=args.master,
    )

    if args.cmd == "code":
        from dedup_domains_spark.config import DedupConfig
        from dedup_domains_spark.plans.pipeline import run_pipeline
        from dedup_domains_spark.sources.code_corpus import load_code_corpus
        from dedup_domains_spark.sources.sinks import write_results

        cfg = DedupConfig(
            shingle_k=args.shingle_k, num_perm=args.num_perm,
            bands=args.bands, rows_per_band=args.num_perm // args.bands,
            jaccard_threshold=args.jaccard,
            use_exact_jaccard=args.exact_jaccard,
        )
        corpus = load_code_corpus(spark, args.input)
        res = run_pipeline(
            spark, corpus, cfg,
            passthrough_predicate=args.passthrough,
            checkpoint_dir=args.checkpoint_dir,
        )
        manifest = write_results(res, args.output, config_hash=cfg.config_hash())
        print(json.dumps(manifest))
    else:
        from dedup_domains_spark.operators.domain_mode import (
            dedup_dnsbl, write_survivor_files,
        )
        from dedup_domains_spark.operators.regex_kill import (
            collect_patterns, regex_kill,
        )
        from dedup_domains_spark.sources.dnsbl import load_dnsbl_files

        df = load_dnsbl_files(spark, args.inputs)
        res = dedup_dnsbl(df)
        survivors = res.survivors
        if args.prune_regex:
            survivors = regex_kill(survivors, collect_patterns(df))
            res.survivors = survivors
        files = write_survivor_files(res, args.output)
        import os
        os.makedirs(args.output, exist_ok=True)
        for src, lines in files.items():
            name = os.path.basename(src)
            with open(os.path.join(args.output, name + ".pruned"), "w") as f:
                f.write("".join(l + "\n" for l in lines))
        print(json.dumps({"files": len(files),
                          "survivors": sum(len(v) for v in files.values())}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
