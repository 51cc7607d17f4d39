"""Per-stage scaling probe: WHERE does the 4N leg lose efficiency?

Runs the full pipeline in probe mode (run_pipeline(stage_times=...) — every
stage materialized eagerly with a count barrier) at the two honest-topology
legs of the BASELINE gate:

  N  leg: BENCH_ROWS/4 rows on local-cluster[1,4,6144]  (1 executor)
  4N leg: BENCH_ROWS   rows on local-cluster[4,4,6144]  (4 executors)

(the round-5 final shape — the 4N leg stays at 16 cores, inside this
box's memory-bandwidth knee; see bench.run_scaling / BENCH.md §8)

and prints each stage's wall on both legs plus the per-stage weak-scaling
ratio T_N / T_4N (1.0 = the stage absorbs 4x data on 4x executors in the
same wall; < 0.8 = this stage is what drags the gate ratio down). Probe
walls serialize the normally-overlapping containment branch, so the TOTAL
here is slower than production — only the per-stage ratios are the signal.

Each leg runs in its own subprocess (one JVM topology per process, like
bench.py's scaling workers), warmed with a tiny pipeline first; legs run
back-to-back so both sit in one hypervisor weather window.

Usage: python tools/stage_probe.py [--rows 240000] [--reps 2]
       python tools/stage_probe.py --leg <rows> <execs> <cores>   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(rows: int, execs: int, cores: int) -> dict:
    from bench import _ensure_corpus
    from dedup_domains_spark import DedupConfig, get_spark
    from dedup_domains_spark.datagen import gen_code_corpus
    from dedup_domains_spark.plans.pipeline import run_pipeline

    par = execs * cores
    spark = get_spark(
        f"stage-probe-{execs}x{cores}", parallelism=par,
        shuffle_partitions=par,
        master=f"local-cluster[{execs},{cores},6144]",
        extra_conf={"spark.executor.memory": "4g"},
    )
    warm = spark.createDataFrame(gen_code_corpus(300).files)
    run_pipeline(spark, warm, DedupConfig()).survivors.count()
    spark.catalog.clearCache()

    corpus = _ensure_corpus(rows)
    df = spark.read.parquet(corpus)
    stage_times: dict = {}
    t0 = time.time()
    res = run_pipeline(spark, df, DedupConfig(), stage_times=stage_times)
    t_surv = time.time()
    res.survivors.count()
    stage_times["survivors"] = round(time.time() - t_surv, 2)
    stage_times["TOTAL"] = round(time.time() - t0, 2)
    spark.stop()
    return stage_times


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        rows, execs, cores = (int(x) for x in sys.argv[2:5])
        print("STAGES " + json.dumps(run_leg(rows, execs, cores)), flush=True)
        return

    rows = 240000
    reps = 2
    args = sys.argv[1:]
    if "--rows" in args:
        rows = int(args[args.index("--rows") + 1])
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])

    def spawn(leg_rows: int, execs: int, cores: int) -> dict:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg",
             str(leg_rows), str(execs), str(cores)],
            capture_output=True, text=True, timeout=3600,
        )
        for ln in p.stdout.splitlines():
            if ln.startswith("STAGES "):
                return json.loads(ln[len("STAGES "):])
        sys.stderr.write(p.stderr[-3000:] + "\n")
        raise RuntimeError(f"leg {execs}x{cores} produced no STAGES line")

    best_n: dict = {}
    best_4n: dict = {}
    for r in range(reps):
        t0 = time.time()
        leg_4n = spawn(rows, 4, 4)
        leg_n = spawn(rows // 4, 1, 4)
        print(f"[rep {r}] paired walls: 4N={leg_4n['TOTAL']}s "
              f"N={leg_n['TOTAL']}s  ({round(time.time() - t0)}s incl "
              f"spin-up)", file=sys.stderr, flush=True)
        for k, v in leg_4n.items():
            best_4n[k] = min(best_4n.get(k, v), v)
        for k, v in leg_n.items():
            best_n[k] = min(best_n.get(k, v), v)

    print(f"{'stage':<16}{'N(60k/1ex)':>12}{'4N(240k/4ex)':>14}{'ratio':>8}")
    for k in best_4n:
        if k == "cc_iterations":
            print(f"{k:<16}{best_n.get(k, 0):>12}{best_4n[k]:>14}")
            continue
        n_v, f_v = best_n.get(k, 0.0), best_4n[k]
        ratio = round(n_v / f_v, 3) if f_v else None
        print(f"{k:<16}{n_v:>12}{f_v:>14}{ratio!s:>8}")
    print(json.dumps({"n": best_n, "fourn": best_4n}))


if __name__ == "__main__":
    main()
