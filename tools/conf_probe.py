"""Conf probe: same-window A/B of Spark conf candidates on the 4N leg.

The faithful N-vs-4N topology (2 vs 8 executor JVMs x 4 cores) exposes
per-stage fixed costs that the 8-executor leg pays 4x: scheduler locality
waits (spark.locality.wait defaults to 3 s per locality level — on one box
every executor is equally local, so every wait is pure stall) and
shuffle/broadcast compression (the shuffle lives on /dev/shm tmpfs, so
compression buys no IO and costs CPU under a credit-capped hypervisor).

This measures baseline vs tuned workers of the IDENTICAL topology
back-to-back inside one weather window, interleaved A,B per round and
bracketed by the numpy host control, so the delta is attributable to the
conf, not the weather.

Usage: python tools/conf_probe.py [rounds] [rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

TUNED = {
    "spark.locality.wait": "0ms",
    "spark.shuffle.compress": "false",
    "spark.shuffle.spill.compress": "false",
    "spark.broadcast.compress": "false",
    "spark.rdd.compress": "false",
}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else bench.BENCH_ROWS
    corpus = bench._ensure_corpus(rows)
    small = bench._ensure_corpus(rows // 4)

    wa = bench._ScalingWorker(32, 8, tag="_base")
    wb = bench._ScalingWorker(32, 8, conf=TUNED, tag="_tuned")
    wn = bench._ScalingWorker(8, 2, conf=TUNED, tag="_tunedN")
    try:
        for w in (wa, wb, wn):
            w.wait_ready()
        for rnd in range(rounds):
            ctl_pre = bench.host_control(secs=6.0)
            a = wa.run(corpus)
            b = wb.run(corpus)
            n = wn.run(small)
            ctl_post = bench.host_control(secs=6.0)
            drift = bench._control_drift(ctl_pre, ctl_post)
            print(json.dumps({
                "round": rnd,
                "base_fourn_sec": a["wall_sec"],
                "tuned_fourn_sec": b["wall_sec"],
                "tuned_weak_n_sec": n["wall_sec"],
                "tuned_weak_eff": round(
                    b["fps"] / (4.0 * n["fps"]), 3) if n["fps"] else None,
                "speedup": round(a["wall_sec"] / b["wall_sec"], 3),
                "kernel_base_fps": a.get("kernel_fps"),
                "kernel_tuned_fps": b.get("kernel_fps"),
                "drift": round(drift, 2),
                "stable": drift <= 2.0,
                "ts": round(time.time()),
            }), flush=True)
    finally:
        for w in (wa, wb, wn):
            w.close(kill=True)


if __name__ == "__main__":
    main()
