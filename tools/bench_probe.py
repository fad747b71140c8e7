#!/usr/bin/env python
"""A/B drift probe: time named registry queries N times each in one
session, after the same warmup protocol bench.py uses, and print per-rep
wall-clock. Used to bisect the r9->r10 bench drift (VERDICT r10 task 1):
run the SAME probe at two commits (via a git worktree) and compare
min-of-N, which removes run-to-run variance from the comparison.

Usage: python tools/bench_probe.py q1 q2 ... [--reps=3] [--sf=DIR]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lazy_frame_spark.parity import REGISTRY  # noqa: E402
from lazy_frame_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    spark = get_spark("lazy_frame_spark-probe")
    spark.sparkContext.setLogLevel("ERROR")
    materialize(REGISTRY["lf_dim"].fn(spark, sf_dir))
    warm_dir = "/root/testdata/sf0.001"
    for name in args:
        try:
            materialize(REGISTRY[name].fn(spark, warm_dir))
        except Exception:
            pass
    out: dict[str, list[float]] = {}
    for name in args:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs
        print(f"{name}: {runs} min={min(runs)}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
