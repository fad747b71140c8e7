"""Per-row profiling harness for the optimization rounds: run one or
more registry rows through the noop sink with (a) wall-clock min-of-N,
(b) Spark job COUNT via job groups, and (c) a per-library-call timing
breakdown obtained by wrapping the versioned/filestats entry points in
timers. Read-only observability — never changes what a query computes.

Usage: python tools/profile_row.py [--runs N] row [row ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lazy_frame_spark.parity import REGISTRY  # noqa: E402
from lazy_frame_spark.session import get_spark  # noqa: E402

CALLS: list[tuple[str, float]] = []
_DEPTH = [0]


def _wrap(mod, name):
    fn = getattr(mod, name)
    if getattr(fn, "__profiled__", False):
        return

    @functools.wraps(fn)
    def timed(*a, **kw):
        _DEPTH[0] += 1
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            _DEPTH[0] -= 1
            el = time.perf_counter() - t0
            if _DEPTH[0] == 0:  # only top-level calls, no double count
                CALLS.append((name, el))

    timed.__profiled__ = True
    setattr(mod, name, timed)


def instrument():
    from lazy_frame_spark.sources import filestats as FS
    from lazy_frame_spark.sources import versioned as V

    for n in (
        "write_versioned", "append_versioned", "merge_versioned",
        "delete_versioned", "apply_cdc", "relay_changes",
        "replicate_versioned", "diff_versions", "table_changes",
        "cluster_versioned", "cluster_increment", "compact_versioned",
        "build_ndv", "build_blooms", "metadata_ndv",
        "metadata_aggregate", "read_versioned", "purge_dvs",
        "evolve_schema", "rename_column", "restore_versioned",
        "vacuum_versioned", "add_constraint",
    ):
        if hasattr(V, n):
            _wrap(V, n)
    for n in ("write_dir_stats", "write_dir_blooms", "write_dir_ndv",
              "prune_files"):
        if hasattr(FS, n):
            _wrap(FS, n)


def main() -> int:
    args = sys.argv[1:]
    runs = 2
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    rows = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lfs-profile")
    spark.sparkContext.setLogLevel("ERROR")
    instrument()

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # warm: a tiny query + one pass of each row at sf0.001
    materialize(REGISTRY["lf_dim"].fn(spark, sf_dir))
    warm = "/root/testdata/sf0.001"
    for name in rows:
        try:
            materialize(REGISTRY[name].fn(spark, warm))
        except Exception as e:
            print(f"warm {name} failed: {e}", file=sys.stderr)
    CALLS.clear()

    st = spark.sparkContext.statusTracker()
    for name in rows:
        best = None
        best_calls = None
        for r in range(runs):
            CALLS.clear()
            group = f"prof_{name}_{r}_{uuid.uuid4().hex[:6]}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            materialize(REGISTRY[name].fn(spark, sf_dir))
            el = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None)
            jobs = len(st.getJobIdsForGroup(group))
            if best is None or el < best[0]:
                best = (el, jobs)
                best_calls = list(CALLS)
        el, jobs = best
        print(f"\n=== {name}: {el:.3f} s, {jobs} Spark jobs "
              f"(min of {runs}) ===")
        agg: dict[str, list[float]] = {}
        for n, t in best_calls:
            agg.setdefault(n, []).append(t)
        lib_total = 0.0
        for n, ts in sorted(agg.items(), key=lambda kv: -sum(kv[1])):
            lib_total += sum(ts)
            print(f"  {sum(ts):7.3f} s  {n} x{len(ts)} "
                  f"({', '.join(f'{t:.3f}' for t in ts)})")
        print(f"  {el - lib_total:7.3f} s  <other (fixture scans, "
              "streaming, final agg)>")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
