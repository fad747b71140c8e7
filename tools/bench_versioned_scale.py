"""Scale-shape evidence for the versioned keyed-maintenance family
(round-15 verdict item 7): the O(changed-files) claim as DATA instead
of an architecture argument.

Builds a versioned table from sf0.1 orders replicated K x (keys
shifted per replica so density is preserved), at K=1 and K=10, with
the SAME file size per file (so files grow ~10x in count, the
production shape), then times the operators whose cost must track the
CHANGE SET, not the table:

- merge_versioned of a fixed ~3k-key update band
- diff_versions across that merge (O(changed files) file cancellation)
- replicate_versioned relay of the same change into a replica
- a where-pruned read of the band (data skipping)

If the engine's shape claims hold, each time is ~flat from K=1 to
K=10 while rows and files grow 10x; the one intentionally O(table)
step (the initial snapshot write + replica bootstrap) is reported for
contrast. Writes VERSIONED_SCALE.json.

Usage: python tools/bench_versioned_scale.py [k1 k2 ...]  (default 1 10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lazy_frame_spark.session import get_spark  # noqa: E402
from lazy_frame_spark.sources import versioned as V  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def orders_k(spark, k: int):
    """sf0.1 orders replicated k x with shifted keys (density kept)."""
    o = (spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
         .select("o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderstatus"))
    span = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    reps = spark.range(k).select(F.col("id").alias("__rep__"))
    return (o.crossJoin(reps)
            .withColumn("o_orderkey",
                        F.col("o_orderkey") + F.col("__rep__") * span)
            .drop("__rep__")), span


def timed(out: dict, label: str, fn):
    t0 = time.perf_counter()
    r = fn()
    el = round(time.perf_counter() - t0, 3)
    out[label] = el
    print(f"  {el:8.3f} s  {label}")
    return r


def run_scale(spark, k: int) -> dict:
    t = f"/tmp/lfs_vscale_{k}"
    dst = f"/tmp/lfs_vscale_dst_{k}"
    shutil.rmtree(t, ignore_errors=True)
    shutil.rmtree(dst, ignore_errors=True)
    df, span = orders_k(spark, k)
    n_rows = df.count()
    # file count scales with data (fixed rows/file): the production
    # layout, so "touched files" is a strict subset that must not grow
    n_files = max(8, 8 * k)
    out: dict = {"k": k, "rows": n_rows}
    timed(out, "snapshot_write_O_table", lambda: V.write_versioned(
        df.repartitionByRange(n_files, "o_orderkey"), t))
    out["n_files"] = len(V._read_manifest(t, 1)["files"])
    timed(out, "replica_bootstrap_O_table", lambda: V.replicate_versioned(
        spark, t, dst, "o_orderkey"))
    # fixed-size change set: ~3000 keys in one band of ONE replica —
    # the CDC shape (updates touch a recent key range)
    lo, hi = span - 3000, span - 1  # tail band of replica 0's keyspan
    batch = (df.filter(F.col("o_orderkey").between(lo, hi))
             .withColumn("o_totalprice", F.col("o_totalprice") * 2))
    out["batch_rows"] = batch.count()
    _, st = timed(out, "merge_fixed_band", lambda: V.merge_versioned(
        spark, t, batch, "o_orderkey"))
    out["merge_stats"] = {m: st.get(m) for m in (
        "files_rewritten", "files_carried", "files_scan_skipped",
        "files_written", "probe_jobs")}
    timed(out, "diff_across_merge", lambda: V.diff_versions(
        spark, t, 1, 2).write.format("noop").mode("overwrite").save())
    _, rst = timed(out, "replicate_relay", lambda: V.replicate_versioned(
        spark, t, dst, "o_orderkey"))
    out["relay_stats"] = {m: rst.get(m) for m in (
        "ops", "files_rewritten", "files_carried", "files_written")}
    timed(out, "pruned_band_read", lambda: V.read_versioned(
        spark, t, where=[("o_orderkey", "between", (lo, hi))])
        .write.format("noop").mode("overwrite").save())
    shutil.rmtree(t, ignore_errors=True)
    shutil.rmtree(dst, ignore_errors=True)
    return out


def main() -> int:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("lfs-vscale")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the operator paths once at the smallest scale
    print("warmup k=1 ...")
    run_scale(spark, 1)
    results = []
    for k in ks:
        print(f"=== scale k={k}")
        results.append(run_scale(spark, k))
    doc = {"sf_dir": SF_DIR, "scales": results}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "VERSIONED_SCALE.json"), "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print("wrote VERSIONED_SCALE.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
