#!/usr/bin/env python
"""Round-11 verdict item 4: MEASURE whether merge-on-read deletion
vectors make point reads pay before building bitmap sidecars.

The suspect cost: ``_read_snapshot`` applies DVs as one left-anti join
on (file, row_index). A point read (bounds/bloom-pruned to a handful of
files) still joins against the WHOLE DV set — the worry is that at a
large deleted fraction the anti-join (and the `_metadata.row_index`
projection it forces) dominates the read. The alternative would be
per-file roaring-style bitmaps loaded only for the files actually
scanned.

Protocol (local[32], warm session, min-of-3 per cell):
  - build a versioned orders table at $SPARK_GRAFT_SF_DIR (sf0.1:
    150k rows, 16 z-ordered files), blooms on o_orderkey
  - MoR-delete 0% / ~10% / ~30% / ~50% of rows (one DV commit each,
    fresh table per fraction so DV files don't accumulate)
  - time (a) a bloom-pruned POINT read (o_orderkey = mid-key),
         (b) a full-table aggregate, on each table
  - compare against the 0% table: the DV overhead is the delta

Writes DV_BENCH.json and prints one JSON line. The go/no-go call from
the run is recorded in SCALE.md ("Round 12: DV anti-join cost").
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


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn, reps: int = 3) -> float:
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return round(best, 4)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lfs-dv-bench")
    spark.sparkContext.setLogLevel("ERROR")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    n_rows = o.count()
    mid = o.approxQuantile("o_orderkey", [0.5], 0.001)[0]
    mid = int(o.filter(F.col("o_orderkey") >= mid)
              .agg(F.min("o_orderkey")).first()[0])

    results = {"sf_dir": sf_dir, "rows": n_rows, "cells": {}}
    for frac_name, mod in [("0pct", None), ("10pct", 10),
                           ("30pct", 10 // 3), ("50pct", 2)]:
        t = f"/tmp/lfs_dvbench_{frac_name}"
        shutil.rmtree(t, ignore_errors=True)
        V.write_versioned(o.repartition(16), t)
        V.cluster_versioned(spark, t, ["o_orderkey"], num_partitions=16)
        V.build_blooms(spark, t, ["o_orderkey"])
        if mod is not None:
            V.delete_versioned(
                spark, t, f"o_custkey % {mod} = 0",
                strategy="merge-on-read")
        man = V._read_manifest(t, V.latest_version(t))
        dv_rows = 0
        for rel in man.get("dv_files", []):
            dv_rows += spark.read.parquet(os.path.join(t, rel)).count()
        # warm each path once (plan compile) before timing
        w = [("o_orderkey", "=", mid)]
        _materialize(V.read_versioned(spark, t, where=w))
        _materialize(V.read_versioned(spark, t)
                     .agg(F.sum("o_totalprice")))
        cell = {
            "dv_rows": dv_rows,
            "point_read_sec": _timed(
                lambda: _materialize(V.read_versioned(spark, t, where=w))),
            "full_agg_sec": _timed(
                lambda: _materialize(
                    V.read_versioned(spark, t)
                    .agg(F.sum("o_totalprice").alias("s")))),
        }
        results["cells"][frac_name] = cell
        shutil.rmtree(t, ignore_errors=True)
    base = results["cells"]["0pct"]
    worst = results["cells"]["50pct"]
    results["point_read_overhead_sec"] = round(
        worst["point_read_sec"] - base["point_read_sec"], 4)
    results["point_read_overhead_x"] = round(
        worst["point_read_sec"] / max(base["point_read_sec"], 1e-9), 2)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "DV_BENCH.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
