"""Head-to-head with the reference's published 'medium' benchmark
(BASELINE.md / inst/doc/lazy.frame.Rnw:333-420):

  dataset: 18M rows x 27 cols CSV (~2 GB; 2 character, 3 double, 22 int)
  open   : reference 4.39 s (newline-index build, Opteron/SSD)
  filter : col20 > 0 -> 95,166 rows; reference 23.4 s on 3 threads

This script synthesizes the same-shaped CSV (deterministic, seeded,
col20 > 0 with probability tuned to land near 95k matches), then times
the engine's equivalents:

  open   = LazyFrame.open (default verified sample-infer: schema from a
           driver-side head peek, no inference job) + positional-id
           enumerate + max id — the comparable to the reference's
           newline-index build (both walk the bytes to locate rows;
           neither parses fields; cache=True opens additionally verify
           the sampled schema for free inside their cache build)
  filter = the WHICH scan: count of matching rows via typed_compare

Usage: python tools/bench_medium.py [n_rows]   (default 18_000_000)
Writes one JSON line; safe to re-run (reuses the generated CSV).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from lazy_frame_spark import LazyFrame  # noqa: E402
from lazy_frame_spark.session import get_spark  # noqa: E402

CSV_DIR = "/tmp/lfs_medium_csv"


def generate(spark, n_rows: int) -> None:
    if os.path.exists(os.path.join(CSV_DIR, "_SUCCESS")):
        return
    df = spark.range(0, n_rows, 1, 64)
    cols = [
        F.concat(F.lit("cat"), (F.col("id") % 97).cast("string")).alias("c1"),
        F.concat(F.lit("grp"), (F.col("id") % 13).cast("string")).alias("c2"),
        F.round(F.rand(1) * 1000, 4).alias("d1"),
        F.round(F.rand(2) * 1.0, 6).alias("d2"),
        F.round(F.rand(3) * 1e6, 2).alias("d3"),
    ]
    for i in range(1, 23):
        if i == 20:
            # rare positives: ~95k of 18M (the reference's selectivity)
            cols.append(
                F.when(F.rand(100) < 95_166 / 18_000_000, (F.rand(101) * 100).cast("int") + 1)
                .otherwise(-((F.rand(102) * 100).cast("int")) - 1)
                .alias("col20")
            )
        else:
            cols.append(((F.rand(10 + i) * 2000).cast("int") - 1000).alias(f"i{i}"))
    out = df.select(*cols)
    out.write.mode("overwrite").option("header", "false").csv(CSV_DIR)


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 18_000_000
    spark = get_spark("bench-medium")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    generate(spark, n_rows)
    gen_s = round(time.perf_counter() - t0, 2)
    size_gb = round(
        sum(
            os.path.getsize(os.path.join(CSV_DIR, f))
            for f in os.listdir(CSV_DIR)
            if f.endswith(".csv")
        )
        / 1e9,
        2,
    )

    # open + enumerate: the DEFAULT sample-infer path — schema from a
    # ~1000-line driver-side head peek (no full-scan job; the old
    # default paid a whole dedicated inferSchema pass), ids from the
    # pruned line-count scan. This is the honest comparable to the
    # reference's 4.39 s newline-index build: both walk the bytes to
    # locate rows, neither parses fields (the reference samples 5 rows
    # for types and never verifies; this path samples 1000 — the
    # cache=True/register() paths additionally VERIFY the schema for
    # free inside their full-width cache build). cache=False so the
    # filter benchmark below still scans the file like the reference.
    # sacrificial warmup (same protocol bench.py records): one tiny job
    # through the same CSV reader shape compiles the codegen/classloads
    # a first-job-in-session would otherwise charge to the open timing —
    # the reference's 4.39 s likewise timed the index build inside a
    # warm R session, not R startup.
    warm = LazyFrame.open(spark, CSV_DIR, format="csv", header=False,
                          cache=False, infer_schema="sample")
    warm.to_df().limit(1024).count()

    t0 = time.perf_counter()
    lf = LazyFrame.open(spark, CSV_DIR, format="csv", header=False, cache=False)
    ncol = lf.ncol()
    n_ids = lf._with_ids().agg(F.max("__row_id__")).collect()[0][0]
    open_s = round(time.perf_counter() - t0, 2)

    # the reference's benchmark filter: col20 > 0 (column 20, int domain),
    # full predicate scan over the CSV
    # the rare column is named col20 (headerless open names it by position
    # V25; resolve by position in the generated layout)
    col20_name = lf.names()[24]
    t0 = time.perf_counter()
    n_match = lf.filter(col20_name, ">", 0).to_df().count()
    filter_s = round(time.perf_counter() - t0, 2)

    # second scan (page-cached, like the reference's warm runs)
    t0 = time.perf_counter()
    lf.filter(col20_name, ">", 0).to_df().count()
    filter_warm_s = round(time.perf_counter() - t0, 2)

    result = {
        "metric": "medium_filter_sec",
        "value": filter_s,
        "unit": "sec",
        "n_rows": n_rows,
        "ncol": ncol,
        "csv_gb": size_gb,
        "gen_sec": gen_s,
        "open_sec": open_s,
        "filter_matches": n_match,
        "filter_warm_sec": filter_warm_s,
        "n_ids": n_ids,
        "open_protocol": (
            "default sample-infer open (1000-line driver-side head peek, "
            "no inference job) + positional-id enumerate + max(__row_id__)"
            " — the newline-index-build comparable; one untimed "
            "sacrificial reader warmup precedes it (codegen/classload, "
            "same as bench.py's recorded protocol)"
        ),
        "reference": {"open_sec": 4.39, "filter_sec_3threads": 23.4,
                      "filter_matches": 95_166},
    }
    result["ratio_filter_vs_reference"] = round(filter_s / 23.4, 3)
    result["ratio_open_vs_reference"] = round(open_s / 4.39, 3)
    print(json.dumps(result))
    from _repro import record_repro

    record_repro("medium", result)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
