"""Hot-key as-of join microbenchmark: plain single-window carry vs the
(key, time-bucket) pre-split, on a workload where ONE key owns most of
the events — the adversarial shape for any per-key window (AQE cannot
split a window partition, so the hot key stalls one task no matter how
many executors exist).

Usage: python tools/bench_asof_skew.py [n_left] [hot_frac] [n_buckets]

Generated in-memory via spark.range. Prints one JSON line; SCALE.md
records representative numbers. Correctness equivalence of the two
paths is pinned separately by tests/test_operators.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lazy_frame_spark.session import get_spark


def build(spark, n_left: int, hot_frac: float):
    n_keys = 1000
    left = spark.range(n_left).select(
        F.when(F.col("id") < int(n_left * hot_frac), F.lit(0))
        .otherwise(1 + F.xxhash64("id") % n_keys)
        .cast("bigint")
        .alias("uid"),
        F.col("id").cast("double").alias("t"),
        (F.col("id") % 1000).cast("double").alias("x"),
    )
    right = spark.range(n_left // 20).select(
        F.when(F.col("id") < int(n_left // 20 * hot_frac), F.lit(0))
        .otherwise(1 + F.xxhash64("id") % n_keys)
        .cast("bigint")
        .alias("uid"),
        (F.col("id") * 17.0 % n_left).alias("rt"),
        (F.col("id") * 1.5).alias("v"),
    )
    return left, right


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from lazy_frame_spark.operators.joins import asof_join

    left, right = build(spark, n_left, hot_frac)
    left = left.persist()
    right = right.persist()
    left.count(), right.count()

    results = {}
    for label, tb in (("plain_window", 1), ("time_bucketed", n_buckets)):
        # a FRESH plan per run: re-collecting the same DataFrame object
        # reuses its already-materialized shuffle stages and times ~0
        def run():
            q = asof_join(left, right, "uid", "t", "rt", ["v"], time_buckets=tb)
            q.agg(
                F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("sv")
            ).collect()

        run()  # warm codegen
        t0 = time.monotonic()
        run()
        results[label] = round(time.monotonic() - t0, 3)
    print(json.dumps({
        "n_left": n_left, "hot_frac": hot_frac, "n_buckets": n_buckets,
        "sec": results,
    }))


if __name__ == "__main__":
    main()
