"""Skewed-join microbenchmark: AQE skew-split vs explicit salting vs a
plain sort-merge join, on a synthetic workload where ONE key owns half of
the fact rows (the adversarial shape for a shuffled equi-join).

Usage: python tools/bench_skew.py [n_fact_rows] [n_keys] [skew_frac]

Generated in-memory via spark.range (no files): the first ``skew_frac``
(default 0.5) of fact rows all carry key 0 — pass 0.9 for the
pathological regime where one key owns 90% of the shuffle and a plain
SMJ degenerates to a single straggler task — the rest spread uniformly
over n_keys; the dim has one row per key
with a payload column. Broadcast is disabled so the join actually shuffles
— at 100 TB the dim side of a skewed join is rarely broadcastable, which
is exactly when skew hurts. The query is join + per-key aggregate.

Prints one JSON line per strategy; SCALE.md records representative numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lazy_frame_spark.session import get_spark


def build(spark, n_fact: int, n_keys: int, skew_frac: float = 0.5):
    fact = spark.range(n_fact).select(
        F.when(F.col("id") < int(n_fact * skew_frac), F.lit(0))
        .otherwise((F.xxhash64("id") % n_keys))
        .cast("bigint")
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("payload")
    )
    return fact, dim


def run_join(fact, dim, strategy: str, agg_col: str):
    from lazy_frame_spark.operators.joins import salted_join

    if strategy == "salted":
        j = salted_join(fact, dim, on="k", salt_buckets=32)
    elif strategy == "salted_auto":
        # heavy-hitter-sampled sizing: one tiny sample job, then the same
        # salted plan with a data-derived bucket count
        j = salted_join(fact, dim, on="k", salt_buckets="auto")
    else:
        j = fact.join(dim, "k")
    return j.groupBy(agg_col).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("sv")
    )


def main() -> None:
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    skew_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    spark = get_spark()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    configs = [
        # (label, AQE on, skewJoin on, strategy)
        ("smj_no_aqe", "false", "false", "plain"),
        ("smj_aqe_skew", "true", "true", "plain"),
        ("salted", "true", "false", "salted"),
        ("salted_auto", "true", "false", "salted_auto"),
    ]
    # inputs persisted once so the timings isolate the JOIN stage (the
    # skewed shuffle + reduce), not the row generation both plans share
    fact, dim = build(spark, n_fact, n_keys, skew_frac)
    fact = fact.persist()
    dim = dim.persist()
    fact.count(), dim.count()

    results = {}
    # two downstream shapes: aggregating by the JOIN key means a split of
    # the skewed partition must re-shuffle for the agg (AQE skips the
    # split unless forced); aggregating by a dim column needs its own
    # shuffle regardless, so the split is free to fire.
    for agg_col in ("k", "payload"):
        for label, aqe, skew, strategy in configs:
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew)
            # force skew detection at bench scale (defaults target GB-size
            # partitions; the 10 MB threshold keeps the DEMONSTRATION
            # honest — at real scale the default threshold fires the same)
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10m"
            )
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
            spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", skew)
            out = run_join(fact, dim, strategy, agg_col)
            out.count()  # warm the codegen path once
            t0 = time.monotonic()
            out.count()
            results[f"{label}_by_{agg_col}"] = round(time.monotonic() - t0, 3)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    print(json.dumps(
        {"n_fact": n_fact, "n_keys": n_keys, "skew_frac": skew_frac, "sec": results}
    ))


if __name__ == "__main__":
    main()
