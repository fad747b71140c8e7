"""Skew-join measurement: one hot key owning 50% of a 4M-row fact side,
joined to a 200k-key dimension. Compares three plans:

  aqe_off : plain sort-merge join, no AQE — the straggler baseline
  aqe     : AQE skew-join splitting (spark.sql.adaptive.skewJoin)
  salted  : explicit salting (operators.joins.salted_join)

Prints one JSON line; feeds the SCALE.md skew section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from lazy_frame_spark.operators.joins import salted_join  # noqa: E402
from lazy_frame_spark.session import get_spark  # noqa: E402

N_FACT = 4_000_000
N_KEYS = 200_000


def build(spark):
    fact = spark.range(0, N_FACT, 1, 64).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))  # 50% of rows on key 0
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .alias("k"),
        (F.rand(5) * 100).alias("v"),
    )
    dim = spark.range(0, N_KEYS).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    return fact, dim


def run(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> int:
    spark = get_spark("bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle joins
    fact, dim = build(spark)
    fact.persist().count()
    dim.persist().count()

    def agg(j):
        return j.groupBy("label").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t_plain = run(agg(fact.join(dim, "k")))

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t_aqe = run(agg(fact.join(dim, "k")))

    t_salted = run(agg(salted_join(fact, dim, on="k", salt_buckets=32)))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    print(json.dumps({
        "metric": "skew_join_sec",
        "n_fact": N_FACT, "hot_key_share": 0.5,
        "plain_smj_sec": t_plain, "aqe_skew_sec": t_aqe, "salted_sec": t_salted,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
