"""Time the full TPC-H battery (the 19 of 22 shapes the testdata
supports) at a given sf dir, materialized through the noop sink.

Usage: python tools/bench_tpch.py [sf_dir]   (default sf0.1)
Writes one JSON line {"total_sec": ..., "queries": {...}, "sf_dir": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lazy_frame_spark.session import get_spark  # noqa: E402

TPCH = [
    "agg_q1_pricing_summary", "join_q3_revenue", "join_q4_priority_exists",
    "join_q5_local_volume", "agg_q6_forecast_revenue", "join_q7_nation_volume",
    "join_q8_mkt_share", "join_q9_profit_by_nation", "join_q10_returned_topk",
    "join_q12_shipmode_priority", "join_q13_custdist", "join_q14_promo_share",
    "join_q15_top_supplier", "join_q16_supplier_cnt", "join_q17_small_qty",
    "join_q18_large_orders", "join_q19_disjunctive", "join_q21_waiting_supplier",
    "join_q22_dormant_customers",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-tpch")
    from lazy_frame_spark.parity import REGISTRY

    # warm the input file listings/footers so per-query times measure work
    for t in ["lineitem", "orders", "customer", "supplier", "part", "nation",
              "region"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    times = {}
    for name in TPCH:
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        times[name] = round(time.time() - t0, 3)
    out = {
        "total_sec": round(sum(times.values()), 3),
        "queries": times,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
