"""cap_tokens_per_group pre-cut crossover microbenchmark: measures the
``pre_cut`` knob on both regimes its docstring describes, so the
guidance is a recorded number instead of an assertion
(round-9 verdict task 6).

Two synthetic corpora, same row count:

- SKEWED: one hot group owns ``skew_frac`` (default 0.7) of all rows —
  the anti-spam shape the pre-cut exists for. Without it, the global
  rank window serializes the hot group through ONE task.
- BALANCED: rows spread uniformly over ``n_groups`` groups — the
  regime where the pre-cut's second local-window pass is pure
  overhead (every group is already small).

Each (corpus, pre_cut) cell is timed min-of-3 on a fully materialized
count; result rows are also cross-checked equal between the two knob
settings (the pre-cut is an optimization, never a semantics change).

Usage: python tools/bench_precut.py [n_rows] [n_groups] [skew_frac]

Prints one JSON line; SCALE.md records representative numbers and the
``cap_tokens_per_group`` docstring cites the crossover guidance.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lazy_frame_spark.operators.mixing import cap_tokens_per_group
from lazy_frame_spark.session import get_spark


def build(spark, n_rows: int, n_groups: int, skew_frac: float | None):
    """(group, tokens, order id) rows; skew_frac=None means uniform."""
    base = spark.range(n_rows)
    # pmod, not %: xxhash64 is signed and Java remainder keeps the
    # dividend's sign, which would silently double the group count
    # (~2x n_groups distinct ids) and mislabel the 'balanced' regime
    if skew_frac is None:
        grp = F.pmod(F.xxhash64("id"), F.lit(n_groups)).cast("bigint")
    else:
        grp = (
            F.when(F.col("id") < int(n_rows * skew_frac), F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_groups)))
            .cast("bigint")
        )
    return base.select(
        grp.alias("grp"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(900)) + 100)
        .cast("bigint")
        .alias("tokens"),
        F.col("id").alias("doc_id"),
    ).repartition(32)


def time_cell(df, budget: int, pre_cut: bool, reps: int = 3) -> tuple[float, int]:
    best, rows = float("inf"), -1
    for _ in range(reps):
        t0 = time.time()
        rows = cap_tokens_per_group(
            df, ["grp"], budget, "tokens", ["doc_id"], pre_cut=pre_cut
        ).count()
        best = min(best, time.time() - t0)
    return round(best, 3), rows


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    n_groups = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    skew_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.7
    spark = get_spark("bench-precut")
    spark.sparkContext.setLogLevel("ERROR")

    # budget keeps ~half of an average group's tokens so the cut is real
    avg_tokens = 550
    budget = int(avg_tokens * (n_rows / n_groups) / 2)

    out: dict = {
        "metric": "cap_tokens_per_group_precut_crossover",
        "n_rows": n_rows,
        "n_groups": n_groups,
        "skew_frac": skew_frac,
        "budget": budget,
        "unit": "sec",
    }
    for label, frac in (("skewed", skew_frac), ("balanced", None)):
        df = build(spark, n_rows, n_groups, frac).persist()
        df.count()
        cell = {}
        kept = {}
        for pc in (True, False):
            cell[f"pre_cut_{pc}"], kept[pc] = time_cell(df, budget, pc)
        assert kept[True] == kept[False], (
            f"pre-cut changed results on {label}: {kept}"
        )
        cell["rows_kept"] = kept[True]
        out[label] = cell
        df.unpersist()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
