"""IVF-PQ recall sweep — measured evidence for the three serving knobs:
n_cells (index partitioning), n_probe (cell coverage) and refine (exact
re-rank of the ADC shortlist).

Runs the trained-DEFAULT fit (cells=32, sub=16, k=64, Lloyd residual
books + cosine-Lloyd coarse) at $SPARK_GRAFT_SF_DIR (default sf0.1),
sweeps n_probe x refine over a 20-query panel against the exact
squared-L2 top-10, adds the deterministic-coarse comparison rows and an
n_cells sweep (128/512 at proportional probe fractions — the 100 TB
knob story is cells x probe x refine, and the curve must be measured
past 32 cells), and prints ONE JSON line (also merged into
ANN_RECALL.json next to the repo root) so the numbers are a recorded
artifact, not prose.

Usage: python tools/ann_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from lazy_frame_spark.operators import similarity as sim  # noqa: E402
from lazy_frame_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ANN_RECALL.json",
)


def main() -> int:
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1"))
    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding").cache()
    n = e.count()
    idx = sim.IVFPQIndex.fit(e, n_cells=32, n_sub=16, k=64, seed=7)
    enc = idx.encode(e).cache()
    enc.count()
    panel = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in e.filter(F.col("vec_id") < 20).collect()]
    truth = sim.exact_l2_topk_panel(e, panel, k=10).cache()
    truth.count()
    denom = 10 * len(panel)

    grid: dict[str, float] = {}
    for n_probe in (2, 4, 8, 16, 32):
        for refine in (0, 50, 100):
            hits = sim.ivfpq_panel_hits(
                enc, idx, panel, truth, k=10, n_probe=n_probe,
                refine=refine, label="h").collect()[0]["h"]
            grid[f"probe{n_probe}_refine{refine}"] = round(hits / denom, 3)

    # deterministic coarse pick (train_coarse=False — the
    # SQL-reproducible escape): the comparison rows showing what
    # cosine-Lloyd coarse training (the round-9 default above) buys
    idx_u = sim.IVFPQIndex.fit(e, n_cells=32, n_sub=16, k=64, seed=7,
                               train_coarse=False)
    enc_u = idx_u.encode(e).cache()
    enc_u.count()
    for n_probe in (8, 16):
        hits = sim.ivfpq_panel_hits(
            enc_u, idx_u, panel, truth, k=10, n_probe=n_probe,
            refine=100, label="h").collect()[0]["h"]
        grid[f"coarse_untrained_probe{n_probe}_refine100"] = round(
            hits / denom, 3)
    enc_u.unpersist()

    # n_cells sweep at the SAME probe fractions as the headline
    # (probe/cells = 1/4 and 1/2): more cells = finer partition
    # pruning (each probe reads probe/cells of the index) at the cost
    # of coverage per probed cell — the measured trade a 100 TB
    # deployment tunes
    for n_cells in (128, 512):
        idx_n = sim.IVFPQIndex.fit(e, n_cells=n_cells, n_sub=16, k=64,
                                   seed=7)
        enc_n = idx_n.encode(e).cache()
        enc_n.count()
        for n_probe in (n_cells // 4, n_cells // 2):
            hits = sim.ivfpq_panel_hits(
                enc_n, idx_n, panel, truth, k=10, n_probe=n_probe,
                refine=100, label="h").collect()[0]["h"]
            grid[f"cells{n_cells}_probe{n_probe}_refine100"] = round(
                hits / denom, 3)
        enc_n.unpersist()

    result = {
        "metric": "ivfpq_recall_at_10",
        "sf_dir": sf_dir,
        "n_vectors": n,
        "config": {"n_cells": 32, "n_sub": 16, "k": 64,
                   "train_iters": 4, "train_coarse": True,
                   "panel": len(panel)},
        "grid": grid,
    }
    print(json.dumps(result))
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
