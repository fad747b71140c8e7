#!/usr/bin/env python
"""Quantify SemDeDup's cross-cell miss rate (VERDICT r10 task 7).

``similarity.semantic_dedup`` only compares vectors WITHIN a coarse
cell, so a near-dup pair straddling a cell boundary survives by design
(the paper makes the same trade). This measures what that costs at
sf0.1 against numpy brute force:

- pair_recall: fraction of all true near-dup pairs (round(cos,4) >=
  threshold) that land within one cell — the candidate-generation
  recall;
- drop_recall: dropped docs under the celled run / dropped docs under
  the cell-free (n_cells=1) run — the end-to-end effect on the corpus
  (a doc missed through one cross-cell pair can still be dropped via
  another within-cell neighbor, so drop_recall >= pair_recall).

Results merge into ANN_RECALL.json under "semdedup_cross_cell".
Run: python tools/semdedup_recall.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lazy_frame_spark.operators import similarity as sim  # noqa: E402
from lazy_frame_spark.session import get_spark  # noqa: E402

THRESHOLDS = (0.8, 0.85, 0.9)
N_CELLS = (4, 8, 16, 32, 64)

#: planted near-dups: the synthetic embeddings table has NO natural
#: pairs above cos 0.8 (measured — max off-diagonal cosine ~0.6), so
#: the miss-rate experiment plants controlled positives: 20% of the
#: corpus is re-emitted with Gaussian noise sized to land the pair
#: cosine in the 0.82-0.995 band (straddling all three thresholds).
PLANT_FRACTION = 0.2
PLANT_SEED = 20260815


def _plant_near_dups(ids: np.ndarray, X: np.ndarray):
    rng = np.random.default_rng(PLANT_SEED)
    m = int(len(ids) * PLANT_FRACTION)
    src = rng.choice(len(ids), size=m, replace=False)
    # noise scale per clone, spread across the cosine band: for unit
    # vectors, cos(x, x+e) ~ 1/sqrt(1+s^2) with s = |e|/|x|
    s = rng.uniform(0.10, 0.65, size=m)
    base = X[src]
    noise = rng.standard_normal(base.shape)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    clones = base + (s * np.linalg.norm(base, axis=1))[:, None] * noise
    new_ids = ids.max() + 1 + np.arange(m)
    return (np.concatenate([ids, new_ids]),
            np.concatenate([X, clones], axis=0))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("semdedup-recall")
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    rows = src.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids, X = _plant_near_dups(ids, X)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, X)],
        "vec_id long, embedding array<float>",
    )
    X = np.array([[np.float32(x) for x in v] for v in X],
                 dtype=np.float64)  # match the float32 round-trip
    n = len(ids)
    norms = np.linalg.norm(X, axis=1)
    cos = np.round((X @ X.T) / np.outer(norms, norms), 4)

    out: dict = {"sf_dir": sf_dir, "n_vectors": int(n), "grid": []}
    for t in THRESHOLDS:
        # true pairs (i < j by id) and the cell-free single-hop drop set
        hit = (cos >= t) & ~np.eye(n, dtype=bool)
        iu = np.triu(hit, k=1)
        true_pairs = int(iu.sum())
        base_dropped = {int(ids[j]) for j in range(n)
                        if hit[:j, j].any()}
        for k in N_CELLS:
            idx = sim.IVFIndex.fit_deterministic(
                df, k=k, vec_col="embedding", id_col="vec_id")
            cells_rows = idx.with_cells(
                df.selectExpr("vec_id",
                              "cast(embedding as array<double>) as v"),
                vec_col="v",
            ).select("vec_id", "__ivf_cell__").collect()
            cell_of = {r["vec_id"]: r["__ivf_cell__"] for r in cells_rows}
            cvec = np.array([cell_of[int(i)] for i in ids])
            same = cvec[:, None] == cvec[None, :]
            within = int((iu & same).sum())
            survivors = sim.semantic_dedup(
                df, n_cells=k, threshold=t, index=idx
            ).select("vec_id").collect()
            dropped = set(map(int, ids)) - {r["vec_id"] for r in survivors}
            assert dropped <= base_dropped, "celled drop must be a subset"
            out["grid"].append({
                "threshold": t,
                "n_cells": k,
                "true_pairs": true_pairs,
                "within_cell_pairs": within,
                "pair_recall": round(within / true_pairs, 4)
                if true_pairs else None,
                "base_dropped": len(base_dropped),
                "dropped": len(dropped),
                "drop_recall": round(len(dropped) / len(base_dropped), 4)
                if base_dropped else None,
            })
            print(out["grid"][-1], file=sys.stderr)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ANN_RECALL.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc["semdedup_cross_cell"] = out
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
