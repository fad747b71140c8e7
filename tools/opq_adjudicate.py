"""OPQ adjudication — measured evidence on an ANISOTROPIC fixture.

The repo's synthetic embeddings are near-isotropic (flat covariance
spectrum), so an OPQ rotation provably has nothing to decorrelate there
and recall comparisons on them cannot adjudicate the feature (NEXT.md
round-8 follow-up 3, carried to the round-9 verdict as task 5). This
tool builds the missing fixture: a LOW-RANK-COVARIANCE embedding set
(rank-8 latent in 64 dims + small isotropic noise — the spectrum shape
real text encoders produce after mean-pooling), then measures trained
IVF-PQ recall@10 with and without the parametric-OPQ rotation
(``IVFPQIndex.fit(train_rotation=True)``, Ge et al. CVPR 2013) at the
headline serving knobs, plus a neutrality row on the repo's isotropic
embeddings. Results merge into ANN_RECALL.json under ``"opq"`` so the
decision is a recorded artifact, not prose.

Usage: python tools/opq_adjudicate.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from lazy_frame_spark.operators import similarity as sim  # noqa: E402
from lazy_frame_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ANN_RECALL.json",
)

N, DIM, RANK = 20_000, 64, 8
FIXTURE = "/tmp/lfs_opq_fixture_r8d64"


def build_fixture(spark):
    """Deterministic rank-8 embeddings: X = Z @ W + 0.05·noise, with W's
    rows scaled by a decaying spectrum — covariance has 8 dominant
    eigen-directions, exactly the shape PQ's fixed coordinate split
    handles worst (correlated energy smeared across subspaces)."""
    if not os.path.exists(os.path.join(FIXTURE, "_SUCCESS")):
        rng = np.random.default_rng(7)
        W = rng.normal(size=(RANK, DIM)) * (
            4.0 * np.exp(-np.arange(RANK) / 3.0)[:, None])
        Z = rng.normal(size=(N, RANK))
        X = (Z @ W + 0.05 * rng.normal(size=(N, DIM))).astype(np.float32)
        rows = [(i, [float(x) for x in X[i]]) for i in range(N)]
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>"
        ).repartition(32).write.mode("overwrite").parquet(FIXTURE)
    return spark.read.parquet(FIXTURE)


TEXT_FIXTURE = "/tmp/lfs_opq_fixture_lsa64"


def build_text_fixture(spark, sf_dir):
    """REAL-TEXT-derived embeddings (round-10 verdict task 8's missing
    fixture): the documents table's actual text → hashed TF-IDF
    (md5-bucketed, 4096-dim, log-tf, smooth idf, L2 rows) → truncated
    randomized SVD to 64 dims — i.e. LSA, a genuine (if dated) text
    embedding whose singular spectrum decays the way mean-pooled
    encoder output does, unlike the synthetic low-rank fixture whose
    spectrum is hand-written. Deterministic end-to-end (md5 hashing,
    seeded projection)."""
    import hashlib
    import re

    if not os.path.exists(os.path.join(TEXT_FIXTURE, "_SUCCESS")):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "text").orderBy("doc_id").collect()
        n, buckets = len(docs), 4096
        rows_idx, cols_idx, vals = [], [], []
        word_re = re.compile(r"[a-z0-9]+")
        bucket_cache: dict = {}
        df_count = np.zeros(buckets)
        per_doc = []
        for r in docs:
            counts: dict = {}
            for w in word_re.findall((r["text"] or "").lower()):
                b = bucket_cache.get(w)
                if b is None:
                    b = int(hashlib.md5(w.encode()).hexdigest()[:8],
                            16) % buckets
                    bucket_cache[w] = b
                counts[b] = counts.get(b, 0) + 1
            per_doc.append(counts)
            for b in counts:
                df_count[b] += 1
        idf = np.log((1 + n) / (1 + df_count)) + 1.0
        X = np.zeros((n, buckets), dtype=np.float64)
        for i, counts in enumerate(per_doc):
            for b, c in counts.items():
                X[i, b] = (1 + np.log(c)) * idf[b]
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        X /= np.where(norms == 0, 1.0, norms)
        # randomized truncated SVD (Halko et al. 2011), 2 power iters
        rng = np.random.default_rng(11)
        Y = X @ rng.standard_normal((buckets, 96))
        for _ in range(2):
            Y = X @ (X.T @ Y)
        Q, _ = np.linalg.qr(Y)
        U, S, _ = np.linalg.svd(Q.T @ X, full_matrices=False)
        emb = ((Q @ U)[:, :DIM] * S[:DIM]).astype(np.float32)
        rows = [(int(docs[i]["doc_id"]), [float(x) for x in emb[i]])
                for i in range(n)]
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>"
        ).repartition(32).write.mode("overwrite").parquet(TEXT_FIXTURE)
    return spark.read.parquet(TEXT_FIXTURE)


def recall_grid(e, panel, truth, denom, train_rotation):
    idx = sim.IVFPQIndex.fit(e, n_cells=32, n_sub=16, k=64, seed=7,
                             train_rotation=train_rotation)
    enc = idx.encode(e).cache()
    enc.count()
    grid = {}
    for n_probe in (8, 16):
        for refine in (0, 100):
            hits = sim.ivfpq_panel_hits(
                enc, idx, panel, truth, k=10, n_probe=n_probe,
                refine=refine, label="h").collect()[0]["h"]
            grid[f"probe{n_probe}_refine{refine}"] = round(hits / denom, 3)
    enc.unpersist()
    return grid


def main() -> int:
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1"))
    spark = get_spark("opq-adjudicate")
    spark.sparkContext.setLogLevel("ERROR")

    e = build_fixture(spark).cache()
    e.count()
    panel = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in e.filter(F.col("vec_id") < 20).collect()]
    truth = sim.exact_l2_topk_panel(e, panel, k=10).cache()
    truth.count()
    denom = 10 * len(panel)

    aniso = {
        "no_rotation": recall_grid(e, panel, truth, denom, False),
        "opq_rotation": recall_grid(e, panel, truth, denom, True),
    }
    e.unpersist()
    truth.unpersist()

    # neutrality check on the repo's near-isotropic embeddings: the
    # rotation must not HURT where it has nothing to decorrelate
    iso = {}
    ei = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding").cache()
    ei.count()
    panel_i = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
               for r in ei.filter(F.col("vec_id") < 20).collect()]
    truth_i = sim.exact_l2_topk_panel(ei, panel_i, k=10).cache()
    truth_i.count()
    denom_i = 10 * len(panel_i)
    for label, rot in (("no_rotation", False), ("opq_rotation", True)):
        idx = sim.IVFPQIndex.fit(ei, n_cells=32, n_sub=16, k=64, seed=7,
                                 train_rotation=rot)
        enc = idx.encode(ei).cache()
        enc.count()
        hits = sim.ivfpq_panel_hits(
            enc, idx, panel_i, truth_i, k=10, n_probe=16,
            refine=100, label="h").collect()[0]["h"]
        iso[label] = {"probe16_refine100": round(hits / denom_i, 3)}
        enc.unpersist()
    ei.unpersist()

    # the REAL-TEXT fixture (LSA over the documents table) — the
    # round-10 verdict's missing evidence for the default decision
    et = build_text_fixture(spark, sf_dir).cache()
    et.count()
    panel_t = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
               for r in et.orderBy("vec_id").limit(20).collect()]
    truth_t = sim.exact_l2_topk_panel(et, panel_t, k=10).cache()
    truth_t.count()
    denom_t = 10 * len(panel_t)
    text_lsa = {
        "no_rotation": recall_grid(et, panel_t, truth_t, denom_t, False),
        "opq_rotation": recall_grid(et, panel_t, truth_t, denom_t, True),
    }
    et.unpersist()
    truth_t.unpersist()

    section = {
        "fixture": {"n": N, "dim": DIM, "rank": RANK,
                    "config": "cells=32 sub=16 k=64 trained"},
        "anisotropic": aniso,
        "isotropic_sf_dir": sf_dir,
        "isotropic": iso,
        "text_lsa": {
            "fixture": "documents.parquet -> hashed TF-IDF(4096) -> "
                       "randomized SVD 64d (deterministic LSA)",
            **text_lsa,
        },
    }
    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    merged["opq"] = section
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"opq": section}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
