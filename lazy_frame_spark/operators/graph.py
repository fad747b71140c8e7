"""Iterative graph algorithms over edge DataFrames — PageRank.

Not in the reference (a single-table engine); the training-data
motivation is link-graph weighting: page/domain importance scores are a
standard feature for web-corpus quality filtering, and the same
join+aggregate iteration shape covers label propagation and the
connected-components pass already in ``operators/dedup.py``.

Scale shape per iteration (the whole algorithm is K repetitions of it):
- one equi-join of the edge table with the current rank vector on ``src``
  (shuffle on the edge key — linear, AQE-skew-splittable),
- one hash aggregation to ``dst`` grain (partial map-side combine),
- a LEFT join of the node set with the new contributions.
The node count and dangling mass stay 1-row lazy frames cross-joined
into the plan (broadcast of a single row — never a ``collect()``), so
the entire K-iteration computation is ONE Catalyst plan and the driver
never materializes intermediate ranks. For large K, pass
``checkpoint_every`` to truncate lineage the same way
``dedup.duplicate_clusters`` does (localCheckpoint; plan depth is the
classic failure mode of iterative Spark, not data volume).

Dangling nodes (no out-edges) redistribute their mass uniformly — the
standard stochastic-matrix completion, which keeps ``sum(rank) == 1``
at every iteration (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 3,
    damping: float = 0.85,
    round_to: int | None = None,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Weighted PageRank after ``iters`` power iterations; returns
    (node, rank). ``weight=None`` treats every edge as weight 1;
    multi-edges should be pre-aggregated by the caller (their weights
    add). ``round_to`` rounds the final rank so cross-engine float
    accumulation-order jitter cannot flip an oracle hash."""
    w = (F.col(weight) if weight else F.lit(1)).cast("double")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    n1 = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))  # 1-row, lazy
    outw = e.groupBy("src").agg(F.sum("w").alias("wout"))

    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for it in range(iters):
        dang = (
            ranks.join(outw, ranks["node"] == outw["src"], "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dang"))
        )  # 1-row, lazy
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), on="src")
            .join(outw, on="src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("w") / F.col("wout")).alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n1))
            .crossJoin(F.broadcast(dang))
            .join(contrib, on="node", how="left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / F.col("n")
                    )
                ).alias("r"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.withColumnRenamed("r", "rank")
    if round_to is not None:
        out = out.select("node", F.round(F.col("rank"), round_to).alias("rank"))
    return out
