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


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count of the undirected graph, degree-oriented.

    The naive 3-way self-join is cubic on hub nodes; the standard fix
    (node-iterator with degree orientation) orients every edge from the
    (degree, id)-smaller endpoint to the larger, which bounds every
    node's OUT-degree by O(sqrt(m)) regardless of in-degree — so the
    wedge join is m^1.5 worst-case instead of sum(deg²), the difference
    between hours and forever on a power-law web graph.

    Plan: canonical-dedup the edge list, one degree aggregation, two
    broadcast-or-shuffle equi-joins to attach endpoint degrees, the
    wedge self-join on the oriented source, and one closing equi-join.
    Every join key is a node id — uniform after orientation, AQE handles
    residual skew. Wedge endpoints are ordered by the SAME (degree, id)
    tuple as the orientation, so the closing edge of wedge (x, y) can
    only be the oriented edge s=x, t=y — a pure equi-join, each triangle
    counted exactly once.

    Returns a 1-row frame ``(n_triangles)``.
    """
    u, v = F.col(src), F.col(dst)
    e = (
        edges.select(
            F.least(u, v).alias("u"), F.greatest(u, v).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ed = e.join(du, on="u").join(dv, on="v")
    u_first = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    o = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dt"),
    )
    a, b = o.alias("a"), o.alias("b")
    wedges = a.join(
        b,
        (F.col("a.s") == F.col("b.s"))
        & (
            F.struct(F.col("a.dt"), F.col("a.t"))
            < F.struct(F.col("b.dt"), F.col("b.t"))
        ),
    ).select(F.col("a.t").alias("x"), F.col("b.t").alias("y"))
    closed = wedges.join(
        o, (F.col("x") == F.col("s")) & (F.col("y") == F.col("t"))
    )
    return closed.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
