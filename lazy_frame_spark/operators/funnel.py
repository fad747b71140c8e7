"""Ordered-sequence funnel analysis over event streams.

"Of the users who did A, how many then did B, then C?" — the standard
product/behavior query over an event log, with strict temporal ordering
(each stage must happen AFTER the user's previous stage) and an optional
per-step conversion window (B within N days of A).

100 TB design: each stage is one filtered slice of the event scan (the
``event_type`` equality pushes down to the source), joined to the
previous stage's per-user frame on ``user_id`` — an equi-join on a
uniformly distributed key, k-1 joins for a k-stage funnel, never a
self-cross of the event log. The per-user stage times stay as ONE wide
frame, so stage counts come from a single aggregation row (count of
non-null per stage) unpivoted driver-side-free with ``explode`` —
no per-stage actions, one job end to end.

Reference parity note: the reference (bwlewis/lazy.frame) has no event
analytics — north-star scope (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage_times(
    events: DataFrame,
    stages: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    max_gap: str | None = None,
) -> DataFrame:
    """Per-user earliest completion time of each funnel stage, in strict
    order: ``(user_col, t1..tk)`` where ``t_i`` is the user's earliest
    stage-i event AFTER their ``t_{i-1}`` (and within ``max_gap`` of it,
    when given — an SQL interval string like ``'1 day'``). Users who
    never reach stage i have ``t_i`` (and all later stages) null.
    """
    if not stages:
        raise ValueError("stages must be non-empty")

    acc = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, stage in enumerate(stages[1:], start=2):
        prev = f"t{i - 1}"
        nxt = events.filter(F.col(type_col) == stage).select(
            F.col(user_col), F.col(ts_col).alias("__ts__")
        )
        cond = F.col("__ts__") > F.col(prev)
        if max_gap is not None:
            cond = cond & (
                F.col("__ts__") <= F.col(prev) + F.expr(f"INTERVAL {max_gap}")
            )
        step = (
            nxt.join(acc.select(user_col, prev), on=user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min("__ts__").alias(f"t{i}"))
        )
        acc = acc.join(step, on=user_col, how="left")
    return acc


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    max_gap: str | None = None,
) -> DataFrame:
    """Reached-user counts per funnel stage: ``(stage_idx, stage,
    n_users)``, monotonically non-increasing by construction. One
    aggregation row over the wide stage-times frame, unpivoted with
    ``explode`` — no per-stage jobs."""
    wide = funnel_stage_times(
        events, stages, ts_col=ts_col, user_col=user_col,
        type_col=type_col, max_gap=max_gap,
    )
    agg = wide.agg(
        *[F.count(f"t{i}").cast("bigint").alias(f"n{i}") for i in range(1, len(stages) + 1)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i, stage in enumerate(stages, start=1)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")
