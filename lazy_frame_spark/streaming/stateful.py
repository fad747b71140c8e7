"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for stream logic the built-in window/dedup operators
can't express (here: a per-user running profile that emits an updated
row on every micro-batch and expires idle users via processing-time
timeouts).

Built-ins first: tumbling/sliding/session windows and
dropDuplicatesWithinWatermark (streaming/windows.py) cover the standard
cases with RocksDB-backed state for free; reach for this only when state
transitions are genuinely bespoke. State is one small tuple per key —
bounded by key cardinality, not stream length — and the timeout bounds
idle-key retention, which is what makes it viable on an unbounded
100 TB/day stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def running_user_profile(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Streaming per-user running (count, value-sum), updated every batch.

    Batch-mode equivalent (what the oracle checks): plain
    ``groupBy(user_id).agg(count, round(sum(value), 2))``.

    ``idle_timeout_ms`` expires idle users'' state — pass it ONLY with a
    continuous trigger: with ``Trigger.AvailableNow`` a processing-time
    timeout keeps scheduling timeout-check batches and the query never
    terminates (observed; hence default None = NoTimeout).

    The update function is a CLOSURE, not a module-level function, on
    purpose: cloudpickle ships closures by value, so Python workers never
    need this package importable on their own sys.path (a module-level
    function pickles as an import reference and breaks whenever the
    driver's cwd isn't the repo root).
    """

    def update_profile(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield _pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_profile,
            outputStructType=RUNNING_PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def streaming_funnel(
    events: DataFrame,
    stages: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Stateful streaming funnel: per user, the furthest stage reached
    under STRICT ordering (each stage's event must be later than the
    user's previous stage time), updated every micro-batch.

    State per user is one tuple (stage_idx, t_prev_micros) — bounded by
    user cardinality, not stream length. Within a batch the group's rows
    sort by event time; across batches the operator is exact when
    micro-batches arrive in event-time order (the Kafka-partition-per-
    key deployment), and otherwise degrades exactly like any
    order-sensitive stateful stream op would.

    Output (update mode): ``(user, stage_idx, stage, t_stage)`` — the
    user's current funnel position after the batch. Batch equivalence
    (tests): the final row per user equals operators/funnel
    .funnel_stage_times' deepest non-null stage.
    """
    n_stages = len(stages)
    if n_stages == 0:
        raise ValueError("stages must be non-empty")
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("stage_idx", LongType()),
            StructField("stage", StringType()),
            StructField("t_stage", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("stage_idx", LongType()),
            StructField("t_prev", LongType()),
        ]
    )

    def update_funnel(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        idx, t_prev = state.get if state.exists else (0, -1)
        for pdf in batches:
            pdf = pdf.sort_values(ts_col)
            for ts, typ in zip(
                pdf[ts_col].astype("int64"), pdf[type_col]
            ):
                if idx < n_stages and typ == stages[idx] and ts > t_prev:
                    idx += 1
                    t_prev = int(ts)
        state.update((idx, t_prev))
        if idx > 0:
            yield _pd.DataFrame(
                {
                    "user_id": [user_id],
                    "stage_idx": [idx],
                    "stage": [stages[idx - 1]],
                    "t_stage": [t_prev],
                }
            )

    return (
        events.select(user_col, ts_col, type_col)
        .groupBy(user_col)
        .applyInPandasWithState(
            update_funnel,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
