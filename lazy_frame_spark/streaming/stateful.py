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
