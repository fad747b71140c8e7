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


def _topk_merge(pairs: list[tuple], k: int) -> list[tuple]:
    """Keep the k largest (value desc, id asc tie-break — deterministic
    across engines and batch orders). Ids stay in their native type
    (int, str, ...) — only the value is coerced to float."""
    pairs.sort(key=lambda p: (p[1], p[0]))
    pairs.sort(key=lambda p: p[1], reverse=True)
    return [(i, float(v)) for i, v in pairs[:k]]


def running_topk(
    events: DataFrame,
    k: int = 3,
    key_col: str = "event_type",
    id_col: str = "event_id",
    val_col: str = "value",
) -> DataFrame:
    """Per-key running top-k leaderboard, updated every micro-batch.

    State per key is at most k (id, value) pairs — bounded by k × key
    cardinality regardless of stream length, which is what keeps an
    unbounded "biggest events ever seen" tracker viable. Each batch
    merges its rows with the retained k, keeps the k largest (value
    desc, id asc tie-break), writes them back, and emits the key's
    refreshed leaderboard (update mode).

    Batch equivalent (the oracle): ``row_number() OVER (PARTITION BY key
    ORDER BY value DESC, id)`` ≤ k. See ``running_topk_tws`` for the
    same operator on Spark 4's successor API.
    """
    from pyspark.sql.types import ArrayType, IntegralType, NumericType

    id_dt = events.schema[id_col].dataType
    val_dt = events.schema[val_col].dataType
    if not isinstance(val_dt, NumericType):
        raise TypeError(
            f"running_topk: val_col {val_col!r} must be numeric, got {val_dt}"
        )
    # state types DERIVED from the input schema: integral ids
    # (byte/short/int/long) persist as long; everything else — string,
    # float/double/decimal — keeps its own type untouched, so a
    # fractional id is never astype('int64')-truncated
    integral_id = isinstance(id_dt, IntegralType)
    state_id_dt = LongType() if isinstance(id_dt, LongType) else id_dt

    out_schema = StructType(
        [
            StructField(key_col, events.schema[key_col].dataType),
            StructField("rank", LongType()),
            StructField(id_col, id_dt),
            StructField(val_col, DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ids", ArrayType(state_id_dt)),
            StructField("vals", ArrayType(DoubleType())),
        ]
    )

    def update_topk(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        (key_val,) = key
        if state.hasTimedOut:
            state.remove()
            return
        ids, vals = state.get if state.exists else ([], [])
        pairs = list(zip(ids, (float(v) for v in vals)))
        for pdf in batches:
            id_vals = (
                pdf[id_col].astype("int64")
                if integral_id
                else pdf[id_col]
            )
            pairs.extend(zip(id_vals, pdf[val_col].astype("float64")))
        top = _topk_merge(pairs, k)
        top_ids = [i.item() if hasattr(i, "item") else i for i, _ in top]
        state.update((top_ids, [v for _, v in top]))
        yield _pd.DataFrame(
            {
                key_col: [key_val] * len(top),
                "rank": [r + 1 for r in range(len(top))],
                id_col: top_ids,
                val_col: [round(v, 2) for _, v in top],
            }
        )

    return (
        events.select(key_col, id_col, val_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update_topk,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_topk_tws(
    events: DataFrame,
    k: int = 3,
    key_col: str = "event_type",
    id_col: str = "event_id",
    val_col: str = "value",
) -> DataFrame:
    """``running_topk`` on ``transformWithStateInPandas`` — the Spark 4
    arbitrary-state successor API (typed state handles, timers,
    state-level TTL; requires the RocksDB state store provider). State
    is a ListState of at most k (id, value) rows instead of the packed
    tuple ``applyInPandasWithState`` forces.

    The runtime's state-server protocol needs the ``protobuf`` package
    on the PYTHON side; environments without it (this container) get a
    clear ImportError here instead of an opaque worker crash mid-query.
    Semantics are pinned to ``running_topk`` by the test suite wherever
    protobuf IS available.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "for its state-server protocol; use running_topk "
            "(applyInPandasWithState) instead"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = StructType(
        [
            StructField(key_col, events.schema[key_col].dataType),
            StructField("rank", LongType()),
            StructField(id_col, events.schema[id_col].dataType),
            StructField(val_col, DoubleType()),
        ]
    )

    class TopKProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._topk = handle.getListState(
                "topk", f"{id_col} long, {val_col} double"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            (key_val,) = key
            pairs = [(int(i), float(v)) for i, v in self._topk.get()]
            for pdf in rows:
                pairs.extend(
                    zip(pdf[id_col].astype("int64"), pdf[val_col].astype("float64"))
                )
            top = _topk_merge(pairs, k)
            self._topk.put(top)
            yield _pd.DataFrame(
                {
                    key_col: [key_val] * len(top),
                    "rank": [r + 1 for r in range(len(top))],
                    id_col: [i for i, _ in top],
                    val_col: [round(v, 2) for _, v in top],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select(key_col, id_col, val_col)
        .groupBy(key_col)
        .transformWithStateInPandas(
            TopKProcessor(),
            outputStructType=out_schema,
            outputMode="update",
            timeMode="none",
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


def running_recent_ewma(
    events: DataFrame,
    k: int = 20,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key trailing-k EWMA over the k MOST RECENT events — the
    recent-activity feature a streaming feature store serves.

    State is a bounded MERGEABLE synopsis: the k latest
    (ts, id, cents) triples per key. Each micro-batch merges its rows
    into the kept set and re-cuts to k by (ts desc, id desc), so a
    late-arriving row slots into place and the FINAL state is
    independent of how the stream batched — unlike a naive recursive
    EWMA, whose state is arrival-order dependent and unrepairable.

    The arithmetic is deliberately EXACT: values become integer cents,
    weights are dyadic (2^-r, r = 1..k), so every term and every
    partial sum is exactly representable (bounded denominators) — the
    emitted feature is bit-identical under any batch split, and a SQL
    replay over the same rows reproduces it (the oracle contract).
    Emits ``(key, n_seen, recent_ewma)`` per touched key per batch
    (update mode); recent_ewma = (Σ cents_r·2^-r / Σ 2^-r) / 100,
    rounded to 4.
    """
    from pyspark.sql.types import ArrayType

    out_schema = StructType(
        [
            StructField(key_col, events.schema[key_col].dataType),
            StructField("n_seen", LongType()),
            StructField("recent_ewma", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ts_us", ArrayType(LongType())),
            StructField("ids", ArrayType(LongType())),
            StructField("cents", ArrayType(LongType())),
            StructField("n_seen", LongType()),
        ]
    )

    def update_ewma(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        (key_val,) = key
        if state.hasTimedOut:
            state.remove()
            return
        ts_us, ids, cents, n_seen = (
            state.get if state.exists else ([], [], [], 0)
        )
        triples = list(zip(ts_us, ids, cents))
        for pdf in batches:
            n_seen += len(pdf)
            # drop null/NaN rows instead of killing the micro-batch:
            # int(round(nan)) raises, and a valueless event carries no
            # signal for the feature anyway (n_seen still counts it)
            ok = pdf[[ts_col, id_col, value_col]].notna().all(axis=1)
            pdf = pdf[ok]
            t_us = pdf[ts_col].astype("int64")
            i_v = pdf[id_col].astype("int64")
            c_v = pdf[value_col].astype("float64")
            for t, i, v in zip(t_us, i_v, c_v):
                triples.append((int(t), int(i), int(round(v * 100))))
        triples.sort(key=lambda x: (-x[0], -x[1]))
        triples = triples[: int(k)]
        state.update((
            [t for t, _, _ in triples],
            [i for _, i, _ in triples],
            [c for _, _, c in triples],
            int(n_seen),
        ))
        num = 0.0
        den = 0.0
        for r, (_t, _i, c) in enumerate(triples, start=1):
            w = 2.0 ** -r
            num += c * w
            den += w
        ewma = round(num / den / 100.0, 4) if den else None
        yield _pd.DataFrame(
            {
                key_col: [key_val],
                "n_seen": [int(n_seen)],
                "recent_ewma": [ewma],
            }
        )

    return (
        events.select(key_col, ts_col, id_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update_ewma,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
