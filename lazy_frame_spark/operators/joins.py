"""Join operators.

The reference has no joins (SURVEY.md §2.2) — its users materialized
subsets into R and merged there. Here joins are native and scale-aware:

- equi-joins go through ``df.join`` and Catalyst picks broadcast-hash /
  shuffled-hash / sort-merge (AQE re-plans at runtime and handles skew);
- ``broadcast_dim_join`` pins the small side so a 100 TB fact scan never
  shuffles just to pick up dimension attributes;
- ``range_join`` expresses interval predicates as non-equi join conditions,
  with an optional equi "bucket" pre-key to keep it out of
  broadcast-nested-loop territory at scale;
- ``asof_join`` is the one genuinely missing primitive: implemented as
  union + single window pass (one shuffle on the key), NOT a
  per-row correlated lookup — the only formulation that survives 100×
  scale-up.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Fact ⋈ small dimension with an explicit broadcast hint: the fact side
    keeps its partitioning, no shuffle."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    return left.join(right, on=on, how="left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition,
    equi_on: str | Sequence[str] | None = None,
    broadcast_right: bool = True,
) -> DataFrame:
    """Interval/range join: ``condition`` is a non-equi Column predicate
    (e.g. ``l.ts BETWEEN r.lo AND r.hi``).

    Scale notes: a pure non-equi join plans as broadcast-nested-loop —
    fine when the right side is small (bands, calendars); for two large
    sides pass ``equi_on`` (a shared bucket key, e.g. a coarsened time
    bucket) so the plan becomes a shuffled equi-join with the range
    predicate as a post-filter.
    """
    r = F.broadcast(right) if broadcast_right and equi_on is None else right
    if equi_on is not None:
        equi = [equi_on] if isinstance(equi_on, str) else list(equi_on)
        cond = condition
        for k in equi:
            cond = (left[k] == r[k]) & cond
        return left.join(r, on=cond)
    return left.join(r, on=condition)


def suggest_salt_buckets(
    df: DataFrame,
    on: str,
    sample_fraction: float = 0.01,
    target_rows_per_task: int = 5_000_000,
    max_buckets: int = 256,
) -> int:
    """Heavy-hitter-aware salt sizing: estimate the hottest key's row
    count from a Bernoulli sample (ONE narrow count-by-key aggregation
    over the sample — the only job this runs), then size the salt so
    that key splits into ~``target_rows_per_task`` chunks.

    Returns 1 when no key needs splitting — at which point
    ``salted_join`` degrades to a plain join and the salt machinery
    costs nothing. The estimate only needs the right order of magnitude:
    a 2× error in the hot count changes task sizes 2×, not correctness,
    and ``max_buckets`` bounds the right-side replication factor."""
    import math

    hot = (
        df.sample(fraction=sample_fraction, seed=7)
        .groupBy(on)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("m"))
        .collect()[0]["m"]
    ) or 0
    est_hot = hot / sample_fraction
    return max(1, min(max_buckets, math.ceil(est_hot / target_rows_per_task)))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int | str = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the left (skewed) side gets a random salt
    in [0, salt_buckets); the right side is replicated across all salts.
    The hot key's rows then spread over ``salt_buckets`` reducers instead
    of one. AQE's skew-join handles moderate skew automatically — reach
    for explicit salting when a single key exceeds what one task can hold
    even after AQE splitting (the 10^9-rows-for-one-user case).

    Cost: right side × salt_buckets rows through the shuffle — use on a
    pre-aggregated/narrow right side. ``salt_buckets="auto"`` sizes the
    salt from a sampled heavy-hitter estimate (``suggest_salt_buckets``);
    a plain join falls out when nothing is hot.
    """
    if salt_buckets == "auto":
        salt_buckets = suggest_salt_buckets(left, on)
    if salt_buckets <= 1:
        return left.join(right, on=on, how=how)
    salt = (F.rand(seed=7) * salt_buckets).cast("int")
    lsalted = left.withColumn("__salt__", salt)
    rsalted = right.join(
        F.broadcast(
            left.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("__salt__"))
        )
    )
    out = lsalted.join(rsalted, on=[on, "__salt__"], how=how)
    return out.drop("__salt__")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    time_buckets: int | str = 1,
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right_time <= left_time`` (direction='backward'; 'forward' takes the
    next one; 'nearest' the closer of the two, ties resolving backward)
    sharing the key ``on`` (a column name or a composite list).

    ``tolerance`` bounds the match gap (pandas merge_asof semantics: a
    match farther than the tolerance leaves the left row's carried
    values NULL). The gap is measured on the time column's monotone
    surrogate — raw value for numerics, DAYS for dates, SECONDS for
    timestamps. 'nearest' and ``tolerance`` run on the one-window-pass
    plain path only (they don't compose with the ``time_buckets``
    skew pre-split yet — raise rather than silently degrade).

    Implementation: tag and union both inputs, then one window pass per
    key ordered by time — ``last(value, ignorenulls=True)`` carries the
    latest right-side values forward onto left rows. Exactly one shuffle
    (hash by key), no row explosion, no correlated subquery; this is the
    formulation that holds at 1000 executors. Ties (equal timestamps)
    resolve to the right row (right sorts before left at equal time).

    Skew hardening — ``time_buckets``: a per-key window puts EVERY row
    of a key in one task, so a 10^9-event hot key stalls the stage no
    matter how many executors exist (AQE cannot split a window
    partition). ``time_buckets=N`` pre-splits each key into N uniform
    time ranges and runs the carry in two bounded steps: the within-
    bucket window partitions by (key, bucket) — ~1/N of the hot key per
    task — and the cross-bucket carry-in rolls over BUCKET-GRAIN
    summaries (≤ N rows per key, one tiny window), joined back on
    (key, bucket) and coalesced under the within-bucket carry. Results
    are provably identical to the plain path (pinned by tests);
    ``time_buckets="auto"`` samples the hottest key and enables the
    pre-split only when it exceeds ~5M rows.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or "
                         "'nearest'")
    keys = [on] if isinstance(on, str) else list(on)
    if time_buckets == "auto":
        # hot-key estimate on the leading key: a composite key is at
        # most as hot as its leading column
        time_buckets = suggest_salt_buckets(left, keys[0])
    if int(time_buckets) > 1:
        if direction == "nearest" or tolerance is not None:
            raise ValueError(
                "direction='nearest' / tolerance do not compose with "
                "time_buckets>1 yet — use the plain path (time_buckets=1)"
            )
        return _asof_join_time_bucketed(
            left, right, keys, left_time, right_time, value_cols,
            direction, int(time_buckets),
        )

    need_rt = tolerance is not None or direction == "nearest"
    carry_cols = list(value_cols)
    rt_carry = right_time if right_time in carry_cols else None
    if need_rt and rt_carry is None:
        rt_carry = right_time
        carry_cols = carry_cols + [right_time]
    unioned, lcols, t, side = _asof_tagged_union(
        left, right, keys, left_time, right_time, carry_cols
    )

    def carry(win, suffix):
        return [
            F.last(F.col(f"__r_{c}__"), ignorenulls=True).over(win)
            .alias(f"__asof{suffix}_{c}__")
            for c in carry_cols
        ]

    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col(t).asc(), F.col(side).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col(t).desc(), F.col(side).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    # gap arithmetic works on the UNIONED frame's actual types (left
    # and right times coerce to a common type inside the tagged union;
    # the carried right time keeps its own) in ONE shared unit
    if need_rt:
        t_type = unioned.schema[t].dataType
        rtc_type = unioned.schema[f"__r_{rt_carry}__"].dataType
        unit = _gap_unit(t_type, rtc_type)

    if direction != "nearest":
        win = wb if direction == "backward" else wf
        out = unioned.select(*lcols, F.col(t), F.col(side),
                             *carry(win, "")).filter(F.col(side) == 1)
        if need_rt:
            gap = (_time_surrogate(F.col(t), t_type, unit)
                   - _time_surrogate(F.col(f"__asof_{rt_carry}__"),
                                     rtc_type, unit))
            if direction == "forward":
                gap = -gap
            ok = gap <= F.lit(float(tolerance))
            for c in value_cols:
                out = out.withColumn(
                    f"__asof_{c}__",
                    F.when(ok, F.col(f"__asof_{c}__")))
        return out.select(
            *lcols,
            *[F.col(f"__asof_{c}__").alias(c) for c in value_cols],
        )

    # nearest: both carries share ONE hash exchange (two Window nodes,
    # two sorts, same partitioning); pick the closer valid side per
    # left row, ties toward backward
    both = unioned.select(*lcols, F.col(t), F.col(side),
                          *carry(wb, "_b"), *carry(wf, "_f")) \
        .filter(F.col(side) == 1)
    bt, ft = F.col(f"__asof_b_{rt_carry}__"), F.col(f"__asof_f_{rt_carry}__")
    gap_b = (_time_surrogate(F.col(t), t_type, unit)
             - _time_surrogate(bt, rtc_type, unit))
    gap_f = (_time_surrogate(ft, rtc_type, unit)
             - _time_surrogate(F.col(t), t_type, unit))
    valid_b = bt.isNotNull()
    valid_f = ft.isNotNull()
    if tolerance is not None:
        valid_b = valid_b & (gap_b <= F.lit(float(tolerance)))
        valid_f = valid_f & (gap_f <= F.lit(float(tolerance)))
    use_b = valid_b & (~valid_f | (gap_b <= gap_f))
    picked = [
        F.when(use_b, F.col(f"__asof_b_{c}__"))
        .when(valid_f, F.col(f"__asof_f_{c}__"))
        .alias(c)
        for c in value_cols
    ]
    return both.select(*lcols, *picked)


def _gap_unit(a, b) -> str:
    """The ONE unit both sides' gap surrogates use: SECONDS when either
    side is a timestamp, DAYS when either is a date, raw value for
    numeric pairs. Mixed numeric/temporal pairs have no meaningful gap
    and raise."""
    import pyspark.sql.types as T

    def kind(x):
        if isinstance(x, (T.TimestampType, T.TimestampNTZType)):
            return "ts"
        if isinstance(x, T.DateType):
            return "date"
        return "num"

    ka, kb = kind(a), kind(b)
    temporal = {ka, kb} & {"ts", "date"}
    if temporal and "num" in (ka, kb):
        raise ValueError(
            f"tolerance/nearest need comparable time types, got {a} vs {b}"
        )
    if "ts" in (ka, kb):
        return "seconds"
    if "date" in (ka, kb):
        return "days"
    return "raw"


def _time_surrogate(col: Column, dtype, unit: str) -> Column:
    """Monotone numeric surrogate for gap arithmetic, expressed in the
    shared ``unit`` (Spark 4 forbids direct date/timestamp -> double
    casts): dates are epoch days, timestamps epoch seconds. In the
    seconds unit a DATE goes through the SAME date->timestamp cast the
    tagged union applies (session-local midnight) — deriving it from
    unix_date (UTC midnight) instead would disagree with the union's
    ordering by the session's timezone offset and let a future match
    score a negative gap."""
    import pyspark.sql.types as T

    if isinstance(dtype, T.DateType):
        if unit == "seconds":
            return F.unix_micros(col.cast("timestamp")) / F.lit(1e6)
        return F.unix_date(col).cast("double")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp")) / F.lit(1e6)
    return col.cast("double")


def _asof_tagged_union(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
):
    """Shared as-of plumbing: tag both inputs (side 0 = right, sorting
    first at equal times), null-pad each side's missing columns, union.
    Returns (unioned, left_cols, time_col, side_col)."""
    t = "__asof_t__"
    side = "__asof_side__"
    lcols = left.columns
    kset = set(keys)
    tagged_left = left.select(
        *lcols,
        F.col(left_time).alias(t),
        F.lit(1).alias(side),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}__") for c in value_cols],
    )
    tagged_right = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in kset],
        *[F.col(k) for k in keys],
        F.col(right_time).alias(t),
        F.lit(0).alias(side),
        *[F.col(c).alias(f"__r_{c}__") for c in value_cols],
    ).select(*lcols, t, side, *[f"__r_{c}__" for c in value_cols])
    return tagged_left.unionByName(tagged_right), lcols, t, side


def _asof_join_time_bucketed(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    direction: str,
    n_buckets: int,
) -> DataFrame:
    """The (key, time-bucket) pre-split as-of carry — identical results
    to the single-window path, but no task ever holds more than ~1/N of
    a key:

    1. bucket every unioned row into N uniform time ranges (bounds from
       one 1-row min/max agg);
    2. ONE window pass partitioned by (key, bucket) computes BOTH the
       running within-bucket carry and the bucket's final carry value
       (same partitioning+ordering, two frames -> one Window operator);
    3. per-key carry-ins roll over bucket-grain summaries — at most N
       rows per key, a trivially small window;
    4. carry-ins join back on (key, bucket) and fill where the
       within-bucket carry hasn't seen a right row yet.

    Total: the same single wide shuffle as the plain path (now on
    (key, bucket)) + a bucket-grain shuffle of #keys x N rows.
    """
    from pyspark.sql import types as T

    unioned, lcols, t, side = _asof_tagged_union(
        left, right, keys, left_time, right_time, value_cols
    )
    bkt = "__asof_bkt__"
    tdt = unioned.schema[t].dataType
    if isinstance(tdt, (T.TimestampType, T.TimestampNTZType)):
        # unix_micros rejects TIMESTAMP_NTZ; the session is pinned UTC,
        # so the NTZ->TZ cast is drift-free
        tnum = F.unix_micros(F.col(t).cast("timestamp")).cast("double")
    elif isinstance(tdt, T.DateType):
        tnum = F.unix_date(F.col(t)).cast("double")
    else:
        tnum = F.col(t).cast("double")
    b = unioned.agg(F.min(tnum).alias("lo"), F.max(tnum).alias("hi")).collect()[0]
    lo, hi = b["lo"], b["hi"]
    if lo is None or hi is None or hi <= lo:
        return asof_join(
            left, right, keys, left_time, right_time, value_cols, direction
        )
    width = (hi - lo) / n_buckets
    u = unioned.withColumn(
        bkt,
        F.least(
            F.lit(n_buckets - 1), F.floor((tnum - F.lit(lo)) / F.lit(width))
        ).cast("int"),
    )

    asc = direction == "backward"
    order_in = [F.col(t).asc() if asc else F.col(t).desc(), F.col(side).asc()]
    w_run = (
        Window.partitionBy(*keys, bkt)
        .orderBy(*order_in)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = (
        Window.partitionBy(*keys, bkt)
        .orderBy(*order_in)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    u2 = u.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}__"), ignorenulls=True).over(w_run).alias(f"__in_{c}__")
            for c in value_cols
        ],
        *[
            F.last(F.col(f"__r_{c}__"), ignorenulls=True).over(w_all).alias(f"__bf_{c}__")
            for c in value_cols
        ],
    )

    # bucket-grain summaries: every row of a (key, bucket) carries the
    # same __bf_ value, so first() is deterministic; the groupBy keys
    # match the window partitioning, so no extra wide shuffle
    summ = u2.groupBy(*keys, bkt).agg(
        *[F.first(f"__bf_{c}__", ignorenulls=True).alias(f"__s_{c}__") for c in value_cols]
    )
    w_carry = (
        Window.partitionBy(*keys)
        .orderBy(F.col(bkt).asc() if asc else F.col(bkt).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summ.select(
        *[F.col(k).alias(f"__ck_{k}__") for k in keys],
        F.col(bkt).alias("__cb__"),
        *[
            F.last(F.col(f"__s_{c}__"), ignorenulls=True).over(w_carry).alias(f"__carry_{c}__")
            for c in value_cols
        ],
    )

    cond = u2[bkt] == carry["__cb__"]
    for k in keys:
        cond = cond & (u2[k] == carry[f"__ck_{k}__"])
    out = (
        u2.join(carry, cond, "left")
        .filter(F.col(side) == 1)
        .select(
            *lcols,
            *[
                F.coalesce(F.col(f"__in_{c}__"), F.col(f"__carry_{c}__")).alias(c)
                for c in value_cols
            ],
        )
    )
    return out


def shuffle_hash_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """Equi-join pinned to SHUFFLED HASH via a join hint. **``right`` is
    the build side** (the hint is attached to it): pass the SMALLER
    input as ``right`` — it must fit per-task memory, because the build
    side cannot spill gracefully. The knob to reach for when that side
    exceeds the broadcast threshold and sorted output buys nothing: SMJ
    pays two full sorts; shuffle-hash pays one hash table per task. At
    100 TB this is routinely the fastest strategy for mid-size × huge
    equi-joins — hence a knob and not a default."""
    return left.join(right.hint("shuffle_hash"), on, how)


def merge_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """Equi-join pinned to SORT-MERGE. The safe default for huge × huge
    (both sides spill cleanly); pin it explicitly when AQE statistics
    would otherwise flip a borderline plan build-side into memory
    pressure, or when downstream consumers exploit the sorted output."""
    return left.join(right.hint("merge"), on, how)
