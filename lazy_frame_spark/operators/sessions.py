"""Batch sessionization — assign every event to a gap-bounded session
(the batch twin of ``streaming.windows.session_window_agg``; same
semantics as the classic gaps-and-islands SQL, which the oracle runs).

A session is a maximal per-key event chain where consecutive gaps are
<= ``gap``; the session's identity is the timestamp of its FIRST event
(stable, engine-independent, and exactly what the SQL formulation
yields). The default path is the textbook two-window plan: one per-key
window computes start flags (gap > threshold) and carries the latest
start time forward.

Skew hardening mirrors ``operators.joins.asof_join``: a per-key window
puts EVERY event of a key in one task and AQE cannot split window
partitions, so a 10^9-event key stalls the stage. ``time_buckets=N``
pre-splits each key into N uniform time ranges and stitches sessions
across bucket edges with two BUCKET-GRAIN carries (<= N rows per key):
the previous bucket's last event time decides whether a bucket's first
event opens a new session, and the latest session start rolls forward
into buckets whose early events belong to a session begun earlier.
Results are provably identical to the plain path (pinned by tests).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _epoch_expr(df: DataFrame, time_col: str):
    dt = df.schema[time_col].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # unix_micros rejects TIMESTAMP_NTZ; the session is pinned UTC,
        # so the NTZ->TZ cast is drift-free
        return F.unix_micros(F.col(time_col).cast("timestamp")) / F.lit(1_000_000.0)
    if isinstance(dt, T.DateType):
        return (F.unix_date(F.col(time_col)) * F.lit(86_400)).cast("double")
    return F.col(time_col).cast("double")


def sessionize(
    df: DataFrame,
    key_col: str | Sequence[str] = "user_id",
    time_col: str = "ts",
    gap: float = 1800.0,
    out_col: str = "session_start",
    time_buckets: int | str = 1,
) -> DataFrame:
    """Append ``out_col`` — the first-event time of each row's session
    (sessions break when the gap to the previous event exceeds ``gap``
    seconds). ``(key_col, out_col)`` is the session key for any
    downstream per-session aggregation.

    ``time_buckets=N`` runs the skew-safe pre-split (identical output);
    ``"auto"`` samples the hottest key (``suggest_salt_buckets``) and
    enables it only when a key exceeds what one task should hold;
    leave at 1 for ordinary key cardinalities.
    """
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    if time_buckets == "auto":
        from lazy_frame_spark.operators.joins import suggest_salt_buckets

        time_buckets = suggest_salt_buckets(df, keys[0])
    if int(time_buckets) > 1:
        return _sessionize_bucketed(
            df, keys, time_col, gap, out_col, int(time_buckets)
        )
    tsec = "__sess_t__"
    base = df.withColumn(tsec, _epoch_expr(df, time_col))
    w = Window.partitionBy(*keys).orderBy(tsec)
    prev = F.lag(tsec).over(w)
    start = F.when(
        prev.isNull() | ((F.col(tsec) - prev) > F.lit(float(gap))), F.col(time_col)
    )
    run = Window.partitionBy(*keys).orderBy(tsec).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        base.withColumn("__sess_s__", start)
        .withColumn(out_col, F.last("__sess_s__", ignorenulls=True).over(run))
        .drop(tsec, "__sess_s__")
    )


def _sessionize_bucketed(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    gap: float,
    out_col: str,
    n_buckets: int,
) -> DataFrame:
    tsec, bkt = "__sess_t__", "__sess_b__"
    base = df.withColumn(tsec, _epoch_expr(df, time_col))
    b = base.agg(F.min(tsec).alias("lo"), F.max(tsec).alias("hi")).collect()[0]
    lo, hi = b["lo"], b["hi"]
    if lo is None or hi is None or hi <= lo:
        return sessionize(df, keys, time_col, gap, out_col, time_buckets=1)
    width = (hi - lo) / n_buckets
    base = base.withColumn(
        bkt,
        F.least(
            F.lit(n_buckets - 1), F.floor((F.col(tsec) - F.lit(lo)) / F.lit(width))
        ).cast("int"),
    )

    # bucket-grain carry 1: previous bucket's LAST event time per key —
    # decides whether a bucket's first event continues a session that
    # crossed the bucket edge
    gsum = base.groupBy(*keys, bkt).agg(
        F.min(tsec).alias("__bmin__"), F.max(tsec).alias("__bmax__")
    )
    w_b = Window.partitionBy(*keys).orderBy(bkt)
    gprev = gsum.select(
        *[F.col(k).alias(f"__gk_{k}__") for k in keys],
        F.col(bkt).alias("__gb__"),
        F.lag("__bmax__").over(w_b).alias("__prev_last_t__"),
    )

    gcond = base[bkt] == gprev["__gb__"]
    for k in keys:
        gcond = gcond & (base[k] == gprev[f"__gk_{k}__"])
    u = base.join(gprev, gcond, "left").drop(
        *[f"__gk_{k}__" for k in keys], "__gb__"
    )

    # within-(key, bucket) start flags: the first row of a bucket
    # consults the carried previous-bucket last time instead of lag()
    w_in = Window.partitionBy(*keys, bkt).orderBy(tsec)
    prev_in = F.coalesce(F.lag(tsec).over(w_in), F.col("__prev_last_t__"))
    start = F.when(
        prev_in.isNull() | ((F.col(tsec) - prev_in) > F.lit(float(gap))),
        F.col(time_col),
    )
    run_in = Window.partitionBy(*keys, bkt).orderBy(tsec).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    all_in = Window.partitionBy(*keys, bkt).orderBy(tsec).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    u2 = (
        u.withColumn("__sess_s__", start)
        .withColumn("__run__", F.last("__sess_s__", ignorenulls=True).over(run_in))
        .withColumn("__blast__", F.last("__sess_s__", ignorenulls=True).over(all_in))
    )

    # bucket-grain carry 2: latest session START from earlier buckets —
    # fills rows whose session began before their bucket (no start flag
    # seen yet within the bucket). Same partitioning as the window, so
    # the groupBy adds no wide shuffle.
    ssum = u2.groupBy(*keys, bkt).agg(
        F.first("__blast__", ignorenulls=True).alias("__s__")
    )
    w_c = Window.partitionBy(*keys).orderBy(bkt).rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = ssum.select(
        *[F.col(k).alias(f"__ck_{k}__") for k in keys],
        F.col(bkt).alias("__cb__"),
        F.last("__s__", ignorenulls=True).over(w_c).alias("__carry__"),
    )
    ccond = u2[bkt] == carry["__cb__"]
    for k in keys:
        ccond = ccond & (u2[k] == carry[f"__ck_{k}__"])
    out = (
        u2.join(carry, ccond, "left")
        .withColumn(out_col, F.coalesce(F.col("__run__"), F.col("__carry__")))
        .select(*df.columns, out_col)
    )
    return out
