"""Stable positional row ids — the Spark-native replacement for the
reference's newline byte index (``src/lazy.frame.c:252-298``).

The reference scans the file once at open and records every newline offset
so row *i* is an O(1) seek. On Spark, positional semantics are carried by
an explicit ``__row_id__`` column (1-based, mirroring the R/``which()``
contract at ``R/lazy.frame.R:203``). Two assignment strategies:

``order_by`` given — value-bucketed rank
    A bare ``row_number() OVER (ORDER BY …)`` funnels every row through
    one task (would not survive 100×). Instead: approximate quantiles of
    the leading key (or, for string keys, of its byte-prefix numeric
    surrogate) split the data into B value-range buckets, each bucket
    ranks in parallel (``row_number`` partitioned by bucket), and exact
    per-bucket counts — collected once from a narrow aggregation — fold
    back into the plan as literal offsets, so the ranked plan scans the
    source exactly once. Final ids are invariant to where the bucket
    boundaries fall (offset + within-bucket rank is always the global
    rank), so quantile approximation only affects balance, never values.
    Every step is a deterministic function of DATA VALUES — nothing
    depends on physical partition ids, which are NOT stable across plan
    branches once a shuffle is involved (AQE may coalesce the same reused
    exchange differently per consumer — observed corrupting ids).

file order (default) — partition-offset enumeration
    Scalable zipWithIndex: ``monotonically_increasing_id()`` is
    consecutive within each scan partition, so ``mid - min(mid)`` is the
    in-partition sequence; per-partition counts give offsets via a tiny
    window, broadcast-joined back, all inside one plan (no driver
    round-trip, the frame stays a pure lazy promise). Safe here because
    file-scan partitioning (no shuffle) is deterministic and AQE never
    re-reads a scan differently.

For repeatable positional queries across sessions, register the frame once
(``LazyFrame.register``) — ids are persisted to Parquet, mirroring the
reference's contract that the same file always yields the same numbering.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROW_ID = "__row_id__"

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
    T.DateType, T.TimestampType,
)


def with_row_ids(
    df: DataFrame,
    order_by: Sequence[str] | None = None,
    col: str = ROW_ID,
    num_buckets: int | None = None,
) -> DataFrame:
    """Attach a 1-based positional id column.

    ``order_by``: columns forming a deterministic total order (unique key
    recommended). When omitted, ids follow the source's partition/file
    order — deterministic for a fixed file layout, like the reference's
    line numbering.
    """
    if order_by:
        return _with_ordered_ids(df, list(order_by), col, num_buckets)
    return _with_partition_offset_ids(df, col)


def _lead_bucket_expr(df: DataFrame, lead: str):
    """A numeric expression that is (non-strictly) monotone in the leading
    sort key, used ONLY to range-bucket rows — final ids are invariant to
    the bucketing (offset + within-bucket rank always reconstructs the
    global rank), so approximation/ties here affect balance, never values.

    Numeric/temporal keys bucket on their double cast. String keys bucket
    on the big-endian integer of the first 7 UTF-8 bytes (zero-padded) —
    monotone under Spark's binary string ordering, so a string leading key
    ranks in parallel instead of funneling into one task. Returns None for
    types with no monotone surrogate (rare; single-bucket fallback)."""
    lead_type = df.schema[lead].dataType
    if isinstance(lead_type, _NUMERIC_TYPES):
        return F.col(lead).cast("double")
    if isinstance(lead_type, T.StringType):
        hex14 = F.rpad(
            F.substring(F.hex(F.encode(F.col(lead), "UTF-8")), 1, 14), 14, "0"
        )
        return F.conv(hex14, 16, 10).cast("double")
    return None


def _with_ordered_ids(
    df: DataFrame, keys: list[str], col: str, num_buckets: int | None
) -> DataFrame:
    spark = df.sparkSession
    b = num_buckets or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    lead_expr = _lead_bucket_expr(df, keys[0])

    if lead_expr is not None and b > 1:
        probs = [i / b for i in range(1, b)]
        qrow = df.select(
            F.percentile_approx(
                lead_expr, F.array(*[F.lit(p) for p in probs]), 1_000
            ).alias("q")
        ).collect()[0]["q"]
        bounds = sorted(set(qrow or []))
    else:
        bounds = []

    bkt = F.lit(0)
    for bound in bounds:  # monotone: equal values always share a bucket
        bkt = bkt + F.when(lead_expr > F.lit(float(bound)), 1).otherwise(0)
    base = df.withColumn("__bkt__", bkt)

    w_rank = Window.partitionBy("__bkt__").orderBy(*[F.col(k) for k in keys])
    ranked = base.withColumn("__rn__", F.row_number().over(w_rank))

    if bounds:
        # exact per-bucket counts, collected once (a narrow lead-column
        # aggregation of ≤ b rows) and folded back as plan LITERALS — the
        # ranked plan then scans the source exactly once, with no second
        # in-plan counts branch and no broadcast join
        rows = base.groupBy("__bkt__").agg(F.count(F.lit(1)).alias("c")).collect()
        cnt = {r["__bkt__"]: r["c"] for r in rows}
        run, offsets = 0, {}
        for i in sorted(cnt):
            offsets[i] = run
            run += cnt[i]
        off = F.lit(0)
        for i, o in offsets.items():
            if o:
                off = F.when(F.col("__bkt__") == i, F.lit(o)).otherwise(off)
    else:
        off = F.lit(0)
    return (
        ranked.withColumn(col, (off + F.col("__rn__")).cast("bigint"))
        .drop("__bkt__", "__rn__")
    )


def _with_partition_offset_ids(df: DataFrame, col: str) -> DataFrame:
    mid, pid = "__lfs_mid__", "__lfs_pid__"
    base = df.withColumn(mid, F.monotonically_increasing_id()).withColumn(
        pid, F.spark_partition_id()
    )
    stats = base.groupBy(pid).agg(
        F.count(F.lit(1)).alias("__cnt__"), F.min(mid).alias("__mn__")
    )
    w = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    offsets = stats.select(
        F.col(pid),
        F.col("__mn__"),
        F.coalesce(F.sum("__cnt__").over(w), F.lit(0)).alias("__off__"),
    )
    return (
        base.join(F.broadcast(offsets), on=pid, how="inner")
        .withColumn(
            col,
            (F.col("__off__") + (F.col(mid) - F.col("__mn__")) + F.lit(1)).cast("bigint"),
        )
        .drop(mid, pid, "__mn__", "__off__")
    )
