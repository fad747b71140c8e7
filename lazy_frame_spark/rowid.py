"""Stable positional row ids — the Spark-native replacement for the
reference's newline byte index (``src/lazy.frame.c:252-298``).

The reference scans the file once at open and records every newline offset
so row *i* is an O(1) seek. On Spark, positional semantics are instead
carried by an explicit ``__row_id__`` column (1-based, mirroring the R/
``which()`` contract at ``R/lazy.frame.R:203``). Two assignment strategies:

``order_by`` given
    ``row_number()`` over a global ordering on the given key columns.
    Deterministic across engines (this is what the DuckDB oracle can
    reproduce) but requires a global sort — use for keyed tables.

file order (default)
    Scalable zipWithIndex without leaving the DataFrame API and without a
    global shuffle: ``monotonically_increasing_id()`` is consecutive within
    each partition, so ``mid - min(mid per partition)`` is the in-partition
    sequence; per-partition counts (a tiny aggregate job) give cumulative
    offsets, broadcast-joined back. Cost: one extra pass over the data for
    the counts — the exact analogue of the reference's one-time newline
    scan at open. At 100 TB this is ~O(#partitions) driver state (a few
    hundred thousand rows), never per-row driver state.

For repeatable positional queries across sessions, register the frame once
(``LazyFrame.register``) — ids are persisted to Parquet, mirroring the
reference's contract that the same file always yields the same numbering.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROW_ID = "__row_id__"


def with_row_ids(
    df: DataFrame,
    order_by: Sequence[str] | None = None,
    col: str = ROW_ID,
) -> DataFrame:
    """Attach a 1-based positional id column.

    ``order_by``: columns forming a deterministic total order (unique key
    recommended). When omitted, ids follow the source's partition/file
    order — deterministic for a fixed file layout, like the reference's
    line numbering.
    """
    if order_by:
        w = Window.orderBy(*[F.col(c) for c in order_by])
        return df.withColumn(col, F.row_number().over(w).cast("bigint"))
    return _with_file_order_ids(df, col)


def _with_file_order_ids(df: DataFrame, col: str) -> DataFrame:
    mid, pid = "__lfs_mid__", "__lfs_pid__"
    base = df.withColumn(mid, F.monotonically_increasing_id()).withColumn(
        pid, F.spark_partition_id()
    )
    stats = (
        base.groupBy(pid)
        .agg(F.count(F.lit(1)).alias("__cnt__"), F.min(mid).alias("__mn__"))
        .collect()
    )
    rows, acc = [], 0
    for r in sorted(stats, key=lambda r: r[pid]):
        rows.append((r[pid], r["__mn__"], acc))
        acc += r["__cnt__"]
    if not rows:  # empty input
        return df.withColumn(col, F.lit(None).cast("bigint"))
    spark = df.sparkSession
    offsets = spark.createDataFrame(rows, schema=f"{pid} int, __mn__ long, __off__ long")
    out = (
        base.join(F.broadcast(offsets), on=pid, how="inner")
        .withColumn(col, (F.col("__off__") + (F.col(mid) - F.col("__mn__")) + F.lit(1)).cast("bigint"))
        .drop(mid, pid, "__mn__", "__off__")
    )
    return out
