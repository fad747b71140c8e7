"""Multi-dimensional data layout — Z-order (Morton) clustering.

Not in the reference (one text file, one physical order); this is the
lakehouse-side layout optimization that makes 100 TB scans cheap: sort
data along a space-filling curve over several filter columns so that
parquet row-group/file min-max statistics become selective on ALL of
them at once. A table range-partitioned on a single column prunes only
on that column; Z-ordered files keep every interleaved dimension's
per-file span small, so predicate pushdown on ANY of the dimensions
skips most files (the same trick behind Delta/Iceberg ``ZORDER BY``).

Everything is closed-form bit arithmetic on the JVM (shift/and/or —
whole-stage codegen, no UDF), so a SQL oracle verifies z-values
bit-for-bit, and the write path is one ``repartitionByRange`` on the
z-value — a range exchange (sampled boundaries), the same shuffle cost
as any global sort, executed once at layout time to make every later
scan cheaper.

Caller contract: inputs are non-negative integers that fit in ``bits``
bits (map/bucket your domain first — e.g. days since epoch, hash
buckets, quantile ids). Values are masked to ``bits`` to keep the
interleave total ≤ 63 bits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["z_value", "zorder_layout"]


def z_value(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton interleave: bit ``i`` of column ``c`` lands at position
    ``i * n_cols + c`` of the z-value. ``n_cols * bits`` must be ≤ 63."""
    n = len(cols)
    if n < 1:
        raise ValueError("z_value needs at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit z-value")
    cs = [(F.col(c) if isinstance(c, str) else c).cast("bigint") for c in cols]
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for c, col in enumerate(cs):
            z = z + F.shiftleft(F.shiftright(col, i).bitwiseAND(F.lit(1)), i * n + c)
    return z


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: int | None = None,
    z_col: str = "__z__",
) -> DataFrame:
    """Return ``df`` range-partitioned (and sorted within partitions) by
    the z-value of ``cols`` — write the result and each output file
    covers a compact z-interval, i.e. a small span in EVERY interleaved
    dimension, which is what makes min-max pruning fire on all of them.
    The z column is dropped before the caller writes."""
    z = z_value(list(cols), bits).alias(z_col)
    out = df.withColumn(z_col, z)
    out = (
        out.repartitionByRange(num_partitions, z_col)
        if num_partitions
        else out.repartitionByRange(z_col)
    )
    return out.sortWithinPartitions(z_col).drop(z_col)
