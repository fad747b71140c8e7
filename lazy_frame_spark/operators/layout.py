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


def _dilate(col: Column, bits: int, stride: int) -> Column:
    """Spread the ``bits`` low bits of ``col`` so that source bit ``i``
    lands at position ``i * stride`` — the Morton "bit dilation", done
    as O(log bits) shift/or/mask stages (the 64-bit generalization of
    the classic 0x5555... magic-number spread, masks computed for any
    stride). Stage ``k`` (high to low) splits each contiguous group of
    ``2^(k+1)`` source bits into two halves and moves the upper half up
    by ``(stride-1)*2^k``; the mask keeps exactly the target slots, and
    no shifted bit can collide with a kept slot (each target receives
    one source). The pay-off is generated-code SIZE: the per-bit
    formulation emitted ~3 ops per (bit, column) inside ONE expression
    tree — at 16 bits x 2-3 columns janino's 64 KB method limit
    tripped and Spark silently dropped the projection out of
    whole-stage codegen. This form is ~13 ops per column and compiles
    everywhere."""
    x = col.bitwiseAND(F.lit((1 << bits) - 1))
    if stride == 1 or bits == 1:
        return x
    rounds = (bits - 1).bit_length()  # ceil(log2(bits))
    for k in reversed(range(rounds)):
        blk = 1 << k
        shift = (stride - 1) * blk
        mask, g = 0, 0
        while g * blk < bits:
            start = g * stride * blk
            width = min(blk, bits - g * blk)
            mask |= ((1 << width) - 1) << start
            g += 1
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def z_value(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton interleave: bit ``i`` of column ``c`` lands at position
    ``i * n_cols + c`` of the z-value. ``n_cols * bits`` must be ≤ 63.
    Built from per-column bit DILATION (``_dilate``) OR-ed together —
    O(n log bits) generated ops, so the projection stays inside
    whole-stage codegen at any supported (n, bits)."""
    n = len(cols)
    if n < 1:
        raise ValueError("z_value needs at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit z-value")
    cs = [(F.col(c) if isinstance(c, str) else c).cast("bigint") for c in cols]
    z = None
    for c, col in enumerate(cs):
        d = _dilate(col, bits, n)
        if c:
            d = F.shiftleft(d, c)
        z = d if z is None else z.bitwiseOR(d)
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


def hilbert_xy2d(x: int, y: int, bits: int) -> int:
    """Reference Hilbert index (pure Python): canonical iterative xy→d
    with per-level masking. Used by tests and documentation; the
    distributed path is :func:`with_hilbert`."""
    d = 0
    for i in reversed(range(bits)):
        s = 1 << i
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x &= s - 1
        y &= s - 1
    return d


def with_hilbert(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 10,
    out_col: str = "hval",
) -> DataFrame:
    """Hilbert curve index over two bucketed dimensions — the
    better-locality alternative to the Morton z-value: consecutive
    Hilbert indices are always GRID-ADJACENT cells (no Z-shape jumps),
    so range-partitioning files by ``hval`` gives tighter per-file
    min-max spans on both dimensions than z-ordering at the same bits.

    The canonical iterative algorithm is sequential in (x, y) state, so
    it unrolls into ``bits`` chained projections (one ``withColumn``
    layer per level — named columns, no expression-tree blowup); every
    operation is shift/and/xor/arithmetic in whole-stage codegen. The
    same unrolled form renders to SQL for the oracle
    (parity._hilbert_sql). Caller contract matches ``z_value``:
    non-negative ints masked to ``bits`` bits.
    """
    if 2 * bits > 62:
        raise ValueError("2 x bits must fit a signed 64-bit Hilbert value")
    mask = (1 << bits) - 1
    out = df.withColumn(
        "__hx__", F.col(x_col).cast("bigint").bitwiseAND(F.lit(mask))
    ).withColumn(
        "__hy__", F.col(y_col).cast("bigint").bitwiseAND(F.lit(mask))
    ).withColumn(out_col, F.lit(0).cast("bigint"))
    for i in reversed(range(bits)):
        s = 1 << i
        rx = F.shiftright(F.col("__hx__"), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("__hy__"), i).bitwiseAND(F.lit(1))
        out = out.withColumn("__rx__", rx).withColumn("__ry__", ry)
        out = out.withColumn(
            out_col,
            F.col(out_col)
            + F.lit(s * s) * (F.col("__rx__") * 3).bitwiseXOR(F.col("__ry__")),
        )
        flip_x = F.when(
            F.col("__rx__") == 1, F.lit(s - 1) - F.col("__hx__")
        ).otherwise(F.col("__hx__"))
        flip_y = F.when(
            F.col("__rx__") == 1, F.lit(s - 1) - F.col("__hy__")
        ).otherwise(F.col("__hy__"))
        new_x = F.when(F.col("__ry__") == 0, flip_y).otherwise(F.col("__hx__"))
        new_y = F.when(F.col("__ry__") == 0, flip_x).otherwise(F.col("__hy__"))
        out = out.withColumn("__hx2__", new_x).withColumn("__hy2__", new_y)
        out = out.withColumn(
            "__hx__", F.col("__hx2__").bitwiseAND(F.lit(s - 1))
        ).withColumn("__hy__", F.col("__hy2__").bitwiseAND(F.lit(s - 1)))
    return out.drop("__hx__", "__hy__", "__hx2__", "__hy2__", "__rx__", "__ry__")


def hilbert_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + sort by the Hilbert index of two bucketed
    dimensions — same write-time contract as ``zorder_layout`` with
    strictly better locality per file."""
    out = with_hilbert(df, x_col, y_col, bits=bits, out_col="__h__")
    out = (
        out.repartitionByRange(num_partitions, "__h__")
        if num_partitions
        else out.repartitionByRange("__h__")
    )
    return out.sortWithinPartitions("__h__").drop("__h__")
