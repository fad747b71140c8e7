"""Sorts, limits, top-k.

The reference only has positional head/tail (``R/lazy.frame.R:234-244``);
value-ordered retrieval is part of the relational completion. ``orderBy +
limit`` matters at scale because Catalyst plans it as
TakeOrderedAndProject: each partition keeps a k-row heap and only k·P rows
ever move — never a global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Top-k by the given order columns. Always include a unique tiebreak
    column when downstream comparison needs a deterministic row set."""
    return df.orderBy(*order).limit(int(k))


def parallel_ntile(
    df: "DataFrame",
    n_tiles: int,
    order_by: "Sequence[str]",
    out_col: str,
) -> "DataFrame":
    """``ntile`` semantics without the single-task window: the global
    rank comes from the value-bucketed parallel enumeration
    (rowid.with_row_ids — B range buckets rank independently, literal
    offsets reassemble the global rank), and the tile is the closed-form
    function of (rank, row count) that reproduces SQL ``NTILE`` exactly:
    the first ``n %% t`` tiles get ``n // t + 1`` rows, the rest
    ``n // t``. One count() scalar and one rank shuffle — no global
    sort, no single task, at any cardinality."""
    from pyspark.sql import functions as F

    from lazy_frame_spark.rowid import with_row_ids

    ranked = with_row_ids(df, order_by=list(order_by), col="__rank__")
    n = df.count()
    q, rem = divmod(n, n_tiles)
    big = (q + 1) * rem  # rows covered by the first `rem` (larger) tiles
    r = F.col("__rank__")
    tile = F.when(
        F.lit(q) == 0, F.least(r, F.lit(n_tiles))
    ).otherwise(
        F.when(r <= F.lit(big), (r - 1) / (q + 1) + 1).otherwise(
            F.lit(rem) + (r - 1 - F.lit(big)) / q + 1
        )
    )
    return ranked.withColumn(out_col, F.floor(tile).cast("bigint")).drop("__rank__")
