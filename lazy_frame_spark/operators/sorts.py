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
