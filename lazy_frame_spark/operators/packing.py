"""Sequence packing — assigning documents to fixed token-budget training
bins, the standard pre-training batching step (concatenate the corpus in
a deterministic order, chunk every ``budget`` tokens, keep document
granularity: a document belongs to the bin where it starts).

Not in the reference (no analogue of training-data preparation); part of
the north-star 100 TB pipeline surface. The only global state needed is
the running token total over the corpus order, which ``rowid.
with_prefix_sum`` computes scale-safely: value-bucketed parallel partial
cumsums plus literal offsets — no single-task ``ORDER BY`` window, no
driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lazy_frame_spark.operators.text import token_count
from lazy_frame_spark.rowid import with_prefix_sum


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_by: list[str] | None = None,
) -> DataFrame:
    """Per-document bin assignment under concat-and-chunk packing.

    ``start_offset`` is the document's position in the concatenated token
    stream (exclusive prefix sum); ``bin_id = start_offset // budget``.
    Bins fill to the budget and may overflow by at most one document —
    the same best-effort semantics as sample-packing a pre-training
    corpus without splitting documents."""
    order = list(order_by) if order_by else [id_col]
    d = df.withColumn("__n_tok__", token_count(F.col(text_col)).cast("bigint"))
    p = with_prefix_sum(d, "__n_tok__", order, col="__run__")
    start = F.col("__run__") - F.col("__n_tok__")
    return p.select(
        F.col(id_col),
        F.col("__n_tok__").alias("n_tokens"),
        start.alias("start_offset"),
        F.floor(start / budget_tokens).cast("bigint").alias("bin_id"),
    )


def bin_stats(
    packed: DataFrame, budget_tokens: int = 2048
) -> DataFrame:
    """Fill statistics per bin: document count, token total, fill rate in
    basis points. One partial-agg shuffle keyed by bin_id."""
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .withColumn(
            "fill_bp",
            F.floor(F.col("n_tokens") * 10000 / budget_tokens).cast("bigint"),
        )
    )
