"""Time-series regularization and sequence analytics over event
streams: resample-to-grid with forward fill, and first-order transition
matrices.

Reference parity note: north-star scope (the reference has no time
types at all — timestamps round-trip as strings); these are the
event-table operations a telemetry/training-data pipeline runs before
windowed feature extraction.

Scale notes: every step is key-partitioned — the bucket pick and the
forward-fill window both partition by the entity key, so parallelism is
bounded by key cardinality (millions of users ⇒ millions of independent
partitions), never by a global sort. The grid explode generates
span/bucket rows per key with NO shuffle (sequence() is a map-side
expression over the per-key min/max aggregate).
"""

from __future__ import annotations

from collections.abc import Sequence as _Seq

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    every: str = "1 day",
    by: _Seq[str] = ("user_id",),
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    out_col: str = "v_ffill",
) -> DataFrame:
    """Regularize an irregular event stream onto a fixed ``every`` grid
    per key, carrying the last observed value forward across empty
    buckets (the time-series join prerequisite: align first, then
    compare).

    Per key: (1) each bucket keeps its LAST observation — deterministic
    via (ts desc, id desc) row_number, not an arbitrary-tie arg_max;
    (2) the grid spans that key's own [min, max] bucket range
    (``sequence`` + ``explode`` — map-side, no shuffle); (3) a left
    join re-attaches observations and ``last(..., ignorenulls)`` over
    the bucket order fills gaps. Returns ``(by..., bucket, out_col)``;
    leading buckets before a key's first observation cannot exist by
    construction (the grid starts at the first observed bucket).
    """
    keys = list(by)
    bucket = F.window(F.col(ts_col), every).getField("start")
    w_pick = Window.partitionBy(*keys, "bucket").orderBy(
        F.desc(ts_col), F.desc(id_col)
    )
    obs = (
        df.withColumn("bucket", bucket)
        .withColumn("__rn__", F.row_number().over(w_pick))
        .filter(F.col("__rn__") == 1)
        .select(*keys, "bucket", F.col(val_col).alias("__v__"))
    )
    spans = obs.groupBy(*keys).agg(
        F.min("bucket").alias("__lo__"), F.max("bucket").alias("__hi__")
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo__"), F.col("__hi__"), F.expr(f"interval {every}"))
        ).alias("bucket"),
    )
    w_fill = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, on=[*keys, "bucket"], how="left")
        .withColumn(out_col, F.last("__v__", ignorenulls=True).over(w_fill))
        .select(*keys, "bucket", out_col)
    )


def transition_matrix(
    df: DataFrame,
    by: _Seq[str] = ("user_id",),
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order transition counts and probabilities between event
    types, per-key sequenced by (ts, id). One lead() window partitioned
    by key, one pair-grain partial-aggregated groupBy, one tiny window
    over the #types² matrix for row-normalized probabilities — emitted
    as exact integer basis points (``FLOOR(n·10⁴ / row_total)``), the
    cross-engine-portable encoding used throughout this repo.

    Returns ``(src, dst, n, p_bp)``.
    """
    keys = list(by)
    w_seq = Window.partitionBy(*keys).orderBy(ts_col, id_col)
    pairs = (
        df.select(*keys, ts_col, id_col, F.col(type_col).alias("src"))
        .withColumn("dst", F.lead("src").over(w_seq))
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_row = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n",
        F.floor(F.col("n") * 10000 / F.sum("n").over(w_row)).alias("p_bp"),
    )
