"""Distribution statistics: fixed-width histograms and exact-verified
heavy hitters.

Reference parity note: the reference (bwlewis/lazy.frame) computes no
statistics at all (its ``summary()`` is stubbed — ``R/lazy.frame.R``);
north-star scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram_fixed(
    df: DataFrame,
    col: str,
    lo: float,
    width: float,
    clamp_bins: int | None = None,
) -> DataFrame:
    """Fixed-width histogram: ``(bin, lo_edge, n)`` with
    ``bin = floor((x - lo) / width)``. A single partial-aggregated
    groupBy on a derived integer — the cheapest possible shape (map-side
    combine collapses each partition to ≤ #bins rows before the
    shuffle). ``clamp_bins`` folds overflow into the last bin."""
    b = F.floor((F.col(col) - F.lit(float(lo))) / F.lit(float(width))).cast("bigint")
    if clamp_bins is not None:
        b = F.least(b, F.lit(int(clamp_bins) - 1))
    return (
        df.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn("lo_edge", F.round(F.lit(float(lo)) + F.col("bin") * F.lit(float(width)), 4))
        .select("bin", "lo_edge", "n")
    )


def frequent_items_exact(
    df: DataFrame,
    col: str,
    support: float,
) -> DataFrame:
    """Heavy hitters above a support threshold, EXACT — via the
    sketch-then-verify pattern (same shape as the Bloom decontamination
    path): phase 1 runs Spark's one-pass Karp-style ``freqItems``
    sketch, whose guarantee is NO FALSE NEGATIVES (every item with
    frequency ≥ support survives; some lighter items sneak in); phase 2
    exact-counts ONLY the ≤ 1/support candidate items (an ``isin``
    literal filter that pushes down to the scan) and drops the false
    positives. The full-cardinality groupBy never runs — at 100 TB with
    billions of distinct keys, that is the difference between a bounded
    candidate count and an unbounded shuffle.

    Returns ``(item, n)`` with exact counts, for items whose count ≥
    ``support * total_rows``.
    """
    if not (0.0 < support <= 1.0):
        raise ValueError("support must be in (0, 1]")
    candidates = df.stat.freqItems([col], support).collect()[0][f"{col}_freqItems"]
    if not candidates:
        return df.sparkSession.createDataFrame([], f"item {df.schema[col].dataType.simpleString()}, n bigint")
    total = df.count()
    threshold = support * total
    return (
        df.filter(F.col(col).isin(list(candidates)))
        .groupBy(F.col(col).alias("item"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") >= F.lit(threshold))
    )


def equi_depth_histogram(
    df: DataFrame,
    col: str,
    k: int = 10,
    id_col: str | None = None,
) -> DataFrame:
    """Equi-DEPTH (quantile) histogram: ``k`` bins holding near-equal
    row counts (sizes differ by at most one), with each bin's exact
    value range — the distribution summary that stays readable under
    heavy skew, where the fixed-width histogram collapses into one hot
    bar. ``bin = floor((rank-1)·k / n)`` over the total (value,
    tie-break) order; the rank comes from the value-bucketed parallel
    prefix sum (rowid.with_prefix_sum) — NO single-task global ORDER BY
    window anywhere, so the shape survives 100×. Exact by
    construction: integer products below 2^53 divide exactly under
    IEEE, so the bin boundaries are reproducible cross-engine. Returns
    ``(bin, n_rows, lo, hi)``. NULL values sort first under Spark's
    default and land in bin 0 — filter them upstream when that is not
    the intent; ``id_col`` breaks value ties deterministically (any
    unique column)."""
    from lazy_frame_spark.rowid import with_prefix_sum

    order = [col] + ([id_col] if id_col else [])
    # the row total rides the plan as a broadcast 1-row aggregate
    # instead of a separate driver-side count() — that was a whole
    # extra pass over the corpus; this also makes the empty-input case
    # fall out naturally with the column's OWN lo/hi types (a
    # hardcoded empty schema diverged from the non-empty one)
    total = F.broadcast(
        df.agg(F.count(F.lit(1)).cast("bigint").alias("__n__")))
    ranked = with_prefix_sum(
        df.select(*order).withColumn("__one__", F.lit(1).cast("bigint")),
        "__one__", order, col="__rank__",
    ).crossJoin(total)
    b = F.floor((F.col("__rank__") - 1) * F.lit(int(k)) / F.col("__n__"))
    return (
        ranked.select(b.cast("bigint").alias("bin"), F.col(col))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
        )
    )
