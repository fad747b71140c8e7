"""Mergeable sketch columns: HyperLogLog, theta, and KLL sketches as
first-class binary columns.

The pattern that makes 100 TB incremental analytics tractable: aggregate
each ingest grain (day / file / partition) ONCE into a tiny mergeable
sketch, store the sketches, and answer rollup queries by merging
sketches — never rescanning raw data. A year of per-day per-key HLL
sketches is megabytes; the raw events they summarize are terabytes.
Spark 4 ships Apache DataSketches-backed aggregates for all three
families, entirely JVM-side (no Python in the loop):

- **HLL** (``hll_sketch_agg`` / ``hll_union_agg``): distinct counts.
  Register-wise union is lossless — merging partials yields bit-for-bit
  the sketch of the union, so partial-then-merge ≡ one-shot.
- **Theta** (``theta_sketch_agg`` + ``theta_union`` / ``_intersection``
  / ``_difference``): distinct counts under SET ALGEBRA — the only
  sketch family here that answers "how many users did A AND B" from
  per-segment partials. Exact below ~4096 retained hashes (exact mode),
  tightly bounded above.
- **KLL** (``kll_sketch_agg_double`` + pairwise ``kll_sketch_merge``):
  mergeable quantiles with a ~1.65 % normalized rank-error guarantee at
  the default k=200.

Reference parity note: north-star scope — the reference
(bwlewis/lazy.frame) computes no statistics at all (``summary()`` is
stubbed, ``R/lazy.frame.R:186-190``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_SKETCH = "hll_sketch"
THETA_SKETCH = "theta_sketch"
KLL_SKETCH = "kll_sketch"


def hll_partials(
    df: DataFrame,
    grain: Sequence[str],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch per ``grain`` group over ``col`` — the ingest-time
    aggregate. Map-side partial aggregation collapses every partition to
    ≤ |grain| sketch rows (each 2^lgk registers ≈ KBs) before the
    shuffle, so the output is sized by group count, not row count."""
    return df.groupBy(*grain).agg(
        F.hll_sketch_agg(F.col(col), F.lit(int(lgk))).alias(HLL_SKETCH)
    )


def hll_rollup(
    partials: DataFrame,
    keys: Sequence[str],
    out: str = "distinct_est",
) -> DataFrame:
    """Merge stored partials up to ``keys`` grain and estimate. The
    union is register-wise max — associative, commutative, lossless —
    so any rollup hierarchy (day→month→year) gives identical estimates
    to a one-shot sketch of the same rows."""
    merged = partials.groupBy(*keys).agg(
        F.hll_union_agg(F.col(HLL_SKETCH)).alias(HLL_SKETCH)
    )
    return merged.withColumn(out, F.hll_sketch_estimate(F.col(HLL_SKETCH)))


def theta_partials(
    df: DataFrame,
    grain: Sequence[str],
    col: str,
) -> DataFrame:
    """One theta sketch per ``grain`` group over ``col``. Unlike HLL,
    theta partials compose under union AND intersection AND difference
    — segment-overlap questions ("users in click ∩ view") come straight
    from the stored partials."""
    return df.groupBy(*grain).agg(
        F.theta_sketch_agg(F.col(col)).alias(THETA_SKETCH)
    )


def theta_setops(a: Column, b: Column) -> tuple[Column, Column, Column]:
    """(union, intersection, difference a∖b) estimate columns for two
    theta sketch columns. Exact while both sketches are in exact mode
    (≤ ~4096 retained hashes); bounded-error above."""
    return (
        F.theta_sketch_estimate(F.theta_union(a, b)),
        F.theta_sketch_estimate(F.theta_intersection(a, b)),
        F.theta_sketch_estimate(F.theta_difference(a, b)),
    )


def kll_partials(
    df: DataFrame,
    grain: Sequence[str],
    col: str,
) -> DataFrame:
    """One KLL(double) quantile sketch per ``grain`` group over
    ``col``."""
    return df.groupBy(*grain).agg(
        F.kll_sketch_agg_double(F.col(col)).alias(KLL_SKETCH)
    )


def kll_merge(partials: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """Merge KLL partials to ``keys`` grain (global when None). Spark
    exposes KLL merge as a PAIRWISE scalar, not an aggregate, so the
    rollup folds a collected sketch array: collect_list is bounded by
    the number of PARTIALS per output group (the ingest grain count —
    e.g. 365 day-sketches/year, KBs each), never by raw row count, so
    the fold stays executor-side and small. Groups with one partial
    skip the fold entirely."""
    gb = partials.groupBy(*keys) if keys else partials.groupBy()
    # the filter also covers the empty-input global merge: groupBy() on
    # zero rows still yields one row with an empty list, and the fold's
    # slice(..., size-1) would throw on length -1 — drop it (no data →
    # no row) instead of crashing
    arr = gb.agg(F.collect_list(KLL_SKETCH).alias("_ks")).filter(F.size("_ks") > 0)
    merged = F.when(F.size("_ks") == 1, F.element_at("_ks", 1)).otherwise(
        F.expr(
            "aggregate(slice(_ks, 2, size(_ks) - 1), _ks[0], "
            "(acc, x) -> kll_sketch_merge_double(acc, x))"
        )
    )
    return arr.withColumn(KLL_SKETCH, merged).drop("_ks")


def kll_quantiles(
    merged: DataFrame,
    probs: Sequence[float],
    prefix: str = "q",
) -> DataFrame:
    """Quantile estimates (one column per prob) plus the exact stream
    count ``n`` — KLL tracks n exactly, so ``n`` is value-checkable
    even though the quantiles are approximate."""
    names = [f"{prefix}{int(round(p * 100))}" for p in probs]
    if len(set(names)) != len(names):
        raise ValueError(
            f"probs {list(probs)} collide after percent rounding: {names}"
        )
    out = merged.withColumn(
        "n", F.kll_sketch_get_n_double(F.col(KLL_SKETCH)).cast("bigint")
    )
    for p in probs:
        out = out.withColumn(
            f"{prefix}{int(round(p * 100))}",
            F.kll_sketch_get_quantile_double(F.col(KLL_SKETCH), F.lit(float(p))),
        )
    return out.drop(KLL_SKETCH)


def hll_incremental_update(
    stored: DataFrame,
    new_batch: DataFrame,
    grain: Sequence[str],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """Merge a new ingest batch into a stored partial-sketch table —
    incremental materialized-view maintenance for distinct counts. The
    batch sketches at the same grain, unions with the stored partials
    (a KB-scale frame), and re-merges per grain key; the STORED DATA IS
    NEVER RESCANNED. Writing the result back over the sketch table
    keeps the view current at per-batch cost, which is the entire point
    of mergeable sketches at 100 TB.

    The union requires both sides at the same lgk (register-wise union
    is only defined over equal register arrays); Spark's hll_union_agg
    raises otherwise rather than degrading silently.
    """
    fresh = hll_partials(new_batch, grain, col, lgk=lgk)
    return (
        stored.select(*grain, HLL_SKETCH)
        .unionByName(fresh)
        .groupBy(*grain)
        .agg(F.hll_union_agg(F.col(HLL_SKETCH)).alias(HLL_SKETCH))
    )


def theta_incremental_update(
    stored: DataFrame,
    new_batch: DataFrame,
    grain: Sequence[str],
    col: str,
) -> DataFrame:
    """Theta twin of ``hll_incremental_update``: fold a new batch's
    partials into the stored sketch table without rescanning stored
    data. Kept separate (not parameterized over the sketch family)
    because the union aggregate differs and theta's exact-mode
    guarantees are part of its contract."""
    fresh = theta_partials(new_batch, grain, col)
    return (
        stored.select(*grain, THETA_SKETCH)
        .unionByName(fresh)
        .groupBy(*grain)
        .agg(F.theta_union_agg(F.col(THETA_SKETCH)).alias(THETA_SKETCH))
    )


# --------------------------------------------------------------------- #
# Count-min sketch — frequency estimation (no Spark built-in; the long-
# format (i, j, n) encoding below keeps it 100% JVM-side)
# --------------------------------------------------------------------- #

def cms_partials(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    depth: int = 5,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch partials per key group, as LONG-FORMAT rows
    ``(keys..., i, j, n)`` — row ``(i, j)`` holds the count of elements
    whose i-th hash lands in bucket j. At most ``depth x width`` rows
    per group regardless of data volume, mergeable by plain summation,
    and built entirely from codegen expressions (explode + partial-agg
    count): no Python, no UDAF.

    The classic guarantee carries over: a point estimate (``cms_query``)
    never undercounts, and overcounts by more than ``2N/width`` with
    probability at most ``2^-depth``. Depth rows use independent seeds
    of the same 64-bit hash family."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(width))
                .cast("int")
                .alias("j"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(*keys, F.explode(cells).alias("__c__"))
        .groupBy(*keys, F.col("__c__.i").alias("i"), F.col("__c__.j").alias("j"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(partials: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """Merge count-min partials (possibly from different batches /
    grains) by cellwise summation — exact: partial-then-merge is
    bit-identical to sketching the union in one shot."""
    keys = list(keys or [])
    return partials.groupBy(*keys, "i", "j").agg(F.sum("n").alias("n"))


def cms_query(
    partials: DataFrame,
    values: DataFrame,
    col: str,
    keys: Sequence[str] | None = None,
    depth: int = 5,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for every row of ``values`` (a frame
    with ``col`` and optionally the group ``keys``): recompute the
    depth cell coordinates for each value, fetch the matching cells
    from the (broadcastable, <= depth x width per group) partials, and
    take the MIN across depth rows — missing cells read as 0 via the
    count of found cells. ``depth``/``width`` must match the build."""
    keys = list(keys or [])
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(width))
                .cast("int")
                .alias("j"),
            )
            for i in range(depth)
        ]
    )
    v = values.select(*keys, col, F.explode(cells).alias("__c__")).select(
        *keys, col, F.col("__c__.i").alias("i"), F.col("__c__.j").alias("j")
    )
    # ungrouped partials are <= depth x width rows — pin the broadcast;
    # grouped partials scale with group count, so let AQE pick the
    # strategy from the measured size
    rhs = F.broadcast(partials) if not keys else partials
    joined = v.join(rhs, on=[*keys, "i", "j"], how="left")
    return (
        joined.groupBy(*keys, col)
        .agg(
            F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_min"),
            F.count(F.col("n")).alias("__hits__"),
        )
        .select(
            *keys,
            col,
            # any missed cell means some hash row never saw the value -> 0
            F.when(F.col("__hits__") < depth, F.lit(0))
            .otherwise(F.col("est_min"))
            .cast("long")
            .alias("cms_estimate"),
        )
    )


def cms_incremental_update(
    stored: DataFrame,
    new_batch: DataFrame,
    grain: Sequence[str],
    col: str,
    depth: int = 5,
    width: int = 1024,
) -> DataFrame:
    """Count-min twin of ``hll_incremental_update``: sketch the batch,
    union with the stored long-format partials, re-sum per cell. The
    stored data is never rescanned; the update cost is the batch scan
    plus a <= depth x width x groups merge."""
    fresh = cms_partials(new_batch, grain, col, depth=depth, width=width)
    return cms_merge(stored.unionByName(fresh), keys=grain)


def cms_topk(
    df: DataFrame,
    col: str,
    k: int = 10,
    partials: DataFrame | None = None,
    support: float = 0.001,
    depth: int = 5,
    width: int = 1024,
) -> DataFrame:
    """Approximate top-k heavy hitters from a count-min sketch — the
    composition of the two bounded passes this module already has:
    freqItems (ONE scan, Karp-style, NO false negatives above
    ``support``) bounds the candidate set at <= 1/support values, and
    their frequencies come from the CMS ``partials`` — pass the
    MAINTAINED sketch (``cms_incremental_update`` keeps one per grain)
    and ranking costs one candidate-harvest scan plus a bounded
    (<= depth x width row) broadcast join; the full-cardinality groupBy
    never runs. Without a stored sketch one is built (one extra scan,
    still bounded output).

    Returns ``(col, cms_estimate)`` ordered by (estimate desc, value
    asc), limit k. The one-sided CMS guarantee carries over: estimates
    never undercount, so a true heavy hitter is displaced only when a
    lighter candidate OVERcounts past it (probability <= 2^-depth per
    pair at width >= 2/support)."""
    if partials is None:
        partials = cms_partials(df, [], col, depth=depth, width=width)
    elif set(partials.columns) != {"i", "j", "n"}:
        # a grain-keyed maintained sketch would join on (i, j) alone
        # here, min'ing across grains instead of summing them — a
        # silently wrong ranking. Refuse; collapsing grains is one
        # cms_merge away.
        raise ValueError(
            "cms_topk needs an UNGROUPED sketch (columns i, j, n); got "
            f"{partials.columns} — cms_merge(partials) across the grain "
            "columns first"
        )
    cand_vals = df.stat.freqItems([col], support).collect()[0][
        f"{col}_freqItems"]
    spark = df.sparkSession
    cands = spark.createDataFrame(
        [(v,) for v in cand_vals], df.select(col).schema)
    est = cms_query(partials, cands, col, depth=depth, width=width)
    return est.orderBy(F.desc("cms_estimate"), F.asc(col)).limit(int(k))
