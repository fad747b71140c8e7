"""Corpus mixing and training-order operators.

What a training-data pipeline does after curation: fix a *global,
reproducible shuffle order* for the examples (so every rerun and every
resume sees the same sequence) and *resample domains to a target mix*
(so the training distribution matches the recipe, not the crawl).

Both are built on portable md5-derived keys (the same cross-engine
anchor as operators/dedup.token_hash), so a DuckDB oracle reproduces
every value bit-for-bit:

- ``shuffle_key``: md5 over (seed, id columns) — a uniform, seeded,
  data-deterministic sort key. Changing the seed re-shuffles; keeping it
  reproduces the epoch exactly.
- ``epoch_shuffle``: orders the corpus by that key. The physical plan is
  a range repartition + within-partition sort (Spark's scalable total
  sort — no single reducer); the optional global rank reuses the
  value-bucketed parallel ranking from rowid.py, never a one-task
  window.
- ``uniform_bp`` / ``sample_by_rates``: per-row uniform in integer
  basis points from the hash — domain-conditional Bernoulli acceptance
  as a pure map-side filter: no shuffle, no RNG state, deterministic
  resume.
- ``rates_for_target_mix``: turns target proportions + observed domain
  counts into per-domain acceptance rates (downsampling only — the
  largest achievable corpus with the exact target mix).

Reference parity note: the reference (bwlewis/lazy.frame) has no corpus
operations (SURVEY.md §2.2) — north-star scope.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lazy_frame_spark.rowid import with_row_ids

#: basis-point denominator for acceptance sampling
BP = 10_000


def shuffle_key(seed: int, cols: Sequence[Column | str]) -> Column:
    """Seeded, portable shuffle key: ``md5(seed:col1:col2:…)``. Identical
    in DuckDB as ``md5(seed || ':' || col1 || …)`` — integers render the
    same way in both engines' string casts."""
    parts = [F.lit(str(int(seed)))] + [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in cols
    ]
    return F.md5(F.concat_ws(":", *parts))


def epoch_shuffle(
    df: DataFrame,
    key_cols: Sequence[str],
    seed: int = 0,
    key_col: str = "shuffle_key",
    rank_col: str | None = None,
) -> DataFrame:
    """Reproducible global shuffle: attach the seeded key and return the
    frame ordered by it. ``orderBy`` compiles to a range exchange plus
    per-partition sort — Spark's distributed total ordering, so writing
    the result yields globally shuffled shards with no single-task
    stage. ``rank_col`` additionally materializes the 1-based global
    position via the value-bucketed parallel rank (rowid.py) — the key
    is a string, so it buckets on the byte-prefix surrogate, not one
    reducer."""
    out = df.withColumn(key_col, shuffle_key(seed, key_cols))
    if rank_col is not None:
        return with_row_ids(out, order_by=[key_col], col=rank_col)
    return out.orderBy(key_col)


def uniform_bp(seed: int, cols: Sequence[Column | str]) -> Column:
    """Deterministic per-row uniform draw in integer basis points
    [0, 10000): the 60-bit md5-prefix hash of (seed, cols) mod 10^4.
    Engine-portable (dedup.token_hash's anchor) and exactly resumable —
    a row's draw never depends on partitioning or scan order."""
    h = F.conv(F.substring(shuffle_key(seed, cols), 1, 15), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(BP))


def sample_by_rates(
    df: DataFrame,
    domain_col: str,
    rates_bp: Mapping[str, int],
    id_cols: Sequence[str],
    seed: int = 0,
    default_bp: int = 0,
) -> DataFrame:
    """Domain-conditional Bernoulli downsampling: keep a row iff its
    deterministic uniform draw falls below its domain's acceptance rate
    (basis points). A pure map-side filter — at 100 TB this is a scan
    with a predicate, nothing shuffles, and the filter composes with
    column pruning like any Catalyst predicate."""
    rate = F.lit(int(default_bp))
    for dom, bp in sorted(rates_bp.items()):
        rate = F.when(F.col(domain_col) == dom, F.lit(int(bp))).otherwise(rate)
    return df.filter(uniform_bp(seed, id_cols) < rate)


def rates_for_target_mix(
    counts: Mapping[str, int], target_weights: Mapping[str, float]
) -> dict[str, int]:
    """Per-domain acceptance rates (basis points) that hit the target mix
    by downsampling only: the achievable corpus size is limited by the
    domain that is scarcest relative to its target share
    (``T = min(count_d / w_d)``), and every domain keeps ``T * w_d`` of
    its rows. Domains absent from ``target_weights`` get rate 0; a
    target domain absent from the corpus forces T = 0 (the empty corpus
    is the only one achieving that mix by downsampling alone) rather
    than raising."""
    total_w = sum(target_weights.values())
    norm = {d: w / total_w for d, w in target_weights.items() if w > 0}
    t = min(counts.get(d, 0) / w for d, w in norm.items())
    return {
        d: min(BP, int(t * w / counts[d] * BP)) if counts.get(d) else 0
        for d, w in norm.items()
    }


def temperature_weights(
    counts: Mapping[str, int], alpha: float = 0.5
) -> dict[str, float]:
    """Temperature-based mixture weights — the standard multilingual /
    multi-domain sampling scheme: target share of domain d is
    ``count_d^alpha / sum(count^alpha)``. ``alpha=1`` reproduces the
    natural (proportional) mix, ``alpha=0`` the uniform mix; the usual
    0.2-0.7 range upsamples the tail RELATIVE to its natural share
    while keeping heads dominant. Feed the result straight into
    ``rates_for_target_mix``/``mix_corpora`` (they renormalize, so raw
    ``count^alpha`` values are returned — exact in float for the
    integer counts involved)."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    return {d: float(c) ** alpha for d, c in counts.items() if c > 0}


def mix_temperature(
    df: DataFrame,
    domain_col: str,
    alpha: float,
    id_cols: Sequence[str],
    seed: int = 0,
) -> DataFrame:
    """End-to-end temperature mixing: one count aggregation (k-row
    collect), ``count^alpha`` target weights, downsampling-only rates,
    map-side acceptance filter — same scan shape as ``mix_corpora``
    (ONE pass over the corpus; the count agg is partial-aggregated)."""
    rows = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("c")).collect()
    # NULL domains are dropped (rate 0 via default_bp): a None key
    # would crash the sorted() rate chain, and an unattributed row has
    # no defensible share in a domain mix anyway
    counts = {r[domain_col]: r["c"] for r in rows
              if r[domain_col] is not None}
    rates = rates_for_target_mix(counts, temperature_weights(counts, alpha))
    return sample_by_rates(
        df, domain_col, rates, id_cols=id_cols, seed=seed, default_bp=0
    )


def mix_corpora(
    df: DataFrame,
    domain_col: str,
    target_weights: Mapping[str, float],
    id_cols: Sequence[str],
    seed: int = 0,
) -> DataFrame:
    """End-to-end domain mixing: one count aggregation (k rows collect,
    k = number of domains), rate computation on the driver, then the
    map-side acceptance filter. The expected output proportions match
    ``target_weights`` to sampling noise."""
    rows = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("c")).collect()
    counts = {r[domain_col]: r["c"] for r in rows}
    rates = rates_for_target_mix(counts, target_weights)
    return sample_by_rates(
        df, domain_col, rates, id_cols=id_cols, seed=seed, default_bp=0
    )


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    n: int,
    order_by: Sequence[str],
    pre_cut: bool = True,
) -> DataFrame:
    """Keep at most ``n`` rows per group — the anti-spam cap every web
    corpus applies per domain/source (one hostile domain must not be
    able to dominate the training mix). ``order_by`` decides WHICH n
    survive (e.g. quality score desc, doc_id as tiebreak); make it a
    total order within each group or the selection at the boundary is
    engine-arbitrary.

    Scale shape: the naive single window puts every row of a hot group
    through ONE task. With ``pre_cut`` (default), a local pass ranks
    within (group, scan partition) first — Spark's window exchange
    hashes on BOTH keys, so a hot domain spreads across tasks — and
    keeps n per cell; only ≤ n x touched-partitions rows per group
    reach the global rank. Every global top-n row survives its local
    cut by construction, so results are identical with or without the
    pre-cut (property-tested)."""
    from pyspark.sql import Window

    order = [F.col(c) for c in order_by]
    out = df
    if pre_cut:
        wl = Window.partitionBy(
            *[F.col(c) for c in group_cols], F.spark_partition_id()
        ).orderBy(*order)
        out = (
            out.withColumn("__rl__", F.row_number().over(wl))
            .filter(F.col("__rl__") <= n)
            .drop("__rl__")
        )
    wg = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order)
    return (
        out.withColumn("__rg__", F.row_number().over(wg))
        .filter(F.col("__rg__") <= n)
        .drop("__rg__")
    )
