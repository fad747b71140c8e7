"""Sampling — the vignette's designed-for use case
(``inst/doc/lazy.frame.Rnw:98-101,157-174``: random point extraction and
imbalanced-class bootstrap).

Three flavors:
- ``sample``: Bernoulli/seeded — Spark-native, statistically correct,
  but not reproducible across engines (oracle gets rows-only checks);
- ``stratified_sample``: per-stratum fractions via ``sampleBy`` — the
  vignette's bootstrap pattern, distributed;
- ``deterministic_sample``: hash/modulus-based — fully reproducible in any
  engine (used for oracle-checked pipelines and stable train/test splits).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    return df.sample(fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame, col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    return df.sampleBy(col, fractions=fractions, seed=seed)


def deterministic_sample(df: DataFrame, key_col: str, modulus: int, bucket: int = 0) -> DataFrame:
    """Keep rows where ``key % modulus == bucket`` — engine-independent,
    repeatable, and pushdown-friendly (pure JVM expression)."""
    return df.filter(F.pmod(F.col(key_col), F.lit(modulus)) == F.lit(bucket))


def reservoir_per_group(
    df: DataFrame,
    group_cols: str | Sequence[str],
    k: int,
    id_cols: Sequence[str],
    seed: int = 0,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic k-row-per-group sample — the distributed equivalent
    of per-stratum reservoir sampling: rank each group's rows by the
    seeded md5 hash of their id columns and keep the ``k`` smallest.
    Because the hash is a pure function of (seed, ids), the selected set
    is a uniform-without-replacement draw that is IDENTICAL across
    engines, partitionings, and reruns — resumable pipelines get the
    same sample every time, and a SQL oracle can verify it row-for-row
    (unlike RNG-based ``sampleBy``).

    Scale: ONE shuffle on the group key; each group ranks independently.
    A pathologically hot group serializes on one task — the usual
    window-skew bound — but the output is at most ``k`` rows per group,
    so downstream stays tiny regardless of input skew."""
    from pyspark.sql import Window

    from lazy_frame_spark.operators.mixing import shuffle_key

    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    w = Window.partitionBy(*gcols).orderBy(shuffle_key(seed, list(id_cols)))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_cols: Sequence[str],
    seed: int = 0,
    key_col: str = "sample_key",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row draws u from its seeded md5
    hash and ranks by ``ln(u) / w`` — the k largest keys are a
    without-replacement draw with inclusion probability proportional to
    weight. The md5-derived u makes the draw a pure function of
    (seed, ids): identical across engines, partitionings, and reruns,
    so an SQL oracle can verify the SELECTED SET row-for-row — the same
    property the uniform samplers here trade RNG for.

    Scale: one map pass to compute keys, then ``ORDER BY key LIMIT k``
    → TakeOrderedAndProject (per-partition heaps, k-row driver merge,
    no global sort). Rows with non-positive weight are excluded (their
    inclusion probability is zero).
    """
    from lazy_frame_spark.operators.mixing import shuffle_key

    h = F.conv(F.substring(shuffle_key(seed, list(id_cols)), 1, 15), 16, 10).cast(
        "bigint"
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn(key_col, key)
        .orderBy(F.desc(key_col), *[F.col(c) for c in id_cols])
        .limit(k)
    )
