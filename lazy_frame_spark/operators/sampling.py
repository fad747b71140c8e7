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
