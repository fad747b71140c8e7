"""Deterministic train/validation/test corpus splitting.

The one operation every training pipeline runs exactly once per corpus —
and the one where nondeterminism is most expensive: a split that shifts
between runs (or between engines) leaks validation data into training.
So no ``rand()``: the split is a pure function of the row's id and a
seed, via the engine-portable md5 basis-point draw the mixing module
already uses (``mixing.uniform_bp`` — identical bits in Spark and
DuckDB, `('0x' || substr(md5(seed:id),1,15))::BIGINT % 10000`).

100 TB design: the assignment is a stateless map expression — no
shuffle, no sort, no driver state, trivially parallel, and stable under
repartitioning, re-runs, and incremental corpus growth (a new document's
split never depends on other rows). Split audits (`split_counts`) are a
single partial aggregation.

Reference parity note: the reference (bwlewis/lazy.frame) has no
sampling/splitting at all — north-star scope (SURVEY.md §2.2).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lazy_frame_spark.operators.mixing import uniform_bp

#: default 80/10/10 as cumulative basis-point upper bounds
DEFAULT_WEIGHTS_BP: dict[str, int] = {"train": 8000, "valid": 9000, "test": 10000}


def split_label(
    seed: int,
    id_cols: Sequence[Column | str],
    weights_bp: Mapping[str, int] | None = None,
) -> Column:
    """A split-label Column from cumulative basis-point thresholds.

    ``weights_bp`` maps label → CUMULATIVE upper bound in [0, 10000],
    evaluated in insertion order; the last bound must be 10000 so every
    row lands somewhere. Default 80/10/10 train/valid/test.
    """
    weights_bp = dict(weights_bp or DEFAULT_WEIGHTS_BP)
    bounds = list(weights_bp.values())
    if bounds != sorted(bounds) or bounds[-1] != 10000:
        raise ValueError(
            "weights_bp must be cumulative ascending bounds ending at 10000"
        )
    u = uniform_bp(seed, id_cols)
    expr = None
    for label, bound in weights_bp.items():
        cond = u < F.lit(int(bound))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return expr


def assign_split(
    df: DataFrame,
    id_cols: Sequence[str],
    seed: int = 1,
    weights_bp: Mapping[str, int] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """The corpus with a deterministic ``split`` column appended."""
    return df.withColumn(out_col, split_label(seed, id_cols, weights_bp))


def split_counts(
    df: DataFrame,
    id_cols: Sequence[str],
    seed: int = 1,
    weights_bp: Mapping[str, int] | None = None,
    size_col: str | None = None,
) -> DataFrame:
    """Per-split audit: row count (and total of ``size_col`` when given)
    — the number every pipeline checks before a training run."""
    d = assign_split(df, id_cols, seed=seed, weights_bp=weights_bp)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    if size_col is not None:
        aggs.append(F.sum(size_col).cast("bigint").alias(f"sum_{size_col}"))
    return d.groupBy("split").agg(*aggs)
