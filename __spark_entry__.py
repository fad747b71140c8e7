"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2),
backed by lazy_frame_spark.parity.REGISTRY.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted entries get a
rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's canonical
    idiom ``x[x[, k] < v, cols]`` (man/lazy.frame.Rd:91-93) as one Catalyst
    plan — lazy open → typed scalar filter → projection."""
    from lazy_frame_spark.parity import REGISTRY
    from lazy_frame_spark.session import tune_session

    tune_session(spark)
    return REGISTRY["lf_filter_project"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lazy_frame_spark.parity import REGISTRY
    from lazy_frame_spark.session import tune_session

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # pin UTC + AQE even if the driver never called entry() first —
            # timestamp comparisons against DuckDB require a UTC session
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from lazy_frame_spark.parity import REGISTRY

    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
