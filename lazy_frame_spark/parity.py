"""Parity query registry — the driver-facing correctness surface.

Every implemented operator from SURVEY.md §2 gets an entry here: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an
equivalent DuckDB oracle SQL string over the same parquet tables. The
driver hash-compares them at sf0.01 (CORRECTNESS_r{N}.json).

Conventions (driver compare is schema + order-insensitive value hash):
- every computed/aggregate column is aliased IDENTICALLY in both engines;
- double aggregates are rounded (ROUND(x, 2..4)) in both engines so
  accumulation-order float jitter can't flip the hash;
- integer sums are cast to BIGINT in DuckDB (its SUM(int) yields HUGEINT);
- positional row ids are 1-based ``row_number() OVER (ORDER BY <unique
  key>)`` in both engines (TABLE_KEYS) — deterministic everywhere.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from lazy_frame_spark.frame import LazyFrame
from lazy_frame_spark.rowid import ROW_ID
from lazy_frame_spark.sources.registry import TABLE_KEYS


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → rows-only check (non-SQL-expressible)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn, oracle)
        return fn

    return deco


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _lf(spark: SparkSession, sf_dir: str, name: str) -> LazyFrame:
    return LazyFrame.from_df(_table(spark, sf_dir, name), order_by=TABLE_KEYS[name])


LINEITEM_RID = (
    "row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_partkey, "
    "l_suppkey, l_extendedprice, l_shipdate)"
)


def _with_rid(lf: LazyFrame) -> DataFrame:
    return lf.to_df(with_row_id=True).withColumnRenamed(ROW_ID, "row_id")


# --------------------------------------------------------------------- #
# S1/P3/F2/F3 — the reference's flagship idiom: open → filter → project
# (man/lazy.frame.Rd:91-93; x[x[,k] < v, cols])
# --------------------------------------------------------------------- #

@query(
    "lf_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity < 4.5
    """,
)
def lf_filter_project(spark, sf_dir):
    lf = _lf(spark, sf_dir, "lineitem")
    out = lf.filter("l_quantity", "<", 4.5).select(
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
    )
    return out.to_df()


# --------------------------------------------------------------------- #
# P1 — contiguous row-range extraction (RANGE, src/lazy.frame.c:189-216)
# --------------------------------------------------------------------- #

@query(
    "lf_row_range",
    oracle=f"""
    SELECT * FROM (SELECT {LINEITEM_RID} AS row_id, * FROM lineitem)
    WHERE row_id BETWEEN 101 AND 200
    """,
)
def lf_row_range(spark, sf_dir):
    lf = _lf(spark, sf_dir, "lineitem")
    return _with_rid(lf.row_range(101, 200))


# --------------------------------------------------------------------- #
# P2 — scattered row-point extraction (LINES, src/lazy.frame.c:219-245)
# --------------------------------------------------------------------- #

_POINTS = [5, 15, 25, 111, 1000, 4999, 2, 777]


@query(
    "lf_row_points",
    oracle=f"""
    SELECT * FROM (SELECT {LINEITEM_RID} AS row_id, * FROM lineitem)
    WHERE row_id IN ({", ".join(map(str, _POINTS))})
    """,
)
def lf_row_points(spark, sf_dir):
    lf = _lf(spark, sf_dir, "lineitem")
    return _with_rid(lf.rows(_POINTS))


# --------------------------------------------------------------------- #
# L1/L2 — head / tail (R/lazy.frame.R:234-244)
# --------------------------------------------------------------------- #

@query(
    "lf_head",
    oracle=f"""
    SELECT * FROM (SELECT {LINEITEM_RID} AS row_id, * FROM lineitem)
    WHERE row_id <= 6
    """,
)
def lf_head(spark, sf_dir):
    return _with_rid(_lf(spark, sf_dir, "lineitem").head(6))


@query(
    "lf_tail",
    oracle=f"""
    WITH t AS (SELECT {LINEITEM_RID} AS row_id, * FROM lineitem)
    SELECT * FROM t WHERE row_id > (SELECT max(row_id) - 6 FROM t)
    """,
)
def lf_tail(spark, sf_dir):
    return _with_rid(_lf(spark, sf_dir, "lineitem").tail(6))


# --------------------------------------------------------------------- #
# F2 — the WHICH scan, 1-based indices (src/lazy.frame.c:507-773)
# --------------------------------------------------------------------- #

@query(
    "lf_which",
    oracle=f"""
    SELECT row_id FROM (SELECT {LINEITEM_RID} AS row_id, l_returnflag FROM lineitem)
    WHERE l_returnflag = 'R'
    """,
)
def lf_which(spark, sf_dir):
    return _lf(spark, sf_dir, "lineitem").which("l_returnflag", "==", "R")


# --------------------------------------------------------------------- #
# F2 — all six comparators in the RHS-typed domains
# (opcodes 1-6, R/lazy.frame.R:189-194; typed casts src/lazy.frame.c:543-565)
# --------------------------------------------------------------------- #

@query(
    "lf_filter_eq_str",
    oracle="SELECT * FROM orders WHERE o_orderstatus = 'F'",
)
def lf_filter_eq_str(spark, sf_dir):
    return _lf(spark, sf_dir, "orders").filter("o_orderstatus", "==", "F").to_df()


@query(
    "lf_filter_ne_str",
    oracle="SELECT * FROM lineitem WHERE l_linestatus <> 'O'",
)
def lf_filter_ne_str(spark, sf_dir):
    return _lf(spark, sf_dir, "lineitem").filter("l_linestatus", "!=", "O").to_df()


@query(
    "lf_filter_gt_double",
    oracle="SELECT * FROM orders WHERE o_totalprice > 100000.0",
)
def lf_filter_gt_double(spark, sf_dir):
    return _lf(spark, sf_dir, "orders").filter("o_totalprice", ">", 100000.0).to_df()


@query(
    "lf_filter_lt_double",
    oracle="SELECT * FROM customer WHERE c_acctbal < 0.0",
)
def lf_filter_lt_double(spark, sf_dir):
    return _lf(spark, sf_dir, "customer").filter("c_acctbal", "<", 0.0).to_df()


@query(
    # int RHS → bigint comparison domain (atoi truncation parity,
    # src/lazy.frame.c:543-548): CAST the double column in the oracle too
    "lf_filter_ge_int",
    oracle="SELECT * FROM lineitem WHERE CAST(l_quantity AS BIGINT) >= 49",
)
def lf_filter_ge_int(spark, sf_dir):
    return _lf(spark, sf_dir, "lineitem").filter("l_quantity", ">=", 49).to_df()


@query(
    "lf_filter_le_int",
    oracle="SELECT * FROM part WHERE p_size <= 5",
)
def lf_filter_le_int(spark, sf_dir):
    return _lf(spark, sf_dir, "part").filter("p_size", "<=", 5).to_df()


# --------------------------------------------------------------------- #
# S3/M3 — dims (R/lazy.frame.R:206-215)
# --------------------------------------------------------------------- #

@query(
    "lf_dim",
    oracle="SELECT COUNT(*) AS nrow, 11 AS ncol FROM lineitem",
)
def lf_dim(spark, sf_dir):
    import pyspark.sql.functions as F

    lf = _lf(spark, sf_dir, "lineitem")
    nrow, ncol = lf.dim()
    return spark.range(1).select(
        F.lit(nrow).alias("nrow"), F.lit(ncol).cast("int").alias("ncol")
    )


# --------------------------------------------------------------------- #
# P3 — projection by name and by 1-based index (R/lazy.frame.R:141-147)
# --------------------------------------------------------------------- #

@query(
    "lf_project",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def lf_project(spark, sf_dir):
    # by 1-based index: columns 1 and 5 of lineitem; OOB index 99 dropped
    return _lf(spark, sf_dir, "lineitem").select([1, 5, 99]).to_df()
