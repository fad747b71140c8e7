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
    from lazy_frame_spark.sources.registry import load_table

    return load_table(spark, sf_dir, name)


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


# ===================================================================== #
# M3 — relational completion (SURVEY.md §2.2: capabilities the
# reference's users reached by materializing to R, now Spark-native)
# ===================================================================== #

import pyspark.sql.functions as F  # noqa: E402

from lazy_frame_spark.operators.joins import (  # noqa: E402
    anti_join,
    asof_join,
    broadcast_dim_join,
    range_join,
    semi_join,
)
from lazy_frame_spark.operators.sampling import deterministic_sample  # noqa: E402
from lazy_frame_spark.operators.sorts import top_k  # noqa: E402


# --------------------------------------------------------------------- #
# Aggregations: hash agg with partial (map-side) + final phases is what
# Catalyst plans for groupBy.agg automatically.
# --------------------------------------------------------------------- #

@query(
    "agg_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the headline aggregation. Partial aggregation
    (map-side combine) means the shuffle carries one row per (flag,status)
    per task — a few hundred rows at any scale."""
    li = _table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark, sf_dir):
    li = _table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT o_orderstatus,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           ROUND(AVG(o_totalprice), 2) AS avg_price,
           ROUND(STDDEV_SAMP(o_totalprice), 2) AS sd_price,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_stats(spark, sf_dir):
    o = _table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.round(F.stddev_samp("o_totalprice"), 2).alias("sd_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    li = _table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    o = _table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    _table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# --------------------------------------------------------------------- #
# Joins
# --------------------------------------------------------------------- #

@query(
    "join_broadcast_dims",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_broadcast_dims(spark, sf_dir):
    """Star-schema dimension pickup: both dims broadcast; the customer
    scan never shuffles."""
    c = _table(spark, sf_dir, "customer")
    n = _table(spark, sf_dir, "nation").withColumnRenamed("n_name", "nation")
    r = _table(spark, sf_dir, "region").withColumnRenamed("r_name", "region")
    out = broadcast_dim_join(c, n, on=c["c_nationkey"] == n["n_nationkey"])
    out = broadcast_dim_join(out, r, on=n["n_regionkey"] == r["r_regionkey"])
    return out.select("c_custkey", "c_name", "nation", "region")


@query(
    "join_left_with_agg",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, COUNT(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def join_left_with_agg(spark, sf_dir):
    c = _table(spark, sf_dir, "customer")
    o = _table(spark, sf_dir, "orders")
    j = c.join(o, c["c_custkey"] == o["o_custkey"], "left")
    return j.groupBy("c_custkey", "c_mktsegment").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT * FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0)
    """,
)
def join_semi(spark, sf_dir):
    c = _table(spark, sf_dir, "customer")
    big = _table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return semi_join(c, big.withColumnRenamed("o_custkey", "c_custkey"), on="c_custkey")


@query(
    "join_anti",
    oracle="""
    SELECT * FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark, sf_dir):
    c = _table(spark, sf_dir, "customer")
    o = _table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return anti_join(c, o, on="c_custkey")


@query(
    "join_range_bands",
    oracle="""
    SELECT b.band, COUNT(*) AS n, ROUND(SUM(l.l_extendedprice), 2) AS revenue
    FROM lineitem l
    JOIN (VALUES ('small', 0.0, 10.0), ('mid', 10.0, 30.0), ('large', 30.0, 1e9))
         AS b(band, lo, hi)
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band
    """,
)
def join_range_bands(spark, sf_dir):
    li = _table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [("small", 0.0, 10.0), ("mid", 10.0, 30.0), ("large", 30.0, 1e9)],
        schema="band string, lo double, hi double",
    )
    j = range_join(
        li, bands,
        condition=(li["l_quantity"] >= bands["lo"]) & (li["l_quantity"] < bands["hi"]),
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


@query(
    "join_asof_last_order",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT MAX(o.o_orderdate) FROM orders o
            WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS last_order_date
    FROM events e
    """,
)
def join_asof_last_order(spark, sf_dir):
    """As-of join (backward): each event picks up the latest prior order
    date of the same user — union + one window pass, one shuffle."""
    e = _table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        _table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("user_id"), "o_orderdate")
    )
    out = asof_join(
        e, o, on="user_id", left_time="ts", right_time="o_orderdate",
        value_cols=["o_orderdate"],
    )
    return out.withColumnRenamed("o_orderdate", "last_order_date")


@query(
    "join_q3_revenue",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def join_q3_revenue(spark, sf_dir):
    """TPC-H Q3 shape: filtered dim broadcast into fact joins, grouped
    revenue, top-k (TakeOrderedAndProject — only k rows per partition
    move)."""
    c = _table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem")
    j = broadcast_dim_join(o, c, on=o["o_custkey"] == c["c_custkey"]).join(
        li, li["l_orderkey"] == o["o_orderkey"]
    )
    agg = j.groupBy("l_orderkey", "o_orderdate").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return top_k(
        agg.select("l_orderkey", "revenue", "o_orderdate"),
        [F.col("revenue").desc(), F.col("l_orderkey")],
        10,
    )


# --------------------------------------------------------------------- #
# Window functions
# --------------------------------------------------------------------- #

@query(
    "window_top3_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def window_top3_per_customer(spark, sf_dir):
    from pyspark.sql.window import Window

    o = _table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rn"),
        ).filter(F.col("rn") <= 3)
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    from pyspark.sql.window import Window

    o = _table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice - LAG(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
           AS delta_vs_prev
    FROM orders
    """,
)
def window_lag_delta(spark, sf_dir):
    from pyspark.sql.window import Window

    o = _table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2
        ).alias("delta_vs_prev"),
    )


# --------------------------------------------------------------------- #
# Sorts / top-k
# --------------------------------------------------------------------- #

@query(
    "sort_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def sort_topk_orders(spark, sf_dir):
    o = _table(spark, sf_dir, "orders")
    return top_k(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        25,
    )


# --------------------------------------------------------------------- #
# Set operations
# --------------------------------------------------------------------- #

@query(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union(spark, sf_dir):
    c = _table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    c = _table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark, sf_dir):
    c = _table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (set semantics); exceptAll would be bag-diff


# --------------------------------------------------------------------- #
# Scalar function surface (string/date/math/conditional)
# --------------------------------------------------------------------- #

@query(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS yr,
           MONTH(o_orderdate) AS mo,
           DAY(o_orderdate) AS dy,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           UPPER(o_orderstatus) AS status_u,
           SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
           LENGTH(o_orderpriority) AS prio_len,
           CONCAT(o_orderstatus, '-', o_orderpriority) AS status_prio,
           ROUND(o_totalprice * 0.07, 2) AS tax,
           ABS(o_totalprice - 100000.0) AS dist_100k,
           CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_k,
           MOD(o_orderkey, 7) AS key_mod7,
           CASE WHEN o_totalprice > 150000.0 THEN 'big' ELSE 'small' END AS size_class,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_decoded
    FROM orders
    """,
)
def scalar_functions(spark, sf_dir):
    o = _table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_add(F.col("o_orderdate"), 30).alias("due_date"),
        F.upper("o_orderstatus").alias("status_u"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.round(F.col("o_totalprice") * 0.07, 2).alias("tax"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist_100k"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_k"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.when(F.col("o_totalprice") > 150000.0, "big").otherwise("small").alias("size_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_decoded"),
    )


# --------------------------------------------------------------------- #
# Sampling
# --------------------------------------------------------------------- #

@query(
    "sample_deterministic",
    oracle="SELECT * FROM orders WHERE o_orderkey % 97 = 0",
)
def sample_deterministic(spark, sf_dir):
    return deterministic_sample(_table(spark, sf_dir, "orders"), "o_orderkey", 97)


@query("sample_bernoulli", oracle=None)  # seeded RNG is engine-specific → rows-only
def sample_bernoulli(spark, sf_dir):
    from lazy_frame_spark.operators.sampling import sample

    return sample(_table(spark, sf_dir, "lineitem"), 0.01, seed=42)


@query("sample_stratified", oracle=None)  # rows-only: engine-specific RNG
def sample_stratified(spark, sf_dir):
    """The vignette's imbalanced-bootstrap pattern
    (inst/doc/lazy.frame.Rnw:157-174): per-stratum sampling fractions."""
    from lazy_frame_spark.operators.sampling import stratified_sample

    li = _table(spark, sf_dir, "lineitem")
    return stratified_sample(
        li, "l_returnflag", {"R": 0.02, "A": 0.02, "N": 0.005}, seed=7
    )
