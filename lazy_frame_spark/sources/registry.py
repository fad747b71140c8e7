"""Test-data table registry: the driver's TPC-H-ish star schema plus
events/documents/embeddings (TESTDATA.md). One parquet file per table.

``load_tables`` returns lazy DataFrames; ``register_views`` additionally
registers them as temp views so the SQL surface (spark.sql) works on the
same names the DuckDB oracle uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: unique, deterministic ordering keys per table — used for oracle-
#: reproducible positional row ids (rowid.with_row_ids(order_by=...))
TABLE_KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
    # extend the tiebreak until the ordering is total (verified unique)
    "lineitem": [
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_shipdate",
    ],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table, normalizing the events ``ts`` column to
    TimestampType (LTZ) whatever the generator wrote:

    - nanosecond int64 (older generators): Spark's parquet reader rejects
      nanos, so read as long (``spark.sql.legacy.parquet.nanosAsLong``)
      and convert JVM-side with integer DIV (double math would lose
      precision above 2^53 ns);
    - ``isAdjustedToUTC=false`` microseconds (current generator): Spark 4
      infers TIMESTAMP_NTZ, which watermarks/event-time ops reject
      ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]) — cast to TimestampType;
      the session pins UTC (session.py), so the instant is unchanged and
      matches DuckDB's naive-UTC reading of the same file."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
