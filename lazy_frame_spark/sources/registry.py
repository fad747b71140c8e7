"""Test-data table registry: the driver's TPC-H-ish star schema plus
events/documents/embeddings (TESTDATA.md). One parquet file per table.

``load_tables`` returns lazy DataFrames; ``register_views`` additionally
registers them as temp views so the SQL surface (spark.sql) works on the
same names the DuckDB oracle uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {
        name: spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for name in TABLE_NAMES
    }


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
