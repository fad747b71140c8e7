from pyspark.sql import functions as F

from lazy_frame_spark.rowid import ROW_ID, with_row_ids


def test_file_order_ids_contiguous(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = df.count()
    out = with_row_ids(df)
    stats = out.agg(
        F.min(ROW_ID).alias("mn"),
        F.max(ROW_ID).alias("mx"),
        F.countDistinct(ROW_ID).alias("d"),
    ).collect()[0]
    assert (stats["mn"], stats["mx"], stats["d"]) == (1, n, n)


def test_file_order_ids_deterministic(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = with_row_ids(df).select("o_orderkey", ROW_ID).toPandas().sort_values(ROW_ID)
    b = with_row_ids(df).select("o_orderkey", ROW_ID).toPandas().sort_values(ROW_ID)
    assert a["o_orderkey"].tolist() == b["o_orderkey"].tolist()


def test_order_by_ids_match_sort(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = with_row_ids(df, order_by=["c_custkey"]).orderBy(ROW_ID).toPandas()
    assert out["c_custkey"].tolist() == sorted(out["c_custkey"].tolist())
    assert out[ROW_ID].tolist() == list(range(1, len(out) + 1))


def test_multipartition_ids(spark):
    df = spark.range(0, 100_000, 1, 16).toDF("x")
    out = with_row_ids(df)
    assert out.select(ROW_ID).distinct().count() == 100_000
    assert out.agg(F.max(ROW_ID)).collect()[0][0] == 100_000
