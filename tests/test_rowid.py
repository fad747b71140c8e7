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


def test_ordered_ids_invariant_to_bucket_count(spark, sf_dir):
    """Ids are the global sort rank — the quantile bucket count is an
    execution detail and must never change the numbering."""
    from lazy_frame_spark.sources.registry import TABLE_KEYS

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = TABLE_KEYS["lineitem"]
    base = None
    for b in (1, 4, 32):
        out = (
            with_row_ids(df, order_by=keys, num_buckets=b)
            .select(ROW_ID, *keys)
            .orderBy(ROW_ID)
            .toPandas()
        )
        if base is None:
            base = out
        else:
            assert out.equals(base), f"bucket count {b} changed ids"


def test_ordered_ids_with_null_leading_key(spark):
    df = spark.createDataFrame(
        [(None, "a"), (2, "b"), (1, "c"), (None, "d")], "k int, v string"
    )
    out = with_row_ids(df, order_by=["k", "v"]).orderBy(ROW_ID).collect()
    # Spark sorts NULLs first ascending; ids must be total and contiguous
    assert [r[ROW_ID] for r in out] == [1, 2, 3, 4]
    assert [r["v"] for r in out] == ["a", "d", "c", "b"]


def test_string_leading_key_exact_ids(spark):
    """A string leading key must produce exact global ranks via the
    byte-prefix surrogate — and must NOT fall back to a single bucket."""
    import random
    import string as st

    from pyspark.sql import functions as F

    from lazy_frame_spark.rowid import _lead_bucket_expr

    rng = random.Random(7)
    words = [
        "".join(rng.choices(st.ascii_lowercase, k=rng.randint(1, 12)))
        for _ in range(300)
    ]
    data = [(rng.choice(words), i) for i in range(5000)]
    df = spark.createDataFrame(data, "k string, u long")
    out = with_row_ids(df, order_by=["k", "u"], num_buckets=8).orderBy(ROW_ID).toPandas()
    assert out[ROW_ID].tolist() == list(range(1, 5001))
    assert out["k"].tolist() == sorted(out["k"].tolist())

    # the surrogate must yield >1 quantile bound: parallel ranking, not a
    # one-task row_number (the 100× scale hazard this module exists to avoid)
    expr = _lead_bucket_expr(df, "k")
    assert expr is not None
    probs = [i / 8 for i in range(1, 8)]
    q = df.select(
        F.percentile_approx(expr, F.array(*[F.lit(p) for p in probs]), 1_000).alias("q")
    ).collect()[0]["q"]
    assert len(set(q)) > 1


def test_ordered_ids_plan_is_single_scan(spark, sf_dir):
    """Bucket offsets are plan literals: the ranked plan must contain no
    join and exactly one window (no second in-plan counts branch)."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = with_row_ids(df, order_by=["o_orderkey"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Window") == 1
