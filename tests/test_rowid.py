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
    """Bucket offsets are plan literals: the RANK path's plan must
    contain no join and exactly one window (no second in-plan counts
    branch). Uses lineitem — unsorted in the synthetic data, so the
    sorted fast path declines and the rank path is what plans."""
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_shipdate"]
    out = with_row_ids(df, order_by=keys)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_sorted_table_plans_zero_shuffle_ids(spark, sf_dir):
    """orders IS key-sorted in the synthetic data: the enumeration takes
    the sorted fast path — NO window, NO exchange of the data (only the
    tiny per-partition stats agg + broadcast join)."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = with_row_ids(df, order_by=["o_orderkey"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "__lfs_mid__" in plan  # partition-offset enumeration


def test_footer_bounds_ids_identical_to_quantile_path(spark, sf_dir):
    """Parquet footer-stat bounds are a balance-only optimization: the ids
    they produce must be byte-identical to the quantile-job path."""
    from lazy_frame_spark.rowid import parquet_footer_bounds
    from lazy_frame_spark.sources.registry import TABLE_KEYS

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = TABLE_KEYS["lineitem"]
    bounds = parquet_footer_bounds(df, keys[0], 32)
    assert bounds, "parquet scan with stats must yield footer bounds"
    a = with_row_ids(df, order_by=keys).select(ROW_ID, *keys).orderBy(ROW_ID).toPandas()
    b = (
        with_row_ids(df, order_by=keys, bounds=bounds)
        .select(ROW_ID, *keys).orderBy(ROW_ID).toPandas()
    )
    assert a.equals(b)


def test_footer_bounds_none_for_non_parquet(spark):
    from lazy_frame_spark.rowid import parquet_footer_bounds

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    assert parquet_footer_bounds(df, "k", 8) is None


def test_date_leading_key(spark):
    """Spark 4 forbids date→double casts — the date surrogate must go via
    unix_date (regression: this crashed with DATATYPE_MISMATCH)."""
    import datetime

    rows = [(datetime.date(2020, 1, 1) + datetime.timedelta(days=int(i * 7 % 365)), i)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "d date, u long")
    out = with_row_ids(df, order_by=["d", "u"], num_buckets=8).orderBy(ROW_ID).toPandas()
    assert out[ROW_ID].tolist() == list(range(1, 2001))
    assert out["d"].tolist() == sorted(out["d"].tolist())


def test_enumerate_cache_single_handle_lifecycle(spark, sf_dir):
    """cache=True persists exactly one intermediate and the handle
    releases it (the open-cost contract: one scan, one cached frame)."""
    from lazy_frame_spark.rowid import enumerate_rows

    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out, handle = enumerate_rows(df, order_by=["o_orderkey"], cache=True)
    assert handle is not None
    assert out.agg(F.max(ROW_ID)).collect()[0][0] == df.count()
    assert jsc.getPersistentRDDs().size() == base + 1
    handle.unpersist(blocking=True)
    assert jsc.getPersistentRDDs().size() == base


def test_open_cache_false_skips_persist(spark, sf_dir):
    """cache=False open mode: positional queries still produce correct
    ids but NO cached blocks are left behind — the one-shot-query path
    (open → slice → done) must not spend executor storage."""
    from lazy_frame_spark.frame import LazyFrame

    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    lf = LazyFrame.open(
        spark, f"{sf_dir}/orders.parquet", order_by=["o_orderkey"], cache=False
    )
    head = lf.head(5)
    assert [r["o_orderkey"] for r in head.collect()] == [0, 1, 2, 3, 4]
    assert jsc.getPersistentRDDs().size() == base
    # default mode on the same source does cache (and close releases it)
    lf2 = LazyFrame.open(spark, f"{sf_dir}/orders.parquet", order_by=["o_orderkey"])
    assert len(lf2.head(5).collect()) == 5
    assert jsc.getPersistentRDDs().size() == base + 1
    lf2.close()
    assert jsc.getPersistentRDDs().size() == base


def test_string_surrogate_python_matches_sql(spark):
    """The Python-side footer-stat surrogate must agree with the SQL
    bucketing expression, or footer bounds for string keys would land in
    the wrong domain (balance-only, but pin it anyway)."""
    from pyspark.sql import types as T

    from lazy_frame_spark.rowid import _lead_bucket_expr, _surrogate_value

    vals = ["", "a", "zebra", "müller", "exactly7", "longer-than-seven-bytes", "ÿĀ"]
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    got = df.select(_lead_bucket_expr(df, "k").alias("s")).collect()
    sql_side = [r["s"] for r in got]
    py_side = [_surrogate_value(v, T.StringType()) for v in vals]
    assert sql_side == py_side


def test_parquet_footer_stats_match_scan(spark, sf_dir):
    from pyspark.sql import functions as F

    from lazy_frame_spark.rowid import parquet_footer_stats

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n, lo, hi = parquet_footer_stats(df, "o_orderkey")
    want = df.agg(
        F.count("*").alias("n"), F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    assert (n, lo, hi) == (want["n"], want["lo"], want["hi"])


def test_parquet_footer_stats_none_for_non_parquet(spark, tmp_path):
    from lazy_frame_spark.rowid import parquet_footer_stats

    p = tmp_path / "x.csv"
    p.write_text("a\n1\n2\n")
    df = spark.read.option("header", True).csv(str(p))
    assert parquet_footer_stats(df, "a") is None


def test_sorted_fast_path_ids_match_rank_path(spark, sf_dir, tmp_path):
    """A key-sorted parquet table takes the zero-shuffle fast path and
    yields EXACTLY the ids the rank path yields."""
    from lazy_frame_spark import rowid as R

    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    p = str(tmp_path / "sorted_orders")
    src.orderBy("o_orderkey").coalesce(4).write.parquet(p)
    # re-split into several files while preserving global order
    d = spark.read.parquet(p)
    assert R.footer_sorted_candidate(d, "o_orderkey") in (True, False)
    fast = R.sorted_fast_path_ids(d, ["o_orderkey"])
    assert fast is not None, "sorted table must take the fast path"
    slow, _ = R.enumerate_rows(d, order_by=["o_orderkey"], cache=False)
    import pyspark.sql.functions as F

    joined = fast.withColumnRenamed(R.ROW_ID, "fast_id").join(
        slow.withColumnRenamed(R.ROW_ID, "slow_id").select("o_orderkey", "slow_id"),
        on="o_orderkey",
    )
    assert joined.filter(F.col("fast_id") != F.col("slow_id")).count() == 0
    assert fast.count() == d.count()


def test_unsorted_table_rejected(spark, sf_dir, tmp_path):
    """Multi-file random data fails the FREE footer pre-check (zero
    scans); a single-row-group random table passes it vacuously but the
    verify scan still declines — either way, no wrong ids."""
    from lazy_frame_spark import rowid as R

    src = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = str(tmp_path / "unsorted_multi")
    src.repartition(4).write.parquet(p)  # 4 overlapping-range files
    assert R.footer_sorted_candidate(spark.read.parquet(p), "l_orderkey") is False
    # single-row-group source: pre-check is vacuous, verify scan rejects
    assert R.sorted_fast_path_ids(src, ["l_orderkey", "l_linenumber",
                                        "l_partkey", "l_suppkey",
                                        "l_extendedprice", "l_shipdate"]) is None


def test_duplicate_keys_force_fallback(spark, tmp_path):
    """Strictness: duplicated composite keys make in-tie rank assignment
    arbitrary, so the fast path must decline."""
    from lazy_frame_spark import rowid as R

    p = str(tmp_path / "dups")
    spark.createDataFrame(
        [(1,), (2,), (2,), (3,)], "k long"
    ).coalesce(1).write.parquet(p)
    d = spark.read.parquet(p)
    assert R.sorted_fast_path_ids(d, ["k"]) is None


def test_enumerate_rows_via_fast_path_end_to_end(spark, sf_dir, tmp_path):
    """enumerate_rows transparently takes the fast path on sorted input:
    max id == row count and ids are 1..n dense."""
    import pyspark.sql.functions as F

    from lazy_frame_spark import rowid as R

    p = str(tmp_path / "sorted_li")
    spark.read.parquet(f"{sf_dir}/orders.parquet").orderBy(
        "o_orderkey"
    ).coalesce(3).write.parquet(p)
    d = spark.read.parquet(p)
    out, handle = R.enumerate_rows(d, order_by=["o_orderkey"], cache=True)
    n = d.count()
    agg = out.agg(
        F.max(R.ROW_ID).alias("mx"), F.count_distinct(R.ROW_ID).alias("nd")
    ).collect()[0]
    assert (agg["mx"], agg["nd"]) == (n, n)
    if handle is not None:
        handle.unpersist()


def test_columnar_index_matches_full_enumeration(spark, sf_dir):
    """The late-materialization index must return byte-identical rows and
    ids to the full-cache path for ranges and scattered points."""
    from lazy_frame_spark.rowid import ROW_ID, ColumnarPositionalIndex, enumerate_rows
    from lazy_frame_spark.sources.registry import TABLE_KEYS, load_table

    df = load_table(spark, sf_dir, "lineitem")
    keys = TABLE_KEYS["lineitem"]
    full, handle = enumerate_rows(df, order_by=keys, cache=False)
    idx = ColumnarPositionalIndex(df, keys)
    try:
        want = {
            r[ROW_ID]: r
            for r in full.filter((full[ROW_ID] >= 101) & (full[ROW_ID] <= 150)).collect()
        }
        got = {r[ROW_ID]: r for r in idx.row_range(101, 150).collect()}
        assert set(got) == set(want)
        for rid, row in got.items():
            assert row["l_orderkey"] == want[rid]["l_orderkey"]
            assert row["l_extendedprice"] == want[rid]["l_extendedprice"]

        pts = [5, 999, 3000, 1]
        gp = {r[ROW_ID] for r in idx.rows(pts).collect()}
        wp = {r[ROW_ID] for r in full.filter(full[ROW_ID].isin(pts)).collect()}
        assert gp == wp

        import pyspark.sql.functions as F

        # which() never touches the wide table: only key predicates
        n_narrow = idx.which(F.col("l_orderkey") <= 100).count()
        n_full = full.filter(F.col("l_orderkey") <= 100).count()
        assert n_narrow == n_full
    finally:
        idx.close()


def test_columnar_index_empty_selection(spark, sf_dir):
    from lazy_frame_spark.rowid import ColumnarPositionalIndex
    from lazy_frame_spark.sources.registry import TABLE_KEYS, load_table

    idx = ColumnarPositionalIndex(
        load_table(spark, sf_dir, "orders"), TABLE_KEYS["orders"]
    )
    try:
        assert idx.row_range(10**9, 10**9 + 5).count() == 0
    finally:
        idx.close()


def test_null_key_past_head_sample_declines_not_crashes(spark, tmp_path):
    """A NULL in a string sort key BEYOND the 2048-row head sample must
    make the fast path decline (file order vs NULLS FIRST rank order is
    unprovable) — not raise TypeError inside the mapInPandas worker."""
    from lazy_frame_spark import rowid as R

    p = str(tmp_path / "null_tail")
    rows = [(f"k{i:05d}",) for i in range(3000)]
    rows[2500] = (None,)
    spark.createDataFrame(rows, "k string").coalesce(1).write.parquet(p)
    d = spark.read.parquet(p)
    assert R.sorted_fast_path_ids(d, ["k"]) is None
    # and the full enumeration still works via the rank fallback
    ids, handle = R.enumerate_rows(d, order_by=["k"])
    assert ids.count() == 3000
    if handle is not None:
        handle.unpersist()
