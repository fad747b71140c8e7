"""Relational operators: as-of join semantics, range join, sampling,
top-k determinism."""

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from lazy_frame_spark.operators.joins import anti_join, asof_join, range_join, semi_join
from lazy_frame_spark.operators.sampling import deterministic_sample, stratified_sample
from lazy_frame_spark.operators.sorts import top_k


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:00:03"), 100.0),
            ("A", ts("2024-01-01 10:00:00"), 99.0),
            ("B", ts("2024-01-01 10:00:01"), 50.0),
            ("C", ts("2024-01-01 10:00:05"), 7.0),  # no quote for C
        ],
        "sym string, t timestamp, px double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", ts("2024-01-01 09:59:59"), 98.5),
            ("A", ts("2024-01-01 10:00:02"), 99.5),
            ("A", ts("2024-01-01 10:00:03"), 99.9),  # tie with trade 1
            ("B", ts("2024-01-01 10:00:04"), 49.0),  # after B's trade
        ],
        "sym string, qt timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="qt",
        value_cols=["bid"],
    ).toPandas().set_index(["sym", "px"])
    # trade at 10:00:03 ties with quote at 10:00:03 → takes it (<= semantics)
    assert out.loc[("A", 100.0), "bid"] == 99.9
    assert out.loc[("A", 99.0), "bid"] == 98.5
    # B's only quote is later → no match
    assert out.loc[("B", 50.0), "bid"] != out.loc[("B", 50.0), "bid"] or \
        out.loc[("B", 50.0), "bid"] is None or str(out.loc[("B", 50.0), "bid"]) == "nan"
    assert str(out.loc[("C", 7.0), "bid"]) == "nan"


def test_asof_forward(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="qt",
        value_cols=["bid"], direction="forward",
    ).toPandas().set_index(["sym", "px"])
    assert out.loc[("B", 50.0), "bid"] == 49.0  # next quote after the trade
    assert out.loc[("A", 99.0), "bid"] == 99.5  # next at/after 10:00:00 is 10:00:02


def test_asof_row_count_preserved(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_time="t", right_time="qt",
                    value_cols=["bid"])
    assert out.count() == trades.count()


def test_range_join(spark):
    pts = spark.createDataFrame([(1, 5.0), (2, 15.0), (3, 50.0)], "id int, v double")
    bands = spark.createDataFrame(
        [("lo", 0.0, 10.0), ("hi", 10.0, 40.0)], "band string, lo double, hi double"
    )
    out = range_join(
        pts, bands, condition=(pts["v"] >= bands["lo"]) & (pts["v"] < bands["hi"])
    ).select("id", "band").toPandas().set_index("id")
    assert out.loc[1, "band"] == "lo"
    assert out.loc[2, "band"] == "hi"
    assert 3 not in out.index  # outside all bands → dropped (inner)


def test_semi_anti_partition(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("c_custkey")
    )
    with_orders = semi_join(c, o, on="c_custkey").count()
    without = anti_join(c, o, on="c_custkey").count()
    assert with_orders + without == c.count()


def test_deterministic_sample_is_stable(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = deterministic_sample(o, "o_orderkey", 10).count()
    b = deterministic_sample(o, "o_orderkey", 10).count()
    assert a == b > 0


def test_stratified_sample_fractions(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = stratified_sample(li, "l_returnflag", {"R": 0.5, "A": 0.0, "N": 0.0}, seed=1)
    flags = {r[0] for r in out.select("l_returnflag").distinct().collect()}
    assert flags == {"R"}


def test_topk_deterministic(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = top_k(o, [F.col("o_totalprice").desc(), F.col("o_orderkey")], 5).collect()
    b = top_k(o, [F.col("o_totalprice").desc(), F.col("o_orderkey")], 5).collect()
    assert a == b and len(a) == 5


def test_salted_join_matches_plain(spark, sf_dir):
    from lazy_frame_spark.operators.joins import salted_join

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = o.join(c, "o_custkey").count()
    salted = salted_join(o, c, on="o_custkey", salt_buckets=4).count()
    assert salted == plain


def test_salted_join_auto_sizing(spark, sf_dir):
    from lazy_frame_spark.operators.joins import salted_join, suggest_salt_buckets

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    # sf0.001 orders: no key approaches the per-task target → plain join path
    assert suggest_salt_buckets(o, "o_custkey", sample_fraction=1.0) == 1
    auto = salted_join(o, c, on="o_custkey", salt_buckets="auto")
    assert "__salt__" not in auto.columns
    assert auto.count() == o.join(c, "o_custkey").count()
    # a genuinely hot key (every row the same) sized against a tiny target
    hot = o.select(F.lit(1).alias("k"))
    n = suggest_salt_buckets(hot, "k", sample_fraction=1.0, target_rows_per_task=100)
    assert 1 < n <= 256
    # sizing is an estimate: full-sample count/target, ceil'd, capped
    import math

    assert n == min(256, math.ceil(hot.count() / 100))


def test_ivf_topk_matches_bruteforce_head(spark, sf_dir):
    from lazy_frame_spark.operators.similarity import IVFIndex, cosine_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in e.filter(F.col("vec_id") == 3).collect()[0]["embedding"]]
    ivf = IVFIndex.fit_deterministic(e, k=8)
    approx = ivf.topk(e, q, k=5, n_probe=8)  # probing ALL cells == exact
    exact = cosine_topk(e, q, k=5)
    assert [r["vec_id"] for r in approx.collect()] == [r["vec_id"] for r in exact.collect()]
    # partial probe still finds the self-match first
    part = ivf.topk(e, q, k=3, n_probe=2).collect()
    assert part[0]["vec_id"] == 3 and part[0]["cos_sim"] == 1.0


def test_weighted_sample_deterministic_and_positive_weights(spark):
    from lazy_frame_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame(
        [(i, float(i % 7) if i % 11 else 0.0) for i in range(1, 500)],
        "id long, w double",
    )
    a = [r["id"] for r in weighted_sample_topk(df, "w", 20, ["id"], seed=3).collect()]
    b = [r["id"] for r in weighted_sample_topk(df, "w", 20, ["id"], seed=3).collect()]
    assert a == b and len(a) == 20
    zero_w = {r["id"] for r in df.filter("w <= 0").collect()}
    assert not zero_w & set(a)


def test_weighted_sample_prefers_heavy_rows(spark):
    """Across seeds, a row with 50x the weight must be included far more
    often than a light row (A-ES inclusion is weight-proportional)."""
    from lazy_frame_spark.operators.sampling import weighted_sample_topk

    rows = [(i, 50.0 if i <= 10 else 1.0) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "id long, w double")
    heavy_hits = light_hits = 0
    for seed in range(8):
        picked = {
            r["id"] for r in weighted_sample_topk(df, "w", 30, ["id"], seed=seed).collect()
        }
        heavy_hits += len(picked & set(range(1, 11)))
        light_hits += len(picked - set(range(1, 11)))
    # 10 heavy rows (w=50) vs 190 light (w=1): heavy rows should be
    # almost always selected (expected ~10/seed), lights fill the rest
    assert heavy_hits >= 8 * 8  # ≥80% of heavy slots taken
    assert heavy_hits / 10 > light_hits / 190  # per-row inclusion rate


def test_weighted_sample_plan_is_topk(spark):
    from lazy_frame_spark.operators.sampling import weighted_sample_topk
    from lazy_frame_spark.plans import audit

    df = spark.range(1, 1000).select(
        F.col("id"), (F.col("id") % 5 + 1).cast("double").alias("w")
    )
    assert audit.has_take_ordered(weighted_sample_topk(df, "w", 10, ["id"]))


def test_rolling_range_window_values(spark):
    """Hand-checked rolling 1-hour frame: events at 0, 30, 90, 200 min."""
    from pyspark.sql.window import Window

    base = datetime(2024, 1, 1, 0, 0)
    rows = [
        (1, base, 1, 1.0),
        (2, datetime(2024, 1, 1, 0, 30), 1, 2.0),
        (3, datetime(2024, 1, 1, 1, 30), 1, 4.0),
        (4, datetime(2024, 1, 1, 3, 20), 1, 8.0),
        (5, base, 2, 16.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    got = {
        r["event_id"]: (r["n"], r["s"])
        for r in df.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum("value").over(w).alias("s"),
        ).collect()
    }
    # event 3 at 90min sees event 2 (30min, within 1h) but not event 1
    assert got == {1: (1, 1.0), 2: (2, 3.0), 3: (2, 6.0), 4: (1, 8.0), 5: (1, 16.0)}


def test_embedding_centroids_match_numpy(spark):
    import numpy as np

    rows = [(i, [float(i), float(i * 2), 1.0], i % 2) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {}
    out = (
        df.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("c"))
        .collect()
    )
    for r in out:
        got.setdefault(r["label"], {})[r["dim"]] = r["c"]
    for lbl in (0, 1):
        exp = np.mean([r[1] for r in rows if r[2] == lbl], axis=0)
        for d in range(3):
            assert abs(got[lbl][d] - exp[d]) < 1e-9


def test_histogram_fixed_bins_and_clamp(spark):
    from lazy_frame_spark.operators.stats import histogram_fixed

    df = spark.createDataFrame([(float(v),) for v in [0, 1, 9.9, 10, 25, 99]], "x double")
    got = {r["bin"]: r["n"] for r in histogram_fixed(df, "x", lo=0.0, width=10.0).collect()}
    assert got == {0: 3, 1: 1, 2: 1, 9: 1}
    clamped = {r["bin"]: r["n"] for r in histogram_fixed(df, "x", 0.0, 10.0, clamp_bins=3).collect()}
    assert clamped == {0: 3, 1: 1, 2: 2}


def test_frequent_items_exact_matches_bruteforce(spark):
    from lazy_frame_spark.operators.stats import frequent_items_exact

    # 1000 rows: item 1 x400, item 2 x300, items 3..32 x10 each
    vals = [1] * 400 + [2] * 300 + [i for i in range(3, 33) for _ in range(10)]
    df = spark.createDataFrame([(v,) for v in vals], "k int")
    got = {r["item"]: r["n"] for r in frequent_items_exact(df, "k", support=0.25).collect()}
    assert got == {1: 400, 2: 300}
    # lighter support keeps the 1%-ers too
    got2 = {r["item"]: r["n"] for r in frequent_items_exact(df, "k", support=0.01).collect()}
    assert got2[1] == 400 and got2[2] == 300 and got2[5] == 10 and len(got2) == 32


def test_frequent_items_bad_support(spark):
    from lazy_frame_spark.operators.stats import frequent_items_exact

    df = spark.createDataFrame([(1,)], "k int")
    import pytest as _pt
    with _pt.raises(ValueError):
        frequent_items_exact(df, "k", support=0.0)


def test_triangle_count_known_graphs(spark):
    from lazy_frame_spark.operators.graph import triangle_count

    def tri(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        return triangle_count(df).collect()[0]["n_triangles"]

    # K4: 4 triangles; input has duplicate + reversed + self edges to
    # exercise canonicalization
    k4 = [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (3, 4), (1, 1)]
    assert tri(k4) == 4
    # square + one diagonal: 2 triangles
    assert tri([(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]) == 2
    # path: 0 triangles
    assert tri([(1, 2), (2, 3), (3, 4)]) == 0
    # star (hub): 0 triangles despite high hub degree
    assert tri([(0, i) for i in range(1, 20)]) == 0


def test_hilbert_reference_full_grid_permutation_and_adjacency():
    """bits=4 complete proof: all 256 cells map to a permutation of
    0..255 and consecutive indices are Manhattan-adjacent cells — the
    defining properties of a Hilbert curve (z-order fails the second)."""
    from lazy_frame_spark.operators.layout import hilbert_xy2d

    n = 16
    seen = {}
    for x in range(n):
        for y in range(n):
            d = hilbert_xy2d(x, y, 4)
            assert 0 <= d < n * n and d not in seen
            seen[d] = (x, y)
    for d in range(1, n * n):
        (x1, y1), (x2, y2) = seen[d - 1], seen[d]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_spark_matches_reference(spark):
    import random

    from lazy_frame_spark.operators.layout import hilbert_xy2d, with_hilbert

    rng = random.Random(41)
    rows = [(i, rng.randrange(256), rng.randrange(256)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r["id"]: r["hval"]
        for r in with_hilbert(df, "x", "y", bits=8).select("id", "hval").collect()
    }
    for i, x, y in rows:
        assert got[i] == hilbert_xy2d(x, y, 8)


def test_hilbert_layout_tightens_file_spans(spark):
    """Range-partitioning by the Hilbert index gives each partition a
    bounded span in BOTH dimensions (the pruning property), unlike a
    single-column sort which leaves the other dimension full-range."""
    import random

    from lazy_frame_spark.operators.layout import hilbert_layout

    rng = random.Random(7)
    rows = [(rng.randrange(256), rng.randrange(256)) for _ in range(4096)]
    df = spark.createDataFrame(rows, "x long, y long")
    parts = (
        hilbert_layout(df, "x", "y", bits=8, num_partitions=16)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    avg_span = sum((r["sx"] + r["sy"]) / 2 for r in parts) / len(parts)
    assert avg_span < 128  # each dim's span well under the full 256 range


def test_hilbert_bits_bound():
    import pytest as _pt

    from lazy_frame_spark.operators.layout import with_hilbert

    with _pt.raises(ValueError):
        with_hilbert(None, "x", "y", bits=32)


def test_parallel_ntile_matches_sql_ntile(spark):
    """Exact NTILE semantics from the closed-form rank formula, across
    sizes with remainders and the degenerate n < tiles case."""
    from pyspark.sql.window import Window

    from lazy_frame_spark.operators.sorts import parallel_ntile

    for n, tiles in [(1500, 4), (1001, 4), (7, 3), (2, 5), (100, 7)]:
        df = spark.range(n).select(
            F.col("id"), (F.col("id") * 37 % 1000).alias("v")
        )
        want = {
            r["id"]: r["t"]
            for r in df.select(
                "id", F.ntile(tiles).over(Window.orderBy("v", "id")).alias("t")
            ).collect()
        }
        got = {
            r["id"]: r["t"]
            for r in parallel_ntile(df, tiles, ["v", "id"], "t").collect()
        }
        assert got == want, (n, tiles)


def test_label_outliers_matches_numpy(spark, sf_dir):
    """Top-k farthest-from-centroid per label agrees with a numpy
    brute-force model (same squared-L2, same id tie-break)."""
    import numpy as np

    from lazy_frame_spark.operators.similarity import label_outliers

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pdf = emb.toPandas()
    want = set()
    for lab, grp in pdf.groupby("label"):
        mat = np.stack(grp["embedding"].to_numpy()).astype("float64")
        mu = mat.mean(axis=0)
        d2 = ((mat - mu) ** 2).sum(axis=1)
        order = sorted(zip(-d2, grp["vec_id"].to_numpy()))[:4]
        want |= {(int(v), int(lab)) for _, v in order}
    got = {
        (r["vec_id"], r["label"])
        for r in label_outliers(emb, k=4).collect()
    }
    assert got == want


def test_partsupp_fixture_invariants(spark, sf_dir):
    """The derived partsupp: exactly 4 key-unique (partkey, suppkey)
    rows per part, every suppkey a real supplier, values in their
    documented domains — deterministic across runs (same frame twice
    hashes identically)."""
    import pyspark.sql.functions as F

    from lazy_frame_spark.parity import _partsupp

    ps = _partsupp(spark, sf_dir)
    n_part = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    assert ps.count() == 4 * n_part
    assert ps.select("ps_partkey", "ps_suppkey").distinct().count() == 4 * n_part
    skeys = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey")
    assert (
        ps.join(skeys, ps["ps_suppkey"] == skeys["s_suppkey"], "left_anti").count()
        == 0
    )
    stats = ps.agg(
        F.min("ps_availqty"), F.max("ps_availqty"),
        F.min("ps_supplycost"), F.max("ps_supplycost"),
    ).first()
    assert stats[0] >= 1 and stats[1] <= 9999
    assert stats[2] >= 1.0 and stats[3] <= 9990.0
    a = sorted(map(tuple, _partsupp(spark, sf_dir).collect()))
    b = sorted(map(tuple, _partsupp(spark, sf_dir).collect()))
    assert a == b


def test_asof_time_bucketed_matches_plain(spark, trades_quotes):
    """The (key, time-bucket) pre-split path must produce EXACTLY the
    plain single-window result, both directions, including the
    tie-at-equal-time and no-match rows."""
    trades, quotes = trades_quotes
    for direction in ("backward", "forward"):
        plain = asof_join(
            trades, quotes, on="sym", left_time="t", right_time="qt",
            value_cols=["bid"], direction=direction,
        )
        bucketed = asof_join(
            trades, quotes, on="sym", left_time="t", right_time="qt",
            value_cols=["bid"], direction=direction, time_buckets=4,
        )
        key = lambda r: (r["sym"], r["t"], r["px"])  # noqa: E731
        a = sorted(((key(r), r["bid"]) for r in plain.collect()))
        b = sorted(((key(r), r["bid"]) for r in bucketed.collect()))
        assert a == b, direction


def test_asof_time_bucketed_hot_key(spark):
    """Synthetic hot key: one user holds 50k of 51k events. The bucketed
    path must agree with the plain path row-for-row, and its wide window
    must partition on (key, bucket) — the hot key spreads over N tasks
    instead of stalling one."""
    import pyspark.sql.functions as F

    hot = spark.range(50_000).select(
        F.lit(1).alias("uid"), F.col("id").alias("t"),
        (F.col("id") % 97).cast("double").alias("x"),
    )
    cold = spark.range(1_000).select(
        (2 + F.col("id") % 50).alias("uid"),
        (F.col("id") * 37 % 50_000).alias("t"),
        F.lit(-1.0).alias("x"),
    )
    left = hot.unionByName(cold)
    right = spark.range(500).select(
        (F.when(F.col("id") < 450, 1).otherwise(2 + F.col("id") % 50)).alias("uid"),
        (F.col("id") * 101 % 50_000).alias("rt"),
        (F.col("id") * 1.5).alias("v"),
    )
    plain = asof_join(left, right, "uid", "t", "rt", ["v"])
    bucketed = asof_join(left, right, "uid", "t", "rt", ["v"], time_buckets=16)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, bucketed.collect()))
    assert a == b
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "__asof_bkt__" in plan.split("Window")[1]  # wide window keyed by bucket


def test_asof_time_bucketed_ntz_timestamps(spark, trades_quotes):
    """TIMESTAMP_NTZ time columns work in the bucketed path (unix_micros
    rejects NTZ; the epoch surrogate casts via the UTC session)."""
    import pyspark.sql.functions as F

    trades, quotes = trades_quotes
    tn = trades.withColumn("t", F.col("t").cast("timestamp_ntz"))
    qn = quotes.withColumn("qt", F.col("qt").cast("timestamp_ntz"))
    plain = asof_join(tn, qn, "sym", "t", "qt", ["bid"])
    bucketed = asof_join(tn, qn, "sym", "t", "qt", ["bid"], time_buckets=3)
    a = sorted((r["sym"], r["t"], r["px"], r["bid"]) for r in plain.collect())
    b = sorted((r["sym"], r["t"], r["px"], r["bid"]) for r in bucketed.collect())
    assert a == b


def test_asof_composite_key(spark):
    """Composite (sym, venue) as-of key: carries must not leak across
    either key component, plain and bucketed paths identical."""
    left = spark.createDataFrame(
        [("A", "x", 10.0), ("A", "y", 10.0), ("B", "x", 5.0), ("A", "x", 2.0)],
        "sym string, venue string, t double",
    )
    right = spark.createDataFrame(
        [("A", "x", 1.0, 100.0), ("A", "y", 3.0, 200.0), ("B", "x", 9.0, 300.0),
         ("A", "x", 9.0, 111.0)],
        "sym string, venue string, rt double, bid double",
    )
    want = {("A", "x", 10.0): 111.0, ("A", "y", 10.0): 200.0,
            ("B", "x", 5.0): None, ("A", "x", 2.0): 100.0}
    for tb in (1, 4):
        out = asof_join(left, right, ["sym", "venue"], "t", "rt", ["bid"],
                        time_buckets=tb)
        got = {(r["sym"], r["venue"], r["t"]): r["bid"] for r in out.collect()}
        assert got == want, tb


def test_asof_nearest_and_tolerance_match_pandas(spark):
    """direction='nearest' and tolerance replicate pandas.merge_asof
    (the de-facto reference semantics) on randomized numeric frames:
    nearest picks the closer side with ties resolving BACKWARD (probed:
    pandas does exactly this), tolerance nulls matches beyond the gap,
    and both compose. Right (key, time) pairs are unique by
    construction — equal right timestamps are engine-order-arbitrary in
    both systems."""
    import random

    import pandas as pd

    from lazy_frame_spark.operators.joins import asof_join

    rng = random.Random(11)
    for trial in range(5):
        keys = ["a", "b", "c"]
        lrows = [(k, float(rng.randint(0, 50)), i)
                 for i, k in enumerate(rng.choices(keys, k=25))]
        rtimes = {k: rng.sample(range(-5, 60), 8) for k in keys}
        rrows = [(k, float(t), float(100 * ti + 1))
                 for k in keys for ti, t in enumerate(rtimes[k])]
        ldf = spark.createDataFrame(lrows, "k string, t double, i long")
        rdf = spark.createDataFrame(rrows, "k string, rt double, v double")
        lpd = pd.DataFrame(lrows, columns=["k", "t", "i"]) \
            .sort_values(["t", "i"]).reset_index(drop=True)
        rpd = pd.DataFrame(rrows, columns=["k", "rt", "v"]) \
            .sort_values("rt").reset_index(drop=True)
        for direction in ("backward", "forward", "nearest"):
            for tol in (None, 7.0):
                got = asof_join(
                    ldf, rdf, on="k", left_time="t", right_time="rt",
                    value_cols=["v"], direction=direction, tolerance=tol,
                ).toPandas().set_index("i")["v"].to_dict()
                want = pd.merge_asof(
                    lpd, rpd, left_on="t", right_on="rt", by="k",
                    direction=direction,
                    **({"tolerance": tol} if tol is not None else {}),
                ).set_index("i")["v"].to_dict()
                for i in want:
                    g, w = got.get(i), want[i]
                    same = (g == w) or (pd.isna(g) and pd.isna(w))
                    assert same, (trial, direction, tol, i, g, w)


def test_asof_nearest_timestamps_with_tolerance(spark, trades_quotes):
    """nearest over TIMESTAMP keys: the gap surrogate is seconds, so
    tolerance is expressed in seconds; B's only quote (1 s ahead) wins
    under nearest, and a 0.5 s tolerance drops it again."""
    from lazy_frame_spark.operators.joins import asof_join

    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="qt",
        value_cols=["bid"], direction="nearest",
    ).toPandas().set_index(["sym", "px"])
    assert out.loc[("B", 50.0), "bid"] == 49.0      # forward-only match
    assert out.loc[("A", 100.0), "bid"] == 99.9     # exact tie -> itself
    assert str(out.loc[("C", 7.0), "bid"]) == "nan"

    tight = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="qt",
        value_cols=["bid"], direction="nearest", tolerance=0.5,
    ).toPandas().set_index(["sym", "px"])
    assert str(tight.loc[("B", 50.0), "bid"]) == "nan"

    import pytest

    with pytest.raises(ValueError, match="nearest"):
        asof_join(trades, quotes, on="sym", left_time="t",
                  right_time="qt", value_cols=["bid"],
                  direction="nearest", time_buckets=4)
