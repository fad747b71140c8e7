"""Time-series regularization (operators/timeseries.py): grid bounds,
per-bucket last-wins determinism, forward fill, and transition counts
pinned on handcrafted streams."""

from datetime import datetime

import pyspark.sql.functions as F

from lazy_frame_spark.operators import timeseries as ts

SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def test_resample_ffill_fills_gaps_per_key(spark):
    rows = [
        # user 1: day 1 and day 4 observed -> days 2,3 forward-filled
        (1, datetime(2024, 1, 1, 5), 1, 10.0),
        (2, datetime(2024, 1, 4, 5), 1, 40.0),
        # user 2: a single day -> one-row grid, no fill needed
        (3, datetime(2024, 1, 2, 9), 2, 7.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["user_id"], r["bucket"].day): r["v_ffill"]
        for r in ts.resample_ffill(df, every="1 day").collect()
    }
    assert got == {
        (1, 1): 10.0, (1, 2): 10.0, (1, 3): 10.0, (1, 4): 40.0,
        (2, 2): 7.0,
    }


def test_resample_last_observation_wins_with_id_tiebreak(spark):
    rows = [
        (1, datetime(2024, 1, 1, 3), 1, 1.0),
        (2, datetime(2024, 1, 1, 9), 1, 2.0),   # later ts wins the bucket
        (4, datetime(2024, 1, 1, 9), 1, 4.0),   # same ts: larger id wins
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = ts.resample_ffill(df, every="1 day").collect()
    assert len(out) == 1 and out[0]["v_ffill"] == 4.0


def test_transition_matrix_counts_and_bp(spark):
    sch = "event_id long, ts timestamp, user_id long, event_type string"
    rows = [
        (1, datetime(2024, 1, 1, 1), 1, "a"),
        (2, datetime(2024, 1, 1, 2), 1, "b"),
        (3, datetime(2024, 1, 1, 3), 1, "a"),
        (4, datetime(2024, 1, 1, 4), 1, "c"),
        (5, datetime(2024, 1, 1, 1), 2, "a"),
        (6, datetime(2024, 1, 1, 2), 2, "b"),
    ]
    df = spark.createDataFrame(rows, sch)
    got = {
        (r["src"], r["dst"]): (r["n"], r["p_bp"])
        for r in ts.transition_matrix(df).collect()
    }
    # a -> b twice, a -> c once (row a total 3); b -> a once (row b total 1)
    assert got[("a", "b")] == (2, 6666)
    assert got[("a", "c")] == (1, 3333)
    assert got[("b", "a")] == (1, 10000)
    assert ("c", "a") not in got  # last event of its user: no successor


def test_transition_matrix_probabilities_sum_to_near_1(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = ts.transition_matrix(df).groupBy("src").agg(
        F.sum("p_bp").alias("s"), F.count("*").alias("k")
    ).collect()
    for r in rows:
        # FLOOR loses at most 1bp per cell
        assert 10000 - r["k"] <= r["s"] <= 10000


def test_resample_subdaily_grid_alignment(spark):
    """6-hour buckets align to epoch boundaries (00/06/12/18h) and the
    grid steps by exactly the bucket width."""
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 1), 1, 5.0),    # 00h bucket
        (2, datetime(2024, 1, 1, 19), 1, 9.0),   # 18h bucket
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(
        (r["bucket"].hour, r["v_ffill"])
        for r in ts.resample_ffill(df, every="6 hours").collect()
    )
    assert got == [(0, 5.0), (6, 5.0), (12, 5.0), (18, 9.0)]


def test_sessionize_plain_matches_gaps_and_islands(spark, sf_dir):
    """Per-event session assignment equals a brute-force per-key pass."""
    from collections import defaultdict

    from lazy_frame_spark.operators.sessions import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    got = {
        r["event_id"]: (r["user_id"], r["session_start"])
        for r in sessionize(ev, "user_id", "ts", gap=3600.0).collect()
    }
    rows = defaultdict(list)
    for r in ev.collect():
        rows[r["user_id"]].append(r)
    want = {}
    for uid, rs in rows.items():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        start = None
        prev = None
        for r in rs:
            if prev is None or (r["ts"] - prev).total_seconds() > 3600.0:
                start = r["ts"]
            want[r["event_id"]] = (uid, start)
            prev = r["ts"]
    assert got == want


def test_sessionize_bucketed_matches_plain(spark, sf_dir):
    """The (key, time-bucket) pre-split must produce the identical
    per-event assignment — including sessions that SPAN bucket edges."""
    from lazy_frame_spark.operators.sessions import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    plain = {
        (r["event_id"]): (r["user_id"], r["session_start"])
        for r in sessionize(ev, "user_id", "ts", gap=3600.0).collect()
    }
    for n in (4, 16, 64):
        bucketed = {
            (r["event_id"]): (r["user_id"], r["session_start"])
            for r in sessionize(
                ev, "user_id", "ts", gap=3600.0, time_buckets=n
            ).collect()
        }
        assert bucketed == plain, n


def test_sessionize_bucketed_hot_key_cross_bucket_chain(spark):
    """Adversarial: ONE key whose events form a single unbroken session
    spanning every bucket (each inter-event gap below the threshold) —
    the carry must chain through N-1 bucket edges; plus a cold key with
    genuine breaks."""
    import pyspark.sql.functions as F

    from lazy_frame_spark.operators.sessions import sessionize

    hot = spark.range(10_000).select(
        F.col("id").alias("event_id"), F.lit(1).alias("user_id"),
        (F.col("id") * 5.0).alias("ts"),  # gap 5 < 100 everywhere
    )
    cold = spark.range(10).select(
        (100_000 + F.col("id")).alias("event_id"), F.lit(2).alias("user_id"),
        (F.col("id") * 1000.0).alias("ts"),  # every gap breaks
    )
    ev = hot.unionByName(cold)
    plain = sorted(map(tuple, sessionize(ev, "user_id", "ts", gap=100.0).collect()))
    bucketed = sorted(
        map(tuple, sessionize(ev, "user_id", "ts", gap=100.0, time_buckets=32).collect())
    )
    assert bucketed == plain
    hot_rows = [r for r in bucketed if r[1] == 1]
    assert {r[3] for r in hot_rows} == {0.0}  # one session, carried through
    assert len({r[3] for r in bucketed if r[1] == 2}) == 10


def test_sessionize_composite_key(spark):
    """Composite (user, device) sessionization: gaps evaluate within the
    full composite key; plain and bucketed paths identical."""
    from lazy_frame_spark.operators.sessions import sessionize

    rows = [
        (1, "a", 0.0), (1, "a", 50.0), (1, "a", 400.0),   # a: 2 sessions
        (1, "b", 10.0), (1, "b", 500.0),                  # b: 2 sessions
        (2, "a", 0.0), (2, "a", 90.0),                    # one session
    ]
    df = spark.createDataFrame(rows, "uid long, dev string, t double")
    for tb in (1, 8):
        got = {
            (r["uid"], r["dev"], r["t"]): r["session_start"]
            for r in sessionize(df, ["uid", "dev"], "t", gap=100.0,
                                time_buckets=tb).collect()
        }
        assert got == {
            (1, "a", 0.0): 0.0, (1, "a", 50.0): 0.0, (1, "a", 400.0): 400.0,
            (1, "b", 10.0): 10.0, (1, "b", 500.0): 500.0,
            (2, "a", 0.0): 0.0, (2, "a", 90.0): 0.0,
        }, tb
