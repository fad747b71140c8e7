"""Custom stateful streaming operator: final state after draining the
stream must equal the batch aggregation."""

import pyspark.sql.functions as F

from lazy_frame_spark.sources.registry import load_table
from lazy_frame_spark.streaming import stream_events
from lazy_frame_spark.streaming.stateful import running_user_profile


def test_stateful_running_profile_matches_batch(spark, sf_dir, tmp_path):
    d = str(tmp_path / "ev")
    load_table(spark, sf_dir, "events").repartition(3).write.mode("overwrite").parquet(d)

    stream = stream_events(spark, d, spark.read.parquet(d).schema)
    prof = running_user_profile(stream)
    q = (
        prof.writeStream.format("memory")
        .queryName("t_profile")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update-mode emits one row per user per batch; the LAST emission per
    # user is the final state
    got = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM t_profile) WHERE rn = 1
        """
    ).toPandas().set_index("user_id").sort_index()

    want = (
        spark.read.parquet(d)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .toPandas().set_index("user_id").sort_index()
    )
    assert got["n_events"].equals(want["n_events"])
    assert (got["total_value"] - want["total_value"]).abs().max() < 0.01


def test_streaming_funnel_matches_batch(spark, tmp_path_factory):
    """The stateful streaming funnel's final per-user position equals the
    batch funnel's deepest non-null stage when micro-batches arrive in
    event-time order (time-partitioned files, maxFilesPerTrigger=1)."""
    from datetime import datetime

    import pyspark.sql.functions as F

    from lazy_frame_spark.operators import funnel as fn
    from lazy_frame_spark.streaming.stateful import streaming_funnel
    from lazy_frame_spark.streaming.windows import run_stream_to_memory

    stages = ["view", "click", "purchase"]
    rows = [
        # user 1 completes across batches
        (1, datetime(2024, 1, 1, 9, 0), 1, "view", 0.0),
        (2, datetime(2024, 1, 1, 9, 5), 2, "click", 0.0),   # click before view
        (3, datetime(2024, 1, 1, 10, 0), 1, "click", 0.0),
        (4, datetime(2024, 1, 1, 10, 5), 2, "view", 0.0),
        (5, datetime(2024, 1, 1, 11, 0), 1, "purchase", 0.0),
        (6, datetime(2024, 1, 1, 11, 5), 2, "purchase", 0.0),  # no click after view: stuck at stage 1
        (7, datetime(2024, 1, 1, 11, 10), 3, "view", 0.0),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    batch_df = spark.createDataFrame(rows, schema)

    d = str(tmp_path_factory.mktemp("funnel_stream"))
    import time as _time

    for i, window in enumerate([rows[:2], rows[2:4], rows[4:]]):
        spark.createDataFrame(window, schema).coalesce(1).write.parquet(f"{d}/b{i}")
        import os

        for f in os.listdir(f"{d}/b{i}"):
            if f.endswith(".parquet"):
                os.rename(f"{d}/b{i}/{f}", f"{d}/b{i}_data.parquet")
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(d)
    )
    out = streaming_funnel(stream, stages)
    assert out.isStreaming
    run_stream_to_memory(out, "t_funnel", output_mode="update")
    # update mode: keep each user's LAST emitted position
    final = {
        r["user_id"]: r["stage_idx"]
        for r in spark.sql(
            """SELECT user_id, stage_idx FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                          ORDER BY t_stage DESC, stage_idx DESC) rn FROM t_funnel)
               WHERE rn = 1"""
        ).collect()
    }
    wide = fn.funnel_stage_times(batch_df, stages)
    want = {}
    for r in wide.collect():
        depth = sum(1 for i in range(1, 4) if r[f"t{i}"] is not None)
        want[r["user_id"]] = depth
    assert final == {u: d for u, d in want.items() if d > 0}
    assert final[1] == 3 and final[2] == 1 and final[3] == 1


def test_running_topk_matches_batch(spark, sf_dir, tmp_path):
    """Running top-k (applyInPandasWithState): after draining the
    stream (2 files per trigger -> multiple batches, so cross-batch
    state merge is exercised), the final per-key leaderboard equals
    the batch window ranking."""
    from lazy_frame_spark.streaming.stateful import running_topk

    d = str(tmp_path / "ev_topk")
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(d)

    from lazy_frame_spark.streaming import stream_events

    stream = stream_events(spark, d, spark.read.parquet(d).schema,
                           max_files_per_trigger=2)
    top = running_topk(stream, k=3)
    q = (
        top.writeStream.format("memory")
        .queryName("t_topk")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode emits a full leaderboard per key per batch; per-rank
    # values are monotone non-decreasing (ties broken by smaller id,
    # which also wins in the final merged order), so the final
    # leaderboard row per (key, rank) is the (value desc, id asc) best.
    got = spark.sql(
        """
        SELECT event_type, rank, event_id, value FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type, rank
                                       ORDER BY value DESC, event_id) rn
          FROM t_topk) WHERE rn = 1
        """
    ).toPandas().sort_values(["event_type", "rank"]).reset_index(drop=True)

    want = (
        spark.read.parquet(d)
        .select("event_type", "event_id", F.round("value", 2).alias("value"))
        .withColumn(
            "rank",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("event_type")
                .orderBy(F.desc("value"), F.asc("event_id"))
            ).cast("long"),
        )
        .filter(F.col("rank") <= 3)
        .select("event_type", "rank", "event_id", "value")
        .toPandas().sort_values(["event_type", "rank"]).reset_index(drop=True)
    )
    assert got.equals(want)


def test_running_topk_tws_requires_protobuf_or_matches(spark, sf_dir, tmp_path):
    """The transformWithStateInPandas variant either runs (protobuf
    present: semantics must match the applyInPandasWithState one) or
    fails fast with a clear ImportError (this container)."""
    from lazy_frame_spark.streaming.stateful import running_topk_tws

    try:
        import google.protobuf  # noqa: F401
        has_protobuf = True
    except ImportError:
        has_protobuf = False

    if not has_protobuf:
        import pytest

        d = str(tmp_path / "ev_tws")
        load_table(spark, sf_dir, "events").limit(10).write.parquet(d)
        stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
        with pytest.raises(ImportError, match="protobuf"):
            running_topk_tws(stream, k=3)
        return

    from lazy_frame_spark.streaming import stream_events

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    d = str(tmp_path / "ev_tws")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(d)
    stream = stream_events(spark, d, spark.read.parquet(d).schema,
                           max_files_per_trigger=2)
    q = (
        running_topk_tws(stream, k=3)
        .writeStream.format("memory").queryName("t_topk_tws")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.sql(
        """
        SELECT event_type, rank, event_id, value FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type, rank
                                       ORDER BY value DESC, event_id) rn
          FROM t_topk_tws) WHERE rn = 1
        """
    ).count()
    assert got > 0


def test_topk_merge_string_ids_tiebreak():
    """_topk_merge keeps ids in their native type and tie-breaks equal
    values by id ascending for ANY comparable id type (the two-pass
    stable sort avoids negating non-numeric ids)."""
    from lazy_frame_spark.streaming.stateful import _topk_merge

    pairs = [("b", 2.0), ("a", 2.0), ("z", 5.0), ("m", 1.0)]
    assert _topk_merge(pairs, 3) == [("z", 5.0), ("a", 2.0), ("b", 2.0)]
    assert _topk_merge([(7, 1.0), (3, 1.0)], 2) == [(3, 1.0), (7, 1.0)]


def test_running_topk_string_id(spark, tmp_path):
    """State types are derived from the input schema: a STRING id column
    runs end-to-end (previously crashed in the executor on a hardcoded
    astype('int64') / ArrayType(LongType) state)."""
    from lazy_frame_spark.streaming.stateful import running_topk

    d = str(tmp_path / "ev_strid")
    rows = [
        ("click", "e-05", 3.0), ("click", "e-02", 9.0), ("click", "e-09", 9.0),
        ("click", "e-01", 1.0), ("view", "e-03", 4.0), ("view", "e-08", 2.0),
    ]
    spark.createDataFrame(
        rows, "event_type string, event_id string, value double"
    ).repartition(2).write.mode("overwrite").parquet(d)
    stream = stream_events(spark, d, spark.read.parquet(d).schema,
                           max_files_per_trigger=1)
    q = (
        running_topk(stream, k=2)
        .writeStream.format("memory").queryName("t_topk_str")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    final = spark.sql(
        """
        SELECT event_type, rank, event_id, value FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type, rank
                                       ORDER BY value DESC, event_id) rn
          FROM t_topk_str) WHERE rn = 1
        """
    ).collect()
    got = {(r["event_type"], r["rank"]): (r["event_id"], r["value"]) for r in final}
    assert got[("click", 1)] == ("e-02", 9.0)   # tie at 9.0 -> min id wins
    assert got[("click", 2)] == ("e-09", 9.0)
    assert got[("view", 1)] == ("e-03", 4.0)
    assert got[("view", 2)] == ("e-08", 2.0)


def test_running_topk_rejects_non_numeric_value(spark, tmp_path):
    import pytest

    d = str(tmp_path / "ev_badval")
    spark.createDataFrame(
        [("a", 1, "oops")], "event_type string, event_id long, value string"
    ).write.parquet(d)
    stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
    with pytest.raises(TypeError, match="must be numeric"):
        from lazy_frame_spark.streaming.stateful import running_topk
        running_topk(stream, k=2)


def test_running_topk_double_id_not_truncated(spark, tmp_path):
    """A DOUBLE id column is NOT an integral id: the state path must
    keep the fractional values intact (previously isinstance(...,
    NumericType) sent doubles through astype('int64'), silently
    corrupting ids while the output schema still declared double)."""
    from lazy_frame_spark.streaming.stateful import running_topk

    d = str(tmp_path / "ev_dblid")
    rows = [
        ("click", 1.25, 3.0), ("click", 2.75, 9.0),
        ("click", 2.25, 9.0), ("view", 0.5, 4.0),
    ]
    spark.createDataFrame(
        rows, "event_type string, event_id double, value double"
    ).repartition(2).write.mode("overwrite").parquet(d)
    stream = stream_events(spark, d, spark.read.parquet(d).schema,
                           max_files_per_trigger=1)
    q = (
        running_topk(stream, k=2)
        .writeStream.format("memory").queryName("t_topk_dbl")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    final = spark.sql(
        """
        SELECT event_type, rank, event_id, value FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type, rank
                                       ORDER BY value DESC, event_id) rn
          FROM t_topk_dbl) WHERE rn = 1
        """
    ).collect()
    got = {(r["event_type"], r["rank"]): (r["event_id"], r["value"]) for r in final}
    # ids keep their fractional parts: 2.25/2.75, never 2/2
    assert got[("click", 1)] == (2.25, 9.0)   # tie at 9.0 -> min id wins
    assert got[("click", 2)] == (2.75, 9.0)
    assert got[("view", 1)] == (0.5, 4.0)


def test_recent_ewma_order_independent_and_matches_replay(spark, sf_dir, tmp_path):
    """The trailing-k EWMA's state is a mergeable synopsis: draining the
    SAME events one-file-per-trigger in two different physical layouts
    (time-ordered vs scrambled) must end in IDENTICAL per-user features,
    equal to a driver-side replay of the exact dyadic arithmetic."""
    from lazy_frame_spark.streaming.stateful import running_recent_ewma

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value").limit(600)
    rows = ev.collect()

    def drain(order_col, name):
        d = str(tmp_path / name)
        ev.repartition(5, F.col(order_col)).write.mode("overwrite") \
            .parquet(d)
        schema = spark.read.parquet(d).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(d))
        q = (running_recent_ewma(stream, k=8).writeStream
             .format("memory").queryName(f"t_{name}")
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination()
        return {r["user_id"]: (r["n_seen"], r["recent_ewma"])
                for r in spark.sql(
                    f"""SELECT user_id, n_seen, recent_ewma FROM (
                         SELECT *, row_number() OVER (
                           PARTITION BY user_id ORDER BY n_seen DESC) rn
                         FROM t_{name}) WHERE rn = 1""").collect()}

    a = drain("event_id", "ordered")
    b = drain("value", "scrambled")   # different file assignment
    assert a == b

    # driver replay of the same dyadic arithmetic
    per_user: dict = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], int(round(r["value"] * 100))))
    for uid, triples in per_user.items():
        triples.sort(key=lambda x: (x[0], x[1]), reverse=True)
        kept = triples[:8]
        num = sum(c * 2.0 ** -(i + 1) for i, (_, _, c) in enumerate(kept))
        den = sum(2.0 ** -(i + 1) for i in range(len(kept)))
        assert a[uid] == (len(triples), round(num / den / 100.0, 4)), uid
