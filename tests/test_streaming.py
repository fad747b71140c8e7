"""Structured Streaming integration: the readStream pipeline must produce
exactly the batch results (availableNow trigger, memory sink), watermarks
must bound state, and streaming dedup must drop in-horizon duplicates."""

import pyspark.sql.functions as F
import pytest

from lazy_frame_spark.sources.registry import load_table
from lazy_frame_spark.streaming import (
    session_window_agg,
    stream_events,
    tumbling_window_agg,
)
from lazy_frame_spark.streaming.windows import dedup_within_watermark, run_stream_to_memory


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """Re-shard the events table into several files so the file-source
    stream has multiple micro-batches to chew through."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def _batch_events(spark, events_dir):
    return spark.read.parquet(events_dir)


def test_stream_tumbling_equals_batch(spark, events_stream_dir):
    batch = tumbling_window_agg(_batch_events(spark, events_stream_dir), "1 hour")
    schema = _batch_events(spark, events_stream_dir).schema
    stream = stream_events(spark, events_stream_dir, schema, max_files_per_trigger=1)
    result = tumbling_window_agg(stream, "1 hour", watermark="10 minutes")
    run_stream_to_memory(result, "t_tumble", output_mode="complete")
    got = spark.sql("SELECT * FROM t_tumble").toPandas()
    want = batch.toPandas()
    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got[key + ["n", "sum_value"]].equals(want[key + ["n", "sum_value"]])


def test_stream_session_equals_batch(spark, events_stream_dir):
    batch = session_window_agg(_batch_events(spark, events_stream_dir), "5 minutes")
    schema = _batch_events(spark, events_stream_dir).schema
    stream = stream_events(spark, events_stream_dir, schema)
    result = session_window_agg(stream, "5 minutes", watermark="30 minutes")
    run_stream_to_memory(result, "t_session", output_mode="complete")
    got = spark.sql("SELECT count(*) AS c, sum(n) AS s FROM t_session").collect()[0]
    want = batch.agg(F.count(F.lit(1)).alias("c"), F.sum("n").alias("s")).collect()[0]
    assert (got["c"], got["s"]) == (want["c"], want["s"])


def test_stream_dedup_within_watermark(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dup_events"))
    rows = [
        (1, "2024-01-01 10:00:00", "click"),
        (1, "2024-01-01 10:00:30", "click"),  # duplicate id within horizon
        (2, "2024-01-01 10:01:00", "view"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts_s string, event_type string") \
        .select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    stream = stream_events(spark, d, spark.read.parquet(d).schema)
    result = dedup_within_watermark(stream, ["event_id"], watermark="10 minutes")
    run_stream_to_memory(result, "t_dedup", output_mode="append")
    got = spark.sql("SELECT event_id FROM t_dedup ORDER BY event_id").toPandas()
    assert got["event_id"].tolist() == [1, 2]


def test_streaming_plan_is_incremental(spark, events_stream_dir):
    schema = _batch_events(spark, events_stream_dir).schema
    stream = stream_events(spark, events_stream_dir, schema)
    assert stream.isStreaming
    agg = tumbling_window_agg(stream, "1 hour", watermark="10 minutes")
    assert agg.isStreaming


def test_stream_stream_time_join(spark, events_stream_dir):
    """Purchases joined to same-user clicks within the prior hour: the
    streaming join (both sides streams, watermarked, time-bounded) must
    equal the batch join."""
    from lazy_frame_spark.streaming.windows import stream_stream_time_join

    batch = spark.read.parquet(events_stream_dir)
    purchases_b = batch.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("purchase_id")
    )
    clicks_b = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("click_id"),
    ).withColumnRenamed("c_user", "user_id")

    want = stream_stream_time_join(
        purchases_b, clicks_b.withColumnRenamed("user_id", "user_id"), on="user_id"
    ).count()

    schema = batch.schema
    s = stream_events(spark, events_stream_dir, schema)
    purchases_s = s.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("purchase_id")
    )
    s2 = stream_events(spark, events_stream_dir, schema)
    clicks_s = s2.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("r_ts"), F.col("event_id").alias("click_id")
    )
    joined = stream_stream_time_join(purchases_s, clicks_s, on="user_id")
    q = (
        joined.writeStream.format("memory").queryName("t_ssj")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT count(*) FROM t_ssj").collect()[0][0]
    assert got == want > 0


def test_foreach_batch_upsert_sink(spark, events_stream_dir, tmp_path_factory):
    """Streamed keyed upsert: the published table holds exactly one row per
    user, each matching a real source row; replaying a committed batch id
    is a no-op (exactly-once under micro-batch replay)."""
    from lazy_frame_spark.streaming.sinks import ParquetUpsertSink

    table = str(tmp_path_factory.mktemp("upsert_table"))
    ckpt = str(tmp_path_factory.mktemp("upsert_ckpt"))
    batch = spark.read.parquet(events_stream_dir)
    schema = batch.schema

    sink = ParquetUpsertSink(table, keys=["user_id"], seq_col="ts")
    src = stream_events(spark, events_stream_dir, schema, max_files_per_trigger=1)
    q = sink.write_stream(src.select("user_id", "ts", "event_id", "value"), ckpt)
    q.awaitTermination()

    stored = sink.read_current(spark)
    n_users = batch.select("user_id").distinct().count()
    assert stored.count() == n_users
    assert stored.select("user_id").distinct().count() == n_users
    # every stored row is a real source row
    assert (
        stored.join(
            batch.select("user_id", "ts", "event_id", "value"),
            on=["user_id", "ts", "event_id", "value"],
            how="left_anti",
        ).count()
        == 0
    )

    # replaying an already-committed batch id must not bump the version
    before = sink.current_path()
    sink.upsert_batch(batch.select("user_id", "ts", "event_id", "value").limit(5), 0)
    assert sink.current_path() == before


def test_upsert_batch_within_batch_latest_wins(spark, tmp_path_factory):
    from lazy_frame_spark.streaming.sinks import ParquetUpsertSink

    table = str(tmp_path_factory.mktemp("upsert_small"))
    sink = ParquetUpsertSink(table, keys=["k"], seq_col="seq")
    b0 = spark.createDataFrame([("a", 1, "old"), ("a", 2, "new"), ("b", 1, "b0")],
                               "k string, seq long, payload string")
    sink.upsert_batch(b0, 0)
    b1 = spark.createDataFrame([("b", 5, "b1"), ("c", 1, "c0")],
                               "k string, seq long, payload string")
    sink.upsert_batch(b1, 1)
    got = {r["k"]: r["payload"] for r in sink.read_current(spark).collect()}
    assert got == {"a": "new", "b": "b1", "c": "c0"}


def test_kafka_message_framing(spark):
    from lazy_frame_spark.streaming.sinks import kafka_message_frame, kafka_sink_writer

    df = spark.createDataFrame([(1, "click", 2.5)], "user_id long, et string, v double")
    msg = kafka_message_frame(df, key_cols=["user_id", "et"], value_cols=["v"])
    row = msg.collect()[0]
    assert row["key"] == "1|click"
    assert row["value"] == '{"v":2.5}'

    stream = spark.readStream.format("rate").load()
    w = kafka_sink_writer(
        kafka_message_frame(stream, ["value"]), "events", "broker:9092", "/tmp/ck"
    )
    # configured but not started — the connector jar isn't in this container
    assert w is not None


def test_stream_decontamination_equals_batch(spark, sf_dir, tmp_path_factory):
    """The stateless decontamination filter runs in a real append-mode
    micro-batch stream with zero state and drops exactly the documents
    the batch path drops."""
    from lazy_frame_spark.operators import decontam as dc
    from lazy_frame_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 17 == 0)
    tr = docs.filter(F.col("doc_id") % 17 != 0)
    want = sorted(
        r["doc_id"]
        for r in dc.decontaminate(tr, ev, min_overlap=2).select("doc_id").collect()
    )

    d = str(tmp_path_factory.mktemp("decontam_stream"))
    tr.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(tr.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    clean = dc.decontaminate_stream(stream, ev, min_overlap=2)
    assert clean.isStreaming
    run_stream_to_memory(clean.select("doc_id"), "t_decontam", output_mode="append")
    got = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM t_decontam").collect())
    assert got == want


def test_stream_media_decode_equals_batch(spark, tmp_path_factory):
    """Real codec featureization (PNG + JPEG decode via decode_pixels)
    is a stateless mapInPandas stage, so it runs unchanged in an
    append-mode micro-batch stream — the plumbing a 100 TB media ingest
    pipeline would use for continuously-arriving image files."""
    import numpy as np

    from lazy_frame_spark.operators import multimodal as mm
    from lazy_frame_spark.operators.jpeg import encode_jpeg

    def payload(i: int) -> bytes:
        v = 60 + i % 120
        px = np.full((8, 8), v, np.uint8)
        # even ids → PNG (lossless), odd → baseline JPEG (exact at q75
        # for constant blocks) — both decode through the same dispatch
        return mm.encode_png(px) if i % 2 == 0 else encode_jpeg(px, quality=75)

    rows = [(i, payload(i)) for i in range(40)]
    batch = spark.createDataFrame(rows, "doc_id long, payload binary")
    want = sorted(
        (r["doc_id"], r["width"], r["height"], r["feature"][0])
        for r in mm.decode_image_features(batch, real_decoder=True).collect()
    )

    d = str(tmp_path_factory.mktemp("media_stream"))
    batch.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    feats = mm.decode_image_features(stream, real_decoder=True)
    assert feats.isStreaming
    run_stream_to_memory(
        feats.select("doc_id", "width", "height", "feature"),
        "t_media", output_mode="append",
    )
    got = sorted(
        (r["doc_id"], r["width"], r["height"], r["feature"][0])
        for r in spark.sql("SELECT * FROM t_media").collect()
    )
    assert got == want and len(got) == 40


def test_watermark_drops_late_events(spark, tmp_path_factory):
    """True late-data semantics, pinned: an event older than the
    watermark arriving in a LATER micro-batch must be excluded from its
    (already finalized) window. Three sequential files because the
    late-events filter uses the PREVIOUS batch's watermark (Spark's
    two-watermark model, SPARK-39931): batch 1 sets event time, batch 2
    advances the filter watermark past the window, batch 3 delivers the
    late row. File order is forced by maxFilesPerTrigger=1 + distinct
    mtimes."""
    import os
    import time as _time
    from datetime import datetime

    from lazy_frame_spark.streaming.windows import (
        run_stream_to_memory,
        stream_events,
        tumbling_window_agg,
    )

    d = str(tmp_path_factory.mktemp("late_events"))
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    batches = [
        [(1, datetime(2024, 1, 1, 8, 30), 1, "click", 1.0),
         (2, datetime(2024, 1, 1, 10, 0), 1, "click", 1.0)],
        [(3, datetime(2024, 1, 1, 10, 10), 1, "click", 1.0)],
        [(4, datetime(2024, 1, 1, 8, 40), 1, "click", 1.0),   # late: wm 10:00
         (5, datetime(2024, 1, 1, 10, 30), 1, "click", 1.0)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{d}/b{i}")
        for f in os.listdir(f"{d}/b{i}"):
            if f.endswith(".parquet"):
                os.rename(f"{d}/b{i}/{f}", f"{d}/b{i}_data.parquet")
        _time.sleep(1.1)  # distinct mtime -> deterministic pickup order

    stream = stream_events(spark, d, schema, max_files_per_trigger=1)
    result = tumbling_window_agg(stream, "1 hour", watermark="10 minutes")
    run_stream_to_memory(result, "t_late", output_mode="append")
    rows = [
        (r["window_start"], r["n"])
        for r in spark.sql("SELECT * FROM t_late").collect()
        if r["window_start"] == datetime(2024, 1, 1, 8, 0)
    ]
    # the 08:00 window finalized with ONE event, emitted exactly once;
    # the late 08:40 arrival neither joined it nor resurrected it
    assert rows == [(datetime(2024, 1, 1, 8, 0), 1)]


def test_stream_quality_gate_equals_batch(spark, sf_dir, tmp_path_factory):
    """The composite quality gate is a pure map-only select, so the SAME
    call runs unchanged on an append-mode stream and keeps exactly the
    documents the batch path keeps — streaming ingest can gate at the
    edge with zero state."""
    from lazy_frame_spark.operators import text as tx
    from lazy_frame_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    want_df = tx.quality_gate(docs)
    keep_col = next(c for c in want_df.columns if "keep" in c or "pass" in c)
    want = sorted(
        r["doc_id"] for r in want_df.filter(F.col(keep_col)).select("doc_id").collect()
    )

    d = str(tmp_path_factory.mktemp("gate_stream"))
    docs.repartition(3).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    gated = tx.quality_gate(stream).filter(F.col(keep_col))
    assert gated.isStreaming
    run_stream_to_memory(gated.select("doc_id"), "t_gate", output_mode="append")
    got = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM t_gate").collect())
    assert got == want


def test_checkpoint_resume_is_exactly_once(spark, sf_dir, tmp_path):
    """Sequential availableNow runs over one checkpoint must be
    exactly-once: run 2 with no new files appends NOTHING to a parquet
    sink; after a new file lands, run 3 appends exactly its rows."""
    import glob
    import shutil

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, sf_dir, "events").limit(300)
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def drain():
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink).count()

    n1 = drain()
    assert n1 == 300
    assert drain() == 300  # same files: nothing reprocessed

    # a new file lands; only its rows append
    extra = str(tmp_path / "extra")
    load_table(spark, sf_dir, "events").limit(350).subtract(ev).limit(50)\
        .coalesce(1).write.parquet(extra)
    for f in glob.glob(extra + "/part-*.parquet"):
        shutil.copy(f, src + "/late-" + f.rsplit("/", 1)[1])
    assert drain() == 350


def test_agg_view_stream_writer_exactly_once(spark, sf_dir, tmp_path):
    """Streamed micro-batch folds must converge to the one-shot batch
    aggregate, and a REPLAYED batch id (the foreachBatch crash-replay
    case) must be a no-op rather than double-count."""
    import pyspark.sql.functions as F

    from lazy_frame_spark.operators import incremental as iv
    from lazy_frame_spark.operators.incremental import agg_view_stream_writer
    from lazy_frame_spark.streaming import stream_events

    src = str(tmp_path / "ev_src")
    view = str(tmp_path / "ev_view")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    )
    ev.repartition(4).write.parquet(src)
    stream = stream_events(spark, src, spark.read.parquet(src).schema,
                           max_files_per_trigger=1)
    fold = agg_view_stream_writer(view, ["event_type"], sum_cols=["value"],
                                  min_cols=["value"], max_cols=["value"])
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def norm(df):
        return sorted(
            (r["event_type"], r["__n__"], round(r["sum_value"], 4),
             r["min_value"], r["max_value"])
            for r in df.collect()
        )
    got = spark.read.parquet(view)
    want = iv.agg_view_build(ev, ["event_type"], sum_cols=["value"],
                             min_cols=["value"], max_cols=["value"])
    assert norm(got) == norm(want)

    # replay an already-folded batch id: exactly-once skip
    fold(ev.limit(50), 0)
    assert norm(spark.read.parquet(view)) == norm(want)


def test_upsert_sink_gc_retains_last_n_versions(spark, tmp_path_factory):
    """A multi-batch stream must leave exactly retain_versions version
    dirs (old ones deleted AFTER pointer publish), the pointer must
    reference a surviving version, replayed batch ids stay no-ops, and
    the merged content is unaffected by GC."""
    import os
    import re

    from lazy_frame_spark.streaming.sinks import ParquetUpsertSink

    table = str(tmp_path_factory.mktemp("upsert_gc"))
    sink = ParquetUpsertSink(table, keys=["k"], seq_col="seq",
                             retain_versions=2)
    for bid in range(5):
        b = spark.createDataFrame(
            [(f"k{bid}", bid, f"p{bid}"), ("shared", bid, f"s{bid}")],
            "k string, seq long, payload string",
        )
        sink.upsert_batch(b, bid)

    vers = sorted(int(m.group(1)) for m in
                  (re.fullmatch(r"v(\d+)", n) for n in os.listdir(table)) if m)
    assert vers == [3, 4], f"expected exactly the last 2 versions, got {vers}"
    assert sink.current_path().endswith("v4")

    # replayed batch id: no-op, no new version
    sink.upsert_batch(
        spark.createDataFrame([("zzz", 99, "never")],
                              "k string, seq long, payload string"), 2)
    vers2 = sorted(int(m.group(1)) for m in
                   (re.fullmatch(r"v(\d+)", n) for n in os.listdir(table)) if m)
    assert vers2 == [3, 4]

    got = {r["k"]: r["payload"] for r in sink.read_current(spark).collect()}
    assert got == {"k0": "p0", "k1": "p1", "k2": "p2", "k3": "p3",
                   "k4": "p4", "shared": "s4"}

    # retain_versions=1 keeps only the current version
    t1 = str(tmp_path_factory.mktemp("upsert_gc1"))
    s1 = ParquetUpsertSink(t1, keys=["k"], seq_col="seq", retain_versions=1)
    for bid in range(3):
        s1.upsert_batch(
            spark.createDataFrame([("a", bid, str(bid))],
                                  "k string, seq long, payload string"), bid)
    only = [n for n in os.listdir(t1) if re.fullmatch(r"v\d+", n)]
    assert only == ["v2"]

    import pytest
    with pytest.raises(ValueError, match="retain_versions"):
        ParquetUpsertSink(t1, keys=["k"], seq_col="seq", retain_versions=0)

    # time travel within retention: the retained previous version shows
    # the pre-publish state; GC'd and future versions raise
    assert sink.versions() == [3, 4]
    prev = {r["k"]: r["payload"]
            for r in sink.read_version(spark, 3).collect()}
    assert prev["shared"] == "s3" and "k4" not in prev
    with pytest.raises(ValueError, match="garbage-collected"):
        sink.read_version(spark, 1)
    with pytest.raises(ValueError, match="not published"):
        sink.read_version(spark, 99)


def test_agg_view_stream_writer_cdc_retraction(spark, sf_dir, tmp_path):
    """CDC-aware stream maintenance: 'D' rows retract, others upsert —
    the streamed view must equal a batch build over the NET rows
    (inserts minus deletes), replay stays exactly-once, and a grain
    whose every row was deleted drops out. op_col with min/max cols
    raises up front."""
    import pyspark.sql.functions as F
    import pytest

    from lazy_frame_spark.operators import incremental as iv
    from lazy_frame_spark.operators.incremental import agg_view_stream_writer
    from lazy_frame_spark.streaming import stream_events

    src = str(tmp_path / "cdc_src")
    view = str(tmp_path / "cdc_view")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    types = sorted(r["event_type"]
                   for r in ev.select("event_type").distinct().collect())
    doomed_type = types[0]
    # CDC log: every event inserted; every 3rd event AND the entire
    # doomed grain deleted afterwards (later file => later micro-batch)
    inserts = ev.withColumn("op", F.lit("I"))
    deletes = ev.filter(
        (F.col("event_id") % 3 == 0) | (F.col("event_type") == doomed_type)
    ).withColumn("op", F.lit("D"))
    inserts.repartition(2).write.parquet(src)
    deletes.coalesce(1).write.mode("append").parquet(src)

    stream = stream_events(spark, src, spark.read.parquet(src).schema,
                           max_files_per_trigger=2)
    fold = agg_view_stream_writer(view, ["event_type"], sum_cols=["value"],
                                  op_col="op")
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "cdc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    net = ev.join(deletes.drop("op"), on=["event_id", "event_type", "value"],
                  how="left_anti")
    want = iv.agg_view_build(net, ["event_type"], sum_cols=["value"])

    def norm(df):
        return sorted((r["event_type"], r["__n__"], round(r["sum_value"], 4))
                      for r in df.select("event_type", "__n__", "sum_value")
                      .collect())
    got = spark.read.parquet(view)
    assert norm(got) == norm(want)
    assert got.filter(F.col("event_type") == doomed_type).count() == 0

    # replayed batch id: no-op
    fold(inserts.limit(30), 0)
    assert norm(spark.read.parquet(view)) == norm(want)

    with pytest.raises(ValueError, match="count/sum views only"):
        agg_view_stream_writer(view, ["event_type"], sum_cols=["value"],
                               min_cols=["value"], op_col="op")


def test_cdc_stream_retractable_extremes(spark, tmp_path):
    """CDC stream maintenance of a min/max view with buffer_extremes=N:
    deleting a grain's current min AND max serves the exact next-best
    from the bounded synopsis (no rescan), replay stays exactly-once, a
    grain losing more than N rows in one batch goes __stale__ and STAYS
    stale across later clean batches, and an out-of-band batch repair
    against the net source clears it."""
    import pyspark.sql.functions as F

    from lazy_frame_spark.operators import incremental as iv
    from lazy_frame_spark.operators.incremental import agg_view_stream_writer

    view = str(tmp_path / "cdc_ext_view")
    fold = agg_view_stream_writer(view, ["k"], sum_cols=["v"],
                                  min_cols=["v"], max_cols=["v"],
                                  op_col="op", buffer_extremes=4)
    b0 = spark.createDataFrame(
        [("a", float(v), "I") for v in range(10)]
        + [("b", float(v), "I") for v in range(100, 110)],
        "k string, v double, op string")
    fold(b0, 0)
    # delete a's current extremes -> exact next-best, no staleness
    b1 = spark.createDataFrame([("a", 0.0, "D"), ("a", 9.0, "D")],
                               "k string, v double, op string")
    fold(b1, 1)
    got = {r["k"]: r for r in spark.read.parquet(view).collect()}
    assert got["a"]["min_v"] == 1.0 and got["a"]["max_v"] == 8.0
    assert got["a"]["__n__"] == 8 and got["a"][iv.STALE_COL] is False
    # replayed batch id: exactly-once no-op
    fold(b1, 1)
    again = {r["k"]: r for r in spark.read.parquet(view).collect()}
    assert again["a"]["min_v"] == 1.0 and again["a"]["__n__"] == 8
    # 6 > N deletes on 'b' in one batch: synopsis can't prove -> stale
    b2 = spark.createDataFrame(
        [("b", float(v), "D") for v in range(100, 106)],
        "k string, v double, op string")
    fold(b2, 2)
    stale_now = {r["k"] for r in spark.read.parquet(view)
                 .filter(F.col(iv.STALE_COL)).collect()}
    assert stale_now == {"b"}
    # staleness persists through a later clean batch (repair is
    # out-of-band — a stream cannot be rescanned)
    b3 = spark.createDataFrame([("b", 200.0, "I")],
                               "k string, v double, op string")
    fold(b3, 3)
    vb = {r["k"]: r for r in spark.read.parquet(view).collect()}
    assert vb["b"][iv.STALE_COL] is True
    assert vb["a"][iv.STALE_COL] is False
    # out-of-band repair against the net source rebuilds 'b' exactly
    net = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 9)]
        + [("b", float(v)) for v in range(106, 110)] + [("b", 200.0)],
        "k string, v double")
    repaired = iv.agg_view_repair(
        spark.read.parquet(view), net, ["k"],
        sum_cols=["v"], min_cols=["v"], max_cols=["v"], buffer_extremes=4)
    want = iv.agg_view_build(net, ["k"], sum_cols=["v"], min_cols=["v"],
                             max_cols=["v"], buffer_extremes=4)

    def norm(d):
        return sorted((r["k"], r["__n__"], r["sum_v"], r["min_v"],
                       r["max_v"]) for r in d.collect())

    assert norm(repaired) == norm(want)
    brow = {r["k"]: r for r in repaired.collect()}["b"]
    assert brow["min_v"] == 106.0 and brow["max_v"] == 200.0


def test_cdc_writer_null_op_rows_upsert(spark, tmp_path):
    """A NULL op value means 'not a delete' and must UPSERT — a plain
    == comparison dropped NULL-op rows from both sides (review
    finding). Common CDC shape: only deletes are tagged."""
    import pyspark.sql.functions as F

    from lazy_frame_spark.operators import incremental as iv
    from lazy_frame_spark.operators.incremental import agg_view_stream_writer

    view = str(tmp_path / "cdc_null_view")
    fold = agg_view_stream_writer(view, ["k"], sum_cols=["v"], op_col="op")
    batch = spark.createDataFrame(
        [("a", 1.0, None), ("a", 2.0, None), ("b", 3.0, "I"),
         ("a", 1.0, "D")],
        "k string, v double, op string",
    )
    fold(batch, 0)
    got = {r["k"]: (r["__n__"], r["sum_v"])
           for r in spark.read.parquet(view).collect()}
    # both NULL-op 'a' rows inserted, then one retracted by the D row
    assert got == {"a": (1, 2.0), "b": (1, 3.0)}


def test_stream_into_versioned_table_exactly_once(spark, sf_dir, tmp_path):
    """readStream → foreachBatch(versioned_stream_writer): every drained
    micro-batch lands as ONE versioned append with its batch id in the
    manifest; re-draining with a FRESH checkpoint (at-least-once
    replay) is absorbed by the high-water mark — table contents stay
    exactly-once, and each ingest epoch is individually
    time-travelable."""
    import glob
    import shutil

    from lazy_frame_spark.sources.registry import load_table
    from lazy_frame_spark.sources.versioned import (
        last_stream_batch,
        read_versioned,
        versioned_stream_writer,
    )

    src = str(tmp_path / "vsrc")
    tbl = str(tmp_path / "vtable")
    ev = load_table(spark, sf_dir, "events").limit(200)
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def drain(ckpt):
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.foreachBatch(versioned_stream_writer(tbl))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain("ck1")
    assert read_versioned(spark, tbl).count() == 200
    hw1 = last_stream_batch(tbl)

    # a fresh checkpoint replays EVERYTHING from batch 0 — the writer's
    # high-water mark must absorb it
    drain("ck2")
    assert read_versioned(spark, tbl).count() == 200
    assert last_stream_batch(tbl) == hw1

    # new file: only its rows commit, as a later batch id
    extra = load_table(spark, sf_dir, "events").limit(260).subtract(ev)
    extra.coalesce(1).write.parquet(str(tmp_path / "extra"))
    for f in glob.glob(str(tmp_path / "extra") + "/part-*.parquet"):
        shutil.copy(f, src + "/late-" + f.rsplit("/", 1)[1])
    drain("ck2")
    assert read_versioned(spark, tbl).count() == 260
    assert last_stream_batch(tbl) > hw1


# --------------------------------------------------------------------- #
# streaming READS of versioned tables (sources/versioned_stream.py)
# --------------------------------------------------------------------- #

def _vsr_orders(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_orderkey", "o_totalprice", "o_orderdate",
                    "o_orderstatus"))


def test_versioned_stream_read_drains_append_chain(spark, sf_dir, tmp_path):
    """readStream over the commit log: bootstrap snapshot + two appends
    drain into a memory sink and match the batch union exactly —
    including date and string columns through the Arrow cast path."""
    from lazy_frame_spark.sources import versioned as V
    from lazy_frame_spark.sources.versioned_stream import (
        versioned_stream_read,
    )

    t = str(tmp_path / "vsr")
    o = _vsr_orders(spark, sf_dir)
    V.write_versioned(o.filter(F.col("o_orderkey") <= 500), t)
    V.append_versioned(
        o.filter(F.col("o_orderkey").between(501, 900)), t)
    V.append_versioned(
        o.filter(F.col("o_orderkey").between(901, 1100)), t)
    q = (versioned_stream_read(spark, t)
         .writeStream.format("memory").queryName("vsr_drain")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(180)
    assert q.exception() is None
    got = spark.sql("SELECT * FROM vsr_drain")
    exp = o.filter(F.col("o_orderkey") <= 1100)
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_versioned_stream_checkpoint_consumes_only_new_appends(
        spark, sf_dir, tmp_path):
    """Exactly-once across restarts: a second availableNow run over the
    SAME checkpoint must deliver only the rows appended in between —
    version offsets ride the checkpoint, manifests are immutable."""
    from lazy_frame_spark.sources import versioned as V
    from lazy_frame_spark.sources.versioned_stream import (
        versioned_stream_read,
    )

    t = str(tmp_path / "vsr2")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    o = _vsr_orders(spark, sf_dir)
    V.write_versioned(o.filter(F.col("o_orderkey") <= 400), t)

    def drain():
        # parquet sink: the memory sink can't recover a checkpoint
        q = (versioned_stream_read(spark, t)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(180)
        assert q.exception() is None
        return spark.read.parquet(out)

    n1 = drain().count()
    assert n1 == o.filter(F.col("o_orderkey") <= 400).count()
    V.append_versioned(o.filter(F.col("o_orderkey").between(401, 700)), t)
    got = drain()  # same checkpoint: exactly the delta lands on top
    exp = o.filter(F.col("o_orderkey") <= 700)
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    # idempotent re-run with no new commits adds nothing
    assert drain().count() == exp.count()


def test_versioned_stream_fails_on_destructive_commit(
        spark, sf_dir, tmp_path):
    """A delete mid-chain must fail the stream loudly (rows already
    delivered cannot be retracted) — never silently re-emit or skip."""
    from lazy_frame_spark.sources import versioned as V
    from lazy_frame_spark.sources.versioned_stream import (
        VersionedStreamReader,
    )

    t = str(tmp_path / "vsr3")
    o = _vsr_orders(spark, sf_dir)
    V.write_versioned(o.filter(F.col("o_orderkey") <= 400), t)
    V.append_versioned(o.filter(F.col("o_orderkey").between(401, 600)), t)
    V.delete_versioned(spark, t, "o_orderkey <= 100")
    r = VersionedStreamReader({"path": t})
    with pytest.raises(ValueError, match="append-only chain"):
        r.partitions({"version": 0}, {"version": 3})
    # streaming only the pre-delete range still plans fine
    assert len(r.partitions({"version": 0}, {"version": 2})) > 0


def test_versioned_stream_fails_on_merge_on_read_delete(
        spark, sf_dir, tmp_path):
    """The destructive-commit gate's merge-on-read twin: a DV delete
    keeps the FILE list identical (only dv_files grows), so the
    file-diff test alone would silently stream across rows the table
    has logically erased — the gate must track the DV list too. An
    append AFTER the delete inherits the DV list unchanged, so a
    re-seeded stream starting past the delete plans fine."""
    from lazy_frame_spark.sources import versioned as V
    from lazy_frame_spark.sources.versioned_stream import (
        VersionedStreamReader,
    )

    t = str(tmp_path / "vsr_mor")
    o = _vsr_orders(spark, sf_dir)
    V.write_versioned(o.filter(F.col("o_orderkey") <= 400), t)            # v1
    V.append_versioned(o.filter(F.col("o_orderkey").between(401, 600)),
                       t)                                                 # v2
    _, st = V.delete_versioned(spark, t, "o_orderkey <= 100",
                               strategy="merge-on-read")                  # v3
    assert st["rows_deleted"] > 0 and st["files_rewritten"] == 0
    V.append_versioned(o.filter(F.col("o_orderkey").between(601, 800)),
                       t)                                                 # v4
    r = VersionedStreamReader({"path": t})
    with pytest.raises(ValueError, match="deletion vectors"):
        r.partitions({"version": 0}, {"version": 3})
    with pytest.raises(ValueError, match="append-only chain"):
        r.partitions({"version": 2}, {"version": 4})
    # pre-delete range still plans; re-seeding PAST the delete plans
    # (the appends after v3 carry the DV list by reference, unchanged)
    assert len(r.partitions({"version": 0}, {"version": 2})) > 0
    assert len(r.partitions({"version": 3}, {"version": 4})) > 0


def test_versioned_stream_drains_rebased_concurrent_appends(
        spark, sf_dir, tmp_path):
    """Concurrency × streaming: a chain containing REBASED concurrent
    appends (losers re-committed on top of winners, so each commit's
    file list is the winner's plus its own) must stream exactly-once —
    the per-version file diff attributes every file to exactly the
    commit that introduced it, no double-emits, no drops."""
    import threading

    from lazy_frame_spark.sources import versioned as V
    from lazy_frame_spark.sources.versioned_stream import (
        versioned_stream_read,
    )

    t = str(tmp_path / "vsr_race")
    o = _vsr_orders(spark, sf_dir)
    V.write_versioned(o.filter(F.col("o_orderkey") <= 200), t)
    bands = [(201, 400), (401, 600), (601, 800), (801, 1000)]
    errs: list = []

    def work(lo, hi):
        try:
            V.append_versioned(
                o.filter(F.col("o_orderkey").between(lo, hi)), t)
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    threads = [threading.Thread(target=work, args=b) for b in bands]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    assert V.latest_version(t) == 1 + len(bands)  # dense: rebases won
    q = (versioned_stream_read(spark, t)
         .writeStream.format("memory").queryName("vsr_race_drain")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(180)
    assert q.exception() is None
    got = spark.sql("SELECT * FROM vsr_race_drain")
    exp = o.filter(F.col("o_orderkey") <= 1000)
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_versioned_stream_pads_pre_evolution_files(
        spark, sf_dir, tmp_path):
    """Files written before an additive evolution stream their missing
    column as typed NULL — the committed-schema rule, Arrow-side."""
    from lazy_frame_spark.sources import versioned as V
    from lazy_frame_spark.sources.versioned_stream import (
        versioned_stream_read,
    )

    t = str(tmp_path / "vsr4")
    o = _vsr_orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    V.write_versioned(o.filter(F.col("o_orderkey") <= 300), t)
    V.append_versioned(
        o.filter(F.col("o_orderkey").between(301, 500))
        .withColumn("lang", F.lit("en")),
        t, merge_schema=True)
    q = (versioned_stream_read(spark, t)
         .writeStream.format("memory").queryName("vsr_evo")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(180)
    assert q.exception() is None
    got = spark.sql(
        "SELECT COALESCE(lang, 'none') AS lang, COUNT(*) AS n "
        "FROM vsr_evo GROUP BY 1").collect()
    by = {r["lang"]: r["n"] for r in got}
    assert by["none"] == o.filter(F.col("o_orderkey") <= 300).count()
    assert by["en"] == o.filter(
        F.col("o_orderkey").between(301, 500)).count()


def test_versioned_stream_starting_timestamp_and_widened_files(
        spark, sf_dir, tmp_path):
    """starting_timestamp resolves like read_versioned(as_of=...), and
    narrow pre-widening files stream up-cast to the evolved schema."""
    import time as _time

    from lazy_frame_spark.sources import versioned as V
    from lazy_frame_spark.sources.versioned_stream import (
        versioned_stream_read,
    )

    t = str(tmp_path / "vsr5")
    o = _vsr_orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    narrow = o.withColumn("o_orderkey", F.col("o_orderkey").cast("int"))
    V.write_versioned(narrow.filter(F.col("o_orderkey") <= 200), t)
    cut = _time.time()
    V.append_versioned(
        o.filter(F.col("o_orderkey").between(201, 400)), t,
        merge_schema=True)  # widens int -> bigint
    # start AFTER the snapshot taken at `cut`: only the append streams
    q = (versioned_stream_read(spark, t, starting_timestamp=cut)
         .writeStream.format("memory").queryName("vsr_ts")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(180)
    assert q.exception() is None
    got = spark.sql("SELECT * FROM vsr_ts")
    assert dict(got.dtypes)["o_orderkey"] == "bigint"
    assert got.count() == o.filter(
        F.col("o_orderkey").between(201, 400)).count()
    # full replay also casts the narrow v1 files up to bigint
    q2 = (versioned_stream_read(spark, t)
          .writeStream.format("memory").queryName("vsr_ts_full")
          .outputMode("append").trigger(availableNow=True).start())
    assert q2.awaitTermination(180)
    assert q2.exception() is None
    full = spark.sql("SELECT * FROM vsr_ts_full")
    assert full.count() == o.filter(F.col("o_orderkey") <= 400).count()
    assert dict(full.dtypes)["o_orderkey"] == "bigint"
    with pytest.raises(ValueError, match="mutually exclusive"):
        versioned_stream_read(spark, t, starting_version=1,
                              starting_timestamp=cut)


def test_versioned_stream_max_files_per_batch_admission_control(
        spark, sf_dir, tmp_path):
    """Steady-state admission control: from a run's second micro-batch
    on, each batch admits whole versions totalling at most the cap's
    files (>= 1 version, so progress is guaranteed). The unit drives
    the reader through the engine's PROBED call order — latestOffset
    BEFORE initialOffset, even on fresh queries — which is exactly why
    a run's first batch must stay uncapped: the API hides the
    checkpointed start, and a blind cap could hand back an offset
    behind it and stall a resumed stream forever. The e2e run proves
    the option plumbs through without changing delivered rows."""
    from lazy_frame_spark.sources import versioned as V
    from lazy_frame_spark.sources.versioned_stream import (
        VersionedStreamReader,
        versioned_stream_read,
    )

    t = str(tmp_path / "vsr_cap")
    out = str(tmp_path / "cap_out")
    ckpt = str(tmp_path / "cap_ckpt")
    o = _vsr_orders(spark, sf_dir)
    V.write_versioned(
        o.filter(F.col("o_orderkey") <= 200).coalesce(1), t)   # v1: 1 file
    bands = [(201, 300), (301, 400), (401, 500)]
    for lo, hi in bands:                                       # v2-v4
        V.append_versioned(
            o.filter(F.col("o_orderkey").between(lo, hi)).coalesce(1), t)

    # engine call order (probed): latest -> initial -> partitions ->
    # commit -> latest -> ... First batch uncapped, then capped.
    r = VersionedStreamReader({"path": t, "max_files_per_batch": 1})
    assert r.latestOffset() == {"version": 4}      # first batch: uncapped
    r.initialOffset()
    r.partitions({"version": 0}, {"version": 1})   # engine planned [0,1]
    r.commit({"version": 1})
    V.append_versioned(                                        # v5
        o.filter(F.col("o_orderkey").between(501, 600)).coalesce(1), t)
    V.append_versioned(                                        # v6
        o.filter(F.col("o_orderkey").between(601, 700)).coalesce(1), t)
    assert r.latestOffset() == {"version": 2}      # capped: 1 version
    r.commit({"version": 2})
    assert r.latestOffset() == {"version": 3}
    # a bigger budget admits whole versions while it lasts
    r2 = VersionedStreamReader({"path": t, "max_files_per_batch": 2})
    r2.partitions({"version": 0}, {"version": 2})
    r2.commit({"version": 2})
    assert r2.latestOffset() == {"version": 4}     # v3(1) + v4(1) fit
    # progress even when one version alone exceeds the cap
    r3 = VersionedStreamReader({"path": t, "max_files_per_batch": 1})
    big = o.filter(F.col("o_orderkey") > 700).repartition(4)
    V.append_versioned(big, t)                                 # v7: 4 files
    r3.commit({"version": 6})
    assert r3.latestOffset() == {"version": 7}     # >=1 version always
    with pytest.raises(ValueError, match="max_files_per_batch"):
        VersionedStreamReader({"path": t, "max_files_per_batch": 0})

    # e2e: the option plumbs through; an availableNow run (single
    # uncapped batch) delivers the same rows, and a re-run is a no-op
    def drain():
        q = (versioned_stream_read(spark, t, max_files_per_batch=1)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(180)
        assert q.exception() is None
        return spark.read.parquet(out).count()

    full = o.count()
    assert drain() == full
    assert drain() == full
    """The streaming change-data-feed closure (relay_changes): the
    stream source refuses destructive commits, so changes become DATA
    — each relay appends compacted I/U/D op rows to an append-only
    feed table the stream source CAN tail. A consumer drains the
    bootstrap, the source then takes an append + a merge-on-read
    delete + a keyed update-merge, and the SAME checkpointed consumer
    drains the relayed ops without breaking: the DV delete arrives as
    D rows carrying the retraction preimage."""
    from lazy_frame_spark.sources import versioned as V
    from lazy_frame_spark.sources.versioned_stream import (
        versioned_stream_read,
    )

    src = str(tmp_path / "cdf_src")
    feed = str(tmp_path / "cdf_feed")
    out = str(tmp_path / "cdf_out")
    ckpt = str(tmp_path / "cdf_ckpt")
    o = _vsr_orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    V.write_versioned(o.filter(F.col("o_orderkey") <= 400), src)
    _, st1 = V.relay_changes(spark, src, feed, "o_orderkey")
    assert st1["bootstrap"]

    def drain():
        q = (versioned_stream_read(spark, feed)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(180)
        assert q.exception() is None
        return spark.read.parquet(out)

    n0 = o.filter(F.col("o_orderkey") <= 400).count()
    got = drain()
    assert got.count() == n0
    assert got.filter("op != 'I'").count() == 0

    V.append_versioned(o.filter(F.col("o_orderkey").between(401, 600)),
                       src)
    V.delete_versioned(spark, src, "o_orderkey <= 50",
                       strategy="merge-on-read")
    V.merge_versioned(
        spark, src,
        o.filter(F.col("o_orderkey").between(101, 150))
        .withColumn("o_totalprice", F.lit(1.0)),
        "o_orderkey")
    _, st2 = V.relay_changes(spark, src, feed, "o_orderkey")
    assert st2["ops"] and st2["ops"] > 0
    got = drain()  # same checkpoint: consumer survives the chain
    d = got.filter("op = 'D'").select("o_orderkey", "o_totalprice")
    u = got.filter("op = 'U'")
    i2 = got.filter("op = 'I' AND _src_version > 1")
    exp_del = o.filter(F.col("o_orderkey") <= 50)
    assert d.count() == exp_del.count()
    assert d.exceptAll(exp_del).count() == 0  # preimage rides the D
    assert (sorted(r["o_orderkey"] for r in u.collect())
            == sorted(r["o_orderkey"] for r in
                      o.filter(F.col("o_orderkey").between(101, 150))
                      .collect()))
    assert u.filter("o_totalprice != 1.0").count() == 0
    assert i2.count() == o.filter(
        F.col("o_orderkey").between(401, 600)).count()
    # no-change relay no-ops; draining again adds nothing
    total = got.count()
    _, st3 = V.relay_changes(spark, src, feed, "o_orderkey")
    assert st3["ops"] == 0
    assert drain().count() == total
    # reserved-column collision is refused up front
    with pytest.raises(ValueError, match="op"):
        V.relay_changes(spark, feed, str(tmp_path / "f2"), "o_orderkey")


def test_feed_stream_restart_across_rename_follow(spark, tmp_path):
    """End-to-end: a checkpointed Structured Streaming consumer of a
    relay feed across the feed's rename-follow. The schema is fixed
    per RUN (mid-run renames fail loudly — reader-level test); a
    RESTART re-resolves it, so the resumed run ADOPTS the new
    spelling and delivers the pending rows exactly once with correct
    values — physical identity makes the adoption sound. A fresh
    checkpoint replays the whole feed under the new spelling."""
    import pyspark.sql.functions as F

    from lazy_frame_spark.sources import versioned as V
    from lazy_frame_spark.sources.versioned_stream import (
        versioned_stream_read,
    )

    src = str(tmp_path / "fs_src")
    feed = str(tmp_path / "fs_feed")
    out1 = str(tmp_path / "out1")
    ck1 = str(tmp_path / "ck1")
    rows = spark.range(6).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    V.write_versioned(rows, src)
    V.relay_changes(spark, src, feed, "k")

    def drain(outp, ckp):
        q = (versioned_stream_read(spark, feed)
             .writeStream.format("parquet").option("path", outp)
             .option("checkpointLocation", ckp)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return q

    q = drain(out1, ck1)
    assert q.exception() is None
    assert spark.read.parquet(out1).count() == 6
    # source renames; the next relay makes the feed follow
    V.rename_column(spark, src, "v", "value")
    V.append_versioned(
        spark.range(6, 9).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("value")), src)
    V.relay_changes(spark, src, feed, "k")
    # the SAME checkpoint resumes: the new run re-resolves the schema
    # (post-rename), the alter commits in the pending range are
    # history already folded in, and ONLY the pending rows land —
    # exactly once, under the new spelling
    q2 = drain(out1, ck1)
    assert q2.exception() is None
    merged = spark.read.option("mergeSchema", "true").parquet(out1)
    assert merged.count() == 9
    assert {"v", "value"} <= set(merged.columns)  # sink saw both runs
    assert merged.filter("value IS NOT NULL").count() == 3
    # a FRESH checkpoint replays the whole feed under the new spelling
    out2 = str(tmp_path / "out2")
    ck2 = str(tmp_path / "ck2")
    q3 = drain(out2, ck2)
    assert q3.exception() is None
    got = spark.read.parquet(out2)
    assert "value" in got.columns and got.count() == 9
    assert sorted(r["k"] for r in got.collect()) == list(range(9))


def test_manifest_schema_ddl_shared_and_backtick_safe(spark):
    """schema() and the driver-side readStream fast path render their
    DDL through ONE helper (a diverging copy would let the worker
    declare a different schema than the driver pinned), and a field
    name containing a backtick escapes to valid DDL instead of
    producing an unparseable string."""
    import json as _json

    from pyspark.sql import types as T

    from lazy_frame_spark.sources.versioned_stream import (
        _manifest_schema_ddl,
    )

    sch = T.StructType([
        T.StructField("plain", T.LongType()),
        T.StructField("weird`name", T.StringType()),
    ])
    ddl = _manifest_schema_ddl(_json.dumps(sch.jsonValue()))
    assert "`weird``name`" in ddl
    # the escaped DDL round-trips to the original field names
    back = T._parse_datatype_string(ddl)
    assert [f.name for f in back.fields] == ["plain", "weird`name"]
    assert [f.dataType for f in back.fields] == [
        T.LongType(), T.StringType()]
