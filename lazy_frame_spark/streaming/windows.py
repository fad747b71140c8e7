"""Structured Streaming extension over the events table.

The reference has no streaming whatsoever (SURVEY.md §2.2) — this is the
north-star extension built the Spark-native way: the SAME windowed
aggregation functions run in batch mode (for the DuckDB oracle) and in a
``readStream`` pipeline (for production), because ``window()`` /
``session_window()`` are plan transformations, not stream-only APIs.

Scale/correctness notes:
- watermarks bound state: an aggregation over a 100 TB/day stream keeps
  only in-flight windows in the state store, late rows beyond the
  watermark are dropped (documented, testable);
- tumbling/sliding windows are epoch-aligned — identical bucketing to
  DuckDB's ``time_bucket``;
- session windows use the built-in ``session_window`` (gap-merged in the
  state store) rather than a hand-rolled stateful op; the batch-mode
  equivalent is the classic gaps-and-islands SQL, which the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    duration: str = "1 hour",
    time_col: str = "ts",
    key_col: str = "event_type",
    watermark: str | None = None,
) -> DataFrame:
    """Per-(window, key) count + value sum over fixed windows."""
    if watermark:
        events = events.withWatermark(time_col, watermark)
    return (
        events.groupBy(F.window(time_col, duration).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    time_col: str = "ts",
    key_col: str = "event_type",
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    if watermark:
        events = events.withWatermark(time_col, watermark)
    return (
        events.groupBy(F.window(time_col, duration, slide).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), key_col, "n")
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "5 minutes",
    time_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessions per key: session_start, event count, value sum."""
    if watermark:
        events = events.withWatermark(time_col, watermark)
    return (
        events.groupBy(F.session_window(time_col, gap).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            key_col,
            "n",
            "sum_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    time_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving within
    the watermark horizon are dropped; state is purged beyond it."""
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_events(
    spark: SparkSession,
    events_dir: str,
    schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of event parquet files —
    the test/demo stand-in for Kafka; swap ``format('kafka')`` in
    production, the downstream plan is identical."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(events_dir)


def stream_stream_time_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "l_ts",
    right_time: str = "r_ts",
    watermark: str = "1 hour",
    max_lag: str = "1 hour",
) -> DataFrame:
    """Time-bounded stream-stream inner join: right events within
    ``[left_time - max_lag, left_time]`` for the same key.

    Both sides carry watermarks and the join condition bounds event time
    in both directions — that pair of constraints is what lets the state
    store evict rows (an unbounded stream-stream join would buffer
    forever). The same plan runs in batch mode for the oracle.
    """
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_time] >= F.expr(f"{left_time} - INTERVAL {max_lag}"))
        & (rw[right_time] <= lw[left_time])
    )
    return lw.join(rw, cond, "inner")


def run_stream_to_memory(
    result: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain a streaming aggregation into an in-memory table with the
    availableNow trigger (process-everything-then-stop) — the pattern the
    tests use to compare stream results against batch results."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    dim_col: str = "segment",
    value_col: str = "value",
    window_duration: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-static enrichment: join each event against a STATIC dim
    frame (no watermark, no join state — the dim is just broadcast into
    every micro-batch, and dim updates are picked up at the next batch
    for file-backed dims), then a tumbling windowed aggregate per the
    dim's ``dim_col`` attribute over the stream's ``value_col``. The
    workhorse pattern for enriching telemetry with account/segment
    tables; identical plan in batch mode, which is what the oracle
    checks."""
    enriched = stream.join(F.broadcast(dim), on=on)
    return (
        enriched.groupBy(
            F.window(F.col(ts_col), window_duration).getField("start").alias(
                "window_start"
            ),
            dim_col,
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
    )
