"""Streaming sinks: keyed upsert via foreachBatch, and a Kafka-shaped
message sink.

The reference has no streaming (SURVEY.md §2.2) — north-star scope. The
upsert sink demonstrates the canonical Structured Streaming pattern for
exactly-once keyed output over a plain-parquet table: ``foreachBatch``
gives a batch DataFrame + a monotonically increasing ``batch_id``, and the
sink (a) skips batch ids it has already committed (idempotent under
micro-batch replay after failure) and (b) versions the table directory,
atomically publishing via a pointer file.

Scale note: at 100 TB you would point the same ``foreachBatch`` body at a
table format with a real MERGE (Delta/Iceberg) instead of
read-union-rewrite — the streaming side (idempotence, batch ids,
checkpointing) is identical; only the merge implementation narrows to the
touched partitions. The pointer-file scheme here is the minimal honest
stand-in that still gets atomic publish + replay safety right.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class ParquetUpsertSink:
    """Keyed upsert into a versioned parquet table, driven by foreachBatch.

    ``keys``: upsert identity — a batch row replaces the stored row with
    the same key. Within a batch, the row with the greatest ``seq_col``
    wins (ties broken arbitrarily but deterministically by the window
    sort). Readers open ``current_path()``.

    ``retain_versions``: how many published versions stay on disk (≥ 1).
    A long-running stream writes ``v0, v1, v2, …`` forever; without
    retention the dead versions fill the disk. After each pointer
    publish the sink deletes every version older than the newest
    ``retain_versions`` — the default (2) keeps the previous version
    alive so a reader that resolved ``current_path()`` just before the
    publish can still finish its scan. Replay safety is unaffected:
    replayed batch ids are skipped via the pointer, never by re-reading
    old versions.
    """

    def __init__(
        self,
        table_dir: str,
        keys: list[str],
        seq_col: str,
        retain_versions: int = 2,
    ):
        if retain_versions < 1:
            raise ValueError("retain_versions must be >= 1")
        self.table_dir = table_dir
        self.keys = keys
        self.seq_col = seq_col
        self.retain_versions = retain_versions
        os.makedirs(table_dir, exist_ok=True)

    # -- pointer management ------------------------------------------- #
    @property
    def _pointer(self) -> str:
        return os.path.join(self.table_dir, "_CURRENT")

    def _read_pointer(self) -> tuple[int, int]:
        """(last committed batch_id, current version) or (-1, -1)."""
        try:
            with open(self._pointer, encoding="utf-8") as f:
                bid, ver = f.read().split(",")
                return int(bid), int(ver)
        except FileNotFoundError:
            return -1, -1

    def current_path(self) -> str | None:
        _, ver = self._read_pointer()
        return None if ver < 0 else os.path.join(self.table_dir, f"v{ver}")

    def read_current(self, spark: SparkSession) -> DataFrame | None:
        p = self.current_path()
        return None if p is None else spark.read.parquet(p)

    def versions(self) -> list[int]:
        """Version numbers currently on disk (ascending) — the newest
        ``retain_versions`` published ones, plus possibly one orphan
        above the pointer from a crash between write and publish."""
        import re

        return sorted(
            int(m.group(1))
            for m in (re.fullmatch(r"v(\d+)", n)
                      for n in os.listdir(self.table_dir))
            if m
        )

    def read_version(self, spark: SparkSession, version: int) -> DataFrame:
        """Time travel within the retention window: read a specific
        retained version (the state as of that batch's publish).
        Raises for versions GC'd away or never published — time travel
        reaches exactly as far back as ``retain_versions``."""
        _, cur = self._read_pointer()
        if version > cur:
            raise ValueError(
                f"version {version} not published (current is {cur})"
            )
        p = os.path.join(self.table_dir, f"v{version}")
        if not os.path.isdir(p):
            raise ValueError(
                f"version {version} was garbage-collected "
                f"(retain_versions={self.retain_versions}; on disk: "
                f"{self.versions()})"
            )
        return spark.read.parquet(p)

    # -- the foreachBatch body ---------------------------------------- #
    def upsert_batch(self, batch: DataFrame, batch_id: int) -> None:
        last_bid, ver = self._read_pointer()
        if batch_id <= last_bid:
            return  # replayed micro-batch after recovery — already merged
        spark = batch.sparkSession
        # latest row per key within the incoming batch
        w = Window.partitionBy(*self.keys).orderBy(
            F.col(self.seq_col).desc(), *[F.col(k) for k in self.keys]
        )
        latest = (
            batch.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )
        current = self.read_current(spark)
        if current is None:
            merged = latest
        else:
            survivors = current.join(
                F.broadcast(latest.select(*self.keys).distinct()),
                on=self.keys,
                how="left_anti",
            )
            merged = survivors.unionByName(latest)
        new_ver = ver + 1
        out = os.path.join(self.table_dir, f"v{new_ver}")
        merged.write.mode("overwrite").parquet(out)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(f"{batch_id},{new_ver}")
        os.replace(tmp, self._pointer)  # atomic publish
        self._gc_versions(new_ver)

    def _gc_versions(self, current_ver: int) -> None:
        """Delete version directories older than the newest
        ``retain_versions`` — runs AFTER the pointer publish, so the
        pointer never references a deleted version; a crash mid-GC just
        leaves extra versions for the next batch's pass to finish.
        Versions above the pointer (an orphan from a crash between
        write and publish) are left alone — the next batch overwrites
        them."""
        import re
        import shutil

        floor = current_ver - self.retain_versions + 1
        if floor <= 0:
            return
        for name in os.listdir(self.table_dir):
            m = re.fullmatch(r"v(\d+)", name)
            if m and int(m.group(1)) < floor:
                shutil.rmtree(
                    os.path.join(self.table_dir, name), ignore_errors=True
                )

    def write_stream(self, result: DataFrame, checkpoint_dir: str):
        """Attach the sink to a streaming result; availableNow trigger so
        tests (and backfills) process everything then stop."""
        return (
            result.writeStream.foreachBatch(self.upsert_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )


def kafka_message_frame(
    df: DataFrame, key_cols: list[str], value_cols: list[str] | None = None
) -> DataFrame:
    """Shape a result for a Kafka sink: (key, value) string columns — key
    = concat of key cols, value = JSON of the payload. Works identically
    on batch and streaming frames; the actual broker write is
    ``kafka_sink_writer``."""
    payload = value_cols or [c for c in df.columns]
    return df.select(
        F.concat_ws("|", *[F.col(k).cast("string") for k in key_cols]).alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in payload])).alias("value"),
    )


def kafka_sink_writer(
    result: DataFrame,
    topic: str,
    bootstrap_servers: str,
    checkpoint_dir: str,
):
    """Configured (NOT started) Kafka writeStream. The kafka connector jar
    is not present in this container, so callers ``.start()`` only in an
    environment that ships ``spark-sql-kafka``; tests validate the message
    framing via ``kafka_message_frame`` and this writer's options."""
    return (
        result.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
