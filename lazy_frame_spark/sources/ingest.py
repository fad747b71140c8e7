"""One-call ingest of unsplittable compressed text into a splittable
table — the SCALE.md guidance as code.

A ``.gz`` CSV/JSONL cannot be split: Spark reads the WHOLE file in one
task, so a 100 GB gzip stalls a 1000-executor cluster exactly like a
1-executor one. The only cure is to pay that single-threaded read ONCE
and land the data as a parallel-scannable table. ``ingest_gzip`` does
precisely that: open (the engine's CSV reader handles gz/sep/header/
skip), reshard to a target in-file parallelism, write zstd parquet
through the journaled sink directory, and return the re-read frame —
every later query scans N splittable row-grouped files instead of one
gzip stream.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def ingest_gzip(
    spark: SparkSession,
    path: str,
    out_path: str,
    format: str | None = None,
    target_files: int | None = None,
    compression: str = "zstd",
    **options: Any,
) -> DataFrame:
    """Decompress-and-reshard: read the unsplittable source once, write
    it as ``target_files`` zstd parquet files (default: the session's
    default parallelism, so one core per file on the next scan), return
    the frame re-read from the new table. ``format`` infers from the
    inner extension (``data.csv.gz`` -> csv, ``data.jsonl.gz`` ->
    json); ``options`` pass through to the reader (sep/header/skip...).

    Scale note: the single-task read is inherent to gzip — this helper
    exists so it happens exactly once per dataset instead of once per
    query. For recurring ingest of many .gz files, the per-FILE
    parallelism of the one-task reads is already the fan-out; the
    reshard then only evens out file sizes.
    """
    inner = path[:-3] if path.endswith(".gz") else path
    fmt = format
    if fmt is None:
        ext = inner.rsplit(".", 1)[-1].lower()
        fmt = {"csv": "csv", "tsv": "csv", "json": "json", "jsonl": "json"}.get(ext)
        if fmt is None:
            raise ValueError(
                f"cannot infer format from {path!r}; pass format='csv'|'json'"
            )
        if ext == "tsv":
            options.setdefault("sep", "\t")
    if fmt == "csv":
        from lazy_frame_spark.sources.csv import open_csv

        df = open_csv(spark, path, **options)
    elif fmt == "json":
        df = spark.read.options(
            **{k: str(v) for k, v in options.items()}
        ).json(path)
    else:
        raise ValueError(f"unsupported ingest format {fmt!r}")
    n = target_files or spark.sparkContext.defaultParallelism
    (
        df.repartition(n)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(out_path)
    )
    return spark.read.parquet(out_path)
