"""Adaptive parallelism for fold-heavy operators on low-split sources.

A gzip CSV (unsplittable by construction) or a single-row-group parquet
file scans as ONE partition, so every map-side-heavy operator
downstream — shingle explosion, token hashing, per-row regex work —
serializes onto one core no matter how many the session has. At
cluster scale well-formed sources arrive with hundreds of splits and
the problem vanishes.

``ensure_min_partitions`` encodes that asymmetry as a two-condition
*gate*. It inserts a round-robin repartition only when

1. the scan yields materially fewer partitions than the session's
   parallelism (on a well-split source this makes it a provable no-op
   that adds no shuffle), AND
2. the source is big enough that each resulting partition receives
   meaningful work (Catalyst's size estimate, a pure metadata read).
   Without this condition the shuffle overhead exceeds the fan-out win
   on small inputs — measured: SimHash over a 5k-doc single-split file
   got 45% SLOWER when repartitioned unconditionally, because moving
   the text cost more than single-core hashing of it.

The scenario the gate exists for is the big-unsplittable one — a
multi-GB gzip CSV feeding a dedup sweep: condition 1 holds (1 split),
condition 2 holds (GBs per target partition), and the one-pass shuffle
is repaid immediately by the fold work fanning out across every core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: don't bother fanning out unless each target partition would receive
#: at least this much input (Catalyst size estimate)
MIN_BYTES_PER_PARTITION = 8 << 20


def estimated_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate — file-footer metadata
    for scans, propagated estimates elsewhere. No job runs."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def _codec_expansion(df: DataFrame) -> int:
    """Catalyst's size estimate is on-disk bytes; for whole-file
    compression codecs (which are also exactly the unsplittable inputs
    this gate exists for) that understates the decompressed work by the
    compression ratio. A conservative 4× stands in for typical text
    ratios — the gate only needs the right order of magnitude."""
    try:
        files = df.inputFiles()
    except Exception:
        return 1
    if any(f.endswith((".gz", ".bz2", ".zst", ".xz", ".deflate")) for f in files):
        return 4
    return 1


def ensure_min_partitions(
    df: DataFrame,
    target: int | None = None,
    min_bytes_per_partition: int = MIN_BYTES_PER_PARTITION,
) -> DataFrame:
    """Repartition ``df`` to the session's parallelism iff (a) its plan
    yields fewer than half that many partitions AND (b) the estimated
    input gives each target partition at least ``min_bytes_per_partition``
    of work. Streaming frames and anything whose partitioning can't be
    probed pass through untouched."""
    want = _fan_out_target(df, target)
    if want is None:
        return df
    size = estimated_bytes(df)
    if size is None or size * _codec_expansion(df) < want * min_bytes_per_partition:
        return df
    return df.repartition(want)


def _fan_out_target(df: DataFrame, target: int | None) -> int | None:
    """The partition count to fan out to, or None when the frame is
    already well-split (or can't be probed / is streaming). The
    ``df.rdd`` probe converts the whole plan to an RDD lineage on the
    driver — cheap once, not free on deep plans — so the measured count
    is memoized ON the DataFrame object (same plan → same partitioning;
    an id()-keyed global would resurrect stale entries after GC id
    reuse, the object attribute can't)."""
    try:
        if df.isStreaming:
            return None
        spark = df.sparkSession
        want = target or spark.sparkContext.defaultParallelism
        have = getattr(df, "_lfs_num_partitions", None)
        if have is None:
            have = df.rdd.getNumPartitions()
            df._lfs_num_partitions = have
    except Exception:
        return None
    return None if have * 2 > want else want


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Partition-count-only fan-out for *compute-bound* stages (media
    decode, heavy Pandas UDFs): there the per-row work, not the input
    bytes, is the cost, so the byte floor of ``ensure_min_partitions``
    would wrongly veto the repartition — a 5k-row frame of ids feeding
    a per-row image decode wants all cores despite being kilobytes.
    Callers declare the stage expensive by choosing this entry point;
    the gate still no-ops on well-split inputs and streaming frames."""
    want = _fan_out_target(df, target)
    return df if want is None else df.repartition(want)
