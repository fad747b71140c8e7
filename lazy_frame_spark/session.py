"""SparkSession bootstrap tuned for this engine.

Local testing runs ``local[N]``; the same configuration is what we would
ship to a 1000-executor cluster — AQE on (runtime re-planning, skew-join
handling, partition coalescing), UTC session timezone (oracle parity with
DuckDB, whose timestamps are UTC-naive), Arrow-based Python interop for the
few Pandas-UDF operators, and shuffle partitions sized to the local core
count (on a real cluster AQE coalescing makes the static number far less
critical).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: application ids this process has already shipped the package to
_SHIPPED: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Make ``lazy_frame_spark`` importable on executors regardless of the
    driver's working directory.

    Module-level ``pandas_udf`` / ``mapInPandas`` functions are
    cloudpickled BY REFERENCE (module + qualname), so the worker must be
    able to ``import lazy_frame_spark`` — true in this repo's tests (cwd
    is the repo) but NOT when a harness imports ``__spark_entry__`` via a
    ``sys.path`` entry from elsewhere (observed:
    ``ModuleNotFoundError: lazy_frame_spark`` in the Python worker).
    ``addPyFile`` ships a zip of the package with every task and prepends
    it to the worker's ``sys.path`` — the same mechanism ``spark-submit
    --py-files`` uses on a real cluster."""
    sc = spark.sparkContext
    if sc.applicationId in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"lazy_frame_spark_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED.add(sc.applicationId)


def get_spark(app_name: str = "lazy_frame_spark", cpus: int | None = None) -> SparkSession:
    """Create (or get) a SparkSession with the engine's standard config."""
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # shuffle/spill codec (guide §2.3: zstd trades CPU for ratio —
        # "there is no universal answer, measure both"). Measured on
        # this engine's bench at sf0.1, 32 AND 8 cores (round 16,
        # OPTIMIZATION_r16.md): totals within the session-noise band in
        # both directions — the shuffles here are small enough that
        # codec CPU/ratio is not a lever, so the Spark default stays.
        # Parameterized for clusters, where multi-TB shuffles on
        # network-bound nodes usually favor zstd.
        .config("spark.io.compression.codec",
                os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"))
        .config("spark.sql.warehouse.dir", "/tmp/lazy_frame_spark-warehouse")
        # Columnar-cache compression costs ~3× on cache BUILD (measured:
        # enumerate+persist of sf0.1 lineitem 8.0 s → 2.8 s) and the open →
        # persist → many-positional-queries pattern is cache-build-heavy.
        # Trade memory for build speed; re-enable on memory-tight clusters.
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
    )
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable knobs to an externally created
    session (the verify driver builds its own ``SparkSession``).

    Only touches conf that is safe to set post-startup.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    try:
        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    except Exception:  # pragma: no cover
        pass
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_CPUS))
    except Exception:  # pragma: no cover - conf may be fixed by the driver
        pass
    ship_package(spark)
    return spark
