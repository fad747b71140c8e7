from lazy_frame_spark.sources.csv import open_csv
from lazy_frame_spark.sources.ingest import ingest_gzip
from lazy_frame_spark.sources.registry import TABLE_NAMES, load_tables, register_views
from lazy_frame_spark.sources.versioned import (
    append_versioned,
    appended_since,
    clone_versioned,
    cluster_versioned,
    compact_versioned,
    delete_versioned,
    drop_column,
    evolve_schema,
    history,
    read_versioned,
    rename_column,
    restore_versioned,
    table_detail,
    upgrade_manifest_lists,
    vacuum_versioned,
    versioned_stream_writer,
    write_versioned,
)

__all__ = [
    "open_csv", "ingest_gzip", "load_tables", "register_views",
    "TABLE_NAMES",
    "write_versioned", "append_versioned", "delete_versioned",
    "drop_column", "evolve_schema",
    "restore_versioned", "read_versioned", "rename_column",
    "history", "table_detail", "vacuum_versioned", "upgrade_manifest_lists",
    "compact_versioned", "cluster_versioned", "clone_versioned", "versioned_stream_writer", "appended_since",
]
