from lazy_frame_spark.sources.csv import open_csv
from lazy_frame_spark.sources.ingest import ingest_gzip
from lazy_frame_spark.sources.registry import TABLE_NAMES, load_tables, register_views

__all__ = ["open_csv", "ingest_gzip", "load_tables", "register_views", "TABLE_NAMES"]
