from lazy_frame_spark.sources.csv import open_csv
from lazy_frame_spark.sources.registry import TABLE_NAMES, load_tables, register_views

__all__ = ["open_csv", "load_tables", "register_views", "TABLE_NAMES"]
