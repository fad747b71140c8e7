"""lazy_frame_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of bwlewis/lazy.frame (reference: R package
``lazy.frame`` v0.0.4, surveyed in SURVEY.md).

The core abstraction is :class:`LazyFrame`, a thin facade over
``pyspark.sql.DataFrame`` implementing the reference's lazy dataframe
algebra — lazy open, positional row selection, column projection,
RHS-typed scalar predicates, which-indices, head/tail, persistent column
metadata, read-only contract — with Spark-native execution (Catalyst
pushdown/pruning, whole-stage codegen) instead of the reference's
newline-index + pthread scan (``src/lazy.frame.c``).

Beyond reference parity, the package provides the relational layer the
reference's users reached by materializing to R (joins, aggregations,
windows, sorts, set ops, sampling) and large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal columns),
all designed for 100 TB-scale execution.
"""

from lazy_frame_spark.frame import LazyFrame
from lazy_frame_spark.session import get_spark
from lazy_frame_spark.rowid import ROW_ID, with_row_ids

__all__ = ["LazyFrame", "get_spark", "with_row_ids", "ROW_ID"]

__version__ = "0.1.0"
