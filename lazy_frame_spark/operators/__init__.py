from lazy_frame_spark.operators.joins import asof_join, broadcast_dim_join, range_join
from lazy_frame_spark.operators.sampling import deterministic_sample, sample, stratified_sample
from lazy_frame_spark.operators.sorts import top_k

__all__ = [
    "asof_join",
    "broadcast_dim_join",
    "range_join",
    "top_k",
    "sample",
    "stratified_sample",
    "deterministic_sample",
]
