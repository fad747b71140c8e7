from lazy_frame_spark.plans.parallel import ensure_min_partitions, fan_out
from lazy_frame_spark.plans.audit import (
    BNLJ_BOUNDED_BUILD,
    executed_plan,
    has_broadcast_hash_join,
    has_pushed_filters,
    has_take_ordered,
    read_schema_columns,
    scale_warnings,
    whole_stage_codegen_spans,
)

__all__ = [
    "BNLJ_BOUNDED_BUILD",
    "ensure_min_partitions",
    "fan_out",
    "executed_plan",
    "has_pushed_filters",
    "has_broadcast_hash_join",
    "has_take_ordered",
    "read_schema_columns",
    "scale_warnings",
    "whole_stage_codegen_spans",
]
