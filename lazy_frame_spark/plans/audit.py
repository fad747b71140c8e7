"""Physical-plan audit helpers — the engine's "is this the plan I'd want
at 100 TB" checks, kept as library code so tests can assert on them and
regressions in pushdown/broadcast/pruning fail CI instead of shipping.

What the reference hand-rolled (predicate-over-raw-bytes scan, selective
field parse — SURVEY.md §4.1), Catalyst gives us declaratively — but only
if the plan stays pushdown-friendly. These helpers make that a tested
invariant rather than a hope:

- ``has_pushed_filters``: the filter reached the data source
  (``PushedFilters: [...]`` on the scan node);
- ``read_schema_columns``: column pruning reached the scan (a 2-column
  projection must not read 11 columns);
- ``has_broadcast_hash_join``: the small side actually broadcast;
- ``has_take_ordered``: top-k planned as TakeOrderedAndProject, not a
  global sort;
- ``whole_stage_codegen_spans``: the hot expressions stayed inside
  codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filters(df: DataFrame, *needles: str) -> bool:
    """True if the scan advertises pushed filters (optionally containing
    every given needle, e.g. a column name)."""
    plan = executed_plan(df)
    # plan toString elides long filter lists as "[A, B, C..." with NO
    # closing bracket — accept either terminator
    m = re.search(r"PushedFilters: \[([^\r\n]*?)(?:\]|\.\.\.)", plan)
    if not m or not m.group(1).strip():
        return False
    return all(n in m.group(1) for n in needles)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in the scan's ReadSchema (what actually gets read)."""
    plan = executed_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()]


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in executed_plan(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans in the executed plan
    (rendered as ``*(n)`` node prefixes in the compact plan string)."""
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))
