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


def scale_warnings(df: DataFrame) -> list[str]:
    """Audit a query's physical plan for the hazards that stay invisible
    at test scale and dominate at 100 TB. Returns human-readable
    warnings (empty = no known hazard). The same checks the repo's plan
    tests assert query-by-query, packaged for ad-hoc use::

        for w in scale_warnings(q): print("WARN:", w)

    Checks: cartesian products, nested-loop joins, row-at-a-time Python
    UDFs (BatchEvalPython — Arrow paths show as ArrowEvalPython /
    MapInPandas and are fine), single-partition windows (every row in
    one task, AQE cannot split a window partition), and global sorts
    that are not top-k cuts."""
    plan = executed_plan(df)
    warns: list[str] = []
    if "CartesianProduct" in plan:
        warns.append(
            "CartesianProduct: O(n*m) row pairs — add an equi/bucket key "
            "or broadcast a provably bounded side"
        )
    if "BroadcastNestedLoopJoin" in plan:
        warns.append(
            "BroadcastNestedLoopJoin: every build-side row compared to "
            "every stream row — acceptable only for provably tiny build "
            "sides (1-row aggregates, literal band tables)"
        )
    if "BatchEvalPython" in plan:
        warns.append(
            "BatchEvalPython: row-at-a-time Python UDF in the plan — "
            "rewrite as built-in expressions or an Arrow pandas_udf "
            "(10-100x)"
        )
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        # partitioned windows list partition columns before the first
        # ASC/DESC ordering term; an ordering-only spec means ONE task
        # holds every row
        first = spec.split(",")[0].strip()
        if " ASC" in first or " DESC" in first or first.startswith("_w"):
            warns.append(
                "single-partition window (no PARTITION BY): every row "
                "flows through one task — add a partition key or use a "
                "distributed formulation (rowid.with_prefix_sum, "
                "operators.sessions time_buckets)"
            )
            break
    warns.extend(_global_sort_warnings(plan))
    return warns


def _tree_indent(line: str) -> int:
    """Depth of a node line in Spark's plan toString tree art (leading
    spaces / ':' rails / '+-' connectors; the '*(n)' codegen prefix is
    node text, not art)."""
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def _global_sort_warnings(plan: str) -> list[str]:
    """Warn on a GLOBAL sort (``Sort [...], true`` — a full range
    shuffle) only when the sort's DIRECT input chain contains no final
    aggregate: a sort fed by a HashAggregate/SortAggregate is bounded
    by group cardinality, the TPC-H "ORDER BY the aggregated result"
    shape (Q11/Q20), and warning on it was a measured false positive
    (round-5 follow-up). A sort over raw rows still warns.

    Scoping (round-8 ADVICE): the suppression stops descending at the
    first join/union/generate below the sort — an aggregate buried
    under a row-multiplying node does NOT bound the sort's input, and
    a TakeOrderedAndProject elsewhere in the plan says nothing about a
    different, unbounded global sort (the old whole-plan containment
    checks suppressed both)."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if not re.search(r"Sort \[[^\]]*\], true", ln):
            continue
        d = _tree_indent(ln)
        agg_bounds = False
        for nxt in lines[i + 1:]:
            if _tree_indent(nxt) <= d:
                break  # left the sort's subtree
            if re.search(
                r"(HashAggregate|SortAggregate|ObjectHashAggregate"
                r"|TakeOrderedAndProject|GlobalLimit|CollectLimit)", nxt
            ):
                # aggregates bound the input by group cardinality;
                # limits/top-k bound it by the literal row cut — a sort
                # over either is sorting a provably small frame
                agg_bounds = True
                break
            if re.search(
                r"(Join|Union|CartesianProduct|Generate|Expand)", nxt
            ):
                break  # row realignment below: the agg bound is void
        if not agg_bounds:
            return [
                "global Sort without a top-k cut: full-data range "
                "shuffle + sort — use top_k() for leaderboards, or drop "
                "the ordering until the final (small) result"
            ]
    return []


#: Registry queries whose BroadcastNestedLoopJoin is justified: the
#: build side is bounded BY CONSTRUCTION (1-row aggregates, literal
#: band/anchor tables, a deliberate cross-join demo). Shared between
#: the registry-wide plan-sweep test and tools/check_oracle.py's
#: per-query audit so the two can't drift; a newcomer BNLJ outside
#: this set is a 100 TB regression even with correct results.
BNLJ_BOUNDED_BUILD = {
    "search_bm25_topk", "search_tfidf_topk",   # 1-row corpus stats
    "lm_perplexity",                            # 1-row vocabulary size
    "graph_pagerank",                           # 1-row dangling mass
    "agg_approx_percentile_rank",               # 1-row totals
    "agg_equi_depth_histogram",                 # 1-row row total
    "sample_bernoulli",                         # 1-row expected-count
    "sketch_kll_quantiles",                     # 1-row merged sketch
    "join_q22_dormant_customers",               # 1-row scalar AVG
    # partsupp derivation: 1-row supplier count x 4-row quarter frame,
    # both broadcast (parity._partsupp); Q11 adds a 1-row threshold
    "join_q2_min_cost_supplier",
    "join_q11_important_stock",
    "join_q20_excess_stock",
    "join_range_bands", "join_interval_overlap",  # literal band tables
    "join_salted",                              # literal salt range
    "ann_hard_negatives",                       # bounded anchor batch
    # corpus mixing: the 1-row scarcity scalar s = min(c/w) crossJoins
    # onto the k-row rate table before the broadcast-hash rate join —
    # both build sides are 1-row aggregates by construction
    "mix_temperature_uniform",
    "mix_target_proportions",
    "mix_high_cardinality",
    "pipeline_mix_curate",
    "ann_pq_trained_recall",   # 20-query panel x corpus, panel broadcast
    "ann_ivfpq_trained_recall",  # same panel shape, exact-truth crossJoin
    "join_cross",                               # deliberate cross join
    "ann_pairs_top15",   # all-pairs verification harness (past window)
}


#: Queries whose ordering-only window is BOUNDED by construction (a
#: top-k limit cuts the input to k rows before the single-task window
#: ranks them) — the "single-partition window" warning is a false
#: positive there; everything it would flow through one task is k rows.
SINGLE_TASK_WINDOW_BOUNDED = {
    "text_vocabulary",     # TakeOrderedAndProject(50) feeds the rank window
    "vocab_merge_candidates",  # same shape: top-k merge pairs then rank
}


#: Queries whose final global ORDER BY runs over a provably small
#: aggregated/HAVING-filtered result (TPC-H mandates the output order);
#: the "global Sort without a top-k cut" warning is advisory noise
#: there — the sort input is grain-bounded, not table-sized.
SORTED_SMALL_RESULT = {
    "join_q11_important_stock",  # parts above the value threshold
    "join_q20_excess_stock",     # suppliers with excess stock
}


#: Registry prefixes excluded from plan audits entirely: side-effecting
#: sinks/streams (executing their plan IS the side effect),
#: positional-cache lf_ queries, and multimodal fan-outs. ONE constant
#: shared by tools/check_oracle.py and the registry-wide sweep test so
#: the two audit scopes cannot drift. ingest_* queries STAY in the
#: sweep: their returned DataFrame is a plain scan over the ingested
#: table (the side effect happened while building it), and auditing
#: that plan costs nothing — exempting them would let a future ingest
#: query ship a cartesian unnoticed.
AUDIT_SKIP_PREFIXES = ("stream_", "sink_", "multimodal_", "lf_")
