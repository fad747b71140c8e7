"""Generate PLANS.md: the formatted physical plans of representative
queries, annotated with the plan property each one is expected to show.
Re-runnable evidence of the .explain() discipline — regressions in
pushdown/broadcast/top-k shape show up as a diff here (and as failures
in tests/test_plans.py, which asserts the same properties).

Usage: python tools/plan_report.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lazy_frame_spark.session import get_spark  # noqa: E402

SHOWCASE = [
    ("agg_q6_forecast_revenue",
     "TPC-H Q6 — every predicate in PushedFilters, 4-column ReadSchema, "
     "one partial+final HashAggregate pair."),
    ("lf_filter_project",
     "The reference's flagship filter+project — filter pushed to the scan, "
     "projection pruned, whole plan in one codegen span."),
    ("join_q3_revenue",
     "TPC-H Q3 — dims broadcast (BroadcastHashJoin), fact shuffle only on "
     "the join key, TakeOrderedAndProject for the top-k cut."),
    ("join_q19_disjunctive",
     "OR-arm predicates spanning both sides — stays a BroadcastHashJoin "
     "with the disjunction as residual, never a nested loop."),
    ("join_q18_large_orders",
     "HAVING semi-reduction — lineitem aggregates to order grain BEFORE "
     "any join touches it."),
    ("dedup_minhash_pairs",
     "MinHash LSH — band equi-join on (band, bucket), signatures carried "
     "through; no all-pairs comparison anywhere."),
    ("sketch_hll_rollup",
     "Mergeable sketches — two partial+final aggregate pairs (build, "
     "merge), no collect, no sort."),
    ("ts_resample_ffill",
     "Grid resample — key-partitioned window fill; the grid explode is a "
     "map-side Generate with no shuffle of its own."),
    ("search_bm25_topk",
     "Ranked retrieval — query-term isin filter BELOW the explode "
     "(pruned token stream), broadcast df/idf, TakeOrderedAndProject."),
    ("embedding_outliers",
     "Centroid distances — BroadcastHashJoin of per-label arrays; the "
     "distance is one codegen zip_with/aggregate expression."),
    ("join_q2_min_cost_supplier",
     "TPC-H Q2 over the derived partsupp — partsupp is a map-side 4x "
     "fan-out of part (1- and 4-row broadcast sides), correlated MIN "
     "decorrelated to one per-part aggregate, TakeOrderedAndProject."),
    ("ts_sessionize_batch",
     "Batch sessionization — one per-key window pair (lag flag + "
     "running last), then a per-session partial+final aggregate; the "
     "skew-safe (key, time-bucket) variant is equivalence-pinned in "
     "tests."),
    ("sketch_cms_freq",
     "Count-min sketch — explode to depth hash cells, partial-agg "
     "count per cell (bounded at depth x width rows), broadcast cell "
     "join for the point estimates; zero Python."),
    ("dq_profile_orders",
     "Exact column profile — NO Expand: null/min/max in one scan, each "
     "exact distinct a narrow two-phase aggregate, broadcast-joined "
     "back on the column name."),
    ("dedup_url_canonical",
     "Canonical-URL dedup — staged projections keep each regex at ONE "
     "evaluation per row (no predicate re-inlining at the scan), then "
     "a single hash-aggregate exchange; no joins."),
    ("ann_pq_adc_topk",
     "PQ asymmetric-distance search — Arrow-batched encode, then the "
     "distance is 8 literal-array loads + adds per row feeding "
     "TakeOrderedAndProject; no geometry in the scan."),
    ("view_retract_erasure",
     "Incremental view retraction — the delete batch aggregates once, "
     "broadcast-joins onto the view (view-sized), and repair's rescan "
     "is semi-join-pruned to the stale grains."),
    ("dedup_semantic",
     "SemDeDup — cell equi-join bounds the pairwise cosine (never a "
     "nested loop); per-vector norms hoisted out of the quadratic, so "
     "each pair pays one dot-product fold; one left_anti returns "
     "survivors."),
    ("view_versioned_increment",
     "Versioned-table incremental consume — the scan addresses ONLY "
     "the appended epochs' files (manifest file-diff; no anti-join, no "
     "old-data I/O), then one partial+final aggregate."),
    ("sink_cluster_increment",
     "Incremental re-clustering — the graded read addresses the carried "
     "body files by reference plus the re-laid-out tail; the increment "
     "itself was one quantile aggregate + one range exchange over the "
     "tail only."),
    ("join_fuzzy_editdist",
     "Exact edit-distance join — prefix-gram equi-join (rare-first "
     "order keeps the hot 'Customer#' grams out), length-band "
     "equi-join for the short bucket, banded levenshtein verify; no "
     "cartesian product anywhere."),
    ("view_versioned_skipping",
     "Manifest-stats data skipping — the scan's file index holds ONLY "
     "the files whose commit-time column bounds overlap the predicate "
     "(pruned driver-side, before any footer I/O); the same predicate "
     "re-applies as the residual Filter; tests pin inputFiles() == the "
     "skipping_summary survivor set."),
    ("view_incremental_join",
     "Incremental join view — each update term is an equi-join of a "
     "delta against a bounds-pruned snapshot read (the body's files "
     "skipped via the delta's key range); no full-table rejoin "
     "anywhere in the maintenance path."),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-report")
    from lazy_frame_spark.parity import REGISTRY

    out = [
        "# PLANS — formatted physical plans of representative queries",
        "",
        f"Generated by `tools/plan_report.py` at `{sf_dir}` (plan shapes are",
        "scale-independent; only statistics change with sf). The property",
        "stated above each plan is asserted by `tests/test_plans.py`.",
        "",
    ]
    for name, note in SHOWCASE:
        import contextlib
        import io

        df = REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        out += [f"## {name}", "", f"*{note}*", "", "```", plan.rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
