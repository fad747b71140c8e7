"""End-to-end training-data curation demo — every stage is an operator
from this repo, wired the way a production corpus pipeline would run:

  generate (Python data source) → quality gate → paragraph dedup →
  near-dup drop (MinHash LSH + connected components) → benchmark
  decontamination (Bloom prefilter) → deterministic splits →
  sequence packing → partitioned parquet sink + HLL sketch table →
  versioned corpus loop (commit v1 → next epoch dedups against the
  snapshot → append novel as v2 → O(increment) consume → Z-order
  cluster → time-travel back)

Prints one JSON line of per-stage row counts. Deterministic end to end
(seeded generators, md5-derived hashes), so re-runs reproduce byte-for-
byte splits and pack assignments.

Usage: python tools/pipeline_demo.py [sf_dir]  (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from lazy_frame_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("pipeline-demo")
    counts: dict[str, int] = {}

    # 1. ingest the corpus (the Python data source connector covers the
    #    "real connector" story in its own parity query/tests; the demo
    #    curates the standard documents table)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    counts["ingested"] = docs.count()

    # 1b. canonical-URL dedup — ALWAYS the first dedup pass (cheapest:
    #     map + one agg, no content hashing). The synthetic corpus has
    #     no URL column, so derive a messy fetch URL per doc the way
    #     the crawler metadata would carry it (several docs share a
    #     canonical target through www/port/tracking-param noise).
    from lazy_frame_spark.operators.urls import dedup_canonical_url

    k = F.col("doc_id")
    fetch_url = (
        F.when(k % 3 == 0, F.concat(
            F.lit("HTTP://WWW.host"), (F.floor(k / 3) % 40).cast("bigint").cast("string"),
            F.lit(".example:80/doc?utm_source=crawl&id=1#top")))
        .when(k % 3 == 1, F.concat(
            F.lit("http://host"), (F.floor(k / 3) % 40).cast("bigint").cast("string"),
            F.lit(".example/doc?id=1")))
        .otherwise(F.concat(
            F.lit("https://host"), (F.floor(k / 3) % 40).cast("bigint").cast("string"),
            F.lit(".example/doc?id=1")))
    )
    winners = dedup_canonical_url(
        docs.withColumn("url", fetch_url), url_col="url", id_col="doc_id"
    )
    docs = docs.join(winners.select(F.col("keep_id").alias("doc_id")), "doc_id")
    counts["after_url_dedup"] = docs.count()

    # 1c. HTML -> main text (round 7): raw fetches arrive as markup, so
    #     boilerplate extraction runs BEFORE any quality/dedup stage
    #     sees the text. The demo wraps each doc the way a crawler
    #     would deliver it (nav/footer/script chrome) and the
    #     link-density heuristic must hand back the article body.
    from lazy_frame_spark.operators.text import with_html_text

    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit('<html><head><script>track();</script></head><body>'
                  '<nav><a href="/">Home</a> <a href="/t">Tags</a></nav>'
                  '<div>'),
            F.col("text"),
            F.lit('</div><footer><a href="/p">Privacy</a></footer>'
                  '</body></html>'),
        ).alias("html"),
    )
    docs = with_html_text(pages, "html", "text").select("doc_id", "text") \
        .filter(F.length("text") > 0)
    counts["after_html_extract"] = docs.count()

    # 2. quality gate (composite C4/Gopher keep/drop) AND the trained-
    #    classifier score — both one map-only pass; a doc must pass both
    from lazy_frame_spark.operators.text import model_quality_score, quality_gate

    gated = quality_gate(docs)
    scored = model_quality_score(docs, threshold=0.4)
    kept = (
        docs.join(gated.filter(F.col("keep")).select("doc_id"), "doc_id")
        .join(scored.filter(F.col("keep")).select("doc_id"), "doc_id")
    )
    counts["quality_kept"] = kept.count()

    # 2b. distill the rule gate into a TRAINED linear model (round 11):
    #     the composite gate labels the corpus, train_logreg fits a
    #     classifier on the engine's own quality features (one Catalyst
    #     aggregate per GD iteration, weights as plan literals), and
    #     the model's sigmoid score becomes the soft-filter surface a
    #     production pipeline thresholds/tunes — the fastText-stage
    #     pattern with the label bootstrap the published pipelines use
    from lazy_frame_spark.operators.classifier import logreg_score, train_logreg
    from lazy_frame_spark.operators.text import quality_features

    feat_cols = ["alpha_bp", "punct_bp", "stopword_bp",
                 "mean_token_len_x100", "n_tokens"]
    labeled = quality_features(docs).join(
        gated.select("doc_id", F.col("keep").cast("int").alias("y")),
        "doc_id",
    )
    model = train_logreg(labeled, feat_cols, "y", iters=40, lr=2.0)
    counts["distilled_loss_x1000"] = int(model["loss"] * 1000)
    counts["distilled_kept"] = (
        logreg_score(labeled, model).filter("keep").count()
    )

    # 3. paragraph-grain boilerplate removal (first occurrence wins)
    from lazy_frame_spark.operators.dedup import paragraph_dedup

    para = paragraph_dedup(
        kept.withColumn("text", F.replace(F.col("text"), F.lit(" the "), F.lit("\n\n")))
    ).filter(F.length("text") > 0)
    counts["after_paragraph_dedup"] = para.count()

    # 4. whole-doc near-dup drop: MinHash LSH pairs → components → min-id
    from lazy_frame_spark.operators.dedup import (
        drop_near_duplicates,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(para, threshold=0.9, max_token_df=200)
    # pin the expensive LSH + connected-components result: every later
    # stage (and each count) reuses it instead of recomputing lineage
    deduped = drop_near_duplicates(para, pairs).cache()
    counts["after_near_dup_drop"] = deduped.count()

    # 5. benchmark decontamination: Bloom prefilter + exact verify
    from lazy_frame_spark.operators.decontam import bloom_contamination

    eval_set = spark.createDataFrame(
        [(i, "alpha bridge copper delta ember forge granite harbor") for i in range(4)],
        "doc_id long, text string",
    )
    contam = bloom_contamination(deduped, eval_set, n=5, min_overlap=2)
    clean = deduped.join(contam.select("doc_id"), "doc_id", "left_anti")
    counts["after_decontam"] = clean.count()

    # 6. deterministic splits (stable under repartitioning and growth)
    from lazy_frame_spark.operators.splits import assign_split

    split = assign_split(clean, id_cols=["doc_id"], seed=42).cache()
    counts["train"] = split.filter(F.col("split") == "train").count()

    # 7. sequence packing: token-budget bins over a distributed cumsum
    from lazy_frame_spark.operators.packing import pack_sequences

    packed = pack_sequences(
        split.filter(F.col("split") == "train"), budget_tokens=256
    )
    counts["packed_bins"] = packed.select("bin_id").distinct().count()

    # 8. publish: partitioned sink + HLL sketch table for incremental
    #    distinct tracking
    from lazy_frame_spark.operators.sketches import hll_partials
    from lazy_frame_spark.sources.parquet import write_parquet

    out = tempfile.mkdtemp() + "/corpus"
    write_parquet(split, out, partition_by=["split"])
    sketches = hll_partials(split, ["split"], "doc_id")
    counts["sketch_rows"] = sketches.count()
    counts["published"] = spark.read.parquet(out).count()

    # 9. serving-side maintenance (round 4): an incremental aggregate
    #    view over the published table, then a scoped GDPR delete — the
    #    view folds the post-delete state without rescanning history
    from lazy_frame_spark.operators.incremental import (
        agg_view_build,
        agg_view_read,
    )
    from lazy_frame_spark.sources.parquet import delete_keys

    sized = spark.read.parquet(out).withColumn("n_chars", F.length("text"))
    view = agg_view_read(
        agg_view_build(sized, ["split"], sum_cols=["n_chars"]),
        avg_of=["n_chars"],
    )
    counts["view_grains"] = view.count()
    erase = split.select("doc_id", "split").orderBy("doc_id").limit(3)
    erased_rows = sized.join(erase, ["doc_id", "split"], "left_semi") \
        .select("split", "n_chars").collect()
    # the STORED view must be materialized pre-delete (in production it
    # lives in its own parquet table): a lazy plan over the corpus
    # would break when delete_keys swaps the underlying files
    from lazy_frame_spark.operators.incremental import (
        agg_view_repair,
        agg_view_retract,
    )

    stored_df = agg_view_build(sized, ["split"], sum_cols=["n_chars"])
    stored = spark.createDataFrame(stored_df.collect(), stored_df.schema)
    after = delete_keys(spark, out, erase, ["doc_id", "split"],
                        scope_to_partitions=True)
    counts["after_erasure"] = after.count()

    # 10. view maintenance after erasure (round 5): retract the deleted
    #     rows' partials from the stored view and repair any grain whose
    #     extreme was tied — the view now serves the post-erasure truth
    #     without a rebuild (consistency asserted against a fresh build)
    del_batch = spark.createDataFrame(erased_rows, "split string, n_chars int") \
        if erased_rows else sized.limit(0).select("split", "n_chars")
    after_sized = spark.read.parquet(out).withColumn("n_chars", F.length("text"))
    maintained = agg_view_repair(
        agg_view_retract(stored, del_batch, ["split"], sum_cols=["n_chars"]),
        after_sized, ["split"], sum_cols=["n_chars"],
    )
    fresh = agg_view_build(after_sized, ["split"], sum_cols=["n_chars"])
    norm = lambda df: sorted(  # noqa: E731
        (r["split"], r["__n__"], r["sum_n_chars"]) for r in df.collect()
    )
    assert norm(maintained) == norm(fresh), "retracted view diverged from rebuild"
    counts["view_retract_consistent"] = 1

    # 11. embedding side-car: int8-quantized ANN store (4-5x smaller)
    #     published next to the corpus; one ADC-cheap similarity query
    from lazy_frame_spark.operators.similarity import (
        cosine_topk_int8,
        quantize_int8,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qstore = tempfile.mkdtemp() + "/emb_int8"
    quantize_int8(emb).select("vec_id", "q_codes", "q_scale") \
        .write.parquet(qstore)
    qv = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    top = cosine_topk_int8(spark.read.parquet(qstore), qv, k=5,
                           pre_quantized=True)
    counts["ann_topk_from_quantized_store"] = top.count()

    # 12. tokenizer training (round 8): BPE merges trained on the train
    #     split — ONE corpus pass builds the (word, count) vocabulary,
    #     the incremental Sennrich loop ranks the merges — then applied
    #     back with the worker-lifetime word cache
    from lazy_frame_spark.operators.text import bpe_apply, bpe_train

    train_docs = split.filter(F.col("split") == "train")
    merges = bpe_train(train_docs, n_merges=30, min_count=2)
    toks = bpe_apply(train_docs, merges)
    counts["bpe_merges"] = len(merges)
    counts["bpe_tokens_train"] = int(
        toks.select(F.sum(F.size("bpe_tokens"))).collect()[0][0] or 0)

    # 13. temperature remix (round 8): count^alpha reweighting of the
    #     published corpus — the multilingual-sampling standard; at
    #     alpha=0.5 the small domains upsample RELATIVE to their natural
    #     share (achieved downsample-only, one scan, map-side filter)
    from lazy_frame_spark.operators.mixing import mix_temperature

    remixed = mix_temperature(
        spark.read.parquet(out), "split", 0.5, id_cols=["doc_id"], seed=9)
    counts["after_temperature_remix"] = remixed.count()

    # 14. versioned corpus loop (round 10): commit the curated corpus as
    #     v1, run a SECOND crawl epoch through the same gates, dedup it
    #     against the v1 snapshot (content keys), append only the novel
    #     survivors as v2 — then prove the increment is consumable as a
    #     pure manifest file-diff, cluster the table for data skipping,
    #     and time-travel back to v1.
    from lazy_frame_spark.operators.dedup import dedup_against
    from lazy_frame_spark.sources.versioned import (
        appended_since,
        cluster_versioned,
        history,
        read_versioned,
        write_versioned,
        append_versioned,
    )

    corpus_tbl = tempfile.mkdtemp() + "/corpus_versioned"
    epoch1 = split.filter(F.col("split") == "train").select("doc_id", "text")
    write_versioned(epoch1, corpus_tbl)                          # v1
    # epoch 2: the held-out docs arrive "next crawl"; half are exact
    # re-fetches of epoch 1 (must dedup against the snapshot)
    refetch = epoch1.orderBy("doc_id").limit(20)  # deterministic
    novel_src = split.filter(F.col("split") != "train").select("doc_id", "text")
    epoch2 = novel_src.unionByName(refetch)
    novel = dedup_against(epoch2, read_versioned(spark, corpus_tbl, 1),
                          ["text"])
    append_versioned(novel.select("doc_id", "text"), corpus_tbl)  # v2
    counts["versioned_v2_rows"] = read_versioned(spark, corpus_tbl).count()
    counts["versioned_increment"] = appended_since(
        spark, corpus_tbl, 1).count()
    cluster_versioned(spark, corpus_tbl, ["doc_id"])              # v3
    counts["versioned_v1_still"] = read_versioned(
        spark, corpus_tbl, 1).count()
    counts["versioned_commits"] = len(history(corpus_tbl))

    # 15. table-format maintenance (round 11 continuation): the served
    #     corpus evolves a `lang` column IN PLACE (no body rewrite), a
    #     re-crawl batch UPSERTS by doc_id (one copy-on-write merge
    #     commit; discovery scan bounds-pre-cut by the batch's keys), a
    #     GDPR request erases docs as a merge-on-read DELETION VECTOR
    #     (O(matched rows), zero rewrites) which purge later
    #     materializes, and a bloom-backed point lookup then finds one
    #     document while scanning only the files that can hold it.
    from lazy_frame_spark.sources.versioned import (
        build_blooms,
        delete_versioned,
        merge_versioned,
        purge_dvs,
        skipping_summary,
    )

    epoch3 = (novel.select("doc_id", "text").orderBy("doc_id").limit(10)
              .withColumn("doc_id", F.col("doc_id") + 1_000_000)
              .withColumn("lang", F.lit("en")))
    append_versioned(epoch3, corpus_tbl, merge_schema=True)       # v4
    n_v4 = read_versioned(spark, corpus_tbl).count()
    counts["versioned_evolved_cols"] = len(
        read_versioned(spark, corpus_tbl).columns)

    snap = read_versioned(spark, corpus_tbl)
    # materialized source batch (pre-evolution rows carry lang=NULL, so
    # the explicit schema is required — all-None can't re-infer)
    recrawl = spark.createDataFrame(
        snap.orderBy("doc_id").limit(5).collect(), snap.schema
    ).withColumn("text", F.concat(F.col("text"), F.lit(" [recrawl]")))
    _, mstats = merge_versioned(spark, corpus_tbl, recrawl, "doc_id")  # v5
    counts["upsert_files_rewritten"] = mstats["files_rewritten"]
    assert read_versioned(spark, corpus_tbl).count() == n_v4  # pure update

    gdpr_ids = [r["doc_id"] for r in
                read_versioned(spark, corpus_tbl)
                .orderBy("doc_id").limit(2).collect()]
    _, dstats = delete_versioned(                                 # v6
        spark, corpus_tbl,
        f"doc_id IN ({','.join(str(i) for i in gdpr_ids)})",
        strategy="merge-on-read",
    )
    assert dstats["files_rewritten"] == 0  # tombstones only
    counts["gdpr_tombstoned_rows"] = dstats["rows_deleted"]
    purge_dvs(spark, corpus_tbl)                                  # v7
    counts["after_gdpr"] = read_versioned(spark, corpus_tbl).count()
    assert counts["after_gdpr"] == n_v4 - len(gdpr_ids)

    build_blooms(spark, corpus_tbl, ["doc_id"])
    lookup_id = int(epoch3.select(F.max("doc_id")).collect()[0][0])
    s = skipping_summary(corpus_tbl, [("doc_id", "=", lookup_id)])
    counts["point_lookup_files"] = s["kept_files"]
    counts["point_lookup_rows"] = read_versioned(
        spark, corpus_tbl, where=[("doc_id", "=", lookup_id)]).count()

    deduped.unpersist()
    split.unpersist()

    print(json.dumps(counts))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
