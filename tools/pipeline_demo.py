"""End-to-end training-data curation demo — every stage is an operator
from this repo, wired the way a production corpus pipeline would run:

  generate (Python data source) → quality gate → paragraph dedup →
  near-dup drop (MinHash LSH + connected components) → benchmark
  decontamination (Bloom prefilter) → deterministic splits →
  sequence packing → partitioned parquet sink + HLL sketch table

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

    # 2. quality gate: composite C4/Gopher keep/drop in one map-only pass
    from lazy_frame_spark.operators.text import quality_gate

    gated = quality_gate(docs)
    kept = docs.join(gated.filter(F.col("keep")).select("doc_id"), "doc_id")
    counts["quality_kept"] = kept.count()

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
    after = delete_keys(spark, out, erase, ["doc_id", "split"],
                        scope_to_partitions=True)
    counts["after_erasure"] = after.count()
    deduped.unpersist()
    split.unpersist()

    print(json.dumps(counts))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
