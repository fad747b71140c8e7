"""Python Data Source (sources/pydatasource.py): partition planning,
filter pushdown narrowing, and deterministic generation."""

import pyspark.sql.functions as F

from lazy_frame_spark.sources.pydatasource import (
    DocGenReader,
    register_docgen,
)


def test_partitions_split_range_evenly():
    r = DocGenReader({"n_docs": "10", "partitions": "3"})
    parts = r.partitions()
    assert [(p.start, p.end) for p in parts] == [(0, 4), (4, 7), (7, 10)]


def test_push_filters_narrow_range_and_return_rest():
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    r = DocGenReader({"n_docs": "1000"})
    rest = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 100),
                LessThan(("doc_id",), 300),
                EqualTo(("lang",), "en"),  # not absorbable
            ]
        )
    )
    assert (r.lo, r.hi) == (100, 300)
    assert len(rest) == 1 and isinstance(rest[0], EqualTo)


def test_push_filters_empty_range_yields_single_empty_partition():
    from pyspark.sql.datasource import GreaterThan, LessThan

    r = DocGenReader({"n_docs": "1000"})
    list(r.pushFilters([GreaterThan(("doc_id",), 500), LessThan(("doc_id",), 100)]))
    parts = r.partitions()
    assert sum(p.end - p.start for p in parts) == 0


def test_end_to_end_matches_direct_generation(spark):
    register_docgen(spark)
    df = (
        spark.read.format("lfs_docgen")
        .option("n_docs", 60)
        .option("partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) == 60
    r7 = rows[7]
    assert r7["lang"] == "de" and r7["n_tokens"] == 7 % 20 + 5
    assert len(r7["text"].split(" ")) == r7["n_tokens"]

    # pushdown path returns exactly the surviving ids
    got = sorted(
        r["doc_id"]
        for r in df.filter((F.col("doc_id") >= 10) & (F.col("doc_id") <= 13)).collect()
    )
    assert got == [10, 11, 12, 13]


def test_stream_reader_drains_in_micro_batches(spark):
    """The simpleStreamReader emits offset-cursored micro-batches; after
    processAllAvailable the sink holds every doc exactly once, proving
    offset advance + replay framing (lists, not generators) work."""
    register_docgen(spark)
    stream = (
        spark.readStream.format("lfs_docgen")
        .option("n_docs", 100)
        .option("batch_size", 30)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_docgen_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    r = spark.sql(
        "SELECT count(*) n, count(DISTINCT doc_id) d, min(doc_id) lo, "
        "max(doc_id) hi FROM t_docgen_stream"
    ).first()
    assert (r["n"], r["d"], r["lo"], r["hi"]) == (100, 100, 0, 99)


def test_python_writer_two_phase_commit(spark, tmp_path):
    """The JSONL writer stages per-task files under _temporary and only
    commit() publishes them; overwrite mode clears previous output; the
    staging dir never survives."""
    import glob
    import json
    import os

    register_docgen(spark)
    d = str(tmp_path / "out")
    df = spark.range(40).selectExpr(
        "id AS doc_id", "'en' AS lang", "5 AS n_tokens", "'x' AS text"
    )
    df.repartition(4).write.format("lfs_docgen").option("path", d).mode(
        "append"
    ).save()
    files = glob.glob(d + "/*.jsonl")
    rows = [json.loads(line) for f in files for line in open(f)]
    assert len(files) == 4
    assert sorted(r["doc_id"] for r in rows) == list(range(40))
    assert not os.path.exists(os.path.join(d, "_temporary"))

    # overwrite replaces the previous 40 rows with 10
    spark.range(10).selectExpr(
        "id AS doc_id", "'de' AS lang", "3 AS n_tokens", "'y' AS text"
    ).coalesce(1).write.format("lfs_docgen").option("path", d).mode(
        "overwrite"
    ).save()
    rows2 = [
        json.loads(line) for f in glob.glob(d + "/*.jsonl") for line in open(f)
    ]
    assert sorted(r["doc_id"] for r in rows2) == list(range(10))
