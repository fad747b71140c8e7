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
