"""Benchmark decontamination for training corpora.

A training document is *contaminated* when it shares at least
``min_overlap`` distinct n-gram shingles with an evaluation corpus —
the n-gram-overlap rule used by published LM training pipelines to keep
benchmark text out of the training set.

100 TB design: eval corpora are tiny relative to training data
(thousands of benchmark documents vs billions of training documents),
so the eval n-gram set is built once, deduplicated, and BROADCAST.
The training side is then a single pass: explode distinct shingles,
broadcast-hash left join against the eval set (no shuffle of training
data on the join — the build side ships to every executor), and one
partial-aggregated count per document. Nothing here is quadratic and
the only shuffle is the per-doc count aggregation, keyed by doc id —
uniformly distributed by construction.

Reference parity note: the reference (bwlewis/lazy.frame) has no
corpus operations at all (SURVEY.md §2.2) — north-star scope.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lazy_frame_spark.operators.text import exploded_shingles


def eval_ngrams(
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """The distinct n-gram shingle set of an evaluation corpus — the
    broadcast-side build of every decontamination join. One column,
    ``shingle``."""
    return (
        exploded_shingles(eval_df, text_col=text_col, id_col=id_col, n=n)
        .select("shingle")
        .distinct()
    )


def contamination(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Per-training-document contamination stats against an eval corpus:
    ``(id, n_shingles, n_overlap, contaminated)``.

    One explode over the training text, one broadcast join, one
    aggregation — the count of distinct shingles and the count of
    eval-overlapping shingles come out of the same partial agg, so the
    training corpus is scanned exactly once.
    """
    ev = F.broadcast(
        eval_ngrams(eval_df, text_col=text_col, id_col=id_col, n=n).withColumn(
            "__hit__", F.lit(1)
        )
    )
    tr = exploded_shingles(train_df, text_col=text_col, id_col=id_col, n=n)
    per_doc = (
        tr.join(ev, on="shingle", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("__hit__"), F.lit(0)).cast("bigint").alias("n_overlap"),
        )
    )
    return per_doc.withColumn(
        "contaminated", F.col("n_overlap") >= F.lit(min_overlap)
    )


#: driver-collect guard for the streaming decontamination path: the eval
#: shingle set is broadcast via SparkContext, so it must fit the driver
#: and every executor. 5M shingles ≈ 150-250 MB in flight — generous for
#: any real eval suite (MMLU+GSM8K+HumanEval together are a few hundred
#: thousand shingles), and small enough that hitting it means someone
#: passed a training corpus as the eval side, which deserves an error.
MAX_EVAL_SHINGLES = 5_000_000


def contamination_udf(
    df: DataFrame,
    eval_shingles,
    text_col: str = "text",
    n: int = 3,
    max_eval_shingles: int = MAX_EVAL_SHINGLES,
):
    """A stateless per-row overlap counter against a driver-broadcast
    shingle set: the STREAMING formulation of decontamination.

    The batch path (``contamination``) needs an explode + per-doc
    aggregation — in a stream that would demand stateful aggregation
    semantics it doesn't actually need. This variant instead ships the
    eval shingle set via ``SparkContext.broadcast`` (eval corpora are
    small by definition) and counts the intersection inside an
    Arrow-batched pandas UDF — stateless, so it runs in append mode
    with no watermark and composes with any micro-batch plan. Token and
    shingle semantics mirror operators/text.tokens / shingles_from_words
    exactly (short documents contribute their whole text as one
    shingle), so batch and stream agree value-for-value.

    ``eval_shingles`` is a DataFrame from :func:`eval_ngrams` (collected
    here — one driver round-trip) or any iterable of shingle strings.
    Returns the overlap-count Column for ``df[text_col]``.

    Size contract: the eval shingle set is DRIVER-COLLECTED and
    broadcast, so the bound is the eval suite's size, which is small BY
    CONSTRUCTION (benchmarks are human-curated; the training corpus is
    the big side and never collects). ``max_eval_shingles`` enforces
    it — exceeding the cap raises instead of silently OOM-ing the
    driver, because the only way past it is passing a corpus-sized
    frame as the eval side."""
    import re

    from pyspark.sql.functions import pandas_udf

    if isinstance(eval_shingles, DataFrame):
        rows = eval_shingles.limit(max_eval_shingles + 1).collect()
        if len(rows) > max_eval_shingles:
            raise ValueError(
                f"eval shingle set exceeds max_eval_shingles="
                f"{max_eval_shingles}: the streaming decontamination "
                "path broadcasts the eval set driver-side — this input "
                "is corpus-sized, not eval-sized; use the batch "
                "contamination() join instead or raise the cap "
                "deliberately"
            )
        eval_shingles = [r["shingle"] for r in rows]
    else:
        eval_shingles = list(eval_shingles)
        if len(eval_shingles) > max_eval_shingles:
            raise ValueError(
                f"eval shingle set ({len(eval_shingles)}) exceeds "
                f"max_eval_shingles={max_eval_shingles}"
            )
    bc = df.sparkSession.sparkContext.broadcast(frozenset(eval_shingles))
    ws_re = re.compile(r"\s+")

    @pandas_udf("long")
    def overlap(texts: pd.Series) -> pd.Series:
        ev = bc.value

        def count(t: str) -> int:
            ws = ws_re.split(t.strip()) if t and t.strip() else []
            if len(ws) >= n:
                sh = {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}
            else:
                sh = {" ".join(ws)}
            return len(sh & ev)

        return texts.map(count)

    return overlap(F.col(text_col))


def decontaminate_stream(
    stream_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Streaming decontamination: keep rows whose eval-corpus n-gram
    overlap stays below ``min_overlap``. A pure map-side filter
    (broadcast set + stateless UDF), so the result is an append-mode
    stream with zero state; the identical call works on a batch frame,
    which is how the parity oracle checks it."""
    ev = eval_ngrams(eval_df, text_col=text_col, n=n)
    return stream_df.filter(
        contamination_udf(stream_df, ev, text_col=text_col, n=n)
        < F.lit(int(min_overlap))
    )


def bloom_bitset(
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
) -> bytes:
    """A Bloom-filter bitset over the eval corpus's distinct n-gram
    shingles.

    Why: ``contamination`` broadcasts the eval shingle set VERBATIM.
    That is right while eval corpora are thousands of documents, but a
    consolidated decontamination list (every benchmark ever published,
    ~1e9 shingles) stops fitting in an executor broadcast. A Bloom
    filter compresses membership to ``m_bits`` (128 KiB at the default
    2^20) at the price of false POSITIVES only — exactly the safe
    direction for a prefilter, because a false positive just sends one
    extra candidate to the exact verify join, while false negatives
    (which a Bloom filter cannot produce) would silently leak
    contamination.

    Hash positions are computed JVM-side (``xxhash64(shingle, seed)``,
    one seed per hash function) and only the tiny position set makes the
    driver round-trip; the bitset is assembled in numpy.
    """
    import numpy as np

    pos_cols = [
        F.pmod(F.xxhash64(F.col("shingle"), F.lit(i)), F.lit(m_bits)).alias(f"p{i}")
        for i in range(k_hashes)
    ]
    pos = (
        eval_ngrams(eval_df, text_col=text_col, id_col=id_col, n=n)
        .select(pos_cols)
        .toPandas()
    )
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for i in range(k_hashes):
        idx = pos[f"p{i}"].to_numpy(dtype=np.int64)
        np.bitwise_or.at(bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
    return bits.tobytes()


def bloom_contamination(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 1,
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
) -> DataFrame:
    """Two-phase decontamination: Bloom prefilter → exact verify.

    Phase 1 streams every training shingle past the broadcast bitset:
    positions are computed JVM-side (``xxhash64`` columns), and the only
    Python in the path is a vectorized numpy bit-lookup over the
    Arrow-delivered position arrays — no hashing, no string handling in
    Python. Survivors (true overlaps + Bloom false positives, a tiny
    fraction of the corpus) proceed to phase 2, the exact broadcast join
    of ``contamination`` — so the RESULT is byte-identical to the exact
    path (``(id, n_overlap, contaminated)`` for flagged docs), which is
    what lets the DuckDB oracle value-check this query with plain
    overlap SQL. No false negatives by construction: every true overlap
    passes the Bloom test.

    Returns ``(id_col, n_overlap)`` for documents with
    ``n_overlap >= min_overlap``.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    bits_np = np.frombuffer(
        bloom_bitset(
            eval_df, text_col=text_col, id_col=id_col, n=n,
            m_bits=m_bits, k_hashes=k_hashes,
        ),
        dtype=np.uint8,
    )
    bc = train_df.sparkSession.sparkContext.broadcast(bits_np)

    @pandas_udf("boolean")
    def maybe_member(pos: pd.Series) -> pd.Series:
        bits = bc.value
        idx = np.stack(pos.to_numpy())  # (batch, k) int64 positions
        hit = (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    tr = exploded_shingles(train_df, text_col=text_col, id_col=id_col, n=n)
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.col("shingle"), F.lit(i)), F.lit(m_bits))
            for i in range(k_hashes)
        ]
    )
    candidates = tr.filter(maybe_member(positions))

    # exact verify: candidates are few, the eval set broadcast is the
    # same build side the exact path uses
    ev = F.broadcast(
        eval_ngrams(eval_df, text_col=text_col, id_col=id_col, n=n)
    )
    return (
        candidates.join(ev, on="shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
        .filter(F.col("n_overlap") >= F.lit(int(min_overlap)))
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Drop contaminated documents from the training corpus: the rows of
    ``train_df`` whose n-gram overlap with the eval corpus is below
    ``min_overlap``. The flagging side aggregates to ids only, so the
    final anti-join carries one bigint per contaminated doc."""
    flagged = contamination(
        train_df, eval_df, text_col=text_col, id_col=id_col, n=n,
        min_overlap=min_overlap,
    )
    bad = flagged.filter(F.col("contaminated")).select(id_col)
    return train_df.join(bad, on=id_col, how="left_anti")
