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


def contamination_udf(df: DataFrame, eval_shingles, text_col: str = "text", n: int = 3):
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
    Returns the overlap-count Column for ``df[text_col]``."""
    import re

    from pyspark.sql.functions import pandas_udf

    if isinstance(eval_shingles, DataFrame):
        eval_shingles = [r["shingle"] for r in eval_shingles.collect()]
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
