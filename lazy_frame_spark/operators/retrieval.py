"""Ranked keyword retrieval (TF-IDF / BM25) over a document corpus.

The reference (bwlewis/lazy.frame) has no text search at all — its only
string operation is the strcmp predicate scan (``src/lazy.frame.c:377-406``).
This module is north-star scope: the "find the k most relevant documents
for a term query" primitive every corpus-curation pipeline needs (query-
anchored sampling, targeted decontamination audit, eval-set mining).

100 TB design — the inverted-index shape without materializing an index:

- The query's term set is a LITERAL ``isin`` filter applied directly to
  the exploded token stream, so Catalyst prunes every non-query token
  BEFORE any shuffle: the per-(doc, term) frequency aggregation only ever
  shuffles rows for the handful of query terms, not the corpus vocabulary.
- Document frequency (per query term) and corpus stats (N, avgdl) are
  tiny aggregates — both broadcast back. The scoring join therefore
  shuffles the per-doc tf rows ONCE (keyed by doc id, uniform) and
  nothing else.
- Final top-k is ``ORDER BY score LIMIT k`` → Spark plans
  TakeOrderedAndProject: per-partition heaps + a k-row driver merge,
  never a global sort.

Scores use the Lucene BM25 idf variant ``ln(1 + (N - df + .5)/(df + .5))``
(always non-negative) and are rounded to 4 decimals BEFORE ranking in
both engines, so accumulation-order float jitter cannot reorder the
top-k between Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: lowercase alnum tokenization, identical in Spark and DuckDB:
#: split on runs of non-alphanumerics, drop empty fragments.
_TOKEN_RE = "[^a-z0-9]+"


def _tokenized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, __ws__) with the lowercase-alnum token array projected once."""
    from lazy_frame_spark.plans.parallel import ensure_min_partitions

    ws = F.filter(F.split(F.lower(F.col(text_col)), _TOKEN_RE), lambda x: x != "")
    return ensure_min_partitions(df).select(F.col(id_col), ws.alias("__ws__"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 score for a bag-of-terms query.

    Returns ``(id_col, bm25)`` with ``bm25`` rounded to 4 decimals,
    ordered by ``(bm25 DESC, id ASC)`` — the id tie-break makes the k-row
    cut deterministic across engines and runs.
    """
    toks = _tokenized(docs, text_col, id_col)

    # per-document length + corpus stats (one tiny agg, broadcast back)
    dl = toks.select(F.col(id_col), F.size("__ws__").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    # term frequencies for QUERY TERMS ONLY: the isin literal filter runs
    # before the groupBy, so only query-term rows ever shuffle.
    tf = (
        toks.select(F.col(id_col), F.explode("__ws__").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    # document frequency per query term — at most len(query_terms) rows
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )

    scored = (
        tf.join(dl, on=id_col)  # doc-keyed shuffle join, uniform keys
        .join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * norm), 4).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.col(id_col)).limit(k)


def tfidf_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Plain TF-IDF variant (ltc-style: log-tf × smoothed idf), same
    plan shape as :func:`bm25_topk` — kept separate because curation
    recipes often specify tf-idf weighting explicitly."""
    toks = _tokenized(docs, text_col, id_col)
    dl = toks.select(F.col(id_col), F.size("__ws__").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        toks.select(F.col(id_col), F.explode("__ws__").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = (F.lit(1.0) + F.log(F.col("tf"))) * F.log(
        F.lit(1.0) + F.col("n_docs") / F.col("df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(w), 4).alias("tfidf"))
    )
    return scored.orderBy(F.desc("tfidf"), F.col(id_col)).limit(k)
