"""n-gram language-model scoring — CCNet-style perplexity filtering.

Not in the reference (whose only text op is the strcmp predicate,
``src/lazy.frame.c:377-406``); this is the published quality-filter
pattern for web-scale training corpora: train a small n-gram LM on a
trusted reference corpus, score every candidate document by its average
negative log-probability, and drop the outliers (high = gibberish /
boilerplate, suspiciously low = templated duplication).

Model: bigram LM with add-alpha smoothing,

    P(w2 | w1) = (c(w1 w2) + alpha) / (c(w1 *) + alpha * V)

where ``c`` are reference-corpus counts and ``V`` is the reference
vocabulary size. Unseen bigrams (and unseen left-words) degrade smoothly
to ``alpha / (alpha * V) = 1/V`` — every document is scoreable with no
special cases, and the whole computation is closed-form, so the DuckDB
oracle can verify scores value-for-value.

Scale shape (the part that must survive 100 TB):
- LM TRAINING is one explode + one hash aggregation shuffled on the
  bigram key; the left-word totals ``c(w1 *)`` are DERIVED from the
  bigram counts by a second (much smaller) aggregation — the corpus is
  scanned once, not twice. Vocabulary size stays a lazy 1-row frame
  (cross-joined, never ``collect()``-ed) so scoring remains a pure plan.
- SCORING is one explode + two equi-joins against the LM tables + one
  partial aggregation back to doc grain. With ``broadcast_lm=True``
  (sane for reference LMs: the CCNet reference corpus is ~10^7 bigrams
  — tens of MB as compact tuples, shippable to every executor) both
  joins are broadcast-hash: NO shuffle of the exploded candidate side
  at all, the dominant term at scale. With ``broadcast_lm=False`` they
  are shuffle hash/SMJ equi-joins on the bigram string — still linear.
- Everything is JVM expression (split/slice/log10); no Python row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lazy_frame_spark.operators.text import tokens

__all__ = ["word_bigrams", "bigram_lm", "perplexity_scores", "perplexity_filter"]


def word_bigrams(ws: Column) -> Column:
    """All consecutive word pairs of a token array, space-joined
    (tokens are whitespace-split, so ``' '`` cannot appear inside one
    and the joined string is an injective pair encoding). Duplicates are
    KEPT — LM counts are multiset counts, unlike the distinct shingles
    of the dedup sketches. Arrays shorter than 2 yield an empty array."""
    sh = F.transform(
        F.sequence(F.lit(0), F.size(ws) - 2),
        lambda i: F.array_join(F.slice(ws, i + 1, 2), " "),
    )
    return F.when(F.size(ws) >= 2, sh).otherwise(F.array().cast("array<string>"))


def _exploded_bigrams(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    """(keep..., bigram) rows; the token array is projected once and the
    explode fans out across cores on low-split sources."""
    from lazy_frame_spark.plans.parallel import ensure_min_partitions

    ws = ensure_min_partitions(df).select(
        *[F.col(c) for c in keep], tokens(F.col(text_col)).alias("__ws__")
    )
    return ws.select(
        *[F.col(c) for c in keep],
        F.explode(word_bigrams(F.col("__ws__"))).alias("bigram"),
    )


def bigram_lm(ref: DataFrame, text_col: str = "text") -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the LM: returns ``(bigram_counts, left_counts, vocab)``.

    ``bigram_counts``: (bigram, c12) — one shuffle on the bigram key.
    ``left_counts``: (w1, c1) where ``c1 = c(w1 *)`` — derived from
    ``bigram_counts`` (aggregation of an aggregation; no second corpus
    scan). ``vocab``: a single-row frame (v) with the distinct-token
    count of the reference corpus, kept lazy for cross-joining."""
    bg = _exploded_bigrams(ref, text_col, keep=[])
    c12 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    c1 = (
        c12.withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    from lazy_frame_spark.plans.parallel import ensure_min_partitions

    uni = ensure_min_partitions(ref).select(
        F.explode(tokens(F.col(text_col))).alias("tok")
    )
    vocab = uni.agg(F.count_distinct(F.col("tok")).alias("v"))
    return c12, c1, vocab


def perplexity_scores(
    docs: DataFrame,
    ref: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    round_to: int = 3,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Per-document average negative log10-probability under the
    reference bigram LM: (id, n_bigrams, avg_nlp). Documents with fewer
    than 2 tokens have no bigrams and are excluded (no fallback row —
    they carry no LM evidence either way; gate them on length instead).

    Lower = more reference-like. ``avg_nlp`` is rounded (default 1e-3)
    so the score is reproducible across engines for oracle checking."""
    c12, c1, vocab = bigram_lm(ref, text_col)
    if broadcast_lm:
        c12, c1 = F.broadcast(c12), F.broadcast(c1)

    bg = _exploded_bigrams(docs, text_col, keep=[id_col])
    scored = (
        bg.crossJoin(F.broadcast(vocab))  # 1 row: plan literal, no collect
        .join(c12, on="bigram", how="left")
        .join(
            c1.withColumnRenamed("w1", "__w1__"),
            on=F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)) == F.col("__w1__"),
            how="left",
        )
        .withColumn(
            "__nlp__",
            -F.log10(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("v"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__nlp__"), round_to).alias("avg_nlp"),
    )


def perplexity_filter(
    docs: DataFrame,
    ref: DataFrame,
    max_avg_nlp: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Keep documents whose average NLP under the reference LM is at most
    ``max_avg_nlp`` — the CCNet 'head/middle' cut. Documents with < 2
    tokens carry no LM evidence and are dropped here (semi-join on the
    scored set)."""
    scores = perplexity_scores(
        docs, ref, text_col, id_col, alpha=alpha, broadcast_lm=broadcast_lm
    )
    keep = scores.filter(F.col("avg_nlp") <= max_avg_nlp).select(id_col)
    return docs.join(keep, on=id_col, how="semi")
