"""Sequence packing — assigning documents to fixed token-budget training
bins, the standard pre-training batching step (concatenate the corpus in
a deterministic order, chunk every ``budget`` tokens, keep document
granularity: a document belongs to the bin where it starts).

Not in the reference (no analogue of training-data preparation); part of
the north-star 100 TB pipeline surface. The only global state needed is
the running token total over the corpus order, which ``rowid.
with_prefix_sum`` computes scale-safely: value-bucketed parallel partial
cumsums plus literal offsets — no single-task ``ORDER BY`` window, no
driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lazy_frame_spark.operators.text import token_count, tokens
from lazy_frame_spark.rowid import with_prefix_sum


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_by: list[str] | None = None,
) -> DataFrame:
    """Per-document bin assignment under concat-and-chunk packing.

    ``start_offset`` is the document's position in the concatenated token
    stream (exclusive prefix sum); ``bin_id = start_offset // budget``.
    Bins fill to the budget and may overflow by at most one document —
    the same best-effort semantics as sample-packing a pre-training
    corpus without splitting documents."""
    order = list(order_by) if order_by else [id_col]
    d = df.withColumn("__n_tok__", token_count(F.col(text_col)).cast("bigint"))
    p = with_prefix_sum(d, "__n_tok__", order, col="__run__")
    start = F.col("__run__") - F.col("__n_tok__")
    return p.select(
        F.col(id_col),
        F.col("__n_tok__").alias("n_tokens"),
        start.alias("start_offset"),
        F.floor(start / budget_tokens).cast("bigint").alias("bin_id"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 512,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long documents into fixed-size token chunks with optional
    overlap — the long-document preprocessing step upstream of packing
    (a context-window's worth of tokens per training example, with
    ``stride < chunk_tokens`` giving sliding-window overlap).

    Pure JVM array expressions: tokenize once, ``posexplode`` a
    ``sequence`` of chunk starts, slice and re-join. Map-only — no
    shuffle, no UDF, whole-stage codegen end-to-end — so at 100 TB it
    scales exactly like the scan itself. Each output row carries
    ``(id, chunk_id, n_chunk_tokens, chunk_text)``; a document shorter
    than one chunk yields exactly one chunk."""
    step = stride or chunk_tokens
    ws = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__ws__"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__ws__") - 1, F.lit(0)), F.lit(step)
    )
    ex = ws.select(
        F.col(id_col),
        F.col("__ws__"),
        F.posexplode(starts).alias("chunk_id", "__start__"),
    )
    chunk = F.slice(F.col("__ws__"), F.col("__start__") + 1, chunk_tokens)
    return ex.select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def bin_stats(
    packed: DataFrame, budget_tokens: int = 2048
) -> DataFrame:
    """Per-bin packing audit — the numbers a pre-training pipeline
    tunes. Each document charges the bin it STARTS in (pack_sequences'
    own "bins fill to the budget, overflow by at most one document"
    semantics): ``n_docs``/``n_tokens`` per bin, ``fill_bp`` the exact
    basis-point load vs the budget (>10000 = overflow that truncates or
    spills; <10000 = padding if bins pad out), and ``n_split_docs`` the
    documents crossing the bin's end — the attention-boundary
    fragmentation count under concat-and-chunk, where token-level waste
    is zero by construction and fragmentation is the real cost. One
    partial-agg shuffle keyed by bin_id; bins-many result rows at any
    corpus size. ``budget_tokens`` must be the value the frame was
    packed with (``bin_id`` derives from it)."""
    b = F.lit(int(budget_tokens))
    split = F.when(
        F.col("start_offset") + F.col("n_tokens")
        > (F.col("bin_id") + 1) * b,
        1,
    ).otherwise(0)
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(split).cast("bigint").alias("n_split_docs"),
        )
        .withColumn(
            "fill_bp",
            F.floor(F.col("n_tokens") * 10000 / b).cast("bigint"),
        )
        .select("bin_id", "n_docs", "n_tokens", "fill_bp", "n_split_docs")
    )


#: sentence boundary: terminal punctuation run followed by whitespace.
#: Kept lookaround-free so Java (Spark) and RE2 (DuckDB) mirror exactly:
#: the boundary is marked with a \x01 sentinel, then split.
SENTENCE_BOUNDARY_RE = r"([.!?]+)\s+"


def sentence_chunks(
    df: DataFrame,
    target_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sentence-AWARE chunking — the RAG-standard chunker: documents
    split at sentence boundaries (terminal punctuation + whitespace; a
    sentinel-insertion split, no lookbehind, so the rule mirrors on RE2
    engines), and whole sentences pack into ~``target_tokens`` chunks
    by cumulative-token bucketing (``chunk_id = floor(tokens_before /
    target)``) — a sentence NEVER splits across chunks, and a chunk
    overflows by at most one sentence (same best-effort contract as
    ``pack_sequences``). Deterministic, shuffle-light: tokenize once,
    posexplode sentences, one per-document window cumsum (bounded by
    document length, never corpus length), hash-aggregate re-join.
    Abbreviation dots ("e.g. x") are honest false boundaries — the 90%
    rule at corpus scale; a model-based splitter plugs in upstream by
    materializing its own sentence column."""
    from pyspark.sql import Window

    marked = F.regexp_replace(F.col(text_col), SENTENCE_BOUNDARY_RE,
                              "$1\x01")
    sents = F.filter(
        F.transform(F.split(marked, "\x01"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )
    ex = df.select(F.col(id_col), sents.alias("__sents__")).select(
        F.col(id_col),
        F.posexplode("__sents__").alias("__pos__", "sentence"),
    )
    n_tok = F.size(F.split(F.col("sentence"), r"\s+")).cast("bigint")
    w = Window.partitionBy(id_col).orderBy("__pos__")
    run = ex.select(
        F.col(id_col), F.col("__pos__"), F.col("sentence"),
        n_tok.alias("__n__"),
    ).withColumn(
        "__before__",
        F.coalesce(F.sum("__n__").over(
            w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)),
    )
    chunked = run.withColumn(
        "chunk_id",
        F.floor(F.col("__before__") / F.lit(int(target_tokens)))
        .cast("bigint"),
    )
    return (
        chunked.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sentences"),
            F.sum("__n__").cast("bigint").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos__", "sentence"))),
                    lambda s: s["sentence"],
                ),
                " ",
            ).alias("chunk_text"),
        )
    )
