"""BM25 / TF-IDF ranked retrieval (operators/retrieval.py) vs an
independent pure-Python scorer, plus plan-shape assertions."""

import math

import pytest
from pyspark.sql import functions as F

from lazy_frame_spark.operators import retrieval
from lazy_frame_spark.plans import audit

DOCS = [
    (1, "spark window merge spark spark table"),
    (2, "window window window merge data table row"),
    (3, "merge batch value key"),
    (4, "the quick brown fox jumps over lazy dog"),
    (5, "spark table scan filter merge window spark"),
]


def _py_tokens(t):
    import re

    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: _py_tokens(t) for i, t in docs}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    df = {
        q: sum(1 for w in toks.values() if q in w)
        for q in terms
    }
    out = {}
    for i, ws in toks.items():
        s = 0.0
        for q in terms:
            tf = ws.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        if s > 0:
            out[i] = round(s, 4)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_bm25_matches_reference_scorer(docs_df):
    terms = ["spark", "window", "merge"]
    got = {
        r["doc_id"]: r["bm25"]
        for r in retrieval.bm25_topk(docs_df, terms, k=10).collect()
    }
    assert got == _py_bm25(DOCS, terms)


def test_bm25_ranking_and_tiebreak(docs_df):
    rows = retrieval.bm25_topk(docs_df, ["spark", "window", "merge"], k=3).collect()
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert len(rows) == 3
    # doc 4 shares no query term: never present even with a large k
    all_rows = retrieval.bm25_topk(docs_df, ["spark", "window", "merge"], k=10).collect()
    assert 4 not in {r["doc_id"] for r in all_rows}


def test_tfidf_positive_and_filtered(docs_df):
    rows = retrieval.tfidf_topk(docs_df, ["spark", "batch"], k=10).collect()
    ids = {r["doc_id"] for r in rows}
    assert ids == {1, 3, 5}
    assert all(r["tfidf"] > 0 for r in rows)


def test_bm25_plan_shape(docs_df):
    """Top-k must be TakeOrderedAndProject (no global sort), and the
    df/stats sides must broadcast (no corpus-sized shuffle join)."""
    df = retrieval.bm25_topk(docs_df, ["spark", "window"], k=5)
    assert audit.has_take_ordered(df)
    assert audit.has_broadcast_hash_join(df)


def test_bm25_empty_query_result(docs_df):
    assert retrieval.bm25_topk(docs_df, ["zzznotaword"], k=5).count() == 0
