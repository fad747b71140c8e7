"""Property-based tests for the round-3 pipeline operators: each Spark
implementation is checked against an independent brute-force Python model
on randomized inputs (hypothesis; low example counts — every example is
a Spark action)."""

import hashlib
import itertools
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --------------------------------------------------------------------- #
# triangle counting vs brute force
# --------------------------------------------------------------------- #

edges_strategy = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)), min_size=0, max_size=40
)


@SETTINGS
@given(edges=edges_strategy)
def test_triangle_count_matches_bruteforce(spark, edges):
    from lazy_frame_spark.operators.graph import triangle_count

    und = {frozenset(e) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    expected = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if {a, b} in und and {a, c} in und and {b, c} in und
    )
    if edges:
        df = spark.createDataFrame(edges, "src long, dst long")
        got = triangle_count(df).collect()[0]["n_triangles"]
        assert got == expected


# --------------------------------------------------------------------- #
# duplicate n-gram spans vs brute force
# --------------------------------------------------------------------- #

def _brute_spans(docs, n, min_span):
    """All maximal shared diagonal runs of n-grams between doc pairs."""
    grams = {}
    for i, text in docs:
        ws = text.split()
        grams[i] = [" ".join(ws[p:p + n]) for p in range(len(ws) - n + 1)]
    out = set()
    ids = sorted(grams)
    for a, b in itertools.combinations(ids, 2):
        matches = {
            (pa, pb)
            for pa, ga in enumerate(grams[a])
            for pb, gb in enumerate(grams[b])
            if ga == gb
        }
        by_diag = {}
        for pa, pb in matches:
            by_diag.setdefault(pa - pb, []).append(pa)
        for diag, pas in by_diag.items():
            pas = sorted(pas)
            run = [pas[0]]
            for p in pas[1:]:
                if p == run[-1] + 1:
                    run.append(p)
                else:
                    if len(run) + n - 1 >= min_span:
                        out.add((a, b, run[0], run[0] - diag, len(run) + n - 1))
                    run = [p]
            if len(run) + n - 1 >= min_span:
                out.add((a, b, run[0], run[0] - diag, len(run) + n - 1))
    return out


words = st.sampled_from(["w%d" % i for i in range(6)])
doc_strategy = st.lists(words, min_size=0, max_size=20).map(" ".join)


@SETTINGS
@given(texts=st.lists(doc_strategy, min_size=2, max_size=4))
def test_ngram_spans_match_bruteforce(spark, texts):
    from lazy_frame_spark.operators import dedup as dd

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_tokens"])
        for r in dd.duplicate_ngram_spans(df, n=3, min_span_tokens=4).collect()
    }
    assert got == _brute_spans(docs, n=3, min_span=4)


# --------------------------------------------------------------------- #
# weighted sampling vs exact Python replication of the A-ES keys
# --------------------------------------------------------------------- #

def _py_aes_topk(rows, k, seed):
    keyed = []
    for rid, w in rows:
        if w <= 0:
            continue
        h = int(hashlib.md5(f"{seed}:{rid}".encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        keyed.append((math.log(u) / w, -rid))
    keyed.sort(reverse=True)
    return [-r for _, r in keyed[:k]]


@SETTINGS
@given(
    weights=st.lists(st.floats(0.0, 100.0, allow_nan=False), min_size=1, max_size=30),
    seed=st.integers(0, 5),
)
def test_weighted_sample_matches_python_keys(spark, weights, seed):
    from lazy_frame_spark.operators.sampling import weighted_sample_topk

    rows = [(i + 1, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "rid long, w double")
    got = [
        r["rid"]
        for r in weighted_sample_topk(df, "w", 5, ["rid"], seed=seed).collect()
    ]
    assert got == _py_aes_topk(rows, 5, seed)


# --------------------------------------------------------------------- #
# funnel vs brute-force simulation
# --------------------------------------------------------------------- #

event_strategy = st.tuples(
    st.integers(1, 4),                       # user
    st.integers(0, 50),                      # minute offset
    st.sampled_from(["view", "click", "buy"]),
)


def _brute_funnel(events, stages):
    per_user = {}
    for u, minute, typ in events:
        per_user.setdefault(u, []).append((minute, typ))
    counts = [0] * len(stages)
    for u, evs in per_user.items():
        t_prev = None
        for i, stage in enumerate(stages):
            cands = [
                m for m, typ in evs
                if typ == stage and (t_prev is None if i == 0 else m > t_prev)
            ]
            if not cands:
                break
            t_prev = min(cands)
            counts[i] += 1
    return counts


@SETTINGS
@given(events=st.lists(event_strategy, min_size=0, max_size=30))
def test_funnel_matches_bruteforce(spark, events):
    from datetime import datetime, timedelta

    from lazy_frame_spark.operators import funnel as fn

    stages = ["view", "click", "buy"]
    expected = _brute_funnel(events, stages)
    if not events:
        return
    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(minutes=m), u, typ)
        for i, (u, m, typ) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r["stage_idx"]: r["n_users"]
        for r in fn.funnel_counts(df, stages).collect()
    }
    assert [got[i + 1] for i in range(3)] == expected


# --------------------------------------------------------------------- #
# chunk-grain dedup vs brute force
# --------------------------------------------------------------------- #

def _brute_chunk_dedup(docs, k):
    seen = {}
    for doc_id, text in sorted(docs):
        ws = text.split()
        starts = range(0, max(len(ws), 1), k)
        for ci, s0 in enumerate(starts):
            chunk = " ".join(ws[s0:s0 + k])
            key = chunk
            pk = doc_id * (1 << 32) + ci
            if key not in seen or pk < seen[key]:
                seen[key] = pk
    out = {}
    for doc_id, text in docs:
        ws = text.split()
        kept = []
        for ci, s0 in enumerate(range(0, max(len(ws), 1), k)):
            chunk = " ".join(ws[s0:s0 + k])
            if seen.get(chunk) == doc_id * (1 << 32) + ci:
                kept.append(chunk)
        out[doc_id] = " ".join(kept)
    return out


chunk_words = st.sampled_from(["a", "b", "c"])
chunk_doc = st.lists(chunk_words, min_size=1, max_size=12).map(" ".join)


@SETTINGS
@given(texts=st.lists(chunk_doc, min_size=1, max_size=4))
def test_chunk_dedup_matches_bruteforce(spark, texts):
    from lazy_frame_spark.operators import dedup as dd

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"] for r in dd.chunk_dedup(df, chunk_tokens=3).collect()
    }
    assert got == _brute_chunk_dedup(docs, 3)


def _brute_paragraph_dedup(docs):
    import re

    seen = {}
    for doc_id, text in docs:
        for pi, p in enumerate(re.split(r"\n{2,}", text)):
            if p.strip() == "":
                continue
            pk = doc_id * (1 << 32) + pi
            if p not in seen or pk < seen[p]:
                seen[p] = pk
    out = {}
    for doc_id, text in docs:
        kept = [
            p
            for pi, p in enumerate(re.split(r"\n{2,}", text))
            if p.strip() != "" and seen.get(p) == doc_id * (1 << 32) + pi
        ]
        out[doc_id] = "\n\n".join(kept)
    return out


para_piece = st.sampled_from(["pa", "pb", "pc", " ", ""])
para_doc = st.lists(para_piece, min_size=1, max_size=6).map("\n\n".join)


@SETTINGS
@given(texts=st.lists(para_doc, min_size=1, max_size=4))
def test_paragraph_dedup_matches_bruteforce(spark, texts):
    from lazy_frame_spark.operators import dedup as dd

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in dd.paragraph_dedup(df).collect()}
    assert got == _brute_paragraph_dedup(docs)


def _brute_resample_ffill(rows, width_s=3600):
    """Model: per user, bucket to width_s-second epochs, last (ts, id)
    observation wins the bucket, grid spans [min,max] bucket, ffill."""
    from collections import defaultdict

    by_user = defaultdict(dict)
    for eid, ts, uid, val in rows:
        b = (int(ts.timestamp()) // width_s) * width_s
        cur = by_user[uid].get(b)
        if cur is None or (ts, eid) > (cur[0], cur[1]):
            by_user[uid][b] = (ts, eid, val)
    out = {}
    for uid, buckets in by_user.items():
        lo, hi = min(buckets), max(buckets)
        last = None
        for b in range(lo, hi + width_s, width_s):
            if b in buckets:
                last = buckets[b][2]
            out[(uid, b)] = last
    return out


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 99),                       # event_id
            st.integers(0, 72).map(
                lambda h: __import__("datetime").datetime(2024, 1, 1)
                + __import__("datetime").timedelta(hours=h, minutes=h % 7)
            ),
            st.integers(1, 3),                        # user_id
            st.floats(0, 100, allow_nan=False).map(lambda v: round(v, 2)),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda r: r[0],
    )
)
def test_resample_ffill_matches_bruteforce(spark, rows):
    from lazy_frame_spark.operators import timeseries as ts

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {
        (r["user_id"], int(r["bucket"].timestamp())): r["v_ffill"]
        for r in ts.resample_ffill(df, every="1 hour").collect()
    }
    assert got == _brute_resample_ffill(rows)


# --------------------------------------------------------------------- #
# bucketed event-time carries vs the plain single-window paths
# --------------------------------------------------------------------- #

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),                    # key
        st.integers(0, 1000),                 # time (ints; dup times allowed)
        st.integers(-5, 5),                   # value payload
    ),
    min_size=1,
    max_size=60,
)


@SETTINGS
@given(ev=events_strategy, n_buckets=st.sampled_from([2, 3, 7, 16]),
       gap=st.sampled_from([1.0, 10.0, 50.0]))
def test_sessionize_bucketed_equals_plain_random(spark, ev, n_buckets, gap):
    """For ANY event set, bucket count and gap, the pre-split sessionize
    must equal the single-window path row-for-row."""
    from lazy_frame_spark.operators.sessions import sessionize

    rows = [(i, k, float(t)) for i, (k, t, _) in enumerate(ev)]
    df = spark.createDataFrame(rows, "event_id long, k long, t double")
    plain = sorted(map(tuple, sessionize(df, "k", "t", gap=gap).collect()))
    bucketed = sorted(
        map(tuple, sessionize(df, "k", "t", gap=gap, time_buckets=n_buckets).collect())
    )
    assert bucketed == plain


@SETTINGS
@given(ev=events_strategy, rt=events_strategy,
       n_buckets=st.sampled_from([2, 3, 7]),
       direction=st.sampled_from(["backward", "forward"]))
def test_asof_bucketed_equals_plain_random(spark, ev, rt, n_buckets, direction):
    """For ANY left/right event sets (duplicate times included, values
    unique per (key, time) so ties can't mask order-dependence), the
    bucketed as-of must equal the single-window path."""
    from lazy_frame_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(i, k, float(t)) for i, (k, t, _) in enumerate(ev)],
        "lid long, k long, t double",
    )
    seen = {}
    rrows = []
    for k, t, v in rt:
        if (k, t) not in seen:      # one right row per (key, time)
            seen[(k, t)] = True
            rrows.append((k, float(t), float(v)))
    right = spark.createDataFrame(rrows, "k long, rt double, v double")
    plain = sorted(map(tuple, asof_join(
        left, right, "k", "t", "rt", ["v"], direction=direction).collect()))
    bucketed = sorted(map(tuple, asof_join(
        left, right, "k", "t", "rt", ["v"], direction=direction,
        time_buckets=n_buckets).collect()))
    assert bucketed == plain


# --------------------------------------------------------------------- #
# URL canonicalization (operators/urls.py)
# --------------------------------------------------------------------- #

url_piece = st.sampled_from([
    "http://", "HTTPS://", "hxxp", "www.", "Ex.COM", ":80", ":443", ":8080",
    "/Path", "/path/", "?", "a=1", "&b=2", "&utm_source=x", "#frag", "",
    "%20", "a b", "//", "?&&", "=", "1",
    # percent-encoding + duplicate-param rule coverage: unreserved
    # escapes (both hex cases), reserved escapes, malformed escapes,
    # escaped www/tracking spellings, repeated param names
    "%7e", "%7E", "%41", "%2F", "%2f", "%zz", "%4", "%25", "%771",
    "&a=2", "&a=%7e", "%77ww.", "&%75tm_x=1",
    # escape-synthesis adjacencies (the round-6 idempotence break:
    # incomplete escape + hex-decoding escape, e.g. '%4'+'%31')
    "%31", "%34", "%%34", "%4%31",
    # dot segments (incl. escaped spellings that decode to dots)
    "/./", "/../", "/..", "/.", "%2e%2E/", "/a/..",
])
url_strategy = st.lists(url_piece, min_size=0, max_size=8).map("".join)


@SETTINGS
@given(urls=st.lists(url_strategy, min_size=1, max_size=12))
def test_canonicalize_url_idempotent_and_forms_agree(spark, urls):
    """Properties over adversarial URL-ish strings: (1) the staged
    (with_canonical_url) and single-Column forms agree byte-for-byte;
    (2) canonicalization is IDEMPOTENT — re-canonicalizing a canonical
    output is a no-op (otherwise dedup keys drift across pipeline
    stages); (3) NULL only for inputs without a scheme."""
    import pyspark.sql.functions as F

    from lazy_frame_spark.operators.urls import (
        canonicalize_url,
        with_canonical_url,
    )

    df = spark.createDataFrame(list(enumerate(urls)), "i long, url string")
    staged = {r["i"]: r["c"] for r in
              with_canonical_url(df, "url", "c").select("i", "c").collect()}
    column = {r["i"]: r["c"] for r in
              df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()}
    assert staged == column

    canon_rows = [(i, c) for i, c in staged.items() if c is not None]
    if canon_rows:
        df2 = spark.createDataFrame(canon_rows, "i long, url string")
        twice = {r["i"]: r["c"] for r in
                 with_canonical_url(df2, "url", "c").select("i", "c").collect()}
        assert twice == dict(canon_rows)


# --------------------------------------------------------------------- #
# positional id assignment incl. the sorted-fast-path probe (rowid.py)
# --------------------------------------------------------------------- #

@SETTINGS
@given(
    keys=st.lists(st.one_of(st.integers(-50, 50), st.none()),
                  min_size=1, max_size=60),
    presort=st.booleans(),
    n_files=st.integers(1, 3),
)
def test_enumerate_ids_total_order_random_tables(spark, tmp_path_factory,
                                                 keys, presort, n_files):
    """Fuzz the whole id-assignment stack — footer span check, pyarrow
    prefix probe, sorted fast path, bucketed rank fallback — over random
    parquet tables (sorted/unsorted, duplicate keys, NULLs, 1..3
    files): ids must always be exactly 1..n and non-decreasing in key
    order (NULLs first, Spark's ascending default)."""
    import pyspark.sql.functions as F

    from lazy_frame_spark import rowid as R

    if presort:
        keys = sorted(keys, key=lambda v: (v is not None, v))
    d = str(tmp_path_factory.mktemp("fuzz_ids"))
    df = spark.createDataFrame([(i, k) for i, k in enumerate(keys)],
                               "pos long, k int").coalesce(1)
    # honor the requested file split while preserving row order per file
    n = len(keys)
    per = max(1, (n + n_files - 1) // n_files)
    import pandas as pd
    pdf = pd.DataFrame({"pos": range(n), "k": keys})
    import os
    for f in range(0, n, per):
        spark.createDataFrame(pdf.iloc[f:f + per], schema="pos long, k int") \
            .coalesce(1).write.mode("append").parquet(d)

    out, handle = R.enumerate_rows(spark.read.parquet(d), order_by=["k"],
                                   col="__rid__", cache=False)
    rows = out.select("k", "__rid__").collect()
    ids = sorted(r["__rid__"] for r in rows)
    assert ids == list(range(1, n + 1))
    by_id = [r["k"] for r in sorted(rows, key=lambda r: r["__rid__"])]
    keyfn = lambda v: (v is not None, v)  # noqa: E731 — NULLS FIRST asc
    assert all(keyfn(a) <= keyfn(b) for a, b in zip(by_id, by_id[1:]))


# --------------------------------------------------------------------- #
# HTML text extraction vs an html.parser twin on adversarial markup
# --------------------------------------------------------------------- #

def _html_to_text_twin(html: str) -> str:
    """Ground-truth twin built on the stdlib's real tokenizer
    (html.parser): script/style contents skipped, comments dropped,
    tags become spaces, charrefs decoded by the parser itself, &nbsp;
    normalized, whitespace collapsed — the same visible-text contract
    html_to_text implements in Catalyst."""
    import re
    from html.parser import HTMLParser

    class _X(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.skip = 0
            self.parts: list[str] = []

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self.skip += 1
            self.parts.append(" ")

        def handle_endtag(self, tag):
            if tag in ("script", "style"):
                self.skip = max(0, self.skip - 1)
            self.parts.append(" ")

        def handle_data(self, data):
            if not self.skip:
                self.parts.append(data)

        def handle_comment(self, data):
            self.parts.append(" ")

    p = _X()
    p.feed(html)
    p.close()
    txt = "".join(p.parts).replace("\xa0", " ")
    return re.sub(r"[ \t\n\r\f\v]+", " ", txt).strip()


_h_text = st.text(alphabet="abcdefgh 123.,\n\t", min_size=0, max_size=24)
_h_entity = st.sampled_from(
    ["&lt;", "&gt;", "&quot;", "&#39;", "&apos;", "&nbsp;", "&amp;",
     "&amp;lt;"])
_h_tag = st.sampled_from(
    ["p", "div", "li", "h1", "span", "b", "a", "section", "td", "DIV", "A"])
_h_attrval = st.text(alphabet="abc 123", min_size=0, max_size=8)


def _mk_open(t, v):
    return f'<{t} class="{v}">' if v else f"<{t}>"


_h_piece = st.one_of(
    _h_text,
    _h_entity,
    st.tuples(_h_tag, _h_attrval).map(lambda tv: _mk_open(*tv)),
    _h_tag.map(lambda t: f"</{t}>"),                       # maybe unmatched
    st.tuples(_h_text, _h_attrval).map(
        lambda tb: f'<a href="{tb[1]}">{tb[0]}'),           # unclosed anchor
    _h_text.map(lambda b: f'<script>var x = "</div>"; {b}</script>'),
    _h_text.map(lambda b: f"<style>p{{color:red}} {b}</style>"),
    _h_text.map(lambda b: f"<!-- {b} -->"),
)
_h_doc = st.lists(_h_piece, min_size=0, max_size=12).map("".join)


@SETTINGS
@given(docs=st.lists(_h_doc, min_size=1, max_size=25))
def test_html_to_text_matches_stdlib_parser_twin(spark, docs):
    """Generated adversarial markup — unmatched/unclosed tags, nested
    and unclosed anchors, mixed-case tags, script bodies containing a
    fake '</div>', comments, the full entity set incl. the
    double-escape '&amp;lt;' — must extract to EXACTLY the text the
    stdlib html.parser twin sees. The generator deliberately stays
    inside the documented regex contract (no '>' inside attribute
    values, no unclosed script/style/comment): those divergence
    classes are pinned separately below."""
    import pyspark.sql.functions as F

    from lazy_frame_spark.operators import text as T

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i long, html string")
    got = {r["i"]: r["t"] for r in df.select(
        "i", T.html_to_text(F.col("html")).alias("t")).collect()}
    for i, d in enumerate(docs):
        assert got[i] == _html_to_text_twin(d), repr(d)


def test_html_to_text_documented_divergences(spark):
    """The divergence classes the regex pass documents, pinned so the
    docstring stays truthful: (1) a quoted '>' INSIDE an attribute
    value ends the tag early for the regex (the stdlib twin parses it);
    (2) an UNCLOSED script leaks its body as text (the twin's CDATA
    mode skips to EOF). An unclosed comment turns out NOT to diverge —
    html.parser leaks its head as data exactly like the regex does —
    so that case pins the AGREEMENT. If a divergence case starts
    agreeing, the engine gained a real parser — update html_to_text's
    docstring and this test together."""
    import pyspark.sql.functions as F

    from lazy_frame_spark.operators import text as T

    cases = [
        '<div class="a>b">text</div>',
        "<script>var x = 1; broken page",
        "<!-- never closed text",
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(cases)], "i long, html string")
    got = {r["i"]: r["t"] for r in df.select(
        "i", T.html_to_text(F.col("html")).alias("t")).collect()}
    assert got[0] != _html_to_text_twin(cases[0])
    assert _html_to_text_twin(cases[0]) == "text"   # the twin is right
    assert got[1] != _html_to_text_twin(cases[1])
    assert "var x" in got[1]                         # body leaks as text
    assert got[2] == _html_to_text_twin(cases[2])    # both leak the head


# --------------------------------------------------------------------- #
# verified sample-infer CSV open vs a DuckDB read of the same file
# --------------------------------------------------------------------- #

_cell_kinds = st.sampled_from(["int", "float", "str", "empty"])


def _cell(kind: str, rng_val: int) -> str:
    if kind == "int":
        return str(rng_val - 500)
    if kind == "float":
        return f"{(rng_val - 500) / 8:.3f}"
    if kind == "str":
        return f"s{rng_val}"
    return ""


_col_plan = st.tuples(_cell_kinds, _cell_kinds, st.integers(0, 4))


@SETTINGS
@given(
    plans=st.lists(_col_plan, min_size=1, max_size=4),
    n_rows=st.integers(3, 60),
    flip_at=st.integers(0, 59),
    data=st.data(),
)
def test_verified_open_always_ends_correct(spark, tmp_path_factory,
                                           plans, n_rows, flip_at, data):
    """The verified-infer contract, fuzzed: columns whose cell KIND can
    flip mid-file (int→float, float→str, anything→empty...) at a row
    the head sample may or may not see. Whatever the sample concluded,
    the cached open must end with values equal to DuckDB's
    all-varchar read of the same file — either the sampled schema held
    (fast path) or the corrupt channel forced the full-infer fallback.
    Silent nulling is the failure mode this hunts. Two generator
    guards keep this about TYPE inference: no fully-blank line (Spark's
    CSV reader skips blank lines by standard-CSV semantics) and
    header=True passed explicitly (the auto-detect heuristic has no
    signal on all-string columns — the reference's own contract)."""
    import duckdb

    rows = []
    for i in range(n_rows):
        cells = []
        for a, b, salt in plans:
            kind = a if i < flip_at else b
            cells.append(_cell(kind, (i * 7 + salt * 13) % 1000))
        if all(c == "" for c in cells):
            cells[0] = f"s{i}"
        rows.append(",".join(cells))
    header = ",".join(f"c{j}" for j in range(len(plans)))
    p = tmp_path_factory.mktemp("fuzzcsv") / "f.csv"
    p.write_text(header + "\n" + "\n".join(rows) + "\n")

    from lazy_frame_spark import LazyFrame

    lf = LazyFrame.open(spark, str(p), format="csv", header=True)
    got = lf._with_ids().orderBy("__row_id__").drop("__row_id__") \
        .toPandas()
    want = duckdb.sql(
        f"SELECT * FROM read_csv('{p}', header=true, "
        "all_varchar=true, nullstr='')").df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        for i in range(len(got)):
            g, w = got[c].iloc[i], want[c].iloc[i]
            if g is None or (isinstance(g, float) and g != g):
                assert w is None or w != w or w is None, (c, i, g, w)
            elif w is None:
                raise AssertionError((c, i, g, w))
            else:
                # compare through the string domain: '12' == 12 == 12.0
                try:
                    assert float(g) == float(w), (c, i, g, w)
                except (TypeError, ValueError):
                    assert str(g) == str(w), (c, i, g, w)
    lf.close()


# --------------------------------------------------------------------- #
# sentence chunking vs a Python replay of the exact rule
# --------------------------------------------------------------------- #

def _brute_sentence_chunks(text, target):
    import re

    marked = re.sub(r"([.!?]+)\s+", "\\1\x01", text)
    sents = [s.strip() for s in marked.split("\x01") if s.strip()]
    out = {}
    before = 0
    for pos, s in enumerate(sents):
        n = len(re.split(r"\s+", s))
        b = before // target
        cnt, toks, parts = out.get(b, (0, 0, []))
        out[b] = (cnt + 1, toks + n, parts + [s])
        before += n
    return {b: (c, t, " ".join(parts)) for b, (c, t, parts) in out.items()}


_sent_piece = st.one_of(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
             min_size=1, max_size=6).map(" ".join),
    st.sampled_from([". ", "! ", "? ", "?! ", "... ", ".\n", "  "]),
)
_sent_doc = st.lists(_sent_piece, min_size=0, max_size=10).map("".join)


@SETTINGS
@given(texts=st.lists(_sent_doc, min_size=1, max_size=6),
       target=st.integers(2, 9))
def test_sentence_chunks_match_bruteforce(spark, texts, target):
    from lazy_frame_spark.operators.packing import sentence_chunks

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in sentence_chunks(df, target_tokens=target).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = (
            r["n_sentences"], r["n_tokens"], r["chunk_text"])
    for i, t in docs:
        want = _brute_sentence_chunks(t, target)
        assert got.get(i, {}) == want, (i, repr(t))


# --------------------------------------------------------------------- #
# round-9: comma-decimal CSV round-trip vs the written values
# --------------------------------------------------------------------- #

_dec_value = st.one_of(
    st.integers(-10**6, 10**6).map(float),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              allow_infinity=False).map(lambda x: round(x, 6)),
)


@SETTINGS
@given(vals=st.lists(_dec_value, min_size=1, max_size=30))
def test_decimal_comma_roundtrip_matches_written_values(
    spark, tmp_path_factory, vals
):
    """decimal=',': every double whose repr round-trips (≤6 dp here, so
    the DecimalType(38,18) quantization is lossless) must come back
    EXACTLY as written once the comma separator is swapped in — the
    locale read + cast-back chain loses nothing."""
    from lazy_frame_spark.sources.csv import open_csv

    # PLAIN notation only: locale DecimalFormat does not parse
    # exponent notation ("1e-05" -> NULL), a documented decimal=','
    # limit — comma-decimal files in the wild are plain-notation
    vals = [float(f"{v:.6f}") for v in vals]
    p = tmp_path_factory.mktemp("csv") / "fuzz_dec.csv"
    lines = ["id;val"] + [
        f"{i};{v:.6f}".replace(".", ",") for i, v in enumerate(vals)
    ]
    p.write_text("\n".join(lines) + "\n")
    df = open_csv(spark, str(p), sep=";", decimal=",",
                  infer_schema="sample")
    got = {r["id"]: r["val"] for r in df.collect()}
    for i, v in enumerate(vals):
        assert got[i] == v, (i, v, got[i])


# --------------------------------------------------------------------- #
# round-9: rate-table join path ≡ when-chain path on random mixes
# --------------------------------------------------------------------- #

@SETTINGS
@given(
    rates=st.dictionaries(
        st.integers(0, 25).map(str), st.integers(0, 10_000),
        min_size=0, max_size=12,
    ),
    default_bp=st.integers(0, 10_000),
    seed=st.integers(0, 99),
)
def test_sample_by_rates_paths_equivalent_fuzz(spark, rates, default_bp,
                                               seed):
    """Membership parity between the literal when-chain and the
    broadcast rate-table join on random mappings, defaults and seeds —
    including NULL domains and domains absent from the mapping."""
    import pyspark.sql.functions as F

    from lazy_frame_spark.operators import mixing as mx

    d = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 11 == 0, F.lit(None).cast("string"))
        .otherwise((F.col("id") % 30).cast("string")).alias("dom"),
    )
    chain = {r["doc_id"] for r in mx.sample_by_rates(
        d, "dom", rates, ["doc_id"], seed=seed,
        default_bp=default_bp).collect()}
    orig = mx.WHEN_CHAIN_MAX_DOMAINS
    try:
        mx.WHEN_CHAIN_MAX_DOMAINS = -1  # force the join path
        joined = {r["doc_id"] for r in mx.sample_by_rates(
            d, "dom", rates, ["doc_id"], seed=seed,
            default_bp=default_bp).collect()}
    finally:
        mx.WHEN_CHAIN_MAX_DOMAINS = orig
    assert chain == joined


# --------------------------------------------------------------------- #
# round-9: token-budget capping vs brute force (and pre_cut equivalence)
# --------------------------------------------------------------------- #

@SETTINGS
@given(
    tokens=st.lists(st.integers(0, 40), min_size=0, max_size=40),
    budget=st.integers(0, 200),
)
def test_cap_tokens_per_group_matches_bruteforce(spark, tokens, budget):
    """The deterministic prefix rule replayed in Python, against BOTH
    the pre-cut two-level plan and the plain single-window one — the
    earliest-dropped-order repair must make them identical on every
    input (the naive local-cumsum pre-cut alone is NOT equivalent:
    dropped rows deflate later survivors' sums)."""
    from lazy_frame_spark.operators.mixing import cap_tokens_per_group

    # group 'None' (a NULL key — Window.partitionBy groups NULLs
    # together, and the boundary join must match them NULL-safely) and
    # every 7th token NULL (rides free — coalesced to 0)
    rows = [(i, None if i % 3 == 2 else f"g{i % 3}",
             None if i % 7 == 6 else t) for i, t in enumerate(tokens)]
    want = set()
    run = {}
    for i, g, t in rows:  # ascending i == the order_by
        run[g] = run.get(g, 0) + (t or 0)
        if run[g] <= budget:
            want.add(i)
    if not rows:
        return
    # spread rows over several partitions so the local pre-cut is real
    df = spark.createDataFrame(rows, "doc_id long, dom string, tok long")
    df = df.repartition(4)
    for pre_cut in (True, False):
        got = {r["doc_id"] for r in cap_tokens_per_group(
            df, ["dom"], budget, "tok", ["doc_id"], pre_cut=pre_cut
        ).collect()}
        assert got == want, (pre_cut, budget, tokens)


@SETTINGS
@given(
    mods=st.integers(3, 17),
    split=st.integers(2, 4),
)
def test_dedup_against_matches_bruteforce(spark, mods, split):
    """Incremental exact dedup replayed in Python: drop new rows whose
    content exists in the snapshot, then first-winner within the
    batch."""
    from lazy_frame_spark.operators.dedup import dedup_against

    # every 11th content NULL: the NULL-safe anti join must treat a
    # NULL batch key as matching a NULL snapshot key
    rows = [(i, None if i % 11 == 10 else f"c{i % mods}")
            for i in range(40)]
    seen_rows = [r for r in rows if r[0] % split == 0]
    new_rows = [r for r in rows if r[0] % split != 0]
    seen_contents = {c for _, c in seen_rows}  # may include None
    want, first = set(), {}
    for i, c in new_rows:  # ascending id = the min-winner order
        if c in seen_contents:
            continue
        if c not in first:
            first[c] = i
            want.add(i)
    df = spark.createDataFrame(rows, "doc_id long, content string")
    got = {r["doc_id"] for r in dedup_against(
        df.filter(f"doc_id % {split} != 0"),
        df.filter(f"doc_id % {split} = 0"),
        ["content"],
    ).collect()}
    assert got == want, (mods, split)


def test_dedup_against_null_content_normalize(spark):
    """normalize=True hashes NULL text to a NULL key; the NULL-safe
    anti join must still match it against a NULL snapshot key (a plain
    equi-join let such rows bypass the snapshot — round-9 review)."""
    from lazy_frame_spark.operators.dedup import dedup_against

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "doc_id long, content string")
    seen = spark.createDataFrame([(0, None)], "doc_id long, content string")
    got = {r["doc_id"] for r in dedup_against(
        df, seen, ["content"], normalize=True).collect()}
    assert got == {3}


@given(
    vecs=st.lists(
        st.tuples(
            st.floats(-1, 1, allow_nan=False, width=32),
            st.floats(-1, 1, allow_nan=False, width=32),
            st.floats(-1, 1, allow_nan=False, width=32),
        ).filter(lambda t: any(abs(x) > 1e-3 for x in t)),
        min_size=2, max_size=24,
    ),
    threshold=st.sampled_from([0.5, 0.8, 0.95]),
)
@SETTINGS
def test_semantic_dedup_matches_bruteforce(spark, vecs, threshold):
    """semantic_dedup against an independent Python model of the rule:
    assign each vector to its argmax-cosine cell (first max), drop any
    vector with a lower-id cell-mate at round(cos,4) >= threshold."""
    import math as m

    from lazy_frame_spark.operators import similarity as sim

    rows = [(i, [float(a), float(b), float(c)])
            for i, (a, b, c) in enumerate(vecs)]
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    idx = sim.IVFIndex(cents)

    def cos(a, b):
        da = m.sqrt(sum(x * x for x in a))
        db = m.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (da * db)

    cells = {
        i: max(range(3), key=lambda c: (cos(v, cents[c]), -c))
        for i, v in rows
    }
    doomed = {
        i for i, v in rows
        if any(j < i and cells[j] == cells[i]
               and round(cos(rows[j][1], v), 4) >= threshold
               for j, _ in rows)
    }
    want = sorted(i for i, _ in rows if i not in doomed)

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(
        r["vec_id"]
        for r in sim.semantic_dedup(df, n_cells=3, threshold=threshold,
                                    index=idx).collect()
    )
    assert got == want
