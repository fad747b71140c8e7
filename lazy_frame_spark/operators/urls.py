"""URL canonicalization + canonical-URL dedup — the first dedup pass a
web-scale corpus runs (CommonCrawl-style pipelines drop ~40-50% of raw
fetches on canonical-URL identity before any content hashing).

Everything is pure Catalyst string/array expressions (codegen, no
Python, no UDF), so canonicalization is a map-only pass and the dedup
is one hash aggregation on the canonical key — the cheapest possible
shuffle shape at any scale.

Canonical form (the common-denominator rules search and crawl stacks
agree on):

- scheme and host lowercased;
- default ports stripped (``:80`` for http, ``:443`` for https);
- fragment removed;
- percent-encoding normalized per RFC 3986 §6.2.2: escapes of
  UNRESERVED characters (ALPHA / DIGIT / ``-._~``) are decoded
  (``%7E`` → ``~``, ``%41`` → ``A``), every surviving escape's hex is
  uppercased (``%2f`` → ``%2F``); malformed escapes (``%zz``, ``%4``)
  pass through untouched. In the HOST component decoded letters land
  lowercase (hosts are case-insensitive: ``%41`` → ``a``, not ``A``);
  path/query decodes keep case. ``%25`` is never decoded, and an
  escape directly after an INCOMPLETE escape (``%4%31``) is kept
  rather than decoded (decoding ``%31`` → ``1`` there would
  synthesize a brand-new ``%41``), so normalization can't create new
  escapes — the pass is idempotent by construction;
- tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``ref`` by default — override with ``drop_params``);
- duplicate query parameters collapsed KEEP-FIRST by name (the
  dominant convention: a repeated ``?a=1&a=2`` serves the first value
  in most frameworks; name = text before the first ``=``, so a bare
  flag ``a`` and ``a=1`` share a name);
- remaining query parameters sorted bytewise;
- empty path normalized to ``/``, non-root trailing slashes (the whole run — one-at-a-time stripping breaks idempotence on '//') stripped;
- optional ``www.`` prefix strip — the whole leading run, only when a
  domain character follows (single-prefix stripping breaks idempotence
  on ``www.www.x``) (on by default — the standard crawl
  aggressiveness; disable for origin-sensitive use).

NOT normalized (documented gaps): IDN hosts (punycode ``xn--`` vs
Unicode forms don't unify — needs the punycode algorithm, out of scope
for a pure-Catalyst pass) and dot-segment removal (``/a/../b``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DROP_PARAMS: tuple[str, ...] = ("utm_[^=]*", "fbclid", "gclid", "ref")


def _pct_normalize(s: Column, lower_decoded: bool = False) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization as pure Catalyst:
    tokenize on a lookahead split (each token after the first starts
    with a well-formed ``%XX`` escape), then per token either decode
    (escape of an unreserved character) or uppercase the hex. Decoded
    characters are never URL delimiters (``/?#&=%`` are all reserved),
    so running this BEFORE host/path/query splitting cannot move
    component boundaries.

    Idempotence needs one extra rule: a decode is SUPPRESSED (escape
    kept, hex uppercased) when the PREVIOUS token's tail ends in an
    incomplete escape (``%`` or ``%h``) — otherwise decoding an escape
    whose value is a hex character would synthesize a NEW well-formed
    escape that the next pass decodes (``%4`` + ``%31``→``1`` =
    ``%41`` → ``A``), drifting dedup keys across pipeline stages.
    Token tails are never rewritten (only leading escapes are), so the
    suppression decision is identical on every re-run and the pass is
    closed under re-application. Suppression can only ever fire on
    already-malformed inputs — a well-formed escape stream has no
    incomplete-escape tails.

    Two-stage fast path: rows without a ``%`` (the overwhelming
    majority of a web corpus) fail the cheap ``contains`` and skip
    everything; rows whose ``%`` never forms a well-formed escape
    (literal percents, lone malformed escapes) fail the rlike and skip
    the tokenizer too — codegen short-circuits ``&&`` per row, so the
    regex only runs on %-bearing rows and the tokenizer only on rows
    with at least one decodable-or-uppercasable escape.

    ``lower_decoded`` lowercases the DECODED character — required for
    the case-insensitive host component, which is lowercased before
    this pass runs: without it ``%41`` decodes to ``A`` AFTER the
    lower() already happened, and the second canonicalization pass
    lowercases it to ``a`` — an idempotence break the hypothesis fuzz
    caught on ``http://a=1%41/...``. Path/query decodes keep case
    (those components are case-sensitive)."""
    toks = F.split(s, r"(?=%[0-9A-Fa-f]{2})")

    def fix(t: Column, prev: Column) -> Column:
        is_esc = t.rlike(r"^%[0-9A-Fa-f]{2}")
        hex2 = F.upper(F.substring(t, 2, 2))
        code = F.conv(hex2, 16, 10).cast("int")
        unreserved = (
            ((code >= 65) & (code <= 90))        # A-Z
            | ((code >= 97) & (code <= 122))     # a-z
            | ((code >= 48) & (code <= 57))      # 0-9
            | code.isin(45, 46, 95, 126)         # - . _ ~
        )
        # the idempotence guard: previous token ends mid-escape, so a
        # decoded hex char would complete it into a new escape
        blocked = F.coalesce(prev, F.lit("")).rlike(r"%[0-9A-Fa-f]?$")
        rest = F.substring(t, 4, 2147483647)
        decoded = F.lower(F.char(code)) if lower_decoded else F.char(code)
        return (
            F.when(is_esc & unreserved & ~blocked, F.concat(decoded, rest))
            .when(is_esc, F.concat(F.lit("%"), hex2, rest))
            .otherwise(t)
        )

    fixed = F.transform(toks, lambda t, i: fix(t, F.get(toks, i - 1)))
    return (
        F.when(
            s.contains("%") & s.rlike(r"%[0-9A-Fa-f]{2}"),
            F.array_join(fixed, ""),
        )
        .otherwise(s)
    )


def _clean_params(query: Column, drop_re: str) -> Column:
    """Split a (percent-normalized) query string into params, drop
    empties and tracking params, collapse duplicates KEEP-FIRST by
    name, sort bytewise. The keep-first fold is a linear ``aggregate``
    over the param array — O(n²) array_contains on the seen-names list,
    but n is query-param count (single digits), not data size."""
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(drop_re),
    )
    init = F.struct(
        F.array().cast("array<string>").alias("kept"),
        F.array().cast("array<string>").alias("seen"),
    )

    def step(acc: Column, p: Column) -> Column:
        name = F.substring_index(p, "=", 1)
        return (
            F.when(F.array_contains(acc["seen"], name), acc)
            .otherwise(F.struct(
                F.concat(acc["kept"], F.array(p)).alias("kept"),
                F.concat(acc["seen"], F.array(name)).alias("seen"),
            ))
        )

    return F.array_sort(F.aggregate(params, init, step, lambda a: a["kept"]))


#: staged intermediate names used by with_canonical_url — input frames
#: must not already carry these (checked up front)
_TMP_COLS: tuple[str, ...] = (
    "__scheme__", "__nofrag__", "__hostport0__", "__rawtail__",
    "__hostport__", "__tail__", "__path0__", "__query__",
    "__host__", "__path__", "__qs__",
)


def canonicalize_url(
    url: Column,
    drop_params: Sequence[str] = DEFAULT_DROP_PARAMS,
    strip_www: bool = True,
) -> Column:
    """Canonical form of ``url`` as a single Catalyst expression tree.
    Unparseable values (no ``scheme://``) canonicalize to NULL so they
    never collide with each other in a dedup groupBy."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    nofrag = F.regexp_replace(rest, r"#.*$", "")
    # percent-normalize AFTER lowercasing but BEFORE port/www stripping:
    # lowercase first so surviving escapes end uppercase-hex (idempotent
    # under a re-run's lower()), decode before the strips so an escaped
    # 'www.'/':80' ('%77ww.', ':%38%30') can't reappear post-strip and
    # break idempotence; lower_decoded so '%41' lands as 'a', not an
    # 'A' that escaped the already-run lower()
    hostport = _pct_normalize(
        F.lower(F.regexp_extract(nofrag, r"^([^/?]*)", 1)), lower_decoded=True
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r"(:80)+$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r"(:443)+$", ""))
        .otherwise(hostport)
    )
    if strip_www:
        host = F.regexp_replace(host, r"^(www\.)+(.)", "$2")
    # percent-normalize path+query as ONE string (everything after the
    # hostport, '?' included) and split afterwards: normalization never
    # creates, removes, or decodes a '?' ('?' is reserved, code 63), so
    # the path/query boundary is identical whether the components are
    # normalized jointly or separately — and the tokenizer runs once
    # per row instead of twice
    tail = _pct_normalize(F.regexp_extract(nofrag, r"^[^/?]*(.*)$", 1))
    path = F.regexp_replace(F.regexp_extract(tail, r"^([^?]*)", 1), r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(tail, r"\?(.*)$", 1)
    drop_re = "^(" + "|".join(drop_params) + ")="
    qs = F.array_join(_clean_params(query, drop_re), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(canon)


def with_canonical_url(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
    drop_params: Sequence[str] = DEFAULT_DROP_PARAMS,
    strip_www: bool = True,
) -> DataFrame:
    """``canonicalize_url`` as STAGED projections: each intermediate
    (scheme, defragmented rest, host, path, query) is computed once per
    row in its own projection instead of being re-inlined into every
    downstream use of the single-Column expression tree. CollapseProject
    keeps multi-use non-cheap expressions (the regexes) as-is, so the
    plan runs ~8 regex evaluations per row instead of ~20 — same
    result, measured ~5x faster on the bench corpus. Use this form for
    table-scale canonicalization; the Column form for ad-hoc
    expressions.

    A pre-existing ``out_col`` is overwritten (``withColumn``
    semantics — re-canonicalizing a frame that already carries the
    column must not fail or produce ambiguous duplicates); a collision
    with one of the staged temp names raises up front with the name."""
    clash = sorted(set(df.columns) & set(_TMP_COLS))
    if clash:
        raise ValueError(
            f"with_canonical_url: input columns {clash} collide with "
            "staged temp names — rename them before canonicalizing"
        )
    if out_col == url_col:
        raise ValueError(
            "with_canonical_url: out_col == url_col would overwrite the "
            "input URLs mid-plan — pick a distinct output name"
        )
    if out_col in df.columns:
        df = df.drop(out_col)
    url = F.col(url_col)
    passthru = [F.col(c) for c in df.columns]
    s1 = df.select(
        *passthru,
        F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
        .alias("__scheme__"),
        F.regexp_replace(
            F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1),
            r"#.*$", "",
        ).alias("__nofrag__"),
    )
    # raw component extraction gets its OWN projection: _pct_normalize
    # references its argument several times (fast-path gates, tokenizer,
    # fallback), so wrapping the regexp_extract directly would re-inline
    # the regex per reference. Staged, each reference is a cheap
    # attribute ref. Path+query normalize as ONE string (the tail after
    # the hostport, '?' included — normalization never creates, removes,
    # or decodes '?', so the later split lands on the same boundary) so
    # the tokenizer runs at most once per row on the dominant component.
    s2 = s1.select(
        *passthru, "__scheme__",
        F.lower(F.regexp_extract(F.col("__nofrag__"), r"^([^/?]*)", 1))
        .alias("__hostport0__"),
        F.regexp_extract(F.col("__nofrag__"), r"^[^/?]*(.*)$", 1)
        .alias("__rawtail__"),
    )
    # same ordering contract as the Column form: lower, then
    # percent-normalize (host decodes lowercase), THEN (next stage)
    # port/www strips
    s2 = s2.select(
        *passthru, "__scheme__",
        _pct_normalize(F.col("__hostport0__"), lower_decoded=True)
        .alias("__hostport__"),
        _pct_normalize(F.col("__rawtail__")).alias("__tail__"),
    )
    s2 = s2.select(
        *passthru, "__scheme__", "__hostport__",
        F.regexp_replace(
            F.regexp_extract(F.col("__tail__"), r"^([^?]*)", 1), r"/+$", ""
        ).alias("__path0__"),
        F.regexp_extract(F.col("__tail__"), r"\?(.*)$", 1).alias("__query__"),
    )
    host = (
        F.when(F.col("__scheme__") == "http",
               F.regexp_replace(F.col("__hostport__"), r"(:80)+$", ""))
        .when(F.col("__scheme__") == "https",
              F.regexp_replace(F.col("__hostport__"), r"(:443)+$", ""))
        .otherwise(F.col("__hostport__"))
    )
    if strip_www:
        host = F.regexp_replace(host, r"^(www\.)+(.)", "$2")
    drop_re = "^(" + "|".join(drop_params) + ")="
    s3 = s2.select(
        *passthru, "__scheme__",
        host.alias("__host__"),
        F.when(F.col("__path0__") == "", F.lit("/"))
        .otherwise(F.col("__path0__")).alias("__path__"),
        F.array_join(
            _clean_params(F.col("__query__"), drop_re), "&"
        ).alias("__qs__"),
    )
    canon = F.concat(
        F.col("__scheme__"), F.lit("://"), F.col("__host__"), F.col("__path__"),
        F.when(F.col("__qs__") != "", F.concat(F.lit("?"), F.col("__qs__")))
        .otherwise(F.lit("")),
    )
    return s3.select(
        *passthru,
        F.when(F.col("__scheme__") == "", F.lit(None).cast("string"))
        .otherwise(canon).alias(out_col),
    )


def dedup_canonical_url(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    drop_params: Sequence[str] = DEFAULT_DROP_PARAMS,
    strip_www: bool = True,
) -> DataFrame:
    """One winner per canonical URL — the smallest ``id_col`` value
    (first occurrence under an ingest-ordered id), same
    first-wins convention as the content-dedup family
    (operators/dedup.py). NULL canonicals (unparseable URLs) are all
    kept: an unparseable URL is not evidence of duplication.

    Plan shape: map-only canonicalization, ONE hash aggregation on the
    canonical key (partial agg map-side), no joins — at 100 TB this is
    strictly cheaper than any content-based pass and runs first."""
    keyed = with_canonical_url(
        df.select(id_col, url_col), url_col, "__canon__", drop_params, strip_www
    )
    # unparseable URLs (NULL canonical) each form their OWN group via a
    # per-row secondary key: they come back as n_dupes=1 singletons
    # with canonical_url NULL. Deliberately NOT a filter — any
    # deterministic predicate on the canonical would be pushed below
    # the projections to the scan, re-evaluating the whole inlined
    # canonicalization per row (~3x the regex work, measured).
    solo = (
        F.when(F.col("__canon__").isNull(), F.col(id_col))
        .otherwise(F.lit(None).cast("long"))
    )
    winners = keyed.groupBy(
        F.col("__canon__"), solo.alias("__solo__")
    ).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_dupes"),
    )
    return winners.select(
        F.col("__canon__").alias("canonical_url"),
        "keep_id",
        "n_dupes",
    )
