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
- dot segments removed per RFC 3986 §5.2.4 (``/a/./b`` → ``/a/b``,
  ``/a/b/../c`` → ``/a/c``, ``..`` never climbs above the root; runs
  after percent-normalization so ``/%2E%2E/`` is caught);
- empty path normalized to ``/``, non-root trailing slashes (the whole run — one-at-a-time stripping breaks idempotence on '//') stripped;
- optional ``www.`` prefix strip — the whole leading run, only when a
  domain character follows (single-prefix stripping breaks idempotence
  on ``www.www.x``) (on by default — the standard crawl
  aggressiveness; disable for origin-sensitive use).

NOT normalized inline: IDN hosts (punycode ``xn--`` vs Unicode forms —
IDNA needs the nameprep tables, which no Catalyst expression carries).
``with_idn_hosts`` closes the gap as an OPT-IN Arrow-batched pre-pass:
run it before ``dedup_canonical_url`` on corpora that carry
internationalized hostnames; it is idempotent, so chaining is safe.
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
    toks = F.split(s, _ESC_LOOKAHEAD)
    fixed = _fix_tokens(toks, lower_decoded)
    return (
        F.when(
            s.contains("%") & s.rlike(_ESC_RE),
            F.array_join(fixed, ""),
        )
        .otherwise(s)
    )


#: a well-formed escape, and the lookahead split that tokenizes on them
_ESC_RE = r"%[0-9A-Fa-f]{2}"
_ESC_LOOKAHEAD = r"(?=%[0-9A-Fa-f]{2})"
_HEX_CHARS = list("0123456789abcdefABCDEF")


def _fix_tokens(toks: Column, lower_decoded: bool = False) -> Column:
    """Per-token escape normalization over a lookahead-split token
    array (see ``_pct_normalize`` for the rules). Regex-free in the
    per-token hot path: every token AFTER the first starts with a
    well-formed escape BY CONSTRUCTION of the split, so ``is_esc`` only
    needs a real check on the first token (identified by its ''
    predecessor — lookahead splitting never yields empty tokens), and
    the idempotence guard tests the predecessor's last two characters
    with substring/isin instead of an rlike.

    Tokens pair with their predecessor via a SHIFTED copy ('' then
    toks) — zip_with's trailing unmatched pair maps (NULL, last) ->
    NULL, which array_join drops. NOT F.get(toks, i-1) inside a
    transform lambda: re-referencing toks per ELEMENT re-embeds (and
    re-evaluates) the split regex once per token — O(tokens^2) splits
    per row, a measured 2x bench regression. For the cheapest plans,
    stage ``toks`` as its own projection column first (the staged
    canonicalizer does) so the two array references here are attribute
    reads, not recomputed splits."""

    def fix(t: Column, prev: Column) -> Column:
        p = F.coalesce(prev, F.lit(""))
        first = p == ""
        is_esc = F.when(first, t.rlike("^" + _ESC_RE)).otherwise(F.lit(True))
        hex2 = F.upper(F.substring(t, 2, 2))
        code = F.conv(hex2, 16, 10).cast("int")
        unreserved = (
            ((code >= 65) & (code <= 90))        # A-Z
            | ((code >= 97) & (code <= 122))     # a-z
            | ((code >= 48) & (code <= 57))      # 0-9
            | code.isin(45, 46, 95, 126)         # - . _ ~
        )
        # the idempotence guard: previous token ends mid-escape ('%' or
        # '%h'), so a decoded hex char would complete a new escape
        last1 = F.substring(p, -1, 1)
        blocked = (last1 == "%") | (
            (F.substring(p, -2, 1) == "%") & last1.isin(_HEX_CHARS)
        )
        rest = F.substring(t, 4, 2147483647)
        decoded = F.lower(F.char(code)) if lower_decoded else F.char(code)
        return (
            F.when(is_esc & unreserved & ~blocked, F.concat(decoded, rest))
            .when(is_esc, F.concat(F.lit("%"), hex2, rest))
            .otherwise(t)
        )

    return F.zip_with(
        toks, F.concat(F.array(F.lit("")), toks), lambda t, p: fix(t, p)
    )


def _remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 remove_dot_segments over an ABSOLUTE path (ours
    always start with '/' or are empty): fold the '/'-split segments —
    '.' skips, '..' pops the last pushed segment (never the leading ''
    root marker), everything else pushes. Runs AFTER percent
    normalization (``%2E`` is an unreserved escape and decodes to '.',
    so a pre-normalization pass would miss '/%2E%2E/'), which also
    makes it idempotent: the output contains no dot segments for a
    second pass to find. Rows without a '/.' substring skip the fold
    entirely (dotfile paths like '/.well-known' pass the gate but fold
    to themselves — only exact '.'/'..' segments are special)."""
    segs = F.split(path, "/")

    def step(acc: Column, s: Column) -> Column:
        return (
            F.when(s == ".", acc)
            .when((s == "..") & (F.size(acc) > 1),
                  F.slice(acc, 1, F.size(acc) - 1))
            .when(s == "..", acc)
            .otherwise(F.concat(acc, F.array(s)))
        )

    folded = F.aggregate(segs, F.array().cast("array<string>"), step)
    return (
        F.when(path.contains("/."), F.array_join(folded, "/"))
        .otherwise(path)
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
    "__sep__", "__rawscheme__", "__rest__", "__scheme__", "__nofrag__",
    "__rawhp__", "__hostport0__", "__hostport__", "__tail__",
    "__tailtoks__", "__ntail__", "__host__", "__pathq__", "__path0__",
    "__query__", "__path__", "__params__", "__pnames__", "__qs__",
)


def canonicalize_url(
    url: Column,
    drop_params: Sequence[str] = DEFAULT_DROP_PARAMS,
    strip_www: bool = True,
) -> Column:
    """Canonical form of ``url`` as a single Catalyst expression tree,
    built on the same string-scan primitives as the staged form (plain
    Java-regex component extraction diverges from scans on corner
    inputs — '$' matches before a FINAL newline, '.' won't cross one —
    so sharing primitives is what keeps the two forms byte-identical).
    Unparseable values (no ``scheme://``) canonicalize to NULL so they
    never collide with each other in a dedup groupBy."""
    big = F.lit(2147483647)
    sep = F.locate("://", url)
    rawscheme = F.substring(url, 1, sep - 1)
    # \z, not $: Java's $ also matches before a string-FINAL newline,
    # which would bless 'http\n' as a scheme
    scheme = F.when(
        (sep > 0) & rawscheme.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*\z"),
        F.lower(rawscheme),
    ).otherwise(F.lit(""))
    rest = F.when(sep > 0, F.substring(url, sep + 3, big)).otherwise(F.lit(""))
    nofrag = F.substring_index(rest, "#", 1)
    rawhp = F.substring_index(F.substring_index(nofrag, "/", 1), "?", 1)
    # percent-normalize AFTER lowercasing but BEFORE port/www stripping:
    # lowercase first so surviving escapes end uppercase-hex (idempotent
    # under a re-run's lower()), decode before the strips so an escaped
    # 'www.'/':80' ('%77ww.', ':%38%30') can't reappear post-strip and
    # break idempotence; lower_decoded so '%41' lands as 'a', not an
    # 'A' that escaped the already-run lower()
    hostport = _pct_normalize(F.lower(rawhp), lower_decoded=True)
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
    # per row instead of twice. The tail is sliced off by RAW length
    # (lower() can change length on exotic unicode).
    tail = _pct_normalize(F.substring(nofrag, F.length(rawhp) + 1, big))
    pathq = F.substring_index(tail, "?", 1)
    path = F.rtrim(_remove_dot_segments(pathq), F.lit("/"))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    drop_re = "^(" + "|".join(drop_params) + ")="
    query = F.when(
        F.length(tail) > F.length(pathq),
        F.substring(tail, F.length(pathq) + 2, big),
    ).otherwise(F.lit(""))
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
    """``canonicalize_url`` as STAGED projections, rebuilt for the hot
    path: every component boundary is found with plain string scans
    (``locate``/``substring_index``/``substring``/``trim``) instead of
    regexes — the only per-row regex work left is the scheme-charset
    validation, the (:port)+/(www.)+ strips on the SHORT host string,
    the tracking-param test, and (on rows that actually carry a
    well-formed escape) the tokenizer split, which is staged as its own
    array column so the zip_with reads an attribute instead of
    re-splitting. Duplicate-param keep-first runs as an indexed
    ``filter`` over staged param/name arrays (no per-step struct
    allocation). Byte-identical to the Column form (pinned by tests +
    hypothesis fuzz + the DuckDB oracle); measured ~3x cheaper than the
    regex-staged round-6 pipeline on the bench corpus. Use this form
    for table-scale canonicalization; the Column form for ad-hoc
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
    big = F.lit(2147483647)

    # '://' located once; the scheme's charset is the one regex the
    # common row still pays (on the SHORT scheme substring)
    s = df.select(*passthru, F.locate("://", url).alias("__sep__"))
    s = s.select(
        *passthru, "__sep__",
        F.substring(url, 1, F.col("__sep__") - 1).alias("__rawscheme__"),
        F.when(F.col("__sep__") > 0,
               F.substring(url, F.col("__sep__") + 3, big))
        .otherwise(F.lit("")).alias("__rest__"),
    )
    s = s.select(
        *passthru,
        F.when(
            (F.col("__sep__") > 0)
            & F.col("__rawscheme__").rlike(r"^[A-Za-z][A-Za-z0-9+.-]*\z"),
            F.lower(F.col("__rawscheme__")),
        ).otherwise(F.lit("")).alias("__scheme__"),
        F.substring_index(F.col("__rest__"), "#", 1).alias("__nofrag__"),
    )
    # hostport = nofrag up to the first '/' or '?'; the tail is sliced
    # off by RAW length (lower() can change length on exotic unicode,
    # so measure before lowercasing)
    s = s.select(
        *passthru, "__scheme__", "__nofrag__",
        F.substring_index(
            F.substring_index(F.col("__nofrag__"), "/", 1), "?", 1
        ).alias("__rawhp__"),
    )
    s = s.select(
        *passthru, "__scheme__",
        F.lower(F.col("__rawhp__")).alias("__hostport0__"),
        F.substring(F.col("__nofrag__"),
                    F.length("__rawhp__") + 1, big).alias("__tail__"),
    )
    # percent-normalization: host via the Column helper (attribute-ref
    # argument, and real hosts essentially never carry escapes so every
    # reference hits the fast path); the tail's token array STAGED so
    # the zip_with reads it twice for free. Path+query normalize as ONE
    # string ('?' included — normalization never creates, removes, or
    # decodes '?', so the later split lands on the same boundary).
    s = s.select(
        *passthru, "__scheme__", "__tail__",
        _pct_normalize(F.col("__hostport0__"), lower_decoded=True)
        .alias("__hostport__"),
        F.when(
            F.col("__tail__").contains("%") & F.col("__tail__").rlike(_ESC_RE),
            F.split(F.col("__tail__"), _ESC_LOOKAHEAD),
        ).alias("__tailtoks__"),
    )
    s = s.select(
        *passthru, "__scheme__", "__hostport__",
        F.when(F.col("__tailtoks__").isNull(), F.col("__tail__"))
        .otherwise(F.array_join(_fix_tokens(F.col("__tailtoks__")), ""))
        .alias("__ntail__"),
    )
    s = s.select(
        *passthru, "__scheme__", "__hostport__", "__ntail__",
        F.substring_index(F.col("__ntail__"), "?", 1).alias("__pathq__"),
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
    s = s.select(
        *passthru, "__scheme__",
        host.alias("__host__"),
        F.rtrim(_remove_dot_segments(F.col("__pathq__")), F.lit("/"))
        .alias("__path0__"),
        F.when(
            F.length("__ntail__") > F.length("__pathq__"),
            F.substring(F.col("__ntail__"), F.length("__pathq__") + 2, big),
        ).otherwise(F.lit("")).alias("__query__"),
    )
    drop_re = "^(" + "|".join(drop_params) + ")="
    s = s.select(
        *passthru, "__scheme__", "__host__", "__path0__",
        F.filter(
            F.split(F.col("__query__"), "&"),
            lambda p: (p != "") & ~p.rlike(drop_re),
        ).alias("__params__"),
    )
    s = s.select(
        *passthru, "__scheme__", "__host__", "__path0__", "__params__",
        F.transform(
            F.col("__params__"), lambda p: F.substring_index(p, "=", 1)
        ).alias("__pnames__"),
    )
    # keep-first by name as an indexed filter over the STAGED arrays:
    # param i survives iff its name is absent from the first i names —
    # same result as _clean_params' fold, none of its per-step
    # struct/array allocation
    s = s.select(
        *passthru, "__scheme__", "__host__",
        F.when(F.col("__path0__") == "", F.lit("/"))
        .otherwise(F.col("__path0__")).alias("__path__"),
        F.array_join(
            F.array_sort(F.filter(
                F.col("__params__"),
                lambda p, i: F.array_position(
                    F.slice(F.col("__pnames__"), 1, i),
                    F.substring_index(p, "=", 1),
                ) == 0,
            )),
            "&",
        ).alias("__qs__"),
    )
    canon = F.concat(
        F.col("__scheme__"), F.lit("://"), F.col("__host__"), F.col("__path__"),
        F.when(F.col("__qs__") != "", F.concat(F.lit("?"), F.col("__qs__")))
        .otherwise(F.lit("")),
    )
    return s.select(
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
    strictly cheaper than any content-based pass and runs first. The
    canonicalization is compute-bound per row, so a LOW-SPLIT source
    (single-file scan, gzip) first fans out across the session's cores
    (plans/parallel.fan_out — a no-op on well-split sources, which is
    what a 100 TB corpus is)."""
    from lazy_frame_spark.plans.parallel import fan_out

    keyed = with_canonical_url(
        fan_out(df.select(id_col, url_col)),
        url_col, "__canon__", drop_params, strip_www,
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


# --------------------------------------------------------------------- #
# IDN (internationalized hostname) unification — opt-in Arrow pass
# --------------------------------------------------------------------- #

def _idn_fold(hp: str) -> str:
    """Fold ONE hostport to its IDNA/punycode ASCII form (RFC 3490 via
    the stdlib 'idna' codec: nameprep case-fold + per-label xn--
    encoding). ASCII hosts return unchanged; hosts the codec rejects
    (empty labels, over-long labels) pass through untouched — an
    unencodable host is not evidence about its duplicates."""
    if hp is None or all(ord(c) < 128 for c in hp):
        return hp
    # authority may carry userinfo (user:pass@host:port) — split it off
    # FIRST, else 'user' would be mistaken for the host and the IDN
    # hostname would silently stay unfolded
    userinfo, at, hostport = hp.rpartition("@")
    host, sep, port = hostport.partition(":")
    try:
        return (
            userinfo + at + host.encode("idna").decode("ascii") + sep + port
        )
    except UnicodeError:
        return hp


def with_idn_hosts(
    df: DataFrame,
    url_col: str = "url",
    out_col: str | None = None,
) -> DataFrame:
    """Rewrite non-ASCII (internationalized) hostnames to their
    punycode form inside each URL — ``http://bücher.example/x`` and
    ``http://xn--bcher-kva.example/x`` then canonicalize to the SAME
    dedup key, closing the IDN gap ``canonicalize_url`` documents.

    OPT-IN and Arrow-batched on purpose: IDNA needs the nameprep
    tables, which no Catalyst expression carries, and a pandas UDF in
    the canonicalization hot path would tax the overwhelmingly-ASCII
    common case (Spark extracts pandas UDFs into an ArrowEvalPython
    node that runs for every row regardless of conditional gating). Run
    this pass BEFORE ``dedup_canonical_url`` on corpora that carry IDN
    hosts; the fold is idempotent (punycode input returns unchanged),
    so re-running is always safe. URLs without ``scheme://`` pass
    through untouched."""
    import pandas as pd

    out = out_col or url_col

    def fold_urls(urls: pd.Series) -> pd.Series:
        def one(u):
            if u is None:
                return u
            sep = u.find("://")
            if sep < 0:
                return u
            rest = u[sep + 3:]
            cut = len(rest)
            for ch in "/?#":
                p = rest.find(ch)
                if p >= 0:
                    cut = min(cut, p)
            return u[:sep + 3] + _idn_fold(rest[:cut]) + rest[cut:]
        return urls.map(one)

    fold_urls.__annotations__ = {"urls": pd.Series, "return": pd.Series}
    udf = F.pandas_udf("string")(fold_urls)
    return df.withColumn(out, udf(F.col(url_col)))
