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
- tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``ref`` by default — override with ``drop_params``);
- remaining query parameters sorted bytewise;
- empty path normalized to ``/``, non-root trailing slashes (the whole run — one-at-a-time stripping breaks idempotence on '//') stripped;
- optional ``www.`` prefix strip — the whole leading run, only when a
  domain character follows (single-prefix stripping breaks idempotence
  on ``www.www.x``) (on by default — the standard crawl
  aggressiveness; disable for origin-sensitive use).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DROP_PARAMS: tuple[str, ...] = ("utm_[^=]*", "fbclid", "gclid", "ref")


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
    hostport = F.lower(F.regexp_extract(nofrag, r"^([^/?]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r"(:80)+$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r"(:443)+$", ""))
        .otherwise(hostport)
    )
    if strip_www:
        host = F.regexp_replace(host, r"^(www\.)+(.)", "$2")
    path = F.regexp_extract(nofrag, r"^[^/?]*([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    drop_re = "^(" + "|".join(drop_params) + ")="
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(drop_re),
        )
    )
    qs = F.array_join(params, "&")
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
    expressions."""
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
    s2 = s1.select(
        *passthru, "__scheme__",
        F.lower(F.regexp_extract(F.col("__nofrag__"), r"^([^/?]*)", 1))
        .alias("__hostport__"),
        F.regexp_replace(
            F.regexp_extract(F.col("__nofrag__"), r"^[^/?]*([^?]*)", 1),
            r"/+$", "",
        ).alias("__path0__"),
        F.regexp_extract(F.col("__nofrag__"), r"\?(.*)$", 1).alias("__query__"),
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
            F.array_sort(F.filter(
                F.split(F.col("__query__"), "&"),
                lambda p: (p != "") & ~p.rlike(drop_re),
            )),
            "&",
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
