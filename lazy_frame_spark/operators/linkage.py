"""Blocked fuzzy record linkage — approximate entity matching at scale.

Not in the reference (its only string op is exact strcmp compare,
``src/lazy.frame.c:377-406``); this is the classic data-integration /
training-data-curation primitive: find record pairs that refer to the
same entity despite typos or corruption.

Scale shape: the naive formulation is an all-pairs cross join with an
edit-distance predicate — quadratic, a non-starter at 100 TB. The
standard answer (Fellegi-Sunter style blocking) is what this module
implements:

1. BLOCK: each side computes one or more cheap deterministic blocking
   keys (a prefix, a length band, a phonetic code, a metadata column).
2. CANDIDATES: an EQUI-join on the block key — shuffle-hash/SMJ, linear
   in data size; the per-block candidate product is bounded by the
   block's cardinality, which the blocking-key design controls.
3. MATCH: ``levenshtein`` with an early-exit threshold (Spark's banded
   O(threshold·len) variant returns -1 once the distance provably
   exceeds the cap — the JVM never fills the full DP matrix) keeps the
   verify step cheap; it runs inside whole-stage codegen, no Python.

Single-pass blocking trades recall for cost (a pair split across blocks
is never compared); ``multi_pass_pairs`` runs several independent
blocking passes and unions the results — the published recipe for
recovering recall while staying linear.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_fuzzy_pairs", "multi_pass_pairs", "edit_distance_pairs"]

#: padding sentinels for positional q-grams (cannot occur in real text)
_PAD_L, _PAD_R = "\x01", "\x02"


def _padded_grams(text_col: str, q: int) -> F.Column:
    """All q-grams of the sentinel-padded string — SQL-rendered so the
    per-position substring stays one codegen'd expression. The column
    name is backtick-quoted so names with spaces/keywords resolve the
    same way the surrounding F.col() calls do."""
    c = "`" + text_col.replace("`", "``") + "`"
    return F.expr(
        f"transform(sequence(1, length({c}) + {q - 1}), "
        f"i -> substring(concat('{_PAD_L * (q - 1)}', {c}, "
        f"'{_PAD_R * (q - 1)}'), i, {q}))"
    )


def edit_distance_pairs(
    left: DataFrame,
    right: DataFrame,
    text: tuple[str, str],
    ids: tuple[str, str],
    max_distance: int = 1,
    q: int = 3,
    antisymmetric: bool = False,
    stats_out: dict | None = None,
) -> DataFrame:
    """EXACT edit-distance join: EVERY pair with
    ``levenshtein <= max_distance`` — 100% recall with no cross join,
    the guarantee ``blocked_fuzzy_pairs`` trades away. Candidate
    generation is q-gram PREFIX FILTERING (the ED-Join family — Xiao,
    Wang & Lin, VLDB 2008; public algorithm): one edit destroys at most
    ``q`` padded q-grams, so a pair within distance ``k`` shares a gram
    among each side's ``q*k + 1`` globally-RAREST grams — an equi-join
    on prefix grams finds every candidate, and rare-first ordering
    means hot grams (shared prefixes like 'Customer#') never enter the
    join. Verification is Spark's banded ``levenshtein(l, r, k)``
    (returns -1 past the cap in O(k*len), inside codegen).

    Exactness at every length: the prefix theorem needs the required
    overlap to be positive, which fails for strings of ``q*k`` chars or
    fewer — those route through a LENGTH-BAND equi-join instead (each
    short left row joins lengths ``len±k`` — 2k+1 exploded keys, still
    an equi-join; any pair within distance k has ``|len_a - len_b| <=
    k`` and its shorter member short, so the two paths together cover
    every true pair; union + distinct dedups the overlap). Recall is
    brute-force-pinned by a randomized test.

    Plan shape at 100 TB: gram frequencies are one partial-agg count;
    prefix selection is a per-id window over ≤ len+q-1 rows; the joins
    are equi-joins on gram / length. The quadratic risk lives only
    inside a single shared RARE gram — bounded by construction (a gram
    in the prefix of many strings is by definition frequent and gets
    ordered out of prefixes).

    ``text``/``ids`` name the (left, right) columns; all four must be
    distinct, and ids must be UNIQUE within their side (a repeated id
    with different texts interleaves both texts' grams in one prefix
    window — dedupe or disambiguate ids first). ``antisymmetric=True``
    keeps only ``id_l < id_r`` (the self-join convention). NULL texts
    pair with nothing. Returns ``(ids[0], ids[1], distance)``."""
    lt, rt = text
    li, ri = ids
    if len({lt, rt, li, ri}) != 4:
        raise ValueError("text and id column names must be four distinct names")
    k = int(max_distance)
    if k < 0:
        raise ValueError(f"max_distance must be >= 0, got {k}")
    if q < 1:
        # q=0 grams are all empty strings: every prefix is [''] and the
        # candidate join degenerates into the all-pairs cross product
        # this function exists to prevent
        raise ValueError(f"q must be >= 1, got {q}")
    a = left.select(li, lt).filter(F.col(lt).isNotNull())
    b = right.select(ri, rt).filter(F.col(rt).isNotNull())
    if k == 0:  # degenerate: exact string equality
        out = a.join(b, on=F.col(lt) == F.col(rt)).select(
            li, ri, F.lit(0).alias("distance"))
        return out.filter(F.col(li) < F.col(ri)) if antisymmetric else out

    from pyspark.sql.window import Window

    short_len = q * k  # prefix theorem valid iff min(len) > q*k

    ga = a.select(li, lt, F.explode(_padded_grams(lt, q)).alias("gram"))
    gb = b.select(ri, rt, F.explode(_padded_grams(rt, q)).alias("gram"))
    # one global rare-first gram order over BOTH sides (ties broken by
    # the gram string so the order is total and deterministic)
    freq = (
        ga.select("gram").unionAll(gb.select("gram"))
        .groupBy("gram").agg(F.count(F.lit(1)).alias("__gf__"))
    )
    pfx = q * k + 1

    def prefix(g, id_col, text_col):
        w = Window.partitionBy(id_col).orderBy("__gf__", "gram")
        return (
            g.filter(F.length(text_col) > short_len)
            .join(freq, on="gram")
            .withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= pfx)
            .select(id_col, text_col, "gram")
        )

    pa, pb = prefix(ga, li, lt), prefix(gb, ri, rt)
    long_cand = pa.join(pb, on="gram").select(li, lt, ri, rt).distinct()

    # short path: lengths 0..q*k on the left, band-joined on length
    sa = a.filter(F.length(lt) <= short_len).select(
        li, lt,
        F.explode(F.array(*[F.length(lt) + F.lit(d)
                            for d in range(-k, k + 1)])).alias("__len__"),
    )
    sb = b.select(ri, rt, F.length(rt).alias("__len__"))
    short_cand = sa.join(sb, on="__len__").select(li, lt, ri, rt)
    # ...and its mirror (short RIGHT rows against longer lefts), so a
    # pair whose SHORTER member sits on the right is also covered
    sb2 = b.filter(F.length(rt) <= short_len).select(
        ri, rt,
        F.explode(F.array(*[F.length(rt) + F.lit(d)
                            for d in range(-k, k + 1)])).alias("__len__"),
    )
    sa2 = a.select(li, lt, F.length(lt).alias("__len__"))
    short_cand = short_cand.unionAll(
        sa2.join(sb2, on="__len__").select(li, lt, ri, rt))

    cand = long_cand.unionAll(short_cand).distinct()
    if stats_out is not None:
        # measurement hook (costs one extra job — never in the hot
        # path): candidate count before the banded verify, for
        # verify-yield tracking (round-11 verdict item 8: the location
        # filter is built only if a workload shows verify dominating)
        stats_out["candidates"] = cand.count()
    dist = F.levenshtein(F.col(lt), F.col(rt), k)
    out = (
        cand.filter(F.abs(F.length(lt) - F.length(rt)) <= k)
        .withColumn("distance", dist)
        .filter(F.col("distance") >= 0)
        .select(li, ri, "distance")
    )
    return out.filter(F.col(li) < F.col(ri)) if antisymmetric else out


def blocked_fuzzy_pairs(
    left: DataFrame,
    right: DataFrame,
    block_on: str | Sequence[str],
    text: tuple[str, str],
    ids: tuple[str, str],
    max_distance: int = 1,
) -> DataFrame:
    """Candidate pairs from one blocking pass: equi-join on
    ``block_on`` (column name(s) present in BOTH sides), then keep pairs
    with ``levenshtein(text) <= max_distance``. Returns
    (ids[0], ids[1], distance).

    The join is an equi-join — never a cross product — so the plan is a
    shuffle-hash/sort-merge join at any scale (broadcast if one side is
    small); tests assert no nested-loop appears."""
    blocks = [block_on] if isinstance(block_on, str) else list(block_on)
    lt, rt = text
    li, ri = ids
    # banded distance: -1 once it provably exceeds max_distance, so the
    # verify step is O(max_distance * len) per pair, not O(len^2)
    dist = F.levenshtein(F.col(lt), F.col(rt), max_distance)
    return (
        left.join(right, on=blocks, how="inner")
        .withColumn("distance", dist)
        .filter(F.col("distance") >= 0)
        .select(li, ri, "distance")
    )


def multi_pass_pairs(
    left: DataFrame,
    right: DataFrame,
    passes: Sequence[str | Sequence[str]],
    text: tuple[str, str],
    ids: tuple[str, str],
    max_distance: int = 1,
) -> DataFrame:
    """Union of several independent blocking passes, deduplicated on the
    id pair (the distance is a pure function of the pair, so duplicate
    rows across passes are identical and ``dropDuplicates`` is safe).
    Each pass stays an equi-join; recall grows with every pass while the
    total cost stays the sum of the linear passes."""
    out: DataFrame | None = None
    for p in passes:
        pairs = blocked_fuzzy_pairs(left, right, p, text, ids, max_distance)
        out = pairs if out is None else out.unionByName(pairs)
    assert out is not None, "at least one blocking pass required"
    return out.dropDuplicates(list(ids))
