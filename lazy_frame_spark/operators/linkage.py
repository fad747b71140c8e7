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

__all__ = ["blocked_fuzzy_pairs", "multi_pass_pairs"]


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
