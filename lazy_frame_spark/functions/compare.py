"""RHS-typed scalar comparison — the reference's entire predicate engine.

The reference picks the comparison domain from the *type of the RHS scalar*
(``src/lazy.frame.c:543-565``): INTSXP → ``atoi`` (truncating), REALSXP →
``cheap_strtod`` (malformed → NaN, compare-false), STRSXP → ``strcmp`` on the
dequoted raw field. Six comparators (op codes 1-6, ``R/lazy.frame.R:189-194``).

Spark-native translation: pick a cast domain from the Python literal's type
and apply ``try_cast`` to the column — malformed values become NULL, and
NULL comparisons are false under SQL three-valued logic when used in a
filter. Documented divergences from the reference (SURVEY.md §2.1, all
fuzz-verified against a Python model in tests/test_properties.py):

- malformed → NULL, not NaN (so ``!=`` on malformed is false, where C
  IEEE would say true);
- strict parse, not prefix parse: C ``strtod("1_000")`` stops at ``_``
  and yields 1.0; SQL rejects the whole token → NULL;
- int domain saturates: doubles at exactly ±2^63 convert to Long
  min/max (strtol-like), anything beyond → NULL (atoi would be garbage).

Integer RHS casts the column via double then ``bigint`` — truncation
toward zero on both numeric and string columns matches the reference's
``atoi`` (``"4.5" == 4``).

Everything here stays JVM-side (whole-stage codegen); no Python UDFs.
"""

from __future__ import annotations

import operator
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

#: op name → Column-level comparator (mirrors opcodes 1..6, R/lazy.frame.R:189-194)
OPS = {
    "==": operator.eq,
    "!=": operator.ne,
    ">=": operator.ge,
    "<=": operator.le,
    ">": operator.gt,
    "<": operator.lt,
}


def typed_literal_domain(value: Any) -> str | None:
    """SQL cast target implied by the RHS literal's Python type.

    Returns None for string RHS (compare as string, the strcmp path).
    """
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "bigint"
    if isinstance(value, float):
        return "double"
    if isinstance(value, str):
        return None
    raise TypeError(
        f"unsupported RHS scalar type {type(value).__name__}; "
        "the predicate engine supports int, float, str, bool "
        "(reference: man/lazy.frame.Rd:55-59)"
    )


def typed_compare(column: Column, op: str, value: Any) -> Column:
    """Build ``column <op> value`` in the RHS-typed comparison domain."""
    if op not in OPS:
        raise ValueError(f"unknown comparator {op!r}; one of {sorted(OPS)}")
    domain = typed_literal_domain(value)
    if domain is None:
        lhs = column.cast("string")
    elif domain == "bigint":
        # atoi parity (src/lazy.frame.c:543-548) requires "4.5" → 4 even on
        # string-typed columns; a direct string→bigint try_cast NULLs
        # decimal strings, so truncate via double. Magnitudes beyond
        # bigint → NULL → compare-false (saner than atoi's garbage;
        # documented divergence).
        lhs = column.try_cast("double").try_cast("bigint")
    else:
        lhs = column.try_cast(domain)
    return OPS[op](lhs, F.lit(value))
