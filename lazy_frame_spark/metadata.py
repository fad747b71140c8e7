"""Persistent per-column attribute store — ``column_attr`` parity.

The reference keeps one sub-environment per column on the lazy.frame handle
(``R/lazy.frame.R:17-35``) and re-applies the stored attributes to every
materialized subset (``R/lazy.frame.R:167-178``); the canonical use is
factor ``levels`` (``man/column_attr.Rd:43-63``) — the reference's stand-in
for a persistent type system.

Here the store is a plain dict on the :class:`LazyFrame` facade, carried
through transformations, and applied at the materialization boundary
(``to_pandas``) exactly where the reference applies it. ``levels`` maps to a
pandas ``Categorical`` with the given categories; integer codes (the way R
reads factor-coded CSV columns) are decoded 1-based, matching R factor
semantics. Attributes are also mirrored into ``StructField.metadata`` on
``materialize()`` so downstream Spark consumers can see them.
"""

from __future__ import annotations

import copy
from typing import Any


class ColumnAttrs:
    """Mutable {column -> {attr -> value}} map with copy-on-transform."""

    def __init__(self, attrs: dict[str, dict[str, Any]] | None = None):
        self._attrs: dict[str, dict[str, Any]] = attrs or {}

    def get(self, column: str, which: str | None = None):
        col = self._attrs.get(column, {})
        return col if which is None else col.get(which)

    def set(self, column: str, which: str, value: Any) -> None:
        self._attrs.setdefault(column, {})[which] = value

    def delete(self, column: str, which: str) -> None:
        self._attrs.get(column, {}).pop(which, None)

    def copy(self) -> "ColumnAttrs":
        return ColumnAttrs(copy.deepcopy(self._attrs))

    def renamed(self, mapping: dict[str, str]) -> "ColumnAttrs":
        return ColumnAttrs(
            {mapping.get(k, k): copy.deepcopy(v) for k, v in self._attrs.items()}
        )

    def restrict(self, columns: list[str]) -> "ColumnAttrs":
        keep = set(columns)
        return ColumnAttrs(
            {k: copy.deepcopy(v) for k, v in self._attrs.items() if k in keep}
        )

    @property
    def dirty(self) -> bool:
        """Any attribute set anywhere (the reference's ``attrs`` flag)."""
        return any(self._attrs.values())

    def items(self):
        return self._attrs.items()

    def apply_to_pandas(self, pdf):
        """Re-apply stored attributes to a materialized pandas DataFrame
        (the R/lazy.frame.R:167-178 equivalent)."""
        import pandas as pd

        for col, attrs in self._attrs.items():
            if col not in pdf.columns:
                continue
            levels = attrs.get("levels")
            if levels is not None:
                s = pdf[col]
                if pd.api.types.is_integer_dtype(s) or pd.api.types.is_float_dtype(s):
                    # R factor codes are 1-based ints into levels; NULL
                    # and out-of-range codes decode to NA (code -1), the
                    # R behavior for invalid factor codes — and the same
                    # semantics as the Spark-side decode_factors
                    codes = pd.to_numeric(s, errors="coerce") - 1
                    codes = codes.where(
                        codes.notna() & (codes >= 0) & (codes < len(levels)), -1
                    ).astype("int64")
                    pdf[col] = pd.Categorical.from_codes(
                        codes, categories=list(levels)
                    )
                else:
                    pdf[col] = pd.Categorical(s, categories=list(levels))
            for k, v in attrs.items():
                if k == "levels":
                    continue
                pdf[col].attrs[k] = v
        return pdf
