"""Fixed-width text source — the legacy-format sibling of the CSV
source (the reference's R userbase reads these with ``read.fwf``;
mainframe/regulatory extracts still ship this way).

A fixed-width file has no delimiter to split on: each column IS a byte
range. The reader maps a ``(name, width, type)`` layout onto
``substring`` slices over ``spark.read.text`` lines — pure codegen
expressions, so parsing runs JVM-side at scan throughput with column
pruning intact (unreferenced columns are dropped by Catalyst before
the substring ever evaluates). No Python row path, no UDFs.

Numeric fields parse through ``try_cast`` after trim: malformed cells
become NULL (the same documented divergence-from-C the CSV source's
typed comparisons follow). The writer right-pads/truncates to the
declared widths, so write→read round-trips exactly for values the
format CAN represent — and the round-trip IS the oracle check in
parity. Two representation limits are inherent to fixed-width and
documented rather than papered over: (1) NULL and '' both serialize as
an all-space field and read back as '' (strings) / NULL (numerics) —
the format has no NULL marker; (2) trailing spaces inside string
values are indistinguishable from padding and are rtrimmed away on
read. Widths are CHARACTER counts (Spark ``substring`` semantics): for
single-byte encodings char ranges ARE byte ranges; a multi-byte UTF-8
legacy file declared in bytes needs a byte-level pre-decode, which is
out of scope here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: layout entry: (column name, byte width, spark type name)
Layout = Sequence[tuple[str, int, str]]


def read_fixed_width(
    spark: SparkSession,
    path: str,
    layout: Layout,
    skip_rows: int = 0,
) -> DataFrame:
    """Parse a fixed-width file per ``layout`` (widths in CHARACTERS —
    see the module docstring for the byte-vs-char caveat and the
    NULL/trailing-space representation limits). 1-based substring starts
    accumulate across the declared widths; ``skip_rows`` drops leading
    header/banner lines by position (monotonic id over file order —
    valid per input file, matching the CSV source's skip semantics)."""
    lines = spark.read.text(path)
    if skip_rows:
        # same mechanism as the CSV source's skip: parallel partition-
        # offset row ids (rowid.with_row_ids) + a pushable predicate —
        # never a single-task global-order window
        from lazy_frame_spark.rowid import ROW_ID, with_row_ids

        lines = (
            with_row_ids(lines)
            .filter(F.col(ROW_ID) > skip_rows)
            .drop(ROW_ID)
        )
    cols = []
    start = 1
    for name, width, typ in layout:
        raw = F.substring(F.col("value"), start, width)
        if typ in ("string",):
            cols.append(F.rtrim(raw).alias(name))
        else:
            cols.append(F.trim(raw).try_cast(typ).alias(name))
        start += width
    return lines.select(*cols)


def write_fixed_width(
    df: DataFrame,
    path: str,
    layout: Layout,
    mode: str = "overwrite",
) -> None:
    """Serialize ``df`` to fixed-width lines: every value stringifies,
    right-pads with spaces to its declared width, and truncates beyond
    it (the format's own contract — pick widths that fit; NULLs become
    empty fields). One codegen concat per row; written via the text
    sink."""
    # rpad both pads AND truncates to the target length — one expression
    # enforces the whole width contract (NULL writes as an empty field;
    # the format cannot distinguish it from '')
    parts = [
        F.rpad(F.coalesce(F.col(name).cast("string"), F.lit("")), int(width), " ")
        for name, width, _ in layout
    ]
    df.select(F.concat(*parts).alias("value")).write.mode(mode).text(path)
