"""Change-data-capture history building — SCD2 validity intervals.

Not in the reference (read-only single-table engine); this is the
warehouse-side primitive every large ingest pipeline needs: turn an
append-only change stream into a slowly-changing-dimension (type 2)
history — one row per (key, attribute-run) with ``valid_from`` /
``valid_to`` interval columns and an ``is_current`` flag — and apply
incremental update batches to an existing history without rebuilding it.

Scale shape: the whole build is two window passes over the SAME
partitioning key — Catalyst plans ONE exchange (hashpartitioning on the
entity key); the change-detection filter preserves distribution and
sort order, so the second window (``lead`` for ``valid_to``) reuses the
first's shuffle. No joins, no driver collects; skewed entities are
bounded by per-key history length, not table size.

Incremental merge (``scd2_apply_batch``) touches ONLY affected keys:
the batch's key set semi-joins the dimension, those keys' histories are
rebuilt, everything else passes through untouched — the delta cost is
proportional to the batch, not the dimension.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_from_changes", "scd2_apply_batch"]


def _keys(key: str | Sequence[str]) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def scd2_from_changes(
    changes: DataFrame,
    key: str | Sequence[str],
    attrs: Sequence[str],
    order_by: Sequence[str],
    valid_from: str | None = None,
) -> DataFrame:
    """Collapse a change stream into SCD2 intervals.

    ``changes``: one row per observed state (key, attrs, event-time
    ordering columns). ``order_by`` must be a deterministic total order
    within each key (include a tiebreaker id). ``valid_from`` names the
    event-time column (default: ``order_by[0]``).

    Returns (key..., attrs..., valid_from, valid_to, is_current): rows
    where the attribute tuple DIFFERS from the key's previous state
    (null-safe comparison), with ``valid_to`` = the next change's
    ``valid_from`` (NULL for the open/current run)."""
    kcols = _keys(key)
    eff = valid_from or order_by[0]
    w = Window.partitionBy(*kcols).orderBy(*[F.col(c) for c in order_by])

    changed = F.row_number().over(w) == 1
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))

    runs = changes.withColumn("__chg__", changed).filter(F.col("__chg__"))
    # same partitioning key: the exchange from the first window is
    # reused, this window only re-sorts within partitions
    w2 = Window.partitionBy(*kcols).orderBy(*[F.col(c) for c in order_by])
    out = runs.select(
        *kcols,
        *attrs,
        F.col(eff).alias("valid_from"),
        F.lead(F.col(eff)).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
    return out


def scd2_apply_batch(
    dim: DataFrame,
    batch: DataFrame,
    key: str | Sequence[str],
    attrs: Sequence[str],
    order_by: Sequence[str],
    valid_from: str | None = None,
) -> DataFrame:
    """Incrementally apply an update batch to an existing SCD2 dimension.

    ``dim`` is a prior ``scd2_from_changes`` output; ``batch`` is new
    change rows (key, attrs, ordering columns). Histories of keys NOT in
    the batch pass through untouched (left anti on the batch's distinct
    key set — a broadcast for any sane batch size); affected keys'
    existing runs are replayed together with the new rows through the
    same run-collapse, which closes open intervals and appends new ones
    in one pass. Idempotent for replayed batches (identical states
    collapse into the same runs)."""
    kcols = _keys(key)
    eff = valid_from or order_by[0]
    affected = batch.select(*kcols).distinct()
    untouched = dim.join(F.broadcast(affected), on=kcols, how="left_anti")

    # prior runs re-expand to change rows at their valid_from instants;
    # the extra order_by tiebreaker columns are absent from dim, so the
    # replay orders on (eff,) — runs are already collapsed per instant
    replay_cols = [*kcols, *attrs, F.col("valid_from").alias(eff)]
    prior = dim.join(F.broadcast(affected), on=kcols, how="semi").select(*replay_cols)
    new = batch.select(*kcols, *attrs, F.col(eff))
    rebuilt = scd2_from_changes(
        prior.unionByName(new), kcols, attrs, order_by=[eff], valid_from=eff
    )
    return untouched.unionByName(rebuilt)
