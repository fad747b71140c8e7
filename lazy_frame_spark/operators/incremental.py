"""Incremental materialized aggregate views — the COUNT/SUM/MIN/MAX
generalization of the mergeable-sketch maintenance pattern
(operators/sketches.py): aggregate each ingest batch ONCE into a small
partial table, fold new batches into the stored partials, and answer
queries from the view — the raw data is never rescanned.

Every supported aggregate is decomposable (merge of partials ==
aggregate of the union): count -> sum of counts, sum -> sum of sums,
min/max -> min/max of partials. AVG is DERIVED at read time
(sum/count) — storing it directly would make the view un-mergeable.
Non-decomposable distincts belong to the sketch family (HLL/theta);
exact medians need the raw data by nature.

At 100 TB this is the difference between a dashboard query that reads a
per-grain view of a few thousand rows and one that rescans a year of
events: the view's size is bounded by grain cardinality, each update
costs one batch scan plus a view-sized merge, and both steps are plain
partial-aggregate shuffles."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COUNT_COL = "__n__"


def _agg_exprs(sum_cols, min_cols, max_cols, first: bool):
    """Partial-building (first=True) or partial-merging aggregate list.
    Merging re-applies the same functions to the partial columns —
    decomposability makes build and merge the same shape."""
    exprs = [
        (F.count(F.lit(1)) if first else F.sum(COUNT_COL))
        .cast("long")
        .alias(COUNT_COL)
    ]
    for c in sum_cols:
        src = c if first else f"sum_{c}"
        exprs.append(F.sum(src).alias(f"sum_{c}"))
    for c in min_cols:
        src = c if first else f"min_{c}"
        exprs.append(F.min(src).alias(f"min_{c}"))
    for c in max_cols:
        src = c if first else f"max_{c}"
        exprs.append(F.max(src).alias(f"max_{c}"))
    return exprs


def agg_view_build(
    df: DataFrame,
    grain: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """One-scan partial table: per grain key — row count, per-column
    sums/mins/maxes. This IS the stored view."""
    return df.groupBy(*grain).agg(
        *_agg_exprs(sum_cols, min_cols, max_cols, first=True)
    )


def agg_view_update(
    stored: DataFrame,
    new_batch: DataFrame,
    grain: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold a new ingest batch into the stored view WITHOUT rescanning
    stored data: build the batch's partials (one batch scan), union
    with the view, re-merge per grain key (a view-sized shuffle).
    Exactly equal to rebuilding from all data — pinned by tests."""
    fresh = agg_view_build(new_batch, grain, sum_cols, min_cols, max_cols)
    return stored.unionByName(fresh).groupBy(*grain).agg(
        *_agg_exprs(sum_cols, min_cols, max_cols, first=False)
    )


def agg_view_read(
    view: DataFrame,
    avg_of: Sequence[str] = (),
    round_avg: int | None = 4,
) -> DataFrame:
    """Read-time derivations over the stored view: averages from
    sum/count (the reason AVG is never stored). Returns the view with
    ``avg_<c>`` columns appended."""
    out = view
    for c in avg_of:
        avg = F.col(f"sum_{c}") / F.col(COUNT_COL)
        if round_avg is not None:
            avg = F.round(avg, round_avg)
        out = out.withColumn(f"avg_{c}", avg)
    return out


def agg_view_stream_writer(
    view_dir: str,
    grain: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    op_col: str | None = None,
):
    """``foreachBatch`` sink that maintains the stored view under
    streaming ingest, EXACTLY-ONCE: each micro-batch folds into the
    view and promotes through the journaled swap, with the folded batch
    id recorded INSIDE the promoted directory — view and progress
    marker commit in the same atomic rename, so a foreachBatch replay
    after any crash sees its own id and skips (double-folding a
    non-idempotent merge is the classic streaming-upsert bug).

    ``op_col`` turns the writer CDC-aware: rows whose ``op_col`` value
    is ``'D'`` (case-insensitive) RETRACT from the view via
    ``agg_view_retract``; every other row upserts. Only count/sum
    aggregates are stream-retractable — min/max need the grain-pruned
    ``agg_view_repair`` rescan, which a foreachBatch body cannot run
    against a stream — so configuring ``op_col`` together with
    ``min_cols``/``max_cols`` raises up front instead of serving stale
    extremes silently.

    Usage::

        q = (stream.writeStream.foreachBatch(
                agg_view_stream_writer(dir, ["k"], sum_cols=["v"]))
             .option("checkpointLocation", ckpt).start())
    """
    import json
    import os

    if op_col is not None and (min_cols or max_cols):
        raise ValueError(
            "op_col (streaming retraction) supports count/sum views only: "
            "min/max retraction needs agg_view_repair's source rescan — "
            "maintain those with the batch retract+repair path instead"
        )

    marker = "_FOLDED_BATCH.json"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        from lazy_frame_spark.sources.parquet import (
            _swap_in_place,
            recover_table,
        )

        spark = batch_df.sparkSession
        recover_table(view_dir)
        last = -1
        mp = os.path.join(view_dir, marker)
        if os.path.exists(mp):
            with open(mp, encoding="utf-8") as f:
                last = json.load(f)["batch_id"]
        if batch_id <= last:  # replayed batch: already folded
            return
        inserts, deletes = batch_df, None
        if op_col is not None:
            # null-safe: a NULL op means "not a delete" and must upsert
            # ('every other row upserts') — a plain == would evaluate
            # to NULL and silently drop the row from BOTH sides
            is_del = F.upper(F.col(op_col)).eqNullSafe(F.lit("D"))
            inserts = batch_df.filter(~is_del).drop(op_col)
            deletes = batch_df.filter(is_del).drop(op_col)
        if os.path.exists(view_dir):
            stored = spark.read.parquet(view_dir)
            updated = agg_view_update(
                stored, inserts, grain, sum_cols, min_cols, max_cols
            )
        else:
            updated = agg_view_build(inserts, grain, sum_cols, min_cols, max_cols)
        if deletes is not None:
            updated = agg_view_retract(
                updated, deletes, grain, sum_cols, min_cols, max_cols
            ).drop(STALE_COL)  # count/sum only: never stale (enforced)
        dest = view_dir.rstrip("/") + "__fold_tmp"
        updated.write.mode("overwrite").parquet(dest)
        with open(os.path.join(dest, marker), "w", encoding="utf-8") as f:
            json.dump({"batch_id": batch_id}, f)
        if os.path.exists(view_dir):
            _swap_in_place(view_dir.rstrip("/"), dest, "__fold_old")
        else:
            os.rename(dest, view_dir.rstrip("/"))

    return fold


STALE_COL = "__stale__"


def agg_view_retract(
    stored: DataFrame,
    deleted_batch: DataFrame,
    grain: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold a DELETE batch out of the stored view without rescanning
    stored data — the maintenance pass a ``delete_keys`` erasure run
    owes the views built over the erased table (without it the view
    silently serves ghosts of erased rows).

    count/sum are subtractable: the deleted batch aggregates once (one
    batch scan) and its partials subtract per grain key. min/max are
    NOT — a partial can't say what the next-best extreme was — so each
    grain gets a ``__stale__`` flag instead: True only when a deleted
    value ties the stored extreme for some min/max column (the only
    case the stored extreme can be wrong; a strictly interior deletion
    leaves it intact). ``agg_view_repair`` rebuilds exactly the stale
    grains from the remaining source — a grain-pruned rescan, never a
    full rebuild. Grains whose count reaches zero drop out of the view.

    Assumes the deleted rows were previously folded in (the erasure
    contract); retracting rows never ingested would drive counts
    negative, which the zero-count filter treats as fully-deleted."""
    d = agg_view_build(deleted_batch, grain, sum_cols, min_cols, max_cols)
    ren = {COUNT_COL: "__d_n__"}
    for c in grain:  # NULL is a real grain under groupBy — the join
        ren[c] = f"__d_g_{c}__"  # below must match it null-safely
    for c in sum_cols:
        ren[f"sum_{c}"] = f"__d_sum_{c}__"
    for c in min_cols:
        ren[f"min_{c}"] = f"__d_min_{c}__"
    for c in max_cols:
        ren[f"max_{c}"] = f"__d_max_{c}__"
    for old, new in ren.items():
        d = d.withColumnRenamed(old, new)

    # eqNullSafe, not on=grain: groupBy treats NULL as an ordinary grain
    # key, so an equality join would never subtract a NULL-grain delete
    # and the view would silently serve ghosts of those erased rows
    cond = F.lit(True)
    for c in grain:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__d_g_{c}__"))
    out = stored.join(F.broadcast(d), on=cond, how="left")
    hit = F.col("__d_n__").isNotNull()
    out = out.withColumn(
        COUNT_COL, F.col(COUNT_COL) - F.coalesce(F.col("__d_n__"), F.lit(0))
    )
    for c in sum_cols:
        out = out.withColumn(
            f"sum_{c}",
            F.col(f"sum_{c}") - F.coalesce(F.col(f"__d_sum_{c}__"), F.lit(0)),
        )
    stale = F.lit(False)
    for c in min_cols:
        stale = stale | (hit & (F.col(f"__d_min_{c}__") <= F.col(f"min_{c}")))
    for c in max_cols:
        stale = stale | (hit & (F.col(f"__d_max_{c}__") >= F.col(f"max_{c}")))
    out = out.withColumn(STALE_COL, F.coalesce(stale, F.lit(False)))
    return out.filter(F.col(COUNT_COL) > 0).drop(*ren.values())


def agg_view_repair(
    retracted: DataFrame,
    remaining_source: DataFrame,
    grain: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Rebuild ONLY the ``__stale__`` grains of a retracted view from
    the remaining (post-delete) source, and return a clean view (flag
    dropped). The rescan is grain-pruned: the source is semi-joined to
    the stale keys before aggregating, so repair cost scales with the
    affected grains, not the table. A view with no stale grains costs
    one empty semi-join."""
    stale_keys = retracted.filter(F.col(STALE_COL)).select(
        *[F.col(c).alias(f"__s_g_{c}__") for c in grain]
    )
    clean = retracted.filter(~F.col(STALE_COL)).drop(STALE_COL)
    # null-safe semi-join: a stale NULL grain must still be rescanned
    cond = F.lit(True)
    for c in grain:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__s_g_{c}__"))
    rebuilt = agg_view_build(
        remaining_source.join(F.broadcast(stale_keys), on=cond, how="left_semi"),
        grain, sum_cols, min_cols, max_cols,
    )
    return clean.unionByName(rebuilt)
