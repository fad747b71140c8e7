"""Manifest-level data skipping for versioned tables — per-FILE column
min/max/null-count recorded at commit time, consulted at read time to
prune the file list BEFORE Spark ever sees it.

Why this exists when parquet already has footer stats: Spark's scan
prunes ROW GROUPS from footers, but it must still LIST, OPEN and
SCHEDULE a task for every file to do so. On a 100 TB table that is
millions of footer reads and task launches per query even when the
predicate matches one file. Delta ("data skipping") and Iceberg
(manifest column bounds) solve this by hoisting the bounds into commit
metadata; this module is that layer for the versioned-table format in
``sources/versioned.py``.

Shape and cost:

- **Write side**: ``write_dir_stats`` reads ONLY the new data
  directory's parquet footers (pyarrow, driver-local, no Spark job —
  the same cost class as the row counts `versioned._footer_rows`
  already records) and writes one ``_stats.json`` sidecar into the
  directory. Files are immutable and carried by reference across
  commits, so the sidecar is written ONCE per directory and travels
  with it — appending to a 100 TB table computes stats for the new
  batch only.
- **Read side**: ``prune_files`` loads one sidecar per *data
  directory* (O(commits), not O(files)), evaluates the conjunctive
  predicate against each file's bounds, and returns the survivors.
  Everything uncertain — missing sidecar (pre-stats directories),
  missing column, unusable parquet statistics, a type the comparator
  doesn't understand — KEEPS the file: pruning is an optimization and
  must never change results.
- ``cluster_versioned`` (Z-order / Hilbert re-layout) is the natural
  companion: after re-clustering, each file covers a compact key
  interval, so these bounds become tight in every clustered dimension
  and range predicates prune to a handful of files.

Predicate language: a list of conjuncts ``(col, op, value)`` with ops
``= == != < <= > >= in between isnull isnotnull`` (``between`` takes a
``(lo, hi)`` pair, ``isnull``/``isnotnull`` take ``None``).
Conjunction-only is deliberate — it matches what file bounds can
decide exactly; a disjunction is two pruned reads unioned by the
caller. ``spark_filter`` builds the EXACT same predicate as a Spark
``Column`` so the pruned read still filters row-by-row: skipping
removes whole files, the filter does the rest.

SQL NULL semantics are preserved: comparison conjuncts never match
NULL rows, so a file whose only candidate rows are NULL is prunable by
bounds alone; ``isnull`` prunes on recorded null counts.
"""

from __future__ import annotations

import datetime
import decimal
import json
import math
import os
import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "write_dir_stats",
    "load_dir_stats",
    "write_dir_blooms",
    "load_dir_blooms",
    "write_dir_ndv",
    "load_dir_ndv",
    "ndv_estimate",
    "NDV_SIDECAR",
    "prune_files",
    "prune_files_spark",
    "prune_manifest_spark",
    "key_set_where",
    "spark_filter",
    "STATS_SIDECAR",
    "BLOOM_SIDECAR",
]

STATS_SIDECAR = "_stats.json"

_OPS = {"=", "==", "!=", "<", "<=", ">", ">=", "in", "between",
        "isnull", "isnotnull"}


# ---------------------------------------------------------------- encode

def _encode(v):
    """Parquet-statistics value -> JSON-safe tagged form, or None when
    the type can't round-trip with a total order we trust (bytes,
    NaN)."""
    if isinstance(v, bool):
        return {"t": "b", "v": v}
    if isinstance(v, int):
        return {"t": "i", "v": v}        # JSON ints are exact
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return None
        return {"t": "f", "v": v}
    if isinstance(v, str):
        return {"t": "s", "v": v}
    if isinstance(v, datetime.datetime):
        return {"t": "ts", "v": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"t": "d", "v": v.isoformat()}
    if isinstance(v, decimal.Decimal):
        return {"t": "n", "v": str(v)}
    return None


def _decode(tagged):
    t, v = tagged["t"], tagged["v"]
    if t == "ts":
        return datetime.datetime.fromisoformat(v)
    if t == "d":
        return datetime.date.fromisoformat(v)
    if t == "n":
        return decimal.Decimal(v)
    return v


def _coerce_literal(kind: str, lit):
    """User literal -> the stats value's domain, or raise TypeError
    when the pair has no defensible total order (caller keeps the
    file). Numeric kinds accept numeric literals (Python compares
    int/float/Decimal exactly across types); temporal kinds accept
    ISO strings or the datetime objects themselves."""
    if lit is None:
        raise TypeError("NULL literal never matches a comparison")
    if kind in ("i", "f", "n"):
        if isinstance(lit, bool) or not isinstance(
            lit, (int, float, decimal.Decimal)
        ):
            raise TypeError(f"non-numeric literal {lit!r}")
        if isinstance(lit, float) and (math.isnan(lit) or math.isinf(lit)):
            raise TypeError("NaN/inf literal")
        return lit
    if kind == "s":
        if not isinstance(lit, str):
            raise TypeError(f"non-string literal {lit!r}")
        return lit
    if kind == "d":
        if isinstance(lit, datetime.datetime):
            raise TypeError("timestamp literal against a date column")
        if isinstance(lit, datetime.date):
            return lit
        return datetime.date.fromisoformat(lit)
    if kind == "ts":
        if isinstance(lit, datetime.datetime):
            return lit
        if isinstance(lit, datetime.date):
            return datetime.datetime(lit.year, lit.month, lit.day)
        return datetime.datetime.fromisoformat(lit)
    if kind == "b":
        if not isinstance(lit, bool):
            raise TypeError(f"non-bool literal {lit!r}")
        return lit
    raise TypeError(f"unknown stats kind {kind!r}")


# ----------------------------------------------------------- write side

def _file_stats(abs_file: str) -> dict | None:
    """One parquet file's per-column bounds from its footer only.
    Returns ``{"rows": n, "cols": {name: {"lo":…,"hi":…,"nulls":…}}}``
    or None when the footer can't be read (caller records nothing —
    readers then keep the file unconditionally).

    Only top-level leaf columns are recorded (no dot in the parquet
    path): nested fields don't participate in the conjunct language.
    A column appears with lo/hi only when EVERY row group has usable
    min/max; null counts likewise only when every row group reports
    one — partial knowledge about a file is not knowledge."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(abs_file).metadata
    except Exception:
        return None
    cols: dict[str, dict] = {}
    per_col: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name:
                continue
            acc = per_col.setdefault(
                name, {"lo": None, "hi": None, "nulls": 0,
                       "bounds_ok": True, "nulls_ok": True},
            )
            st = col.statistics
            if st is None:
                acc["bounds_ok"] = acc["nulls_ok"] = False
                continue
            if st.null_count is None:
                acc["nulls_ok"] = False
            elif acc["nulls_ok"]:
                acc["nulls"] += st.null_count
            # an all-null row group legitimately has no min/max; it
            # constrains nothing, so bounds from other groups stand
            if (st.null_count is not None
                    and st.null_count == row_group.num_rows
                    and not st.has_min_max):
                continue
            if not st.has_min_max:
                acc["bounds_ok"] = False
                continue
            lo, hi = _encode(st.min), _encode(st.max)
            if lo is None or hi is None or lo["t"] != hi["t"]:
                acc["bounds_ok"] = False
                continue
            if acc["lo"] is None:
                acc["lo"], acc["hi"] = lo, hi
            elif acc["lo"]["t"] != lo["t"]:
                acc["bounds_ok"] = False
            else:
                if _decode(lo) < _decode(acc["lo"]):
                    acc["lo"] = lo
                if _decode(hi) > _decode(acc["hi"]):
                    acc["hi"] = hi
    for name, acc in per_col.items():
        rec: dict = {}
        if acc["bounds_ok"] and acc["lo"] is not None:
            rec["lo"], rec["hi"] = acc["lo"], acc["hi"]
        if acc["nulls_ok"]:
            rec["nulls"] = acc["nulls"]
        if rec:
            cols[name] = rec
    return {"rows": md.num_rows, "cols": cols}


def write_dir_stats(dir_abs: str) -> dict | None:
    """Compute and persist the ``_stats.json`` sidecar for one
    finalized data directory. Atomic (temp + rename) so a crash
    mid-write leaves either no sidecar (readers keep all files) or a
    complete one — never a torn file. Returns the written doc, or
    None if no file yielded stats (no sidecar written)."""
    files = sorted(
        f for f in os.listdir(dir_abs) if f.endswith(".parquet")
    )
    # footer opens fan over a thread pool (pyarrow releases the GIL on
    # I/O) — a 10k-file commit's sidecar build stops being 10k serial
    # driver-side opens, the same class of fix as clone_versioned's
    # link loop; key order stays sorted(files), so the sidecar is
    # byte-identical to the serial build
    if len(files) > 8:
        import concurrent.futures

        with concurrent.futures.ThreadPoolExecutor(
                max_workers=min(32, (os.cpu_count() or 4) * 2)) as pool:
            stats = list(pool.map(
                lambda n: _file_stats(os.path.join(dir_abs, n)), files))
    else:
        stats = [_file_stats(os.path.join(dir_abs, n)) for n in files]
    per_file = {n: st for n, st in zip(files, stats) if st is not None}
    if not per_file:
        return None
    doc = {"version": 1, "files": per_file}
    tmp = os.path.join(dir_abs, f".{STATS_SIDECAR}.{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, os.path.join(dir_abs, STATS_SIDECAR))
    return doc


def load_dir_stats(dir_abs: str) -> dict | None:
    """The sidecar's per-file stats map, or None when absent/unreadable
    (pre-stats directories: every file is kept)."""
    try:
        with open(os.path.join(dir_abs, STATS_SIDECAR)) as fh:
            doc = json.load(fh)
        return doc["files"] if doc.get("version") == 1 else None
    except Exception:
        return None


# ------------------------------------------------------------ prune side

def _check_where(where) -> None:
    for conj in where:
        if not (isinstance(conj, (tuple, list)) and len(conj) == 3):
            raise ValueError(f"conjunct must be (col, op, value): {conj!r}")
        col, op, val = conj
        if not isinstance(col, str) or op not in _OPS:
            raise ValueError(f"bad conjunct {conj!r}; ops: {sorted(_OPS)}")
        if op == "between" and not (
            isinstance(val, (tuple, list)) and len(val) == 2
        ):
            raise ValueError(f"between takes a (lo, hi) pair: {conj!r}")
        if op == "in" and not isinstance(val, (tuple, list, set)):
            raise ValueError(f"in takes a collection: {conj!r}")


def _excludes(rec: dict, rows: int, op: str, val) -> bool:
    """True only when the file PROVABLY contains no matching row."""
    have_bounds = "lo" in rec
    nulls = rec.get("nulls")
    if op == "isnull":
        return nulls == 0
    if op == "isnotnull":
        return nulls is not None and nulls >= rows
    # an entirely-NULL column can't match ANY comparison (SQL
    # three-valued logic) — decidable from the null count alone,
    # since an all-null file records no bounds
    if nulls is not None and nulls >= rows:
        return True
    if not have_bounds:
        return False
    lo, hi = _decode(rec["lo"]), _decode(rec["hi"])
    kind = rec["lo"]["t"]
    # EVERY comparison below stays inside the except: coercion can
    # succeed yet the comparison itself still raise (e.g. an aware
    # datetime literal against the naive datetimes parquet stats
    # decode to) — unknown must KEEP the file, never crash the read
    try:
        if op == "in":
            vs = [_coerce_literal(kind, x) for x in val if x is not None]
            return all(x < lo or x > hi for x in vs)
        if op == "between":
            a = _coerce_literal(kind, val[0])
            b = _coerce_literal(kind, val[1])
            return b < lo or a > hi
        v = _coerce_literal(kind, val)
        if op in ("=", "=="):
            return v < lo or v > hi
        if op == "!=":
            # only a constant file is excludable, and only if nothing
            # is NULL
            return lo == hi == v and nulls == 0
        if op == "<":
            return lo >= v
        if op == "<=":
            return lo > v
        if op == ">":
            return hi <= v
        if op == ">=":
            return hi < v
    except TypeError:
        return False
    return False


def _st_excluded(st: dict | None, where) -> bool:
    """ONE file's keep/drop decision from its stats RECORD — the single
    bounds evaluation every pruning path (driver loop, per-dir Spark
    job, embedded-manifest Spark job) shares, so they cannot drift."""
    if st is None:
        return False
    rows, cols = st.get("rows", 0), st.get("cols", {})
    if rows == 0:
        return True  # a zero-row file matches nothing, provably
    for col, op, val in where:
        rec = cols.get(col)
        if rec is None:
            continue
        if _excludes(rec, rows, op, val):
            return True
    return False


def _file_excluded(stats: dict | None, bloom: dict | None,
                   base: str, where) -> bool:
    """Keep/drop from a DIRECTORY's sidecars (stats map + blooms)."""
    if _st_excluded(stats.get(base) if stats else None, where):
        return True
    if bloom is not None:
        for col, op, val in where:
            if _bloom_excludes(bloom, base, col, op, val):
                return True
    return False


def _file_all_match(st: dict, where) -> bool:
    """True when EVERY row of the file provably satisfies the
    conjunction — the dual of ``_excludes`` (which proves NO row can).
    Powers metadata-only COUNT bounds: a file fully inside the
    predicate contributes its whole row count without being read.
    Conservative like all stats proofs: unknown → False."""
    rows = st.get("rows", 0)
    if rows == 0:
        return True  # vacuously: contributes 0 rows either way
    cols = st.get("cols", {})
    for col, op, val in where:
        rec = cols.get(col)
        if rec is None:
            return False
        nulls = rec.get("nulls")
        if op == "isnull":
            if nulls is None or nulls < rows:
                return False
            continue
        # every other op needs ALL rows non-null (NULL fails any
        # comparison and isnotnull alike)
        if nulls is None or nulls > 0:
            return False
        if op == "isnotnull":
            continue
        if "lo" not in rec:
            return False
        lo, hi = _decode(rec["lo"]), _decode(rec["hi"])
        kind = rec["lo"]["t"]
        try:
            if op == "between":
                a = _coerce_literal(kind, val[0])
                b = _coerce_literal(kind, val[1])
                ok = lo >= a and hi <= b
            elif op == "in":
                vs = {_coerce_literal(kind, x) for x in val
                      if x is not None}
                ok = lo == hi and lo in vs
            else:
                v = _coerce_literal(kind, val)
                ok = {
                    "=": lo == hi == v, "==": lo == hi == v,
                    "!=": hi < v or lo > v,
                    "<": hi < v, "<=": hi <= v,
                    ">": lo > v, ">=": lo >= v,
                }[op]
        except TypeError:
            return False
        if not ok:
            return False
    return True


#: Above this many manifest files the per-file driver loop becomes the
#: bottleneck (~1-2 µs of bound checks per file is fine at 100k files,
#: driver-CPU-bound at 10M) and ``prune_files`` — when handed a session
#: — dispatches the evaluation as a Spark job over a (dir, file) frame
#: instead: Iceberg's manifest-list move. Module attribute on purpose:
#: tests and operators can lower it to force the distributed path.
PRUNE_SPARK_THRESHOLD = 100_000


def prune_files_spark(spark, path: str, rel_files: list[str],
                      where) -> list[str]:
    """``prune_files`` as a distributed job: files are shipped as a
    (dir, base) DataFrame, repartitioned by directory so each task
    loads its sidecars ONCE from shared storage, and every file's
    keep/drop decision runs the SAME ``_file_excluded`` the driver
    loop uses. Only the (small) surviving list returns to the driver.
    Requires ``path`` to be visible from executors — true for any
    shared filesystem a real table lives on (and trivially in local
    mode). Order of ``rel_files`` is preserved."""
    _check_where(where)
    import pandas as pd

    has_eq = any(op in ("=", "==", "in") for _c, op, _v in where)
    dirs, bases = [], []
    for rel in rel_files:
        d, base = os.path.split(rel)
        dirs.append(d)
        bases.append(base)
    pdf = pd.DataFrame({"dir": dirs, "base": bases})
    df = spark.createDataFrame(pdf).repartition("dir")
    where_local = [tuple(c) for c in where]

    def _eval(batches):
        cache: dict[str, tuple] = {}
        for pdf in batches:
            out = []
            for d, base in zip(pdf["dir"], pdf["base"]):
                if d not in cache:
                    dir_abs = os.path.join(path, d)
                    cache[d] = (
                        load_dir_stats(dir_abs),
                        load_dir_blooms(dir_abs) if has_eq else None,
                    )
                st, bl = cache[d]
                if not _file_excluded(st, bl, base, where_local):
                    out.append(os.path.join(d, base) if d else base)
            yield pd.DataFrame({"rel": out})

    kept = {r["rel"] for r in df.mapInPandas(_eval, "rel string")
            .collect()}
    return [f for f in rel_files if f in kept]


#: count of names-only manifest-list reconstitutions (the legacy
#: driver-materialize fallback) — tests pin that an upgraded list never
#: reconstitutes again
RECONSTITUTIONS = 0


def upgrade_manifest_list(path: str, manifest_parquet_abs: str) -> bool:
    """Self-heal a NAMES-ONLY offloaded manifest list (written before
    lists embedded per-file stats) by rewriting it in place WITH the
    stats column, copied from the per-directory sidecars — O(dirs)
    sidecar loads, once per legacy list, after which every prune takes
    the distributed embedded-stats path and children commits seed
    their lists from this one incrementally. In-place is safe: the
    list's CONTENT (the file set) is immutable commit state, the stats
    column is best-effort metadata (missing entries keep files at
    prune time), and the swap is an atomic os.replace — a concurrent
    reader sees either version, both correct. Returns False (and
    changes nothing) when the rewrite cannot proceed (read-only
    storage, missing sidecars are fine — they become None stats)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        t = pq.read_table(manifest_parquet_abs)
        if "stats" in t.column_names:
            return True
        files = t["file"].to_pylist()
        per_dir: dict[str, dict] = {}
        stats: list[str | None] = []
        for rel in files:
            d, base = os.path.split(rel)
            if d not in per_dir:
                per_dir[d] = load_dir_stats(os.path.join(path, d)) or {}
            st = per_dir[d].get(base)
            stats.append(json.dumps(st) if st is not None else None)
        tmp = manifest_parquet_abs + f".up-{uuid.uuid4().hex[:8]}.tmp"
        pq.write_table(pa.table({"file": files, "stats": stats}), tmp)
        os.replace(tmp, manifest_parquet_abs)
        return True
    except Exception:
        return False


def prune_manifest_spark(spark, path: str, manifest_parquet_abs: str,
                         where) -> list[str]:
    """Prune an OFFLOADED manifest without the driver ever
    materializing the full file list: the commit's columnar manifest
    list ``(file, stats)`` is scanned as a DataFrame, every file's
    bounds decision runs executor-side against its EMBEDDED stats
    (copied from the per-directory sidecars at commit time — one table
    read replaces O(dirs) JSON loads), and only the (small) surviving
    list returns to the driver. Bloom sidecars stay by REFERENCE: when
    the conjunction carries equality probes, each task loads its
    directory's bloom document once (tasks are partitioned by
    directory for cache locality), exactly like ``prune_files_spark``.
    Files with no embedded stats are kept — pruning is an optimization
    and must never change results. Returns the kept relative paths,
    sorted."""
    _check_where(where)
    import pandas as pd

    df = spark.read.parquet(manifest_parquet_abs)
    if "stats" not in df.columns:
        # pre-stats manifest list (older commit): self-heal it in
        # place — after the one-time upgrade this list (and every
        # child list seeded from it) prunes on the distributed
        # embedded-stats path and the driver never materializes the
        # full file set again
        if upgrade_manifest_list(path, manifest_parquet_abs):
            df = spark.read.parquet(manifest_parquet_abs)
        else:
            # unwritable storage: legacy driver-materialize fallback
            global RECONSTITUTIONS
            RECONSTITUTIONS += 1
            rels = [r["file"] for r in df.select("file").collect()]
            return sorted(prune_files_spark(spark, path, rels, where))
    has_eq = any(op in ("=", "==", "in") for _c, op, _v in where)
    where_local = [tuple(c) for c in where]

    def _eval(batches):
        blooms: dict[str, dict | None] = {}
        for pdf in batches:
            out = []
            for rel, st_json in zip(pdf["file"], pdf["stats"]):
                st = json.loads(st_json) if st_json else None
                if _st_excluded(st, where_local):
                    continue
                if has_eq:
                    d, base = os.path.split(rel)
                    if d not in blooms:
                        blooms[d] = load_dir_blooms(
                            os.path.join(path, d))
                    bl = blooms[d]
                    if bl is not None and any(
                        _bloom_excludes(bl, base, c, op, v)
                        for c, op, v in where_local
                    ):
                        continue
                out.append(rel)
            yield pd.DataFrame({"rel": out})

    if has_eq:
        # co-locate a directory's files so each task loads its bloom
        # document once
        df = df.repartition(
            F.substring_index(F.col("file"), "/", 2))
    kept = df.mapInPandas(_eval, "rel string").collect()
    return sorted(r["rel"] for r in kept)


def prune_files(
    path: str, rel_files: list[str], where, spark=None,
) -> list[str]:
    """The subset of ``rel_files`` that can contain rows matching the
    conjunction ``where``, decided purely from commit-time sidecars —
    one sidecar read per data directory, no parquet I/O. Unknown is
    kept; order is preserved. With a ``spark`` session supplied and
    more than ``PRUNE_SPARK_THRESHOLD`` files, evaluation runs as a
    Spark job (``prune_files_spark``) so a many-million-file manifest
    doesn't pin the driver's CPU; below it the driver loop wins (no
    job-launch latency)."""
    if spark is not None and len(rel_files) > PRUNE_SPARK_THRESHOLD:
        return prune_files_spark(spark, path, rel_files, where)
    _check_where(where)
    sidecars: dict[str, dict | None] = {}
    blooms: dict[str, dict | None] = {}
    kept = []
    has_eq = any(op in ("=", "==", "in") for _c, op, _v in where)
    for rel in rel_files:
        d, base = os.path.split(rel)
        if d not in sidecars:
            sidecars[d] = load_dir_stats(os.path.join(path, d))
            blooms[d] = (load_dir_blooms(os.path.join(path, d))
                         if has_eq else None)
        if not _file_excluded(sidecars[d], blooms[d], base, where):
            kept.append(rel)
    return kept


def key_bounds_aggs(keys) -> list:
    """The aggregate expressions ``key_bounds_where`` collects —
    exposed so a caller that already runs a validation aggregate over
    the batch (``versioned.apply_cdc`` / ``merge_versioned``) can fold
    the bounds into THAT job instead of paying a second full pass."""
    return [
        agg for c in keys
        for agg in (F.min(c).alias(f"__lo_{c}__"),
                    F.max(c).alias(f"__hi_{c}__"))
    ]


def key_bounds_from_row(bounds, keys) -> list | None:
    """Convert one collected row of ``key_bounds_aggs`` columns into
    the ``prune_files`` conjunction (None when unusable — empty batch,
    NULL-only key, or a type the conjunct language can't carry)."""
    where = []
    for c in keys:
        lo, hi = bounds[f"__lo_{c}__"], bounds[f"__hi_{c}__"]
        if lo is None or hi is None:
            return None
        if hasattr(lo, "isoformat"):
            lo, hi = lo.isoformat(), hi.isoformat()
        if isinstance(lo, bool) or not isinstance(lo, (int, float, str)):
            return None
        where.append((c, "between", (lo, hi)))
    return where or None


def key_bounds_where(df, keys) -> list | None:
    """Per-key [min, max] of a batch as a ``prune_files`` conjunction —
    the shared skipping pre-cut for keyed maintenance: a file whose
    bounds don't intersect the batch's bounds on ANY key provably
    contains no equi-join/merge match. One tiny aggregate over the
    batch. Returns None when unusable (empty batch, NULL-only key, or
    a type the conjunct language can't carry) — callers then scan
    unpruned, which is merely slower, never wrong. Used by
    ``versioned.merge_versioned`` (touched-file discovery) and
    ``incremental.join_view_update`` (snapshot terms)."""
    bounds = df.agg(*key_bounds_aggs(keys)).collect()[0]
    return key_bounds_from_row(bounds, keys)


def key_set_where(df, keys, max_keys: int = 1024) -> list | None:
    """Per-key EXACT distinct-value sets of a small batch as a
    ``prune_files`` conjunction ``(key, "in", values)`` — the
    equality-grade sharpening of ``key_bounds_where``: bounds prune by
    interval overlap, but a point delta (a handful of upserted keys)
    inside a wide snapshot range overlaps almost every file; the
    ``in`` form lets BOTH stats layers engage — min/max drops files
    whose bounds contain none of the values, and the bloom sidecars
    (``build_blooms``) answer each value as a point probe, pruning
    files the interval test must keep. Sound for inner-equi-join /
    merge discovery: a snapshot row whose key is outside the delta's
    exact key set cannot match (NULL keys never equi-join, so dropping
    them is exact).

    Returns None — caller falls back to bounds — when any key exceeds
    ``max_keys`` distincts (the cap bounds the driver-side literal
    list and the conjunct's row-filter cost), or carries a type
    without a canonical probe form (int/str only; dates and floats
    stay on the interval path)."""
    where = []
    for c in keys:
        rows = (df.select(c).where(F.col(c).isNotNull())
                .distinct().limit(max_keys + 1).collect())
        if not rows or len(rows) > max_keys:
            return None
        vals = [r[0] for r in rows]
        if isinstance(vals[0], bool) or not isinstance(vals[0], (int, str)):
            return None
        where.append((c, "in", sorted(vals)))
    return where or None


def spark_filter(where) -> Column:
    """The same conjunction as a Spark ``Column`` — applied on top of
    the pruned scan so row-level semantics are exactly SQL's whatever
    the pruning decided."""
    _check_where(where)
    cond = F.lit(True)
    for col, op, val in where:
        c = F.col(col)
        if op in ("=", "=="):
            cur = c == F.lit(val)
        elif op == "!=":
            cur = c != F.lit(val)
        elif op == "<":
            cur = c < F.lit(val)
        elif op == "<=":
            cur = c <= F.lit(val)
        elif op == ">":
            cur = c > F.lit(val)
        elif op == ">=":
            cur = c >= F.lit(val)
        elif op == "in":
            cur = c.isin(list(val))
        elif op == "between":
            cur = (c >= F.lit(val[0])) & (c <= F.lit(val[1]))
        elif op == "isnull":
            cur = c.isNull()
        else:  # isnotnull
            cur = c.isNotNull()
        cond = cond & cur
    return cond


# ----------------------------------------------------------- bloom side

BLOOM_SIDECAR = "_blooms.json"

#: default bloom geometry: 2^17 bits (16 KiB) / 7 probes gives
#: fpp ~0.9% at 10k distinct keys per file and ~17% at 100k — size
#: n_bits to the per-file key cardinality (m ≈ 1.44 · n · log2(1/fpp))
BLOOM_BITS = 1 << 17
BLOOM_K = 7


def _bloom_positions_py(value, n_bits: int, k: int) -> list[int]:
    """The EXACT probe positions the JVM build computes, reproduced
    driver-side: md5 over the value's canonical string form, split into
    two 60-bit halves (hex[0:15], hex[16:31] — matching 1-based Spark
    ``substring(h,1,15)`` / ``substring(h,17,15)``), combined
    Kirsch–Mitzenmacher style (h1 + i·h2 mod m). md5-of-string was
    chosen over xxhash64 precisely because both sides can compute it
    bit-exactly: Spark's xxhash64 is JVM-internal and re-deriving it in
    Python would be a silent-corruption risk at every type boundary.
    Canonical string form = Spark's CAST(x AS STRING) for the two
    supported key types (int → decimal digits, string → identity)."""
    import hashlib

    s = str(value)
    h = hashlib.md5(s.encode("utf-8")).hexdigest()
    h1 = int(h[0:15], 16)
    h2 = int(h[16:31], 16)
    return [(h1 + i * h2) % n_bits for i in range(k)]


def write_dir_blooms(
    spark, dir_abs: str, cols: list[str],
    n_bits: int = BLOOM_BITS, k: int = BLOOM_K,
    extra_cols: dict | None = None,
    extra_types: dict | None = None,
    schema_types: dict | None = None,
) -> dict | None:
    """Build per-FILE bloom filters for ``cols`` over one data
    directory and persist them in a ``_blooms.json`` sidecar (atomic
    temp+rename, advisory metadata — a missing/partial sidecar only
    costs pruning). Complements the min/max bounds: a Z-ordered table
    prunes RANGE predicates on the cluster keys, but equality on a
    high-cardinality key the layout wasn't built for (doc_id, url)
    straddles every file's [lo, hi]; the bloom answers that point
    lookup in O(k) driver-side bit tests per file.

    Cost: ONE extra Spark scan of this directory's files per column
    (projection-pruned to the key column — parquet columnar I/O makes
    that a fraction of the data), entirely map-side until a
    (file, bit-position) distinct; the driver then assembles
    n_files × n_bits/8 bytes. Only int-family and string columns are
    accepted — the two types whose CAST-to-STRING canonical form is
    reproducible bit-exactly in Python (see _bloom_positions_py);
    anything else raises rather than writing a filter that would
    diverge from the probe. ``extra_cols`` carries already-built
    same-geometry column filters into the new sidecar unchanged
    (incremental column addition — see ``versioned.build_blooms``)."""
    files = sorted(
        f for f in os.listdir(dir_abs) if f.endswith(".parquet")
    )
    if not files:
        return None
    import base64

    from pyspark.sql import functions as SF

    abs_files = [os.path.join(dir_abs, f) for f in files]
    df = spark.read.parquet(*abs_files)
    type_by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    ok_types = {"tinyint", "smallint", "int", "bigint", "string"}
    out_cols: dict[str, dict[str, str]] = {}
    zero = base64.b64encode(bytes(n_bits // 8)).decode("ascii")
    absent_types: dict[str, str] = {}
    build_cols: list[str] = []
    for c in cols:
        t = type_by_name.get(c)
        if t is None and schema_types and c in schema_types:
            # directory predates an additive schema evolution: the
            # column reads as all-NULL here, so no equality can ever
            # match — record the all-zero filter (maximum pruning)
            # instead of dying on the first pre-evolution directory
            out_cols[c] = {f: zero for f in files}
            absent_types[c] = schema_types[c]
            continue
        if t is None:
            raise ValueError(f"bloom column {c!r} not in table schema")
        if t not in ok_types:
            raise ValueError(
                f"bloom column {c!r} has type {t} — only int-family and "
                "string keys have a canonical cross-engine string form"
            )
        build_cols.append(c)
    if build_cols:
        # ALL requested columns ride ONE scan of the directory (the
        # same melt-explode shape as the NDV sidecar build): per row,
        # each non-NULL column contributes a (col, positions) struct;
        # the exploded (file, col, position) stream dedupes and groups
        # per (file, col). One job instead of one scan per column —
        # the per-column hashing expressions are unchanged, so the
        # resulting bitmaps are byte-identical.
        def _pos(c):
            h = SF.md5(SF.col(c).cast("string"))
            h1 = SF.conv(SF.substring(h, 1, 15), 16, 10).cast("bigint")
            h2 = SF.conv(SF.substring(h, 17, 15), 16, 10).cast("bigint")
            return SF.array(*[
                SF.pmod(h1 + SF.lit(i) * h2, SF.lit(n_bits)).cast("int")
                for i in range(k)
            ])

        entries = SF.array(*[
            SF.when(SF.col(c).isNotNull(),
                    SF.struct(SF.lit(c).alias("__c"),
                              _pos(c).alias("__pp")))
            for c in build_cols
        ])
        rows = (
            df.select(SF.input_file_name().alias("__f"), *build_cols)
            .select("__f",
                    SF.explode(SF.filter(
                        entries, lambda e: e.isNotNull())).alias("__e"))
            .select("__f", SF.col("__e.__c").alias("__c"),
                    SF.explode("__e.__pp").alias("__p"))
            .distinct()
            .groupBy("__f", "__c")
            .agg(SF.collect_list("__p").alias("__ps"))
            .collect()
        )
        from urllib.parse import unquote

        built: dict[str, dict[str, str]] = {c: {} for c in build_cols}
        for r in rows:
            uri = r["__f"]
            p = unquote(uri[7:]) if uri.startswith("file://") else unquote(uri)
            base = os.path.basename(p)
            bits = bytearray(n_bits // 8)
            for pos_i in r["__ps"]:
                bits[pos_i >> 3] |= 1 << (pos_i & 7)
            built[r["__c"]][base] = (
                base64.b64encode(bytes(bits)).decode("ascii"))
        for c in build_cols:
            # a file whose column is entirely NULL gets an all-zero
            # filter (no equality can match it) — record it explicitly
            # so the probe can prune instead of treating it as unknown
            per_file = built[c]
            for f in files:
                per_file.setdefault(f, zero)
            out_cols[c] = per_file
    col_types = {
        c: absent_types.get(c, type_by_name.get(c)) for c in cols
    }
    if extra_cols:
        for c, per_file in extra_cols.items():
            out_cols.setdefault(c, per_file)
    if extra_types:
        for c, t in extra_types.items():
            col_types.setdefault(c, t)
    doc = {
        "version": 1, "n_bits": n_bits, "k": k,
        "cols": out_cols, "types": col_types,
    }
    tmp = os.path.join(dir_abs, f".{BLOOM_SIDECAR}.{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, os.path.join(dir_abs, BLOOM_SIDECAR))
    return doc


def load_dir_blooms(dir_abs: str) -> dict | None:
    try:
        with open(os.path.join(dir_abs, BLOOM_SIDECAR)) as fh:
            doc = json.load(fh)
        return doc if doc.get("version") == 1 else None
    except Exception:
        return None


# ----------------------------------------------------- NDV sketch sidecars

NDV_SIDECAR = "_ndv.json"

#: default HLL precision: m = 2^12 = 4096 registers per (file, column)
#: — ~5.5 KB base64 in the sidecar, standard error 1.04/sqrt(m) = 1.6%
NDV_P = 12


def write_dir_ndv(
    spark, dir_abs: str, cols: list[str], p: int = NDV_P,
    extra_cols: dict | None = None,
    schema_types: dict | None = None,
) -> dict | None:
    """Build per-FILE dense HLL registers for ``cols`` over one data
    directory and persist them in an ``_ndv.json`` sidecar (atomic
    temp+rename, advisory metadata) — the zero-scan COUNT(DISTINCT)
    layer (Iceberg records the same statistic in puffin files). The
    union of HLL register arrays is elementwise max — associative,
    commutative, LOSSLESS — so per-file sketches written once at build
    time merge into an exact-union table/partition/version estimate
    driver-side with no Spark job and no rescan, and stay correct
    across compactions that carry files by reference.

    Hashing is the same md5-based canonical-string scheme as the bloom
    sidecars (``_bloom_positions_py``): Spark's xxhash64 is
    JVM-internal, md5-of-CAST(x AS STRING) both engines compute
    bit-exactly. The 60-bit half splits as low ``p`` bits → register
    index, remaining ``60-p`` bits → rank via ``length(bin(w))``
    (exact integer log2 — no float edge cases). Only int-family and
    string columns are accepted, like the blooms. Registers are capped
    at 255 trivially (rank ≤ 60-p+1). Cost: one projection-pruned scan
    of the directory per build; output is O(m) per (file, column)."""
    files = sorted(
        f for f in os.listdir(dir_abs) if f.endswith(".parquet")
    )
    if not files:
        return None
    import base64

    from pyspark.sql import functions as SF

    m = 1 << p
    wbits = 60 - p
    abs_files = [os.path.join(dir_abs, f) for f in files]
    df = spark.read.parquet(*abs_files)
    type_by_name = {f.name: f.dataType.simpleString()
                    for f in df.schema.fields}
    ok_types = {"tinyint", "smallint", "int", "bigint", "string"}
    out_cols: dict[str, dict[str, str]] = {}
    zero = base64.b64encode(bytes(m)).decode("ascii")
    sketch_cols: list[str] = []
    for c in cols:
        t = type_by_name.get(c)
        if t is None and schema_types and c in schema_types:
            # pre-evolution directory: all-NULL column distinct-counts
            # nothing — record empty registers so merges stay exact
            out_cols[c] = {f: zero for f in files}
            continue
        if t is None:
            raise ValueError(f"ndv column {c!r} not in table schema")
        if t not in ok_types:
            raise ValueError(
                f"ndv column {c!r} has type {t} — only int-family and "
                "string keys have a canonical cross-engine string form"
            )
        sketch_cols.append(c)
    if sketch_cols:
        # ONE job for every column: melt each row into per-column
        # (col, bucket, rho) entries and aggregate them together —
        # the directory is scanned once instead of once per column
        # (same md5 hashing, same registers; a NULL value hashes to a
        # NULL bucket and is filtered exactly like the old per-column
        # isNotNull gate). Partial aggregation caps the exploded
        # stream at m entries per (file, column) before the shuffle.
        entries = []
        for c in sketch_cols:
            h = SF.md5(SF.col(c).cast("string"))
            h1 = SF.conv(SF.substring(h, 1, 15), 16, 10).cast("bigint")
            bucket = h1.bitwiseAND(SF.lit(m - 1))
            w = SF.shiftrightunsigned(h1, p)
            rho = SF.when(w == 0, SF.lit(wbits + 1)).otherwise(
                SF.lit(wbits + 1) - SF.length(SF.bin(w)))
            entries.append(SF.struct(
                SF.lit(c).alias("__c"),
                bucket.alias("__b"),
                rho.alias("__r")))
        rows = (
            df.select(SF.input_file_name().alias("__f"),
                      SF.explode(SF.array(*entries)).alias("__e"))
            .select("__f", SF.col("__e.__c").alias("__c"),
                    SF.col("__e.__b").alias("__b"),
                    SF.col("__e.__r").alias("__r"))
            .filter(SF.col("__b").isNotNull())
            .groupBy("__f", "__c", "__b")
            .agg(SF.max("__r").alias("__r"))
            .groupBy("__f", "__c")
            .agg(SF.collect_list(SF.struct("__b", "__r")).alias("__brs"))
            .collect()
        )
        from urllib.parse import unquote

        per_col: dict[str, dict[str, str]] = {c: {} for c in sketch_cols}
        for r in rows:
            uri = r["__f"]
            pth = unquote(uri[7:]) if uri.startswith("file://") else unquote(uri)
            base = os.path.basename(pth)
            regs = bytearray(m)
            for br in r["__brs"]:
                regs[br["__b"]] = br["__r"]
            per_col[r["__c"]][base] = (
                base64.b64encode(bytes(regs)).decode("ascii"))
        for c in sketch_cols:
            for f in files:
                per_col[c].setdefault(f, zero)  # all-NULL file
            out_cols[c] = per_col[c]
    if extra_cols:
        for c, per_file in extra_cols.items():
            out_cols.setdefault(c, per_file)
    doc = {"version": 1, "p": p, "cols": out_cols}
    tmp = os.path.join(dir_abs, f".{NDV_SIDECAR}.{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, os.path.join(dir_abs, NDV_SIDECAR))
    return doc


def load_dir_ndv(dir_abs: str) -> dict | None:
    try:
        with open(os.path.join(dir_abs, NDV_SIDECAR)) as fh:
            doc = json.load(fh)
        return doc if doc.get("version") == 1 else None
    except Exception:
        return None


def ndv_estimate(registers: bytes | bytearray) -> float:
    """The standard HyperLogLog estimator over one dense register
    array: bias-corrected harmonic mean, with linear counting in the
    small range (E ≤ 2.5m with empty registers) — the regime where it
    is strictly MORE accurate. No large-range correction is needed:
    the 60-bit hash space exceeds any table this library will meet."""
    import math as _math

    m = len(registers)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / sum(2.0 ** -r for r in registers)
    zeros = sum(1 for r in registers if r == 0)
    if e <= 2.5 * m and zeros:
        return m * _math.log(m / zeros)
    return e


_INT_FAMILY = {"tinyint", "smallint", "int", "bigint"}


def _literal_matches_bloom_type(v, col_type: str | None) -> bool:
    """A bloom probe is only sound when the literal's canonical string
    form is the SAME one the build hashed — i.e. the literal's Python
    type matches the column's Spark type family exactly. Cross-type
    predicates go through Spark's implicit casts (``'05' = 5`` is true,
    ``'5.0' = 5`` is true on an int column), which md5-of-CAST-to-STRING
    cannot reproduce: the bloom stored md5("05") but would probe
    md5("5") and silently prune a matching file. Sidecars written
    before the ``types`` field existed return None here → never probe."""
    if col_type is None:
        return False
    if col_type == "string":
        return isinstance(v, str)
    if col_type in _INT_FAMILY:
        return isinstance(v, int) and not isinstance(v, bool)
    return False


def _bloom_excludes(doc: dict, base: str, col: str, op: str, val) -> bool:
    """True when the directory's bloom PROVES no row of ``base`` equals
    the literal(s). Only equality ops are bloom-decidable, and only for
    literals whose type exactly matches the column's recorded type —
    any mismatch is maybe-present, mirroring _coerce_literal's
    conservatism in the min/max layer."""
    if op not in ("=", "==", "in"):
        return False
    b64 = doc.get("cols", {}).get(col, {}).get(base)
    if b64 is None:
        return False
    col_type = doc.get("types", {}).get(col)
    import base64

    bits = base64.b64decode(b64)
    n_bits, k = doc["n_bits"], doc["k"]

    def maybe_present(v) -> bool:
        if not _literal_matches_bloom_type(v, col_type):
            return True  # implicit-cast semantics: assume present
        return all(
            bits[p >> 3] & (1 << (p & 7))
            for p in _bloom_positions_py(v, n_bits, k)
        )

    vs = val if op == "in" else [val]
    return not any(maybe_present(v) for v in vs if v is not None)
