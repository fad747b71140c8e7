"""Local driver-mimic: run every queries() entry on Spark and its
oracle_sql() on DuckDB at a given sf dir, compare row count, column set,
and (order-insensitively) values. Exit nonzero on any mismatch.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lazy_frame_spark.plans.audit import (  # noqa: E402
    AUDIT_SKIP_PREFIXES,
    BNLJ_BOUNDED_BUILD,
    SINGLE_TASK_WINDOW_BOUNDED,
    SORTED_SMALL_RESULT,
    scale_warnings,
)
from lazy_frame_spark.session import get_spark  # noqa: E402
from lazy_frame_spark.sources.registry import TABLE_NAMES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

#: the audit skip set lives in plans.audit (shared with the registry-
#: wide sweep test so the two scopes cannot drift)
AUDIT_SKIP = AUDIT_SKIP_PREFIXES


def audit(name: str, sdf) -> tuple[list[str], list[str]]:
    """(hard failures, advisory warnings) from the scale audit: a
    CartesianProduct anywhere, or a BroadcastNestedLoopJoin outside the
    bounded-build allowlist, fails the check — a newly added registry
    query can no longer pass value checks with a regressed plan between
    test runs. Everything else prints as a warning."""
    if name.startswith(AUDIT_SKIP):
        return [], []
    try:
        ws = scale_warnings(sdf)
    except Exception as e:
        # a broken audit helper must NOT disable the hard cartesian/BNLJ
        # gate — surface it as a FAILURE so the run stays red until the
        # helper is fixed (an advisory warn would let every query keep
        # reporting 'ok' with the gate off)
        return [f"plan audit unavailable: {e!r}"], []
    hard, soft = [], []
    for w in ws:
        if w.startswith("CartesianProduct"):
            hard.append(w)
        elif w.startswith("BroadcastNestedLoopJoin"):
            if name not in BNLJ_BOUNDED_BUILD:
                hard.append(w)
            # allowlisted: bounded build side by construction — silent
        elif (
            w.startswith("single-partition window")
            and name in SINGLE_TASK_WINDOW_BOUNDED
        ):
            pass  # window input cut to top-k rows before the rank
        elif w.startswith("global Sort") and name in SORTED_SMALL_RESULT:
            pass  # TPC-H-mandated ORDER BY over a grain-bounded result
        else:
            soft.append(w)
    return hard, soft


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("int64")
        elif s.dtype == object:
            # duckdb may return Decimal / bytes; stringify uniformly
            pdf[c] = s.map(lambda v: v if isinstance(v, (str, bytes, type(None))) else str(v))
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort", na_position="last")
    return pdf.reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    errs = []
    if len(spark_pdf) != len(oracle_pdf):
        errs.append(f"row count {len(spark_pdf)} != oracle {len(oracle_pdf)}")
    scols, ocols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if scols != ocols:
        errs.append(f"columns {scols} != oracle {ocols}")
        return errs
    if errs:
        return errs
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = np.allclose(av.fillna(np.nan), bv.fillna(np.nan), rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            ok = av.fillna("__NULL__").astype(str).equals(bv.fillna("__NULL__").astype(str))
        if not ok:
            mism = (av.astype(str) != bv.astype(str))
            idx = mism[mism].index[:3].tolist()
            errs.append(f"column {c!r} values differ, e.g. rows {idx}: "
                        f"spark={av.iloc[idx[0] if idx else 0]!r} oracle={bv.iloc[idx[0] if idx else 0]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        hard, soft = audit(name, sdf)
        for w in soft:
            print(f"warn {name}: {w}")
        if hard:
            failures += 1
            print(f"FAIL {name}: scale hazard: " + "; ".join(hard))
            continue
        if name not in oracles:
            print(f"okro {name}: rows-only, {len(spark_pdf)} rows")
            continue
        try:
            oracle_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        errs = compare(name, spark_pdf, oracle_pdf)
        if errs:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(errs))
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows")
    print(f"\n{checked} of {len(qs)} queries checked, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
