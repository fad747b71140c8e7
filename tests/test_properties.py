"""Property-based tests (hypothesis): the typed predicate engine matches a
Python reference model of the reference's semantics, and positional
selection is set-semantics over 1..n for arbitrary index requests.

One shared fixture table; low example counts (every example is a Spark
action)."""

import math

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lazy_frame_spark import LazyFrame
from lazy_frame_spark.functions.compare import OPS, typed_compare

CELLS = [
    "0", "1", "-3", "4.5", "-4.5", "7", "42", "1e2", "1e300", "abc", "",
    "0.1", "  12  ", "3.14159", "-0.0", "nan", "99999999999999999999",
    # boundary & parser-divergence cells (found by grid fuzzing):
    "9223372036854775807",   # double rounds to 2^63 → saturates to int64max
    "-9223372036854775808",  # exactly -2^63 → int64min
    "1_000",                 # Python float() accepts; SQL try_cast rejects
    "inf", "-inf", "+7", ".5", "5.",
]


def _sql_float(s: str):
    """SQL try_cast-to-double model: like Python float() MINUS the
    Python-only underscore-digit-grouping extension."""
    if "_" in s:
        return None
    try:
        return float(s)
    except ValueError:
        return None


@pytest.fixture(scope="module")
def strings_df(spark):
    return spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(CELLS)], "rid long, s string"
    )


def _atoi_model(s: str):
    """What the engine promises for int-RHS comparisons on raw text:
    SQL float-parse then truncate toward zero; NaN/out-of-range → None;
    doubles at exactly ±2^63 saturate to Long min/max (Spark's
    double→long conversion, strtol-like — fuzz-verified)."""
    f = _sql_float(s)
    if f is None or math.isnan(f):
        return None
    if f >= 2**63:
        return 2**63 - 1 if f == 2**63 else None
    if f < -(2**63):
        return None
    return int(f)  # trunc toward zero; exactly -2^63 is in range


def _strtod_model(s: str):
    return _sql_float(s)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    op=st.sampled_from(sorted(OPS)),
    value=st.integers(min_value=-50, max_value=150),
)
def test_int_rhs_matches_atoi_model(strings_df, op, value):
    got = sorted(
        r["rid"]
        for r in strings_df.filter(typed_compare(F.col("s"), op, value)).collect()
    )
    import operator as _op

    pyop = {"==": _op.eq, "!=": _op.ne, ">=": _op.ge, "<=": _op.le,
            ">": _op.gt, "<": _op.lt}[op]
    want = []
    for i, s in enumerate(CELLS):
        m = _atoi_model(s)
        if m is not None and pyop(m, value):
            want.append(i + 1)
    assert got == want, (op, value, got, want)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    op=st.sampled_from(sorted(OPS)),
    value=st.floats(min_value=-10, max_value=110, allow_nan=False, width=16),
)
def test_double_rhs_matches_strtod_model(strings_df, op, value):
    value = float(value)
    got = sorted(
        r["rid"]
        for r in strings_df.filter(typed_compare(F.col("s"), op, value)).collect()
    )
    import operator as _op

    pyop = {"==": _op.eq, "!=": _op.ne, ">=": _op.ge, "<=": _op.le,
            ">": _op.gt, "<": _op.lt}[op]
    want = []
    for i, s in enumerate(CELLS):
        f = _sql_float(s)
        if f is None:
            continue
        if math.isnan(f):
            # a parseable literal 'nan' follows Spark SQL NaN ordering:
            # NaN is greater than every value and equal to itself —
            # vs RHS non-NaN: >, >=, != are true; ==, <, <= false
            if op in (">", ">=", "!="):
                want.append(i + 1)
            continue
        if pyop(f, value):
            want.append(i + 1)
    assert got == want, (op, value, got, want)


@pytest.fixture(scope="module")
def small_lf(spark):
    df = spark.range(1, 41).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    return LazyFrame.from_df(df, order_by=["k"])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    idx=st.lists(st.integers(min_value=1, max_value=60), min_size=0, max_size=25)
)
def test_rows_is_set_semantics_in_order(small_lf, idx):
    got = [
        r["__row_id__"]
        for r in small_lf.rows(idx)
        .to_df(with_row_id=True)
        .orderBy("__row_id__")
        .collect()
    ]
    want = sorted({i for i in idx if 1 <= i <= 40})
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lo=st.integers(min_value=1, max_value=40),
    span=st.integers(min_value=0, max_value=39),
)
def test_row_range_inclusive(small_lf, lo, span):
    hi = min(lo + span, 40)
    n = small_lf.row_range(lo, hi).nrow()
    assert n == hi - lo + 1


def test_physical_slot_assignment_invariants():
    """Pure-python property test for _assign_physical_slots: across
    random rename/drop/add histories, (1) live physical slots stay
    unique, (2) a new column never lands in a retired or live slot,
    (3) columns that keep their name keep their slot."""
    import json
    import random

    from lazy_frame_spark.sources.versioned import (
        _assign_physical_slots,
        _col_mapping,
        _occupied_slots,
    )

    rng = random.Random(99)
    for _trial in range(200):
        # synthetic manifest state after a random history
        n_live = rng.randint(1, 6)
        live = [f"c{i}" for i in range(n_live)]
        mapping = {}
        retired = set()
        # random renames: some live columns point at other slots
        for c in list(live):
            if rng.random() < 0.4:
                slot = f"p{rng.randrange(10)}"
                if slot not in {mapping.get(x, x) for x in live} \
                        and slot not in retired:
                    mapping[c] = slot
        # random retired slots (dropped columns' storage)
        for _ in range(rng.randrange(3)):
            slot = f"r{rng.randrange(10)}"
            if slot not in {mapping.get(x, x) for x in live}:
                retired.add(slot)
        man = {
            "schema": json.dumps({"type": "struct", "fields": [
                {"name": c, "type": "long", "nullable": True,
                 "metadata": {}} for c in live
            ]}),
            "column_mapping": mapping,
            "retired_columns": sorted(retired),
        }
        # batch adds 1-3 new columns, names drawn to collide sometimes
        pool = (live + list(retired)
                + [mapping.get(c, c) for c in live]
                + [f"new{i}" for i in range(4)])
        added = []
        for nm in rng.sample(pool, k=min(len(pool), rng.randint(1, 3))):
            if nm not in live and nm not in added:
                added.append(nm)
        merged = {
            "type": "struct", "fields": [
                {"name": c, "type": "long", "nullable": True,
                 "metadata": {}} for c in live + added
            ]
        }
        assigned = _assign_physical_slots(man, json.dumps(merged))
        final_map = {**_col_mapping(man), **assigned}
        slots = [final_map.get(c, c) for c in live + added]
        # (1) uniqueness of live physical slots
        assert len(slots) == len(set(slots)), (mapping, retired, added)
        # (2) new columns avoid retired AND pre-existing live slots
        pre_occupied = _occupied_slots(man)
        for a in added:
            got = final_map.get(a, a)
            if a in pre_occupied:
                assert got != a and got not in pre_occupied
            else:
                assert got == a  # free name: writes under itself
        # (3) survivors keep their slots
        for c in live:
            assert final_map.get(c, c) == mapping.get(c, c)
