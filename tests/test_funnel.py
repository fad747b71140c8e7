"""Funnel analysis (operators/funnel.py): strict ordering, conversion
windows, monotone counts, single-job plan shape."""

from datetime import datetime

import pytest

from lazy_frame_spark.operators import funnel as fn


def _e(i, ts, user, typ):
    return (i, datetime(2024, 1, 1, *ts), user, typ)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1 completes view → click → purchase in order
        _e(1, (9, 0), 1, "view"),
        _e(2, (10, 0), 1, "click"),
        _e(3, (11, 0), 1, "purchase"),
        # user 2: click BEFORE view — click must not count
        _e(4, (8, 0), 2, "click"),
        _e(5, (9, 0), 2, "view"),
        # user 3: view then purchase, no click — stops at stage 1
        _e(6, (9, 0), 3, "view"),
        _e(7, (10, 0), 3, "purchase"),
        # user 4: full funnel but click arrives 3 days later
        (8, datetime(2024, 1, 1, 9, 0), 4, "view"),
        (9, datetime(2024, 1, 4, 9, 0), 4, "click"),
        (10, datetime(2024, 1, 4, 10, 0), 4, "purchase"),
        # user 5 never views
        _e(11, (9, 0), 5, "purchase"),
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")


def test_funnel_strict_ordering(events):
    counts = {
        r["stage"]: r["n_users"]
        for r in fn.funnel_counts(events, ["view", "click", "purchase"]).collect()
    }
    # users 1-4 viewed; only 1 and 4 clicked after viewing; both purchased after
    assert counts == {"view": 4, "click": 2, "purchase": 2}


def test_funnel_conversion_window(events):
    counts = {
        r["stage"]: r["n_users"]
        for r in fn.funnel_counts(
            events, ["view", "click", "purchase"], max_gap="1 DAY"
        ).collect()
    }
    # user 4's click is 3 days after the view: outside the window
    assert counts == {"view": 4, "click": 1, "purchase": 1}


def test_funnel_stage_times_values(events):
    row = {
        r["user_id"]: r
        for r in fn.funnel_stage_times(events, ["view", "click", "purchase"]).collect()
    }
    assert row[1]["t1"] == datetime(2024, 1, 1, 9, 0)
    assert row[1]["t2"] == datetime(2024, 1, 1, 10, 0)
    assert row[1]["t3"] == datetime(2024, 1, 1, 11, 0)
    assert row[2]["t2"] is None  # click preceded view
    assert row[3]["t2"] is None and row[3]["t3"] is None  # no click → no purchase
    assert 5 not in row  # never entered the funnel


def test_funnel_counts_monotone(events):
    rows = sorted(
        fn.funnel_counts(events, ["view", "click", "purchase"]).collect(),
        key=lambda r: r["stage_idx"],
    )
    ns = [r["n_users"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_funnel_empty_stage_list(events):
    with pytest.raises(ValueError):
        fn.funnel_counts(events, [])
