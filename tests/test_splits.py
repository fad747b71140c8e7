"""Deterministic corpus splitting (operators/splits.py): stability,
proportion bands, partition invariance, bound validation."""

import pytest
from pyspark.sql import functions as F

from lazy_frame_spark.operators import splits as sp


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).withColumnRenamed("id", "doc_id")


def test_split_is_deterministic_and_total(ids):
    a = {r["doc_id"]: r["split"] for r in sp.assign_split(ids, ["doc_id"], seed=3).collect()}
    b = {r["doc_id"]: r["split"] for r in sp.assign_split(ids, ["doc_id"], seed=3).collect()}
    assert a == b
    assert set(a.values()) == {"train", "valid", "test"}
    assert len(a) == 5000  # every row labeled


def test_split_partition_invariant(ids):
    base = {r["doc_id"]: r["split"] for r in sp.assign_split(ids, ["doc_id"], seed=3).collect()}
    shuffled = {
        r["doc_id"]: r["split"]
        for r in sp.assign_split(ids.repartition(17), ["doc_id"], seed=3).collect()
    }
    assert base == shuffled


def test_split_proportions_near_weights(ids):
    counts = {
        r["split"]: r["n_rows"] for r in sp.split_counts(ids, ["doc_id"], seed=3).collect()
    }
    n = sum(counts.values())
    assert n == 5000
    # md5 draw is uniform: 80/10/10 within a generous band
    assert abs(counts["train"] / n - 0.8) < 0.03
    assert abs(counts["valid"] / n - 0.1) < 0.02
    assert abs(counts["test"] / n - 0.1) < 0.02


def test_split_incremental_stability(ids, spark):
    """Growing the corpus never relabels an existing row."""
    small = ids.filter(F.col("doc_id") < 1000)
    before = {r["doc_id"]: r["split"] for r in sp.assign_split(small, ["doc_id"], seed=3).collect()}
    after = {
        r["doc_id"]: r["split"]
        for r in sp.assign_split(ids, ["doc_id"], seed=3).collect()
        if r["doc_id"] < 1000
    }
    assert before == after


def test_split_seed_changes_assignment(ids):
    a = {r["doc_id"]: r["split"] for r in sp.assign_split(ids, ["doc_id"], seed=3).collect()}
    b = {r["doc_id"]: r["split"] for r in sp.assign_split(ids, ["doc_id"], seed=4).collect()}
    assert a != b


def test_split_bad_bounds_rejected(ids):
    with pytest.raises(ValueError):
        sp.assign_split(ids, ["doc_id"], weights_bp={"train": 9000, "valid": 8000, "test": 10000})
    with pytest.raises(ValueError):
        sp.assign_split(ids, ["doc_id"], weights_bp={"train": 5000, "test": 9999})
