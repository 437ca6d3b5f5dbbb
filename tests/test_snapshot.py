"""snapshot_diff: classification, null-safe compares, default columns."""

from __future__ import annotations

from entity_extractor_spark.operators.snapshot import snapshot_diff

SCHEMA = "k bigint, a string, b bigint"


def _diff(spark, old, new, **kw):
    o = spark.createDataFrame(old, SCHEMA)
    n = spark.createDataFrame(new, SCHEMA)
    return {r["k"]: r["change"] for r in snapshot_diff(o, n, "k", **kw).collect()}


def test_snapshot_diff_classes(spark):
    old = [(1, "x", 10), (2, "y", 20), (3, "z", 30)]
    new = [(2, "y", 20), (3, "z", 31), (4, "w", 40)]
    assert _diff(spark, old, new) == {1: "removed", 3: "changed", 4: "added"}


def test_snapshot_diff_null_safe(spark):
    """NULL -> value, value -> NULL and NULL -> NULL all classify
    correctly (a naive equality would treat every NULL row as changed)."""
    old = [(1, None, 1), (2, "v", 2), (3, None, 3)]
    new = [(1, "now", 1), (2, None, 2), (3, None, 3)]
    assert _diff(spark, old, new) == {1: "changed", 2: "changed"}


def test_snapshot_diff_scoped_compare(spark):
    """Columns outside `compare` don't trigger 'changed'."""
    old = [(1, "same", 10)]
    new = [(1, "same", 99)]
    assert _diff(spark, old, new, compare=["a"]) == {}
    assert _diff(spark, old, new) == {1: "changed"}


def test_snapshot_diff_identical_snapshots_empty(spark):
    rows = [(i, f"t{i}", i * 2) for i in range(50)]
    assert _diff(spark, rows, rows) == {}
