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


# ------------------------------------------------------------ dataset_digest --


def test_digest_order_and_partition_invariant(spark):
    from entity_extractor_spark.operators.snapshot import dataset_digest

    rows = [(i, f"t{i % 7}") for i in range(200)]
    a = spark.createDataFrame(rows, "id long, t string").repartition(1)
    b = (
        spark.createDataFrame(list(reversed(rows)), "id long, t string")
        .repartition(13, "t")
    )
    da = dataset_digest(a, ["id", "t"]).head()
    db = dataset_digest(b, ["id", "t"]).head()
    assert (da["n_rows"], da["digest1"], da["digest2"]) == (
        db["n_rows"], db["digest1"], db["digest2"],
    )


def test_digest_detects_any_change_and_duplicates(spark):
    from entity_extractor_spark.operators.snapshot import dataset_digest

    base = [(1, "a"), (2, "b"), (3, "c")]
    d0 = dataset_digest(
        spark.createDataFrame(base, "id long, t string"), ["id", "t"]
    ).head()
    # one value changed
    d1 = dataset_digest(
        spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "id long, t string"),
        ["id", "t"],
    ).head()
    assert (d1["digest1"], d1["digest2"]) != (d0["digest1"], d0["digest2"])
    # duplicated row changes the multiset even though the SET is equal
    d2 = dataset_digest(
        spark.createDataFrame(base + [(3, "c")], "id long, t string"),
        ["id", "t"],
    ).head()
    assert d2["n_rows"] == 4
    assert (d2["digest1"], d2["digest2"]) != (d0["digest1"], d0["digest2"])


def test_digest_null_vs_empty_vs_sentinel(spark):
    from entity_extractor_spark.operators.snapshot import dataset_digest

    dn = dataset_digest(
        spark.createDataFrame([(1, None)], "id long, t string"), ["id", "t"]
    ).head()
    de = dataset_digest(
        spark.createDataFrame([(1, "")], "id long, t string"), ["id", "t"]
    ).head()
    ds = dataset_digest(
        spark.createDataFrame([(1, "<NULL>")], "id long, t string"), ["id", "t"]
    ).head()
    digs = {(d["digest1"], d["digest2"]) for d in (dn, de, ds)}
    assert len(digs) == 3


def test_digest_grouped_and_python_replay(spark):
    import hashlib

    from entity_extractor_spark.operators.snapshot import dataset_digest

    rows = [(i, f"g{i % 3}", f"v{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, g string, v string")
    got = {
        r["g"]: (r["n_rows"], r["digest1"], r["digest2"])
        for r in dataset_digest(df, ["id", "g", "v"], ["g"]).collect()
    }
    P = (1 << 61) - 1
    want: dict = {}
    for i, g, v in rows:
        rep = f"{i}\x1f{g}\x1f{v}".encode()
        hx = hashlib.md5(rep).hexdigest()
        n, s1, s2 = want.get(g, (0, 0, 0))
        want[g] = (n + 1, s1 + int(hx[:12], 16), s2 + int(hx[12:24], 16))
    want = {g: (n, s1 % P, s2 % P) for g, (n, s1, s2) in want.items()}
    assert got == want


def test_digest_rejects_empty_cols(spark):
    import pytest

    from entity_extractor_spark.operators.snapshot import dataset_digest

    with pytest.raises(ValueError):
        dataset_digest(spark.range(1), [])
