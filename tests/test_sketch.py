"""KMV distinct-count sketch gates: exact below k, sane estimates above
k, pure-Python replay of the exact arithmetic, and MERGEABILITY — the
property that lets per-shard sketches aggregate without a re-scan."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.operators.sketch import HASH_SPACE, kmv_distinct


def _py_hash(key) -> int:
    return int(hashlib.md5(f"{key}|kmv".encode()).hexdigest()[:12], 16)


def _py_kmv(keys, k) -> tuple[int, int]:
    hs = sorted({_py_hash(x) for x in keys})[:k]
    if len(hs) < k:
        return len(hs), len(hs)
    return k, (k - 1) * HASH_SPACE // hs[-1]


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("g", f"k{i % 7}") for i in range(100)], "grp string, key string"
    )
    row = kmv_distinct(df, "grp", "key", k=32).head()
    assert (row["n_kept"], row["est_distinct"]) == (7, 7)


def test_kmv_matches_python_replay_and_is_accurate(spark):
    n = 5000
    df = spark.createDataFrame(
        [("g", f"key-{i}") for i in range(n)], "grp string, key string"
    )
    row = kmv_distinct(df, "grp", "key", k=256).head()
    exp_kept, exp_est = _py_kmv([f"key-{i}" for i in range(n)], 256)
    assert (row["n_kept"], row["est_distinct"]) == (exp_kept, exp_est)
    # bottom-k with k=256 has ~1/sqrt(k) ~ 6% relative error; allow 20%
    assert abs(row["est_distinct"] - n) / n < 0.20


def test_kmv_mergeable(spark):
    """sketch(A | B) == merge(sketch(A), sketch(B)): union the two hash
    sets, re-take the k smallest — per-shard sketches aggregate exactly."""
    k = 64
    a_keys = [f"a-{i}" for i in range(500)]
    b_keys = [f"b-{i}" for i in range(400)] + a_keys[:100]  # overlap
    # driver-side merge of the two python sketches
    a_hs = sorted({_py_hash(x) for x in a_keys})[:k]
    b_hs = sorted({_py_hash(x) for x in b_keys})[:k]
    merged = sorted(set(a_hs) | set(b_hs))[:k]
    est_merged = (k - 1) * HASH_SPACE // merged[-1]
    # the sketch of the union, computed distributed
    df = spark.createDataFrame(
        [("u", x) for x in a_keys + b_keys], "grp string, key string"
    )
    row = kmv_distinct(df, "grp", "key", k=k).head()
    assert row["est_distinct"] == est_merged


def test_kmv_rejects_tiny_k(spark):
    df = spark.createDataFrame([("g", "x")], "grp string, key string")
    with pytest.raises(ValueError):
        kmv_distinct(df, "grp", "key", k=1)


def test_kmv_slice_jaccard_exact_below_k(spark):
    """Below k every estimate is the exact distinct count, so jaccard is
    the exact inclusion-exclusion value."""
    from entity_extractor_spark.operators.sketch import kmv_slice_jaccard

    rows = [("A", f"k{i}") for i in range(10)] + [("B", f"k{i}") for i in range(5, 20)]
    df = spark.createDataFrame(rows, "s string, k string")
    r = kmv_slice_jaccard(df, "s", "k", k=64).head()
    assert (r["slice_a"], r["slice_b"]) == ("A", "B")
    assert (r["est_a"], r["est_b"], r["est_union"]) == (10, 15, 20)
    assert r["est_intersection"] == 5
    assert r["jaccard_ppm"] == 5 * 1_000_000 // 20


def test_kmv_slice_jaccard_matches_python_sketch_algebra(spark):
    """Above k the pairwise row must equal the pure-Python replay of the
    same sketch algebra (merge = union hashes, re-take k smallest)."""
    from entity_extractor_spark.operators.sketch import kmv_slice_jaccard

    k = 32
    a_keys = [f"x-{i}" for i in range(300)]
    b_keys = [f"x-{i}" for i in range(150, 500)]
    df = spark.createDataFrame(
        [("A", x) for x in a_keys] + [("B", x) for x in b_keys], "s string, k string"
    )

    def sk(keys):
        return sorted({_py_hash(x) for x in keys})[:k]

    def est(hs):
        return len(hs) if len(hs) < k else (k - 1) * HASH_SPACE // hs[k - 1]

    ea, eb = est(sk(a_keys)), est(sk(b_keys))
    eu = est(sorted(set(sk(a_keys)) | set(sk(b_keys)))[:k])
    ei = max(0, ea + eb - eu)
    r = kmv_slice_jaccard(df, "s", "k", k=k).head()
    assert (r["est_a"], r["est_b"], r["est_union"], r["est_intersection"]) == (
        ea, eb, eu, ei,
    )
    assert r["jaccard_ppm"] == ei * 1_000_000 // eu
    # ground truth jaccard = 150/500 = 0.30; sketch at k=32 is rough but sane
    assert 0.05 < r["jaccard_ppm"] / 1e6 < 0.65
