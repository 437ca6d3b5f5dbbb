"""Bloom-filter semi-join pruning: build/probe exactness, the
no-false-negative invariant, NULL semantics, stats algebra, and the
zero-fact-shuffle probe plan."""

import pytest

from pyspark.sql import functions as F

from entity_extractor_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
    bloom_semi_join,
    bloom_stats,
)

M, K = 1024, 3


def _py_pos(key, i, m):
    import hashlib

    h = hashlib.md5(f"{key}|{i}".encode()).hexdigest()
    return int(h[:12], 16) % m


def _py_bloom(keys, m, k):
    bits = set()
    for key in keys:
        for i in range(1, k + 1):
            bits.add(_py_pos(key, i, m))
    return bits


# ----------------------------------------------------------------- build --

def test_build_matches_python_replay(spark):
    keys = [1, 2, 3, 500, 9999, 2, 1]  # dups collapse
    df = spark.createDataFrame([(key,) for key in keys], "k long")
    got = {r.word_idx: r.bits for r in bloom_build(df, "k", M, K).collect()}
    want: dict[int, int] = {}
    for p in _py_bloom(set(keys), M, K):
        want[p // 63] = want.get(p // 63, 0) | (1 << (p % 63))
    assert got == want
    assert all(b > 0 for b in got.values())  # only non-empty words stored
    assert all(b < (1 << 63) for b in got.values())  # sign bit never set


def test_build_skips_null_keys(spark):
    df = spark.createDataFrame([(None,), (7,)], "k long")
    got = {r.word_idx: r.bits for r in bloom_build(df, "k", M, K).collect()}
    want: dict[int, int] = {}
    for p in _py_bloom([7], M, K):
        want[p // 63] = want.get(p // 63, 0) | (1 << (p % 63))
    assert got == want


def test_build_string_keys(spark):
    df = spark.createDataFrame([("alice",), ("bob",)], "k string")
    got = {r.word_idx: r.bits for r in bloom_build(df, "k", M, K).collect()}
    want: dict[int, int] = {}
    for p in _py_bloom(["alice", "bob"], M, K):
        want[p // 63] = want.get(p // 63, 0) | (1 << (p % 63))
    assert got == want


# ----------------------------------------------------------------- probe --

def test_probe_no_false_negatives_and_exact_flags(spark):
    """Every built key probes TRUE; every other key's flag equals the
    Python replay of the k-position test (false positives included)."""
    members = list(range(0, 400, 7))
    df_dim = spark.createDataFrame([(k,) for k in members], "k long")
    bloom = bloom_build(df_dim, "k", M, K)
    probe_keys = list(range(400))
    facts = spark.createDataFrame([(k,) for k in probe_keys], "k long")
    got = {
        r.k: r.bloom_maybe
        for r in bloom_probe(facts, "k", bloom, M, K).collect()
    }
    bits = _py_bloom(members, M, K)
    member_set = set(members)
    fp = 0
    for k in probe_keys:
        want = all(_py_pos(k, i, M) in bits for i in range(1, K + 1))
        assert got[k] == want
        if k in member_set:
            assert got[k] is True  # the invariant that matters
        elif want:
            fp += 1
    # with 58 keys * 3 hashes in 1024 bits some false positives are
    # expected but not all probes may hit; just record it's bounded
    assert fp < len(probe_keys)


def test_probe_null_key_flags_false(spark):
    dim = spark.createDataFrame([(1,)], "k long")
    bloom = bloom_build(dim, "k", M, K)
    facts = spark.createDataFrame([(1,), (None,)], "k long")
    got = {r.k: r.bloom_maybe for r in
           bloom_probe(facts, "k", bloom, M, K).collect()}
    assert got == {1: True, None: False}


def test_probe_preserves_columns_and_rows(spark):
    dim = spark.createDataFrame([(1,)], "k long")
    bloom = bloom_build(dim, "k", M, K)
    facts = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b")], "k long, v string"
    )
    out = bloom_probe(facts, "k", bloom, M, K)
    assert out.columns == ["k", "v", "bloom_maybe"]
    assert out.count() == 3  # duplicates kept, nothing dropped


def test_semi_join_is_superset_of_true_semi_join(spark):
    members = [3, 5, 8, 13, 21]
    dim = spark.createDataFrame([(k,) for k in members], "k long")
    bloom = bloom_build(dim, "k", M, K)
    facts = spark.createDataFrame([(k,) for k in range(30)], "k long")
    kept = {r.k for r in bloom_semi_join(facts, "k", bloom, M, K).collect()}
    assert set(members) <= kept  # no false negatives
    bits = _py_bloom(members, M, K)
    want = {
        k for k in range(30)
        if all(_py_pos(k, i, M) in bits for i in range(1, K + 1))
    }
    assert kept == want


def test_probe_plan_never_shuffles_the_fact_side(spark):
    """The probe is k broadcast joins: with the bloom table
    materialized, the executed plan must contain zero hash-partition
    Exchanges — only BroadcastExchange."""
    dim = spark.createDataFrame([(k,) for k in range(50)], "k long")
    rows = bloom_build(dim, "k", M, K).collect()
    bloom = spark.createDataFrame(rows, "word_idx long, bits long")
    facts = spark.createDataFrame([(k,) for k in range(200)], "k long")
    out = bloom_probe(facts, "k", bloom, M, K)
    out.collect()
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if ("Exchange" in line and "Broadcast" not in line
                and "ReusedExchange" not in line):
            raise AssertionError(f"fact-side shuffle in probe plan: {line}")


# ----------------------------------------------------------------- stats --

def test_stats_exact_on_known_filter(spark):
    # hand-built filter: two words, 3 + 2 bits set, m = 1024, k = 2
    bloom = spark.createDataFrame(
        [(0, 0b10110), (5, 0b1001)], "word_idx long, bits long"
    )
    r = bloom_stats(bloom, 1024, 2).collect()[0]
    assert (r.n_words, r.bits_set) == (2, 5)
    assert r.saturation_ppm == 5 * 10**6 // 1024  # 4882
    assert r.est_fp_ppm == (4882 * 4882) // 10**6  # 23


def test_stats_empty_filter_all_zero(spark):
    bloom = spark.createDataFrame([], "word_idx long, bits long")
    r = bloom_stats(bloom, 1024, 3).collect()[0]
    assert (r.n_words, r.bits_set, r.saturation_ppm, r.est_fp_ppm) == (
        0, 0, 0, 0,
    )


def test_stats_matches_probe_reality(spark):
    """est_fp_ppm should approximate the observed FP rate order of
    magnitude on a dense-ish filter (sanity, not a bound)."""
    members = list(range(1000, 1200))
    dim = spark.createDataFrame([(k,) for k in members], "k long")
    bloom = bloom_build(dim, "k", 2048, 2)
    est = bloom_stats(bloom, 2048, 2).collect()[0].est_fp_ppm
    facts = spark.createDataFrame([(k,) for k in range(1000)], "k long")
    n_fp = bloom_probe(facts, "k", bloom, 2048, 2).where(
        F.col("bloom_maybe")
    ).count()
    obs_ppm = n_fp * 10**6 // 1000
    assert est > 0
    assert obs_ppm < 4 * est + 50_000  # same order, generous slack


# ------------------------------------------------------------ validation --

def test_validation_errors(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(df, "k", 32, 3)
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(df, "k", True, 3)  # bool is not an int here
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(df, "k", 1 << 41, 3)  # past the 48-bit hash range
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_build(df, "k", 1024, 0)
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_build(df, "k", 1024, 9)
    bloom = bloom_build(df, "k", 1024, 3)
    with pytest.raises(ValueError, match="already exists"):
        bloom_probe(df.withColumn("bloom_maybe", F.lit(True)),
                    "k", bloom, 1024, 3)
    with pytest.raises(ValueError, match="overflows"):
        bloom_stats(bloom, 1024, 7)
