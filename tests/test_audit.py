"""constraint_audit gates: exact violation counts, strict NULL-counts-as-
violation semantics, one-pass plan shape (no joins, single exchange)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.operators.audit import constraint_audit


def test_counts_and_ppm(spark):
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(100)], "id long, v long"
    )
    out = constraint_audit(
        df,
        {
            "v_below_3": F.col("v") < 3,
            "id_nonneg": F.col("id") >= 0,
            "never": F.lit(False),
        },
    ).collect()
    by = {r["rule"]: r for r in out}
    assert by["v_below_3"]["violations"] == 25
    assert by["v_below_3"]["violation_ppm"] == 250_000
    assert by["id_nonneg"]["violations"] == 0
    assert by["never"]["violations"] == 100
    assert all(r["total_rows"] == 100 for r in out)


def test_null_counts_as_violation(spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], "v int")
    out = constraint_audit(df, {"v_pos": F.col("v") > 0}).head()
    assert out["violations"] == 1  # the NULL row


def test_rejects_empty_rules(spark):
    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError):
        constraint_audit(df, {})


def test_single_pass_plan(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v int")
    plan = constraint_audit(
        df, {"a": F.col("v") > 0, "b": F.col("v") < 5}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1


# ---------------------------------------------------------------- profiler --

def test_profile_columns_known_answer(spark):
    from entity_extractor_spark.operators.audit import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "a")], "x long, s string"
    )
    got = {r["column"]: r for r in profile_columns(df, ["x", "s"]).collect()}
    assert set(got) == {"x", "s"}
    x = got["x"]
    assert (x["total_rows"], x["non_null"], x["nulls"]) == (4, 3, 1)
    assert x["null_ppm"] == 250_000
    assert x["n_distinct"] == 2          # NULL not counted
    assert (x["min_str"], x["max_str"]) == ("1", "2")
    s = got["s"]
    assert (s["nulls"], s["n_distinct"], s["min_str"], s["max_str"]) == (
        1, 2, "a", "b",
    )


def test_profile_columns_min_is_value_order_not_string_order(spark):
    from entity_extractor_spark.operators.audit import profile_columns

    # string-ordering min of {9, 100} would be "100"; value min is 9
    df = spark.createDataFrame([(9,), (100,)], "x long")
    r = profile_columns(df, ["x"]).head()
    assert (r["min_str"], r["max_str"]) == ("9", "100")


def test_profile_columns_all_null_and_empty_validation(spark):
    from entity_extractor_spark.operators.audit import profile_columns

    df = spark.createDataFrame([(None,), (None,)], "x string")
    r = profile_columns(df, ["x"]).head()
    assert (r["non_null"], r["nulls"], r["null_ppm"], r["n_distinct"]) == (
        0, 2, 1_000_000, 0,
    )
    assert r["min_str"] is None and r["max_str"] is None
    with pytest.raises(ValueError):
        profile_columns(df, [])


# ------------------------------------------------------------ MAD outliers --

def _brute_mad(rows, k_ppm=3_500_000):
    """rows: (grp, id, val). Type-1 medians, integer flag predicate."""
    byg: dict = {}
    for g, i, v in rows:
        if None not in (g, i, v):
            byg.setdefault(g, []).append((i, v))
    out = {}
    for g, pairs in byg.items():
        vals = sorted(v for _, v in pairs)
        med = vals[(len(vals) + 1) // 2 - 1]
        devs = sorted(abs(v - med) for _, v in pairs)
        mad = devs[(len(devs) + 1) // 2 - 1]
        for i, v in pairs:
            adev = abs(v - med)
            if adev * 1_000_000 > k_ppm * mad:
                out[(g, i)] = (
                    v, med, adev, mad,
                    adev * 1_000_000 // mad if mad > 0 else None,
                )
    return out


def test_mad_outliers_known_answer(spark):
    from entity_extractor_spark.operators.audit import mad_outliers

    # g: values 10,10,10,11,12,100 -> med 10, devs 0,0,0,1,2,90 -> mad 0
    # mad=0 flags ANY nonzero deviation, robust_ppm NULL
    rows = [("g", i, v) for i, v in enumerate([10, 10, 10, 11, 12, 100])]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = {
        (r["g"], r["id"]): (r["value"], r["med"], r["abs_dev"], r["mad"],
                            r["robust_ppm"])
        for r in mad_outliers(df, "g", "id", "v").collect()
    }
    assert got == _brute_mad(rows)
    assert len(got) == 3  # 11, 12, 100 all deviate from a mad-0 group


def test_mad_outliers_resists_contamination(spark):
    from entity_extractor_spark.operators.audit import mad_outliers

    # one 10^9 sentinel must NOT drag the fence: the moderate outlier 40
    # (med 10, mad 1, z=30) stays flagged alongside the sentinel
    rows = [("g", i, v) for i, v in enumerate([8, 9, 10, 10, 11, 12, 40,
                                               10**9])]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = {r["id"]: r["robust_ppm"]
           for r in mad_outliers(df, "g", "id", "v").collect()}
    assert set(got) == {6, 7}
    assert got[6] == 30_000_000


@pytest.mark.parametrize("seed", [31, 32])
def test_mad_outliers_matches_bruteforce(spark, seed):
    import random

    from entity_extractor_spark.operators.audit import mad_outliers

    rng = random.Random(seed)
    rows = [
        (f"g{rng.randrange(3)}", i,
         rng.randrange(100) if rng.random() < 0.9 else rng.randrange(10_000))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = {
        (r["g"], r["id"]): (r["value"], r["med"], r["abs_dev"], r["mad"],
                            r["robust_ppm"])
        for r in mad_outliers(df, "g", "id", "v").collect()
    }
    assert got == _brute_mad(rows)


def test_mad_outliers_validates(spark):
    from entity_extractor_spark.operators.audit import mad_outliers

    df = spark.createDataFrame([("g", 1, 2)], "g string, id long, v long")
    for bad in (0, -1, 2.5, True):
        with pytest.raises(ValueError):
            mad_outliers(df, "g", "id", "v", k_ppm=bad)


def test_source_scorecard_python_replay(spark):
    import hashlib
    from collections import defaultdict

    from entity_extractor_spark.operators.audit import source_scorecard

    docs = [
        ("a", 1, "one two three"),
        ("a", 2, "one two three"),          # exact dup of doc 1
        ("a", 3, "x " * 60),                # long doc
        ("b", 4, "short doc"),
        (None, 5, "dropped null source"),
    ]
    df = spark.createDataFrame(docs, "source string, doc_id long, text string")
    out = {r.source: r.asDict() for r in
           source_scorecard(df, "source", "text", short_tokens=5).collect()}
    per = defaultdict(list)
    for s, _, t in docs:
        if s is not None:
            per[s].append(t)
    for s, texts in per.items():
        n = len(texts)
        toks = [len(t.strip().lower().split()) for t in texts]
        dups = n - len({hashlib.md5(t.encode()).hexdigest() for t in texts})
        short = sum(1 for x in toks if x < 5)
        row = out[s]
        assert row["n_docs"] == n and row["total_tokens"] == sum(toks)
        assert row["mean_tokens_ppm"] == sum(toks) * 1_000_000 // n
        assert row["exact_dup_ppm"] == dups * 1_000_000 // n
        assert (row["short_docs"], row["short_ppm"]) == (short, short * 1_000_000 // n)
    assert set(out) == {"a", "b"}


def test_source_scorecard_null_and_blank_text_semantics(spark):
    from entity_extractor_spark.operators.audit import source_scorecard

    df = spark.createDataFrame(
        [("s", "real doc here"), ("s", None), ("s", None), ("s", "   ")],
        "source string, text string",
    )
    row = source_scorecard(df, "source", "text", short_tokens=2).collect()[0]
    # NULL/blank texts count zero tokens (split('') would say 1)
    assert row.total_tokens == 3
    # the two NULL texts are ONE sentinel hash group: 4 docs, 3 distinct
    # hashes (real, <NULL>, blank) -> exactly one duplicate
    assert row.exact_dup_ppm == 1 * 1_000_000 // 4
    assert row.short_docs == 3  # both NULLs + the blank are short


def test_functional_dependencies_nulls_and_fanout(spark):
    from entity_extractor_spark.operators.audit import functional_dependencies

    df = spark.createDataFrame(
        [
            (1, "a", 10),
            (1, "a", 10),     # same key, same dep -> no violation
            (2, "b", 20),
            (2, None, 20),    # NULL dep counts as a value -> violation
            (None, "c", 30),  # NULL determinant row excluded
            (3, "d", 30),
            (3, "e", 30),
            (3, "f", 30),     # key 3 fans out to 3 deps
        ],
        "k int, v string, z int",
    )
    rows = {
        (r.determinant, r.dependent): r
        for r in functional_dependencies(df, [("k", "v"), ("z", "k")]).collect()
    }
    kv = rows[("k", "v")]
    assert (kv.n_keys, kv.n_viol_keys, kv.max_distinct_deps, kv.fd_holds) == (
        3, 2, 3, False,
    )
    zk = rows[("z", "k")]
    # z=10->{1}, z=20->{2}, z=30->{NULL? no - det side here is z, dep k:
    # 30 -> {<NULL> excluded? NULL dep becomes sentinel} -> {3, <NULL>}
    assert (zk.n_keys, zk.n_viol_keys, zk.fd_holds) == (3, 1, False)


def test_functional_dependencies_rejects_empty(spark):
    from entity_extractor_spark.operators.audit import functional_dependencies

    df = spark.createDataFrame([(1, 2)], "a int, b int")
    try:
        functional_dependencies(df, [])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
