"""Gates for skew_profile, CMS frequency sketch, and funnel analysis."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.operators.funnel import funnel
from entity_extractor_spark.operators.skew import skew_profile
from entity_extractor_spark.operators.sketch import cms_estimate, cms_table


def _h48(*parts) -> int:
    return int(hashlib.md5("|".join(str(p) for p in parts).encode()).hexdigest()[:12], 16)


# ------------------------------------------------------------ skew_profile --

def test_skew_profile_counts_and_salt(spark):
    rows = [("hot",)] * 70 + [("warm",)] * 25 + [("cold",)] * 5
    df = spark.createDataFrame(rows, "k string")
    out = skew_profile(df, "k", top_k=2, target_rows_per_task=30).collect()
    assert [(r["key"], r["n_rows"]) for r in out] == [("hot", 70), ("warm", 25)]
    assert out[0]["share_ppm"] == 700_000
    assert out[0]["salt_factor"] == 3  # ceil(70/30)
    assert out[1]["salt_factor"] == 1


def test_skew_profile_null_key_is_a_key(spark):
    df = spark.createDataFrame([(None,), (None,), ("a",)], "k string")
    out = skew_profile(df, "k", top_k=1).collect()
    assert out[0]["key"] is None and out[0]["n_rows"] == 2


def test_skew_profile_validates(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        skew_profile(df, "k", top_k=0)


# --------------------------------------------------------------------- cms --

def test_cms_estimate_never_underestimates_and_is_exact_replay(spark):
    keys = [f"k{i % 17}" for i in range(400)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    cms = cms_table(df, "k", depth=4, width=64, salt="c0")
    qdf = spark.createDataFrame([(f"k{i}",) for i in range(20)], "key string")
    got = {
        r["key"]: r["est"]
        for r in cms_estimate(cms, qdf, depth=4, width=64, salt="c0").collect()
    }
    true = Counter(keys)
    # python replay of the same sketch
    cells: Counter = Counter()
    for k in keys:
        for r in range(4):
            cells[(r, _h48(k, r, "c0") % 64)] += 1
    for q in (f"k{i}" for i in range(20)):
        exp = min(cells.get((r, _h48(q, r, "c0") % 64), 0) for r in range(4))
        assert got[q] == exp
        assert got[q] >= true.get(q, 0)  # CMS never underestimates


def test_cms_is_mergeable(spark):
    """Cell-wise sum of two shard sketches == sketch of the union."""
    from pyspark.sql import functions as F

    a = spark.createDataFrame([(f"x{i % 5}",) for i in range(50)], "k string")
    b = spark.createDataFrame([(f"x{i % 7}",) for i in range(70)], "k string")
    merged = (
        cms_table(a, "k", depth=3, width=32)
        .unionByName(cms_table(b, "k", depth=3, width=32))
        .groupBy("row_id", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_table(a.unionByName(b), "k", depth=3, width=32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_cms_validates(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        cms_table(df, "k", depth=0)


# ------------------------------------------------------------------ funnel --

def test_funnel_known_answer(spark):
    rows = [
        # u1 completes all three in order
        ("u1", 1, "view"), ("u1", 3, "click"), ("u1", 5, "buy"),
        # u2 clicks BEFORE viewing: click at 1 can't count, later click does
        ("u2", 1, "click"), ("u2", 2, "view"), ("u2", 4, "click"),
        # u3 views only
        ("u3", 9, "view"),
        # u4 never views: not in output
        ("u4", 1, "click"), ("u4", 2, "buy"),
    ]
    df = spark.createDataFrame(rows, "u string, ts long, st string")
    got = {
        r["key"]: (r["ts_1"], r["ts_2"], r["ts_3"], r["stages_completed"])
        for r in funnel(df, "u", "ts", "st", ["view", "click", "buy"]).collect()
    }
    assert got == {
        "u1": (1, 3, 5, 3),
        "u2": (2, 4, None, 2),
        "u3": (9, None, None, 1),
    }


def test_funnel_simultaneous_is_not_progress(spark):
    rows = [("u", 5, "view"), ("u", 5, "click")]
    df = spark.createDataFrame(rows, "u string, ts long, st string")
    r = funnel(df, "u", "ts", "st", ["view", "click"]).head()
    assert (r["ts_1"], r["ts_2"], r["stages_completed"]) == (5, None, 1)


def test_funnel_validates(spark):
    df = spark.createDataFrame([("u", 1, "a")], "u string, ts long, st string")
    with pytest.raises(ValueError):
        funnel(df, "u", "ts", "st", ["a"])
    with pytest.raises(ValueError):
        funnel(df, "u", "ts", "st", ["a", "a"])


# ---------------------------------------------------------- tfidf / merge --

def test_tfidf_top_terms_known_answer(spark):
    from entity_extractor_spark.operators.text_quality import tfidf_top_terms

    docs = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "banana banana banana"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["score"])
        for r in tfidf_top_terms(df, "doc_id", "text", k=1).collect()
    }
    # N=3; idf_lift: apple 3e6//1, banana 3e6//3=1e6, cherry 3e6//1
    # doc1: apple 2*3e6=6e6 beats banana 1e6 -> apple
    # doc2: cherry 3e6 beats banana -> cherry
    # doc3: banana 3*1e6
    assert got == {
        (1, "apple"): (2, 1, 6_000_000),
        (2, "cherry"): (1, 1, 3_000_000),
        (3, "banana"): (3, 3, 3_000_000),
    }


def test_tfidf_tiebreak_is_term_asc(spark):
    from entity_extractor_spark.operators.text_quality import tfidf_top_terms

    df = spark.createDataFrame([(1, "zz aa")], "doc_id long, text string")
    rows = tfidf_top_terms(df, "doc_id", "text", k=1).collect()
    assert [r["term"] for r in rows] == ["aa"]


def test_merge_conflicts_flags_only_real_conflicts(spark):
    from entity_extractor_spark.operators.audit import merge_conflicts

    rows = [
        ("c1", "x"), ("c1", "x"),          # consistent
        ("c2", "x"), ("c2", "y"),          # conflict
        ("c3", None), ("c3", "z"),          # NULL is absence, not conflict
        ("c4", None),                       # no values at all
    ]
    df = spark.createDataFrame(rows, "cluster string, attr string")
    got = {r["cluster"]: r for r in merge_conflicts(df, "cluster", "attr").collect()}
    assert not got["c1"]["has_conflict"] and got["c1"]["n_values"] == 1
    assert got["c2"]["has_conflict"] and (got["c2"]["val_min"], got["c2"]["val_max"]) == ("x", "y")
    assert not got["c3"]["has_conflict"] and got["c3"]["n_values"] == 1
    assert got["c4"]["n_values"] == 0 and not got["c4"]["has_conflict"]


def test_neighborhood_features_known_answer(spark):
    from entity_extractor_spark.operators.kg_training import neighborhood_features

    edges = [(1, 2), (1, 3), (2, 3)]
    attrs = [(1, 10.0), (2, 20.0), (3, 35.5)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    adf = spark.createDataFrame(attrs, "id long, price double")
    got = {
        r["vertex"]: (r["degree"], r["f_sum"], r["f_min"], r["f_max"])
        for r in neighborhood_features(edf, adf, "id", "price").collect()
    }
    assert got[1] == (2, 55.5, 20.0, 35.5)
    assert got[2] == (2, 45.5, 10.0, 35.5)
    assert got[3] == (2, 30.0, 10.0, 20.0)


# ------------------------------------------------- retention / transitions --

def test_retention_cohorts_known_answer(spark):
    from entity_extractor_spark.operators.funnel import retention_cohorts

    # 2024-01-01 is a Monday. u1's first event lands in week Jan-1 (two
    # events there collapse to one distinct user) and reappears in week
    # Jan-15 (offset 2). u2's first is Sunday Jan-7 (still week Jan-1);
    # its next event is Monday Jan-8 — one DAY later but offset 1,
    # because cohorts count week-boundary crossings, not elapsed time.
    rows = [
        ("u1", "2024-01-02 10:00:00"), ("u1", "2024-01-03 09:00:00"),
        ("u1", "2024-01-16 23:00:00"),
        ("u2", "2024-01-07 12:00:00"), ("u2", "2024-01-08 00:30:00"),
    ]
    df = spark.createDataFrame(rows, "u string, ts string").select(
        "u", F.col("ts").cast("timestamp").alias("ts")
    )
    got = {
        (r["cohort_week"].strftime("%Y-%m-%d"), r["week_offset"]): r["n_users"]
        for r in retention_cohorts(df, "u", "ts").collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
    }


def test_retention_cohorts_null_rows_dropped(spark):
    from entity_extractor_spark.operators.funnel import retention_cohorts

    rows = [("u1", "2024-01-02 10:00:00"), (None, "2024-01-02 11:00:00"),
            ("u2", None)]
    df = spark.createDataFrame(rows, "u string, ts string").select(
        "u", F.col("ts").cast("timestamp").alias("ts")
    )
    out = retention_cohorts(df, "u", "ts").collect()
    assert len(out) == 1 and out[0]["n_users"] == 1


def test_event_transitions_known_answer_with_tiebreak(spark):
    from entity_extractor_spark.operators.funnel import event_transitions

    # u1 has two events at the SAME timestamp — seq orders a before b,
    # so the sequence is a, b, a. u2 has a single event: no transition.
    rows = [
        ("u1", 10, 1, "a"), ("u1", 10, 2, "b"), ("u1", 20, 0, "a"),
        ("u2", 5, 0, "a"),
    ]
    df = spark.createDataFrame(rows, "u string, ts long, seq long, st string")
    got = {
        (r["from_stage"], r["to_stage"]): r["n_transitions"]
        for r in event_transitions(df, "u", "ts", "seq", "st").collect()
    }
    assert got == {("a", "b"): 1, ("b", "a"): 1}


def test_event_transitions_counts_accumulate_across_keys(spark):
    from entity_extractor_spark.operators.funnel import event_transitions

    rows = [("u1", 1, 0, "x"), ("u1", 2, 0, "y"),
            ("u2", 1, 0, "x"), ("u2", 2, 0, "y"), ("u2", 3, 0, "x")]
    df = spark.createDataFrame(rows, "u string, ts long, seq long, st string")
    got = {
        (r["from_stage"], r["to_stage"]): r["n_transitions"]
        for r in event_transitions(df, "u", "ts", "seq", "st").collect()
    }
    assert got == {("x", "y"): 2, ("y", "x"): 1}
