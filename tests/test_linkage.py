"""Fellegi–Sunter linkage: exact-rational u estimation + centibit
pair scoring."""

import pytest

from pyspark.sql import functions as F

from entity_extractor_spark.operators.linkage import fs_score, u_probabilities


# ------------------------------------------------------------------ u prob --

def test_u_probabilities_brute(spark):
    """Exact histogram algebra vs a Python replay, NULLs excluded."""
    rows = [
        ("a", 1), ("a", 1), ("a", 2), ("a", None), ("b", 9),
        ("b", 9), ("b", 9), ("a", 2), ("b", 7),
    ]
    df = spark.createDataFrame(
        [(s, v, v) for s, v in rows], "seg string, f1 long, f2 long"
    ).select("seg", "f1", (F.col("f2") * 0 + F.col("f2")).alias("f2"))
    got = {r.field: (r.n, r.u_ppm) for r in
           u_probabilities(df, ["seg", "f1"]).collect()}
    # seg: counts a=5, b=4, n=9 -> (20+12)*1e6 // 72
    assert got["seg"] == (9, (20 + 12) * 10**6 // 72)
    # f1: counts 1->2, 2->2, 9->3, 7->1, n=8 -> (2+2+6+0)*1e6 // 56
    assert got["f1"] == (8, 10 * 10**6 // 56)


def test_u_probabilities_degenerate_and_validation(spark):
    df = spark.createDataFrame([(1, None), (None, None)], "f1 long, f2 long")
    got = {r.field: (r.n, r.u_ppm) for r in
           u_probabilities(df, ["f1", "f2"]).collect()}
    assert got["f1"] == (1, 0)          # n < 2 -> u 0
    assert "f2" not in got              # all-NULL field vanishes (n = 0)
    with pytest.raises(ValueError):
        u_probabilities(df, [])


# ----------------------------------------------------------------- fs score --

def _pairs(spark):
    # (a_name, b_name, a_city, b_city) with agree / disagree / NULL mass
    return spark.createDataFrame(
        [
            ("smith", "smith", "nyc", "nyc"),
            ("smith", "smyth", "nyc", "sfo"),
            ("jones", "jones", None, "nyc"),
            ("brown", "green", None, None),
        ],
        "a_name string, b_name string, a_city string, b_city string",
    )


def test_fs_score_weights_and_null_no_evidence(spark):
    out = fs_score(
        _pairs(spark),
        {
            "name": (F.col("a_name") == F.col("b_name"), 900, -40),
            "city": (F.col("a_city") == F.col("b_city"), 300, -120),
        },
        prior_cb=-500,
    ).select("w_name", "w_city", "score_cb").collect()
    got = sorted((r.w_name, r.w_city, r.score_cb) for r in out)
    want = sorted([
        (900, 300, 700),     # both agree
        (-40, -120, -660),   # both disagree
        (900, 0, 400),       # city NULL -> no evidence
        (-40, 0, -540),      # city NULL both sides
    ])
    assert got == want


def test_fs_score_custom_agreement_column(spark):
    """Any boolean column works — here levenshtein <= 1."""
    out = fs_score(
        _pairs(spark),
        {"fuzzy": (F.levenshtein("a_name", "b_name") <= 1, 700, -100)},
    ).collect()
    got = {(r.a_name, r.b_name): r.score_cb for r in out}
    assert got[("smith", "smyth")] == 700   # 1 edit -> agree
    assert got[("brown", "green")] == -100


def test_fs_score_validation(spark):
    p = _pairs(spark)
    eq = F.col("a_name") == F.col("b_name")
    with pytest.raises(ValueError):
        fs_score(p, {})
    with pytest.raises(ValueError):
        fs_score(p, {"n": (eq, -40, 900)})        # swapped weights
    with pytest.raises(ValueError):
        fs_score(p, {"n": (eq, True, -1)})        # bool is not a weight
    with pytest.raises(ValueError):
        fs_score(p, {"n": (eq, 900, -40)}, prior_cb=1.5)  # float prior
