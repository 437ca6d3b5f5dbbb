"""fuzzy.py — SymSpell deletion-neighborhood join: completeness vs a
brute-force Levenshtein sweep, precision (no dist-2 leaks), argmin
tie-breaks, and NULL/empty handling."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from entity_extractor_spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_link_best,
    fuzzy_pairs_1del,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_pairs_match_brute_force(spark):
    # adversarial small alphabet: lots of near-collisions incl. the
    # transposition trap ('ab' vs 'ba' shares variants at lev 2)
    words = ["".join(w) for w in itertools.product("ab", repeat=3)]
    words += ["ab", "ba", "a", "abc", "abcd", "bbcd", "acbd"]
    probe = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "pk int, pt string"
    )
    gaz = spark.createDataFrame(
        [(100 + i, w) for i, w in enumerate(words)], "gk int, gt string"
    )
    got = {
        (r.pk, r.gk, r.dist)
        for r in fuzzy_pairs_1del(probe, gaz, "pk", "pt", "gk", "gt").collect()
    }
    want = {
        (i, 100 + j, _lev(a, b))
        for i, a in enumerate(words)
        for j, b in enumerate(words)
        if _lev(a, b) <= 1
    }
    assert got == want


def test_best_match_tiebreak_and_misses(spark):
    probe = spark.createDataFrame(
        [(1, "colour"), (2, "zzzzzz")], "pid int, q string"
    )
    # 'color' (delete u) and 'colou' (delete r) both sit at dist 1 from
    # 'colour' -> tie broken by min gazetteer key.
    gaz = spark.createDataFrame(
        [(7, "color"), (3, "colou"), (9, "colour!")], "gid int, name string"
    )
    rows = fuzzy_link_best(probe, gaz, "pid", "q", "gid", "name").collect()
    assert len(rows) == 1  # probe 2 has no match within dist 1 -> absent
    r = rows[0]
    assert (r.pid, r.gid, r.dist) == (1, 3, 1)  # min key among dist-1 ties


def test_exact_match_wins_at_dist0(spark):
    probe = spark.createDataFrame([(1, "alpha")], "pid int, q string")
    gaz = spark.createDataFrame(
        [(5, "alpha"), (2, "alph")], "gid int, name string"
    )
    r = fuzzy_link_best(probe, gaz, "pid", "q", "gid", "name").collect()[0]
    assert (r.gid, r.dist) == (5, 0)


def test_null_and_empty_dropped(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "k int, t string"
    )
    vs = deletion_variants(df, "t", "v").collect()
    # 'x' alone survives; its length<=1 guard emits just itself
    assert {(r.k, r.v) for r in vs} == {(3, "x")}


def test_variants_dedup_within_string(spark):
    # 'aaa' has one distinct deletion variant 'aa', not three
    df = spark.createDataFrame([(1, "aaa")], "k int, t string")
    vs = sorted(r.v for r in deletion_variants(df, "t", "v").collect())
    assert vs == ["aa", "aaa"]
