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


# ---------------------------------------------------------- one-to-one --

from entity_extractor_spark.operators.linkage import one_to_one_match  # noqa: E402


def _py_one_to_one(pairs, rounds):
    """Pure-Python replay of iterated mutual-best-match."""
    pool = list(pairs)
    out = []
    for rnd in range(1, rounds + 1):
        best_l, best_r = {}, {}
        for l, r, s in pool:
            k = (-s, r)
            if l not in best_l or k < best_l[l]:
                best_l[l] = k
            k = (-s, l)
            if r not in best_r or k < best_r[r]:
                best_r[r] = k
        won = [
            (l, r, s)
            for l, r, s in pool
            if best_l[l] == (-s, r) and best_r[r] == (-s, l)
        ]
        out += [(l, r, s, rnd) for l, r, s in won]
        taken_l = {l for l, _, _ in won}
        taken_r = {r for _, r, _ in won}
        pool = [p for p in pool if p[0] not in taken_l and p[1] not in taken_r]
    return sorted(out)


def test_one_to_one_known_contention(spark):
    pairs = [("l1", "r1", 10), ("l1", "r2", 9), ("l2", "r1", 9), ("l2", "r2", 8)]
    df = spark.createDataFrame(pairs, "l string, r string, s long")
    got = sorted(
        tuple(r) for r in one_to_one_match(df, "l", "r", "s", rounds=2).collect()
    )
    # round 1: only (l1, r1) is mutual; round 2 frees (l2, r2)
    assert got == [("l1", "r1", 10, 1), ("l2", "r2", 8, 2)]


def test_one_to_one_tiebreak_partner_asc(spark):
    df = spark.createDataFrame(
        [("l1", "r2", 5), ("l1", "r1", 5)], "l string, r string, s long"
    )
    got = one_to_one_match(df, "l", "r", "s", rounds=1).collect()
    assert [(r.l, r.r) for r in got] == [("l1", "r1")]


def test_one_to_one_matches_python_replay_and_is_injective(spark):
    import random

    rng = random.Random(7)
    pairs = set()
    while len(pairs) < 300:
        pairs.add((rng.randrange(40), rng.randrange(40)))
    rows = [(f"L{l}", f"R{r}", rng.randrange(1000)) for l, r in pairs]
    df = spark.createDataFrame(rows, "l string, r string, s long").repartition(8)
    got = sorted(
        tuple(r) for r in one_to_one_match(df, "l", "r", "s", rounds=3).collect()
    )
    assert got == _py_one_to_one(rows, 3)
    lefts = [g[0] for g in got]
    rights = [g[1] for g in got]
    assert len(lefts) == len(set(lefts)) and len(rights) == len(set(rights))


def test_one_to_one_mutual_best_is_subset_of_global_greedy(spark):
    import random

    rng = random.Random(11)
    seen = set()
    rows = []
    scores = rng.sample(range(10_000), 200)  # unique scores
    while len(rows) < 200:
        lr = (rng.randrange(30), rng.randrange(30))
        if lr not in seen:
            seen.add(lr)
            rows.append((f"L{lr[0]}", f"R{lr[1]}", scores[len(rows)]))
    greedy, tl, tr = [], set(), set()
    for l, r, s in sorted(rows, key=lambda p: -p[2]):
        if l not in tl and r not in tr:
            greedy.append((l, r, s))
            tl.add(l)
            tr.add(r)
    df = spark.createDataFrame(rows, "l string, r string, s long")
    r1 = one_to_one_match(df, "l", "r", "s", rounds=1).collect()
    assert {(x.l, x.r, x.s) for x in r1} <= set(greedy)


def test_one_to_one_validation_and_null_guard(spark):
    df = spark.createDataFrame([("a", "b", 1)], "l string, r string, s long")
    with pytest.raises(ValueError, match="rounds"):
        one_to_one_match(df, "l", "r", "s", rounds=0)
    with pytest.raises(ValueError, match="rounds"):
        one_to_one_match(df, "l", "r", "s", rounds=True)
    fl = spark.createDataFrame([("a", "b", 1.5)], "l string, r string, s double")
    with pytest.raises(ValueError, match="integral"):
        one_to_one_match(fl, "l", "r", "s")
    nul = spark.createDataFrame([("a", None, 1)], "l string, r string, s long")
    with pytest.raises(Exception, match="NULL"):
        one_to_one_match(nul, "l", "r", "s", rounds=1).collect()


# ------------------------------------------------- sorted neighborhood --

from entity_extractor_spark.operators.linkage import (  # noqa: E402
    sorted_neighborhood_pairs,
)


def _py_snb(rows, w):
    srt = sorted(rows, key=lambda p: (p[1], p[0]))
    out = []
    for i, (ida, ka) in enumerate(srt):
        for d in range(1, w + 1):
            if i + d < len(srt):
                idb, kb = srt[i + d]
                out.append((ida, idb, ka, kb, d))
    return sorted(out)


def test_snb_matches_python_replay(spark):
    import random

    rng = random.Random(5)
    rows = [(i, f"k{rng.randrange(50):03d}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k string").repartition(16)
    got = sorted(
        tuple(r)
        for r in sorted_neighborhood_pairs(df, "id", "k", window=3).collect()
    )
    assert got == _py_snb(rows, 3)
    assert len(got) == 3 * 200 - (1 + 2 + 3)  # exactly w*n - w(w+1)/2


def test_snb_partitioning_invariant_and_range_counts(spark):
    rows = [(i, f"{(i * 7919) % 997:05d}") for i in range(500)]
    a = sorted_neighborhood_pairs(
        spark.createDataFrame(rows, "id long, k string").repartition(3),
        "id", "k", window=2, num_ranges=4,
    )
    b = sorted_neighborhood_pairs(
        spark.createDataFrame(list(reversed(rows)), "id long, k string")
        .repartition(29),
        "id", "k", window=2, num_ranges=17,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_snb_no_partitionless_window(spark):
    """Every Window node in the EXECUTED plan must carry a non-empty
    partitionSpec — the same JVM-side check tools/plan_audit.py runs
    (a string scan of the formatted plan cannot see this: formatted
    plans never print 'PartitionBy', and a plan-wide substring test is
    satisfied by unrelated occurrences of the key name)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from plan_audit import _walk

    df = spark.createDataFrame([(i, str(i)) for i in range(50)], "id long, k string")
    out = sorted_neighborhood_pairs(df, "id", "k", window=2, num_ranges=4)
    out.collect()
    windows, partitionless = [], []

    def visit(node, name):
        if "Window" in name:
            windows.append(name)
            if node.partitionSpec().isEmpty():
                partitionless.append(name)

    _walk(out._jdf.queryExecution().executedPlan(), visit)
    assert windows, "expected the SNB window in the executed plan"
    assert not partitionless


def test_snb_validation_and_null_key(spark):
    df = spark.createDataFrame([(1, "a")], "id long, k string")
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "id", "k", window=0)
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "id", "k", window=True)
    nul = spark.createDataFrame([(1, None), (2, "b")], "id long, k string")
    with pytest.raises(Exception, match="NULL blocking key"):
        sorted_neighborhood_pairs(nul, "id", "k").collect()


def test_one_to_one_duplicate_pairs_collapse(spark):
    """The same (l, r) pair surfacing multiple times (multi-band LSH /
    multiple blocking keys), possibly with different scores, must yield
    exactly ONE matched row carrying the best score — duplicates used
    to pass the mutual-best join and break the one-to-one guarantee."""
    from entity_extractor_spark.operators.linkage import one_to_one_match

    df = spark.createDataFrame(
        [("l1", "r1", 10), ("l1", "r1", 10), ("l1", "r1", 7),
         ("l2", "r2", 5)],
        "l string, r string, s int",
    )
    out = one_to_one_match(df, "l", "r", "s").collect()
    got = sorted((r["l"], r["r"], r["s"], r["match_round"]) for r in out)
    assert got == [("l1", "r1", 10, 1), ("l2", "r2", 5, 1)]
