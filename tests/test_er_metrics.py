"""pair_metrics gates: hand-computed contingency answers, degenerate
clusterings (NULL rates, never fake zeros), and agreement with a brute
pair-enumeration replay."""

from __future__ import annotations

from itertools import combinations

from entity_extractor_spark.operators.er_metrics import pair_metrics


def _brute(rows):
    tp = sum(1 for a, b in combinations(rows, 2) if a[0] == b[0] and a[1] == b[1])
    pp = sum(1 for a, b in combinations(rows, 2) if a[0] == b[0])
    gp = sum(1 for a, b in combinations(rows, 2) if a[1] == b[1])
    return tp, pp, gp


def test_hand_computed(spark):
    # pred splits gold class {1,2,3} as {1,2}|{3}; gold {4,5} predicted together
    rows = [("a", "x"), ("a", "x"), ("b", "x"), ("c", "y"), ("c", "y")]
    df = spark.createDataFrame(rows, "pred string, gold string")
    r = pair_metrics(df, "pred", "gold").head()
    tp, pp, gp = _brute(rows)
    assert (r["tp_pairs"], r["pred_pairs"], r["gold_pairs"]) == (tp, pp, gp) == (2, 2, 4)
    assert r["precision_ppm"] == 1_000_000
    assert r["recall_ppm"] == 500_000
    assert r["f1_ppm"] == 2 * 2 * 1_000_000 // 6


def test_all_singletons_gives_nulls(spark):
    df = spark.createDataFrame(
        [(f"p{i}", f"g{i}") for i in range(5)], "pred string, gold string"
    )
    r = pair_metrics(df, "pred", "gold").head()
    assert (r["tp_pairs"], r["pred_pairs"], r["gold_pairs"]) == (0, 0, 0)
    assert r["precision_ppm"] is None
    assert r["recall_ppm"] is None
    assert r["f1_ppm"] is None


def test_matches_brute_enumeration(spark):
    rows = [(f"p{i % 7}", f"g{i % 5}") for i in range(200)]
    df = spark.createDataFrame(rows, "pred string, gold string")
    r = pair_metrics(df, "pred", "gold").head()
    tp, pp, gp = _brute(rows)
    assert (r["tp_pairs"], r["pred_pairs"], r["gold_pairs"]) == (tp, pp, gp)
    assert r["precision_ppm"] == tp * 1_000_000 // pp
    assert r["recall_ppm"] == tp * 1_000_000 // gp
    assert r["f1_ppm"] == 2 * tp * 1_000_000 // (pp + gp)


# --------------------------------------------------------- threshold_sweep --

def _brute_sweep(rows):
    """rows = (group, score, gold); per group and distinct score t:
    accept score >= t, count tp/fp/fn."""
    out = {}
    groups = {}
    for g, s, y in rows:
        groups.setdefault(g, []).append((s, y))
    for g, items in groups.items():
        p = sum(y for _, y in items)
        for t in sorted({s for s, _ in items}, reverse=True):
            acc = [(s, y) for s, y in items if s >= t]
            tp = sum(y for _, y in acc)
            fp = len(acc) - tp
            out[(g, t)] = (tp, fp, p - tp, p)
    return out


def test_threshold_sweep_brute(spark):
    import random

    from entity_extractor_spark.operators.er_metrics import threshold_sweep

    rng = random.Random(3)
    rows = [
        (f"g{i % 3}", rng.randint(0, 8), rng.randint(0, 1)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "lang string, score int, gold int")
    got = threshold_sweep(df, "lang", "score", "gold").collect()
    exp = _brute_sweep(rows)
    assert len(got) == len(exp)
    for r in got:
        tp, fp, fn, p = exp[(r.lang, r.threshold)]
        assert (r.tp, r.fp, r.fn) == (tp, fp, fn)
        assert r.precision_ppm == tp * 1_000_000 // (tp + fp)
        assert r.recall_ppm == tp * 1_000_000 // p
        assert r.f1_ppm == 2 * tp * 1_000_000 // (tp + fp + p)


def test_threshold_sweep_zero_positive_group_null_rates(spark):
    from entity_extractor_spark.operators.er_metrics import threshold_sweep

    df = spark.createDataFrame(
        [("a", 5, 0), ("a", 3, 0), ("b", 2, 1)],
        "lang string, score int, gold int",
    )
    rows = {
        (r.lang, r.threshold): r
        for r in threshold_sweep(df, "lang", "score", "gold").collect()
    }
    r = rows[("a", 3)]
    assert (r.tp, r.fp, r.fn) == (0, 2, 0)
    assert r.precision_ppm == 0
    assert r.recall_ppm is None and r.f1_ppm is None
    assert rows[("b", 2)].recall_ppm == 1_000_000


def test_threshold_sweep_rejects_bad_gold_and_null_score(spark):
    import pytest

    from entity_extractor_spark.operators.er_metrics import threshold_sweep

    for rows in ([("a", 1, 2)], [("a", None, 1)], [("a", 1, None)]):
        df = spark.createDataFrame(rows, "lang string, score int, gold int")
        with pytest.raises(Exception, match="threshold_sweep"):
            threshold_sweep(df, "lang", "score", "gold").collect()


# -------------------------------------------------------- blocking_quality --

def _brute_blocking(rows):
    """rows = (strategy, block, gold) one per item."""
    out = {}
    strat = {}
    for s, b, g in rows:
        strat.setdefault(s, []).append((b, g))
    for s, items in strat.items():
        n = len(items)
        pairs = list(combinations(items, 2))
        cand = sum(
            1 for a, b in pairs if a[0] is not None and a[0] == b[0]
        )
        gold = sum(1 for a, b in pairs if a[1] == b[1])
        cov = sum(
            1
            for a, b in pairs
            if a[0] is not None and a[0] == b[0] and a[1] == b[1]
        )
        nb = sum(1 for b, _ in items if b is not None)
        out[s] = (n, nb, cand, gold, cov)
    return out


def test_blocking_quality_brute(spark):
    import random

    from entity_extractor_spark.operators.er_metrics import blocking_quality

    rng = random.Random(11)
    rows = []
    for s in ("first3", "lang", "none"):
        for i in range(120):
            blk = (
                None
                if s == "none" and i % 7 == 0
                else f"{s}:{rng.randint(0, 9 if s == 'first3' else 3)}"
            )
            rows.append((s, blk, f"c{rng.randint(0, 29)}"))
    df = spark.createDataFrame(rows, "strategy string, blk string, gold string")
    got = {r.strategy: r for r in blocking_quality(df, "strategy", "blk", "gold").collect()}
    exp = _brute_blocking(rows)
    assert set(got) == set(exp)
    for s, (n, nb, cand, gold, cov) in exp.items():
        r = got[s]
        assert (
            r.n_items, r.n_blocked, r.candidate_pairs, r.gold_pairs, r.covered_pairs
        ) == (n, nb, cand, gold, cov)
        tot = n * (n - 1) // 2
        assert r.reduction_ppm == (tot - cand) * 1_000_000 // tot
        if gold:
            assert r.completeness_ppm == cov * 1_000_000 // gold


def test_blocking_quality_null_block_is_unblocked_not_a_mega_block(spark):
    from entity_extractor_spark.operators.er_metrics import blocking_quality

    # two unblocked items sharing a gold class must NOT count as covered
    df = spark.createDataFrame(
        [("s", None, "g"), ("s", None, "g"), ("s", "b1", "g")],
        "strategy string, blk string, gold string",
    )
    r = blocking_quality(df, "strategy", "blk", "gold").head()
    assert r.n_items == 3 and r.n_blocked == 1
    assert r.candidate_pairs == 0 and r.covered_pairs == 0
    assert r.gold_pairs == 3
    assert r.completeness_ppm == 0
    assert r.reduction_ppm == 1_000_000


def test_blocking_quality_rejects_null_gold(spark):
    import pytest

    from entity_extractor_spark.operators.er_metrics import blocking_quality

    df = spark.createDataFrame(
        [("s", "b", None)], "strategy string, blk string, gold string"
    )
    with pytest.raises(Exception, match="blocking_quality"):
        blocking_quality(df, "strategy", "blk", "gold").collect()


# ------------------------------------------------------- commonness prior --

def test_link_prior_brute(spark):
    """Random observation log vs a pure-Python replay — counts, totals,
    floor ppm, and the tie-free (cnt DESC, entity ASC) ranks all exact;
    NULL mentions/entities excluded."""
    import random
    from collections import Counter

    from entity_extractor_spark.operators.disambiguate import link_prior

    rng = random.Random(41)
    rows = [
        (rng.choice(["jaguar", "python", "mercury", None]),
         rng.choice(["car", "cat", "os", "snake", "lang", None]))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "m string, e string")
    got = {
        (r.mention, r.entity): (r.cnt, r.mention_total, r.prior_ppm, r.rank)
        for r in link_prior(df, "m", "e").collect()
    }
    c = Counter((m, e) for m, e in rows if m is not None and e is not None)
    totals = Counter()
    for (m, _e), n in c.items():
        totals[m] += n
    want = {}
    by_m: dict = {}
    for (m, e), n in c.items():
        by_m.setdefault(m, []).append((e, n))
    for m, es in by_m.items():
        ordered = sorted(es, key=lambda t: (-t[1], t[0]))
        for rk, (e, n) in enumerate(ordered, 1):
            want[(m, e)] = (n, totals[m], n * 1_000_000 // totals[m], rk)
    assert got == want
    # rank-1 rows exist for every mention and ppm shares sum <= 1e6
    for m in by_m:
        shares = [v[2] for (mm, _), v in got.items() if mm == m]
        assert sum(shares) <= 1_000_000


# ----------------------------------------------------------------- B-cubed --

def _brute_bcubed(rows):
    from collections import Counter

    cells = Counter(rows)
    np_, ng_ = Counter(), Counter()
    for (p, g), c in cells.items():
        np_[p] += c
        ng_[g] += c
    n = sum(cells.values())
    sp = sum(c * c * 1_000_000 // np_[p] for (p, g), c in cells.items())
    sg = sum(c * c * 1_000_000 // ng_[g] for (p, g), c in cells.items())
    prec, rec = sp // n, sg // n
    f1 = (
        2 * prec * rec // (prec + rec) if prec + rec > 0 else None
    )
    return (n, prec, rec, f1)


def test_bcubed_brute(spark):
    """Random clusterings vs the pure-Python contingency replay —
    floors-of-floors sequence exact; perfect clustering scores 10^6."""
    import random

    from entity_extractor_spark.operators.er_metrics import bcubed_metrics

    rng = random.Random(53)
    rows = [(f"p{rng.randrange(8)}", f"g{rng.randrange(6)}") for _ in range(300)]
    df = spark.createDataFrame(rows, "p string, g string")
    r = bcubed_metrics(df, "p", "g").collect()[0]
    assert (r.n_items, r.precision_ppm, r.recall_ppm, r.f1_ppm) == _brute_bcubed(
        rows
    )

    perfect = [(g, g) for g in "aabbbcccc"]
    dfp = spark.createDataFrame(perfect, "p string, g string")
    rp = bcubed_metrics(dfp, "p", "g").collect()[0]
    assert (rp.precision_ppm, rp.recall_ppm, rp.f1_ppm) == (
        1_000_000,
        1_000_000,
        1_000_000,
    )


def test_bcubed_item_weighting_vs_pairwise(spark):
    """The reason B-cubed exists: one mega-merge of two big classes hurts
    it far less than pairwise precision, because pairs are quadratic in
    cluster size while items are linear. Asserted directionally against
    pair_metrics on the same labeling."""
    from entity_extractor_spark.operators.er_metrics import (
        bcubed_metrics,
        pair_metrics,
    )

    rows = [("m", f"g{i % 2}") for i in range(40)] + [
        (f"p{i}", f"s{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "p string, g string")
    b = bcubed_metrics(df, "p", "g").collect()[0]
    pw = pair_metrics(df, "p", "g").collect()[0]
    assert b.precision_ppm > pw.precision_ppm


def test_bcubed_rejects_null_labels(spark):
    import pytest

    from entity_extractor_spark.operators.er_metrics import bcubed_metrics

    df = spark.createDataFrame([("a", None), ("a", "g")], "p string, g string")
    with pytest.raises(Exception, match="Exception|non-NULL"):
        bcubed_metrics(df, "p", "g").collect()


def test_ranking_metrics_math(spark):
    import pytest

    from entity_extractor_spark.operators.er_metrics import ranking_metrics

    cand = spark.createDataFrame(
        [
            ("q1", "a", 90), ("q1", "b", 80), ("q1", "c", 70),
            ("q2", "x", 50), ("q2", "y", 50),  # tie -> cand asc: x rank 1
        ],
        "q string, c string, s long",
    )
    truth = spark.createDataFrame(
        [("q1", "b"), ("q2", "y"), ("q3", "zz")],  # q3 unreachable
        "q string, c string",
    )
    r = ranking_metrics(cand, truth, "q", "c", ["s"], ks=(1, 2)).collect()[0]
    # ranks: q1/b=2, q2/y=2 (tie broken by cand asc), q3/zz=missing
    assert (r.n_truth, r.n_found) == (3, 2)
    assert r.mrr_ppm == (10**6 // 2 + 10**6 // 2 + 0) // 3
    assert r.hits_1_ppm == 0
    assert r.hits_2_ppm == 2 * 10**6 // 3
    with pytest.raises(ValueError):
        ranking_metrics(cand, truth, "q", "c", [], ks=(1,))
    with pytest.raises(ValueError):
        ranking_metrics(cand, truth, "q", "c", ["s"], ks=(0,))
    bad = spark.createDataFrame([("q1", None)], "q string, c string")
    with pytest.raises(Exception, match="NULL truth"):
        ranking_metrics(cand, bad, "q", "c", ["s"]).collect()


def test_lp_candidate_scores_filtered_setting(spark):
    from entity_extractor_spark.operators.graph import lp_candidate_scores

    # path graph 1-2-3-4 plus 2-5: candidates for 1 are {3} (via 2) and
    # {5} (via 2); 2 itself is adjacent -> filtered out
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 5)], "src long, dst long"
    )
    q = spark.createDataFrame([(1,)], "src long")
    got = {
        (r.u, r.v): (r.common_neighbors, r.ra_1e9)
        for r in lp_candidate_scores(edges, q, "src", 10).collect()
    }
    # middle 2 has degree 3 -> ra term 10^9 div 3
    assert got == {(1, 3): (1, 10**9 // 3), (1, 5): (1, 10**9 // 3)}
    # cap below the middle's degree excludes the wedge entirely
    assert (
        lp_candidate_scores(edges, q, "src", 2).count() == 0
    )


def test_calibration_report_math_and_guards(spark):
    import pytest

    from entity_extractor_spark.operators.er_metrics import calibration_report

    # scores /10 as probability; bin width 0.1 over 10 bins
    rows = [
        (1, 1), (1, 0), (1, 0), (1, 0),   # p=0.1 -> bin 1, obs 0.25
        (9, 1), (9, 1), (9, 0),           # p=0.9 -> bin 9, obs 2/3
        (10, 1),                          # p=1.0 -> clamped to bin 9
        (0, 0),                           # p=0   -> bin 0, obs 0
    ]
    df = spark.createDataFrame(rows, "score long, gold long")
    got = {r.bin: r for r in calibration_report(df, "score", "gold", 10).collect()}
    b1 = got[1]
    assert (b1.n_pairs, b1.mean_pred_ppm, b1.obs_rate_ppm) == (4, 100000, 250000)
    assert b1.gap_ppm == 150000
    b9 = got[9]
    assert b9.n_pairs == 4  # three 0.9s + the clamped 1.0
    assert b9.mean_pred_ppm == (3 * 900000 + 1000000) // 4
    assert got[0].n_pairs == 1 and got[0].gap_ppm == 0
    assert set(got) == {0, 1, 9}  # empty bins absent
    with pytest.raises(ValueError):
        calibration_report(df, "score", "gold", 0)
    with pytest.raises(ValueError):
        calibration_report(df, "score", "gold", 10, bins=1)
    bad_score = spark.createDataFrame([(11, 0)], "score long, gold long")
    with pytest.raises(Exception, match="score outside"):
        calibration_report(bad_score, "score", "gold", 10).collect()
    bad_gold = spark.createDataFrame([(5, 2)], "score long, gold long")
    with pytest.raises(Exception, match="gold must be"):
        calibration_report(bad_gold, "score", "gold", 10).collect()


# --------------------------------------------------------- confusion_matrix --


def test_confusion_cells_and_marginals(spark):
    from entity_extractor_spark.operators.er_metrics import confusion_matrix

    rows = (
        [("a", "a")] * 6 + [("a", "b")] * 2
        + [("b", "b")] * 3 + [("b", "a")] * 1
    )
    df = spark.createDataFrame(rows, "t string, p string")
    out = {
        (r["truth"], r["pred"]): r.asDict()
        for r in confusion_matrix(df, "t", "p").collect()
    }
    assert set(out) == {("a", "a"), ("a", "b"), ("b", "b"), ("b", "a")}
    aa = out[("a", "a")]
    assert (aa["n"], aa["truth_total"], aa["pred_total"]) == (6, 8, 7)
    assert aa["recall_ppm"] == 6 * 1_000_000 // 8
    assert aa["precision_ppm"] == 6 * 1_000_000 // 7
    ab = out[("a", "b")]
    assert ab["recall_ppm"] == 2 * 1_000_000 // 8  # leak of class a into b
    assert ab["precision_ppm"] == 2 * 1_000_000 // 5  # pollution of pred b


def test_confusion_null_raises(spark):
    import pytest

    from entity_extractor_spark.operators.er_metrics import confusion_matrix

    df = spark.createDataFrame([("a", None)], "t string, p string")
    with pytest.raises(Exception, match="NULL pred label"):
        confusion_matrix(df, "t", "p").collect()
