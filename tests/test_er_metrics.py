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
