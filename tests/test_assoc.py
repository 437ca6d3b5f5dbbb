"""association_rules gates: set-membership semantics, relative support
threshold, exact confidence/lift, quadratic-basket guard."""

from __future__ import annotations

import pytest


def _rules(spark, rows, **kw):
    from entity_extractor_spark.operators.assoc import association_rules

    df = spark.createDataFrame(rows, "b long, i string")
    return {
        (r["item_a"], r["item_b"]): r.asDict()
        for r in association_rules(df, "b", "i", **kw).collect()
    }


def test_rules_known_answer(spark):
    # 4 baskets: {x,y} {x,y} {x,z} {y}
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"), (4, "y"),
            (1, "x")]  # duplicate membership collapses
    out = _rules(spark, rows, min_support_ppm=500_000)  # >= 2 of 4 baskets
    assert set(out) == {("x", "y"), ("y", "x")}
    r = out[("x", "y")]
    assert (r["supp_pair"], r["supp_a"], r["supp_b"]) == (2, 3, 3)
    assert r["confidence_ppm"] == 2 * 1_000_000 // 3
    # lift = supp_ab * N / (supp_a * supp_b) = 2*4/(3*3)
    assert r["lift_ppm"] == 2 * 4 * 1_000_000 // 9
    # x->z (supp 1 of 4 = 250000 ppm) pruned by the 500000 threshold
    loose = _rules(spark, rows, min_support_ppm=250_000)
    assert ("x", "z") in loose and ("z", "x") in loose


def test_rules_guard_and_validation(spark):
    from entity_extractor_spark.operators.assoc import association_rules

    wide = [(1, f"i{k}") for k in range(10)]
    df_rows = wide + [(2, "i0"), (2, "i1")]
    with pytest.raises(Exception, match="max_basket_items"):
        _rules(spark, df_rows, min_support_ppm=1, max_basket_items=5)
    ok = _rules(spark, df_rows, min_support_ppm=1, max_basket_items=10)
    assert ("i0", "i1") in ok
    df = spark.createDataFrame([(1, "x")], "b long, i string")
    with pytest.raises(ValueError, match="min_support_ppm"):
        association_rules(df, "b", "i", min_support_ppm=0)
