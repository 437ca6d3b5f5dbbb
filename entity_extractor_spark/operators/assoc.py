"""Association-rule mining over baskets — frequent item pairs with
support / confidence / lift on the exact ppm grid.

The classic market-basket analysis (Agrawal & Srikant 1994, restricted
to pair rules — the size at which rule mining is join-expressible and
the one that drives "related items" features); over a KG it reads as
"entities co-asserted in the same document" — the co-occurrence signal
kg_quality.mine_rules uses for path rules, here at the item-pair level
with the standard support/confidence/lift statistics. The reference has
no co-occurrence analytics at all; its nearest feature is the per-page
mention count (file_analysis_service.py).

All statistics are exact integers: supports are counts, confidence =
supp(ab) * 1e6 div supp(a), lift_ppm = supp(ab) * N * 1e6 div
(supp(a) * supp(b)) in DECIMAL(38,0) (three 10^9-scale factors exceed
BIGINT) — bit-identical on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support_ppm: int = 1000,
    max_basket_items: int = 256,
) -> DataFrame:
    """Mine directed pair rules a -> b from (basket, item) rows.

    Semantics: membership is set-based (duplicate (basket, item) rows
    collapse first); supp(x) = #baskets containing x, supp(ab) =
    #baskets containing both; rules are emitted in BOTH directions when
    supp(ab) clears the RELATIVE threshold supp(ab) * 1e6 >=
    min_support_ppm * N — the standard form, since an absolute count is
    meaningless across corpus sizes, and the comparison is pure integer
    (no rate rounding); NULL baskets/items are dropped. Output:
    (item_a, item_b, supp_pair, supp_a, supp_b, confidence_ppm,
    lift_ppm) where confidence grades a->b and lift is symmetric
    (lift > 1e6: positive association).

    Scale shape: the pair table comes from a per-basket self-join over
    the DISTINCT membership rows — quadratic ONLY in basket size, which
    is physically bounded (an order has a handful of lines); a basket
    wider than max_basket_items fails LOUDLY via the lazy executor-side
    assert (the ngram_jaccard guard convention) instead of silently
    going n^2 on a hub basket. Item supports and pair supports are
    algebraic counts with map-side combine; the final stats join is
    item-keyed against the (small) support table, broadcast when it
    fits. N (total baskets) is one scalar collected up front — a
    bounded driver read, the star-CC size-probe convention."""
    if not 1 <= int(min_support_ppm) <= 1_000_000:
        raise ValueError("min_support_ppm must be in [1, 1e6]")
    if not 2 <= int(max_basket_items) <= 100_000:
        raise ValueError("max_basket_items must be in [2, 100000]")
    m = (
        baskets.where(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
    )
    sizes = m.groupBy("_b").agg(F.count(F.lit(1)).alias("_bs"))
    guard = F.assert_true(
        F.col("_bs") <= F.lit(int(max_basket_items)),
        F.concat(
            F.lit("association_rules: basket "),
            F.col("_b").cast("string"),
            F.lit(
                f" has more than max_basket_items={int(max_basket_items)} "
                "items; the within-basket self-join would go quadratic — "
                "pre-filter items or raise the cap explicitly"
            ),
        ),
    )
    m = m.join(sizes, "_b").where(guard.isNull()).drop("_bs")
    n_baskets = m.select("_b").distinct().count()
    supp = m.groupBy("_i").agg(F.count(F.lit(1)).cast("long").alias("_s"))
    a = m.select(F.col("_b"), F.col("_i").alias("item_a"))
    b = m.select(F.col("_b"), F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, "_b")
        .where(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("supp_pair"))
        .where(
            F.col("supp_pair") * F.lit(1_000_000)
            >= F.lit(int(min_support_ppm)) * F.lit(int(n_baskets))
        )
    )
    return (
        pairs.join(
            F.broadcast(supp.select(F.col("_i").alias("item_a"), F.col("_s").alias("supp_a"))),
            "item_a",
        )
        .join(
            F.broadcast(supp.select(F.col("_i").alias("item_b"), F.col("_s").alias("supp_b"))),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "supp_pair",
            "supp_a",
            "supp_b",
            F.expr("supp_pair * 1000000 div supp_a").cast("long").alias(
                "confidence_ppm"
            ),
            F.expr(
                f"CAST(CAST(supp_pair AS DECIMAL(38,0)) * {int(n_baskets)}"
                " * 1000000 div (CAST(supp_a AS DECIMAL(38,0)) * supp_b)"
                " AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
