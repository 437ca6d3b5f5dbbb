"""Pairwise clustering evaluation — precision/recall/F1 of a predicted
entity clustering against gold labels, WITHOUT materializing pairs.

Entity resolution's standard metric counts item PAIRS: a pair is a true
positive when predicted co-clustered AND gold co-clustered. The naive
computation joins the table to itself (O(n^2) pairs — instantly fatal on
a 100 TB corpus); this operator uses the contingency-table identity
instead: every count is a sum of C(n,2) over group sizes,

    tp_pairs   = sum over (pred, gold) cells   of  c * (c-1) / 2
    pred_pairs = sum over pred clusters        of  n * (n-1) / 2
    gold_pairs = sum over gold classes         of  n * (n-1) / 2

so the whole evaluation is one groupBy(pred, gold) plus two tiny re-aggs
of the cell table — O(n) data movement, map-side partial aggregation,
no joins at all. The three scalars meet in ONE row via a union of
(kind, pairs) rows folded by a single algebraic agg — no 1-row
crossJoin (which Spark plans as BroadcastNestedLoopJoin) and no
driver-side collect.

All arithmetic is BIGINT (ppm rates via floor division), so the result
is bit-exact on any engine. Undefined rates (zero predicted or zero gold
pairs) surface as NULL, never a fake 0 or 1.

KG use: grade a blocking/clustering scheme (LSH band buckets, simhash
prefixes, the canonicalization CC) against known duplicate classes
before trusting it at scale. The reference has no evaluation story at
all — dedup quality there is whatever `normalized_name` equality gives
(global_node_repository.py upsert-by-name); this makes the quality
measurable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PPM = 1_000_000


def _pairs(n) -> F.Column:
    # C(n, 2) in BIGINT: n*(n-1) is always even, DIV is exact
    return F.expr(f"CAST({n} AS BIGINT) * ({n} - 1) DIV 2")


def pair_metrics(df: DataFrame, pred_col: str, gold_col: str) -> DataFrame:
    """One row: (tp_pairs, pred_pairs, gold_pairs, precision_ppm,
    recall_ppm, f1_ppm) for the clustering `pred_col` scored against the
    classes `gold_col`, over one row per item.

    precision = tp/pred_pairs, recall = tp/gold_pairs, f1 = 2tp/(pred+gold)
    — each in parts-per-million by BIGINT floor division, NULL when its
    denominator is zero (all-singleton clusterings have no pairs to be
    right or wrong about).

    Scale shape: cells = groupBy(pred, gold).count() is the only pass over
    the data (map-side combine; output is #distinct label combinations,
    not #rows). The two marginal re-aggs and the final fold run over that
    tiny cell table, localCheckpoint'd once so its three consumers don't
    recompute the scan."""
    cells = (
        df.groupBy(F.col(pred_col).alias("_p"), F.col(gold_col).alias("_g"))
        .count()
        .localCheckpoint()
    )
    tp = cells.select(F.lit("tp").alias("kind"), _pairs("count").alias("pairs"))
    pp = (
        cells.groupBy("_p")
        .agg(F.sum("count").alias("n"))
        .select(F.lit("pp").alias("kind"), _pairs("n").alias("pairs"))
    )
    gp = (
        cells.groupBy("_g")
        .agg(F.sum("count").alias("n"))
        .select(F.lit("gp").alias("kind"), _pairs("n").alias("pairs"))
    )

    def _tot(kind: str) -> F.Column:
        return F.coalesce(
            F.sum(F.when(F.col("kind") == kind, F.col("pairs"))), F.lit(0)
        ).cast("long")

    one = tp.unionByName(pp).unionByName(gp).agg(
        _tot("tp").alias("tp_pairs"),
        _tot("pp").alias("pred_pairs"),
        _tot("gp").alias("gold_pairs"),
    )
    rate = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0, F.expr(f"{num} * {_PPM} DIV {den}")
    )
    return one.select(
        "tp_pairs",
        "pred_pairs",
        "gold_pairs",
        rate("tp_pairs", "pred_pairs").alias("precision_ppm"),
        rate("tp_pairs", "gold_pairs").alias("recall_ppm"),
        F.when(
            F.col("pred_pairs") + F.col("gold_pairs") > 0,
            F.expr(f"2 * tp_pairs * {_PPM} DIV (pred_pairs + gold_pairs)"),
        ).alias("f1_ppm"),
    )
