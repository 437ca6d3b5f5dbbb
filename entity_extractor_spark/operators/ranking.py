"""Reciprocal-rank fusion — combining heterogeneous retrieval signals
into one ranking without score calibration.

A RAG/recommendation stack retrieves the same items through several
rankers whose raw scores are incomparable (cosine similarity vs BM25 vs
recency). RRF (Cormack, Clarke & Buettcher 2009, "Reciprocal Rank Fusion
outperforms Condorcet and individual rank learning methods") fuses on
RANKS alone: score(item) = sum over rankers of 1 / (k + rank). The
reference returns its single exact cosine top-5 (`vector_repository.py:
56-67`); a production retrieval layer fuses that with lexical and
freshness signals — this operator is that layer.

Everything stays on the integer grid: each contribution is
10^9 div (k + rank) (numerator large enough that distinct ranks never
collide after floor division for any k + rank <= ~30k), so fused scores
are engine-order-invariant BIGINTs — no float summation ceremony.

Scale shape: one union of the (already-ranked) inputs, one algebraic
sum groupBy (query, item), one per-query row_number window (partitioned
by query — never a global window) for the final top-n. Rankers are
expected to emit bounded per-query lists (top-m each), so the fused
set is O(queries * m * rankers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NUM = 1_000_000_000


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str,
    item_col: str,
    rank_col: str,
    k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Fuse per-query rankings (1-based rank_col) into (query, item,
    rrf_score, n_rankers, rank). Ties in fused score break by item
    ascending — deterministic on any engine. Items missing from a ranker
    simply contribute nothing for it (standard RRF)."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k < 0 or top_n <= 0:
        raise ValueError("k must be >= 0 and top_n > 0")
    stacked = None
    for r in rankings:
        part = r.select(
            F.col(query_col).alias("query"),
            F.col(item_col).alias("item"),
            F.expr(f"{_NUM} DIV ({int(k)} + CAST({rank_col} AS BIGINT))").alias(
                "_c"
            ),
        )
        stacked = part if stacked is None else stacked.unionAll(part)
    fused = stacked.groupBy("query", "item").agg(
        F.sum("_c").cast("bigint").alias("rrf_score"),
        F.count(F.lit(1)).cast("bigint").alias("n_rankers"),
    )
    w = Window.partitionBy("query").orderBy(
        F.col("rrf_score").desc(), F.col("item")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= top_n)
    )
