"""Ordered-funnel analysis: which keys completed stage_1 -> stage_2 ->
... -> stage_k IN TIME ORDER, and when.

The classic product/ops question over an event log (signup -> first
ingest -> first query; view -> click -> purchase). The reference can only
answer it by loading a user's events into Python and walking them
(processors/queue.py reads per-document event rows in a loop); at 100 TB
the walk must be relational.

Semantics (earliest-completion greedy): t_1 = MIN ts of a stage-1 event;
t_i = MIN ts of a stage-i event with ts STRICTLY AFTER t_{i-1}. Greedy
earliest matching is the standard funnel definition and maximizes the
number of completed stages (matching any later stage-1 event can only
shrink the feasible set for stage 2+). Strict `>` keeps the funnel
well-defined when two stages share a timestamp: simultaneous events never
count as progress.

Scale shape: k-1 keyed self-joins, every one on the SAME key — Spark
reuses one hash partitioning across the whole chain (each stage table is
a filtered, pre-aggregated one-row-per-key frame, so the joins are
1:1 on shrinking inputs, not event x event). No windows over the raw
event stream, no per-key arrays, no Python: a key with 10^6 events
contributes one row per stage after the first MIN agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    stage_col: str,
    stages: list[str],
) -> DataFrame:
    """(key, ts_1..ts_k, stages_completed) for every key with at least a
    stage-1 event; ts_i is NULL once the funnel stalls (and stays NULL
    for all later stages — enforced by construction, each match requires
    the previous one)."""
    if len(stages) < 2:
        raise ValueError("need at least 2 stages")
    if len(set(stages)) != len(stages):
        raise ValueError("stages must be distinct")
    ev = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("_ts"),
        F.col(stage_col).alias("_st"),
    ).where(F.col("key").isNotNull() & F.col("_ts").isNotNull())
    cur = (
        ev.where(F.col("_st") == stages[0])
        .groupBy("key")
        .agg(F.min("_ts").alias("ts_1"))
    )
    out = cur
    for i, stage in enumerate(stages[1:], start=2):
        nxt = (
            ev.where(F.col("_st") == stage)
            .join(cur.select("key", F.col(f"ts_{i - 1}").alias("_prev")), "key")
            .where(F.col("_ts") > F.col("_prev"))
            .groupBy("key")
            .agg(F.min("_ts").alias(f"ts_{i}"))
        )
        out = out.join(nxt, "key", "left")
        cur = nxt.select("key", f"ts_{i}")
    completed = sum(
        F.when(F.col(f"ts_{i}").isNotNull(), 1).otherwise(0)
        for i in range(1, len(stages) + 1)
    )
    return out.select(
        "key",
        *[f"ts_{i}" for i in range(1, len(stages) + 1)],
        completed.cast("long").alias("stages_completed"),
    )
