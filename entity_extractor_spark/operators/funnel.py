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


def retention_cohorts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention: (cohort_week, week_offset, n_users) where
    cohort_week is the Monday-truncated week of a key's FIRST event and
    n_users counts distinct keys from that cohort active week_offset
    weeks later — the retention triangle behind every growth dashboard,
    and for a corpus pipeline the "do sources that appeared in week W
    still emit documents in week W+k" freshness report. The reference has
    no longitudinal view at all (per-document rows, no cohorts).

    Week arithmetic is pure integers on Monday-aligned date_trunc('week')
    boundaries (datediff of two Mondays is always a multiple of 7, so the
    `div 7` is exact) — no epoch-origin or timezone drift between
    engines.

    Scale shape: one groupBy(key) MIN for the cohort assignment, one
    equi-join back on the SAME key (one exchange, reused), then one
    algebraic-plus-partial-distinct aggregation on (cohort, offset, key)
    — count(DISTINCT key) shuffles the already-deduplicated triple, not
    raw events. No windows, no Python."""
    ev = df.select(
        F.col(key_col).alias("_key"), F.col(ts_col).alias("_ts")
    ).where(F.col("_key").isNotNull() & F.col("_ts").isNotNull())
    first = ev.groupBy("_key").agg(F.min("_ts").alias("_first"))
    return (
        ev.join(first, "_key")
        .select(
            "_key",
            F.date_trunc("week", F.col("_first")).alias("cohort_week"),
            F.expr(
                "CAST(datediff(CAST(date_trunc('week', _ts) AS DATE), "
                "CAST(date_trunc('week', _first) AS DATE)) div 7 AS BIGINT)"
            ).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("_key").alias("n_users"))
    )


def event_transitions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    stage_col: str,
) -> DataFrame:
    """First-order transition counts (from_stage, to_stage, n_transitions):
    for every key's event sequence ordered by (ts, seq), count each
    adjacent stage pair — the Markov-chain view of a clickstream (what do
    users do AFTER a search?) and, over pipeline stage logs, the
    empirical stage graph. seq_col breaks timestamp ties so the sequence
    — and therefore every count — is deterministic on any engine.

    Scale shape: one window partitioned by key (lead only — no growing
    frame), then one algebraic count over (from, to) pairs which partial-
    aggregates map-side into at most |stages|^2 groups. The window sorts
    each key's events within its partition; a hub key with 10^8 events
    makes one big sort — pre-split such keys by session before calling
    (sessionize in streaming/windows.py) if the log has them."""
    from pyspark.sql import Window

    w = Window.partitionBy("_key").orderBy("_ts", "_seq")
    ev = df.select(
        F.col(key_col).alias("_key"),
        F.col(ts_col).alias("_ts"),
        F.col(seq_col).alias("_seq"),
        F.col(stage_col).alias("from_stage"),
    ).where(F.col("_key").isNotNull() & F.col("_ts").isNotNull())
    return (
        ev.withColumn("to_stage", F.lead("from_stage").over(w))
        .where(F.col("to_stage").isNotNull())
        .groupBy("from_stage", "to_stage")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
