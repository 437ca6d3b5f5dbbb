"""Single-pass data-quality audit — Deequ-style constraint checks as one
algebraic aggregation.

A KG build should not trust its inputs or publish its outputs unaudited:
orphaned edges, out-of-range measures, null keys and broken invariants
all need counting BEFORE the corpus ships. The naive form runs one
COUNT(*) WHERE NOT rule per rule — R full scans; this operator folds
every rule into ONE aggregate pass (sum of indicator columns, map-side
partials, whole-stage codegen) and emits a long-form metrics table.

NULL semantics are strict, like Deequ's Check: a rule that evaluates to
NULL (unknown) counts as a VIOLATION — an audit that silently passes
NULL rows hides exactly the rows it exists to catch.

Rates are ppm by BIGINT floor division — bit-exact cross-engine.

Reference analog: the reference validates per-row inside its ingest loop
and drops bad rows ad hoc (artifact_ingestor_service.py try/except per
document); here the violations become a first-class, value-checkable
table instead of log lines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PPM = 1_000_000


def constraint_audit(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, total_rows, violations, violation_ppm) — one row per rule,
    ordered output left to the caller. `rules` maps rule name -> boolean
    Column that is True when the row SATISFIES the rule; False or NULL
    counts as a violation.

    Scale shape: one aggregation over the table computes count(*) plus one
    conditional sum per rule (all algebraic, partials combine map-side);
    the wide one-row result is exploded to long form via a map literal —
    no second scan, no joins, no Python. Audit a 100 TB table at the cost
    of a single column-pruned pass over exactly the columns the rules
    mention."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [F.count("*").cast("long").alias("_total")]
    for i, cond in enumerate(rules.values()):
        aggs.append(
            F.sum(F.when(cond, F.lit(0)).otherwise(F.lit(1))).cast("long").alias(f"_v{i}")
        )
    wide = df.agg(*aggs)
    pairs = []
    for i, name in enumerate(rules.keys()):
        pairs.extend([F.lit(name), F.col(f"_v{i}")])
    return wide.select(
        F.col("_total"), F.explode(F.create_map(*pairs)).alias("rule", "violations")
    ).select(
        "rule",
        F.col("_total").alias("total_rows"),
        "violations",
        F.when(F.col("_total") > 0, F.expr(f"violations * {_PPM} DIV _total"))
        .otherwise(F.lit(None).cast("long"))
        .alias("violation_ppm"),
    )


def merge_conflicts(
    df: DataFrame, cluster_col: str, attr_col: str
) -> DataFrame:
    """Post-merge QA for entity resolution: per canonical cluster, does
    the merged entity carry CONTRADICTORY values of an attribute?
    Output (cluster, n_members, n_values, has_conflict, val_min, val_max)
    — n_values counts distinct non-NULL attribute values, has_conflict =
    n_values > 1, and val_min/val_max bound the disagreement so a reviewer
    sees WHAT conflicts without a second query.

    The reference upserts node properties last-writer-wins and never
    notices the clobber (global_node_repository.py update path); this
    makes every clobber countable BEFORE it ships, the merge-quality
    sibling of er_metrics.pair_metrics (which grades the clustering
    itself).

    Scale shape: ONE groupBy(cluster) with algebraic aggs (count +
    count_distinct via partial aggregation, min/max) — no joins, no
    windows; hub clusters collapse map-side."""
    return df.groupBy(F.col(cluster_col).alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.countDistinct(attr_col).cast("long").alias("n_values"),
        (F.countDistinct(attr_col) > 1).alias("has_conflict"),
        F.min(attr_col).alias("val_min"),
        F.max(attr_col).alias("val_max"),
    )
