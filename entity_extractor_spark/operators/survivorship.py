"""ER survivorship: collapse each entity cluster's observations into one
canonical ("golden") record with a deterministic, per-attribute conflict
resolution rule.

The reference resolves conflicting chemical observations per node with
first-wins / preference-order folds spread through its link path
(chemical_service.py upsert flow; the A4 preference mode and A5 last-wins
rows of SURVEY.md §2). This operator is the cluster-level generalization a
KG build needs right after entity resolution: fuzzy/LSH pairs -> connected
components -> ONE merged record per component, where every attribute
declares how its survivor is chosen.

Rules (all deterministic, all algebraic — hot clusters collapse map-side):
  * mode_cols   — preference-ordered mode: highest observation count wins,
                  ties broken by ascending value (min of struct(-count,
                  value)); NULL observations are ignored; a `<col>_nvals`
                  column reports how many distinct non-null values competed
                  (the conflict signal merge_conflicts counts corpus-wide).
  * max_cols /  — plain algebraic max/min (latest timestamp, largest
    min_cols      balance, smallest key...).
  * first_by    — (order_col, payload_cols): the payloads of the cluster's
                  first observation under ascending (order_col, *payloads)
                  struct order — "earliest record wins", with the payload
                  values themselves as the deterministic tie-break.

Scale shape: one groupBy(cluster) with algebraic aggregates for
count/max/min/first_by, plus per mode column one (cluster, value) count and
one algebraic struct-min — never a window over raw observations, so a
million-member hub cluster partial-aggregates map-side on every path. The
post-agg frames are cluster-sized; AQE broadcasts the small sides of the
reassembly joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def golden_record(
    df: DataFrame,
    cluster_col: str,
    mode_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    first_by: tuple[str, Sequence[str]] | None = None,
) -> DataFrame:
    """One row per cluster: `cluster`, `n_members`, then `<c>_max`,
    `<c>_min`, `<c>_mode` + `<c>_nvals`, and `<p>_first` columns per the
    module-level rules. first_by payload columns should be non-null (the
    struct tie-break order with NULL fields is engine-specific)."""
    names = list(mode_cols) + list(max_cols) + list(min_cols) + (
        [first_by[0], *first_by[1]] if first_by else []
    )
    missing = [c for c in names if c not in df.columns]
    if missing:
        raise ValueError(f"golden_record: columns not in frame: {missing}")
    aggs = [F.count(F.lit(1)).alias("n_members")]
    aggs += [F.max(c).alias(f"{c}_max") for c in max_cols]
    aggs += [F.min(c).alias(f"{c}_min") for c in min_cols]
    if first_by:
        order_col, payload = first_by
        aggs.append(
            F.min(F.struct(F.col(order_col), *[F.col(p) for p in payload])).alias("_fb")
        )
    out = df.groupBy(F.col(cluster_col).alias("cluster")).agg(*aggs)
    if first_by:
        for p in first_by[1]:
            out = out.withColumn(f"{p}_first", F.col(f"_fb.{p}"))
        out = out.drop("_fb")
    for m in mode_cols:
        counts = (
            df.where(F.col(m).isNotNull())
            .groupBy(F.col(cluster_col).alias("cluster"), F.col(m).alias("_v"))
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        pick = (
            counts.groupBy("cluster")
            .agg(
                F.min(F.struct((-F.col("_c")).alias("nc"), F.col("_v").alias("v"))).alias(
                    "_pk"
                ),
                F.count(F.lit(1)).alias(f"{m}_nvals"),
            )
            .select("cluster", F.col("_pk.v").alias(f"{m}_mode"), f"{m}_nvals")
        )
        out = out.join(pick, "cluster", "left")
    return out
