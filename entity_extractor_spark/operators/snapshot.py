"""Snapshot diff: what changed between two corpus snapshots.

Incremental curation's first question — given yesterday's corpus table and
today's, which documents were added, removed or modified — so the expensive
downstream stages (mention scan, extraction, embedding, dedup) re-run over
the delta instead of the full 100 TB. The reference re-ingests whole files
and relies on idempotent upserts (artifact_ingestor_service.py's MERGE
semantics, mirrored by operators/link.py:upsert_edges); this operator makes
the delta itself a first-class, value-checkable table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: str | list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """(keys..., change) for every row that is not identical in both
    snapshots: 'added' (key only in new), 'removed' (key only in old),
    'changed' (key in both, any `compare` column differing — null-safe, so
    NULL -> value and value -> NULL both count as changes). Unchanged rows
    are dropped. `compare` defaults to every shared non-key column.

    Keys are assumed unique per snapshot (a corpus primary key); duplicate
    keys diff row-multiset-agnostically only if their payloads agree.

    Scale shape: ONE full-outer sort-merge join hash-partitioned on the
    key, with both scans pruned to keys + compared columns (project before
    shuffling 100 TB of text: callers comparing a wide document row should
    pass a fingerprint column instead — pair with text_fingerprint).
    Pre-bucketed/partitioned snapshot tables co-locate and skip the
    exchange entirely.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if compare is None:
        compare = [
            c for c in old.columns if c in set(new.columns) and c not in key_list
        ]

    o = old.select(*key_list, *compare, F.lit(1).alias("__snap_in_old"))
    n = new.select(*key_list, *compare, F.lit(1).alias("__snap_in_new"))
    j = o.alias("o").join(n.alias("n"), on=key_list, how="full_outer")

    same_payload = F.lit(True)
    for c in compare:
        same_payload = same_payload & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))

    change = (
        F.when(F.col("o.__snap_in_old").isNull(), F.lit("added"))
        .when(F.col("n.__snap_in_new").isNull(), F.lit("removed"))
        .when(~same_payload, F.lit("changed"))
    )
    return (
        j.select(*key_list, change.alias("change"))
        .where(F.col("change").isNotNull())
    )
