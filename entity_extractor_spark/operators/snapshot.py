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


_MOD_P = (1 << 61) - 1  # Mersenne prime, the repo's modular-hash modulus


def dataset_digest(
    df: DataFrame, cols: list[str], group_cols: list[str] | None = None
) -> DataFrame:
    """Order- and partition-invariant content digest of a dataset (per
    group, or one row for the whole table): the manifest line a
    reproducible training run pins — "this exact multiset of rows" —
    and the cheapest cross-environment equality check after a
    migration, engine swap, or re-layout (snapshot_diff says WHAT
    changed; this says WHETHER, in O(1) manifest space).

        (group..., n_rows, digest1, digest2)

    Each row canonicalizes to a '\\x1f'-joined string of the named
    columns (NULL as a sentinel distinct from any rendered value, so
    NULL != '' != '<NULL>' collisions are impossible unless the data
    literally contains the sentinel), hashes to two INDEPENDENT 48-bit
    integers (md5 hex slices 1-12 and 13-24 — the bloom/minhash
    convention), and the digest is the multiset SUM of each, carried in
    DECIMAL(38,0) (exact to ~10^23 rows) and folded mod 2^61-1 into
    BIGINT. Sum is commutative/associative => identical on any
    partitioning, any row order, any engine; duplicates count
    (multiset semantics — a doubled row is a real corpus change).
    Two independent 48-bit sums make an accidental collision ~2^-96
    per comparison.

    Scale shape: ONE algebraic aggregation, map-side partials, no
    shuffle beyond the group agg; output is group-count-sized. Column
    list is explicit because a digest must name its schema — silently
    hashing whatever columns happen to exist makes two different
    schemas incomparable without failing."""
    if not cols:
        raise ValueError("dataset_digest: cols must be non-empty")
    rep = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL\x00"))
            for c in cols
        ],
    )
    h = F.md5(rep)
    hashed = df.select(
        *[F.col(g) for g in (group_cols or [])],
        F.conv(F.substring(h, 1, 12), 16, 10).cast("long").alias("_h1"),
        F.conv(F.substring(h, 13, 12), 16, 10).cast("long").alias("_h2"),
    )
    return hashed.groupBy(*[F.col(g) for g in (group_cols or [])]).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr(
            f"CAST(sum(CAST(_h1 AS DECIMAL(38,0))) % {_MOD_P} AS BIGINT)"
        ).alias("digest1"),
        F.expr(
            f"CAST(sum(CAST(_h2 AS DECIMAL(38,0))) % {_MOD_P} AS BIGINT)"
        ).alias("digest2"),
    )
