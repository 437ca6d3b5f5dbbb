"""Changelog application (CDC merge): fold an insert/update/delete event
stream into a snapshot to produce the next snapshot.

Every long-lived KG is maintained this way — the day's entity changes
arrive as a change stream and must land on the canonical table with
last-writer-wins semantics. The reference applies changes row-at-a-time
through SQLAlchemy upserts inside the ingest loop
(global_node_repository.py add/update + per-doc session.commit()); at
100 TB the fold must be one relational pass, not 10^9 round-trips.

Semantics (upsert dialect):
  * per key, only the LATEST change by (ts, seq) applies — earlier
    changes to the same key are absorbed before ever touching the
    snapshot;
  * latest op 'I' or 'U' -> the key exists in the output with the
    change's payload (an update to an absent key inserts it — standard
    upsert, what MERGE WHEN NOT MATCHED THEN INSERT does);
  * latest op 'D' -> the key is absent from the output, whether or not
    the snapshot had it;
  * keys the changelog never mentions pass through unchanged.

Determinism: the per-key winner is max(struct(ts, seq, op, payload...)),
a lexicographic struct max — with a unique (ts, seq) per key it IS the
newest change; if a producer ever duplicates (ts, seq), the op/payload
fields extend the comparison so the winner is still a total order, never
a partition race. An op outside {I, U, D} fails the job loudly
(raise_error inside the aggregate's input projection) instead of being
silently coerced.

Scale shape: ONE aggregation shuffles the changelog on key (the struct
max partial-aggregates map-side, so a hot key with 10^6 changes ships
one row per map task), then ONE key-equi full-outer join against the
snapshot — both sides hash-partitioned on the same key. No windows over
raw changes, no Python. This is exactly the shape MERGE INTO compiles to
on an Iceberg/Delta table (plans/tableio.py carries the real-MERGE seam);
this operator is the engine-internal equivalent when the target is plain
parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OPS = ("I", "U", "D")


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    op_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Return the next snapshot: (key_col, *payload_cols). `snapshot`
    must carry key_col + payload_cols; `changes` must carry key_col,
    ts_col, seq_col, op_col + payload_cols."""
    if not payload_cols:
        raise ValueError("payload_cols must be non-empty")
    op = F.col(op_col)
    checked_op = F.when(op.isin(*_OPS), op).otherwise(
        F.raise_error(
            F.concat(F.lit("apply_changelog: op must be one of I/U/D, got "), op)
        )
    )
    latest = (
        changes.where(F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("_k"),
            F.struct(
                F.col(ts_col).alias("_ts"),
                F.col(seq_col).alias("_seq"),
                checked_op.alias("_op"),
                *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
            ).alias("_ch"),
        )
        .groupBy("_k")
        .agg(F.max("_ch").alias("_ch"))
    )
    snap = snapshot.select(
        F.col(key_col).alias("_k"),
        *[F.col(c).alias(f"_s_{c}") for c in payload_cols],
    )
    joined = snap.join(latest, "_k", "full_outer")
    has_change = F.col("_ch").isNotNull()
    return (
        joined.where(~has_change | (F.col("_ch._op") != "D"))
        .select(
            F.col("_k").alias(key_col),
            *[
                F.when(has_change, F.col(f"_ch._p_{c}"))
                .otherwise(F.col(f"_s_{c}"))
                .alias(c)
                for c in payload_cols
            ],
        )
    )


def incremental_agg(
    state: DataFrame | None,
    batch: DataFrame,
    key_col: str,
    sum_cols: list[str],
) -> DataFrame:
    """Incremental materialized-aggregate maintenance for ALGEBRAIC
    aggregates: fold an append-only batch into a persisted per-key
    (n, sums...) state without re-aggregating history —
    new_state = state FULL-OUTER-JOIN agg(batch), columns added with
    null-as-zero. The materialized-view shape of incremental_components
    / incremental_lsh_matches: at 100 TB the rollup a dashboard reads
    must absorb today's partition at O(|batch| + |affected keys|), never
    O(|history|).

    Only additive measures belong here (count, sum — and avg/variance
    via their sum decompositions); min/max are NOT maintainable under
    this contract once data can be deleted, and deletes/updates should
    flow through apply_changelog into a snapshot first. Sums ride
    whatever exact integer/decimal grid the caller puts them on.

    Scale shape: one algebraic aggregation of the batch (map-side
    partials — a hot key's batch rows collapse before the shuffle) +
    one key equi-join against state, which AQE broadcasts while the
    batch-agg side is small. Untouched state keys pass through the
    outer join unmodified.

    Output: (key, n, <sum_cols>...) — same schema as
    `batch.groupBy(key).agg(count, sums)`, so state bootstraps from
    None and chains forever. NULL keys are dropped (same contract as
    gap_fill / half_life_decayed / source_scorecard): a full-outer
    equi-join never matches NULL to NULL, so keeping them would append
    a fresh splinter NULL-key row per batch instead of one group.
    """
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(c).alias(c) for c in sum_cols
    ]
    b = (
        batch.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(*aggs)
    )
    if state is None:
        return b
    s = state.select(
        F.col("key"), F.col("n").alias("_sn"),
        *[F.col(c).alias(f"_s_{c}") for c in sum_cols],
    )
    joined = s.join(b.select("key", F.col("n").alias("_bn"),
                             *[F.col(c).alias(f"_b_{c}") for c in sum_cols]),
                    "key", "full_outer")
    out_cols = [
        "key",
        (F.coalesce("_sn", F.lit(0)) + F.coalesce("_bn", F.lit(0))).alias("n"),
    ]
    for c in sum_cols:
        out_cols.append(
            (
                F.coalesce(F.col(f"_s_{c}"), F.lit(0))
                + F.coalesce(F.col(f"_b_{c}"), F.lit(0))
            ).alias(c)
        )
    return joined.select(*out_cols)


def as_of_state(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    op_col: str,
    payload_cols: list[str],
    as_of,
) -> DataFrame:
    """Point-in-time reconstruction (time travel): the table state AS OF
    `as_of`, rebuilt from the full changelog — the read side of
    apply_changelog and the plain-parquet equivalent of an Iceberg/Delta
    `VERSION AS OF` / `TIMESTAMP AS OF` read. Every KG audit ("what did
    we assert about this entity before the retraction?"), every
    reproducible-training-run manifest ("train on the corpus exactly as
    it stood on date X"), and every incident postmortem is this query.

    Semantics: only events with ts <= as_of (inclusive) exist yet; per
    key the latest of those by (ts, seq) decides — op I/U means the key
    exists with that change's payload, op D means it is absent; keys
    whose first event is after as_of are absent (not yet born). Output:

        (key, *payload_cols, as_of_ts, as_of_seq)

    where as_of_ts/as_of_seq identify the deciding event — the row-level
    provenance an audit needs to cite. Ops outside {I, U, D} fail loudly
    (same executor-side raise as apply_changelog); NULL keys are dropped
    (same contract).

    Determinism: the winner is max(struct(ts, seq, op, payloads...)) — a
    total order even under duplicated (ts, seq), never a partition race.

    Scale shape: the as_of predicate is a pushable scan filter (on a
    ts-partitioned changelog it prunes whole partitions before any
    shuffle), then ONE algebraic aggregation on key — map-side partials
    collapse a hot key's history per task, so the exchange carries one
    row per (task, live key), and no window ever ranks the raw events.
    Reconstructing k snapshots means k such passes; for a dense snapshot
    series use apply_changelog to roll state forward instead."""
    if not payload_cols:
        raise ValueError("payload_cols must be non-empty")
    op = F.col(op_col)
    checked_op = F.when(op.isin(*_OPS), op).otherwise(
        F.raise_error(
            F.concat(F.lit("as_of_state: op must be one of I/U/D, got "), op)
        )
    )
    winner = (
        changes.where(F.col(key_col).isNotNull())
        .where(F.col(ts_col) <= F.lit(as_of))
        .select(
            F.col(key_col).alias("_k"),
            F.struct(
                F.col(ts_col).alias("_ts"),
                F.col(seq_col).alias("_seq"),
                checked_op.alias("_op"),
                *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
            ).alias("_ch"),
        )
        .groupBy("_k")
        .agg(F.max("_ch").alias("_ch"))
    )
    return winner.where(F.col("_ch._op") != "D").select(
        F.col("_k").alias(key_col),
        *[F.col(f"_ch._p_{c}").alias(c) for c in payload_cols],
        F.col("_ch._ts").alias("as_of_ts"),
        F.col("_ch._seq").alias("as_of_seq"),
    )


def forget_cascade(
    requests: DataFrame,
    request_key: str,
    levels: list[tuple[str, DataFrame, str, str | None]],
) -> DataFrame:
    """Right-to-be-forgotten deletion cascade: given a table of deletion
    requests (GDPR/CCPA erasure keys) and an ordered chain of derived
    tables, compute the full downstream removal manifest — what every
    deletion job must produce BEFORE touching data, and what the
    compliance audit quotes after.

    `levels` is the FK chain: (table_name, df, match_col, emit_col).
    Level 0's match_col joins the request keys; level i's joins the
    keys level i-1 emitted (emit_col values of its matched rows).
    emit_col=None terminates the chain (last level only — anything
    after it would have no frontier to match).

    Output, one row per level:
        (depth, table_name, n_rows, n_matched_keys, n_emit_keys,
         digest1, digest2)
    n_rows = rows to delete; n_matched_keys = distinct frontier keys
    that actually hit (requests for unknown keys are visible as
    level-0 shrinkage, not an error — erasure requests routinely name
    already-gone users); n_emit_keys + the two digests describe the
    NEXT frontier via snapshot.dataset_digest's order/partition/engine-
    invariant multiset sum — so the manifest pins the exact key SETS
    flowing down the cascade, not just their sizes, and two runs (or
    two engines) can be compared line by line.

    Scale shape: per level ONE hash equi-join of the table against the
    (distinct, localCheckpoint'd) frontier — the frontier is usually
    small enough to broadcast and AQE does so at runtime, but nothing
    assumes it — plus two algebraic aggregations (row/key counts, the
    digest). No windows, no driver-side key materialization: only the
    per-level scalar counts are collected (pagerank scalar doctrine).
    NULL request keys are dropped (a NULL erasure key is no key);
    NULL emit values simply don't extend the frontier (a row with no
    child link has no children)."""
    from .snapshot import dataset_digest

    if not levels:
        raise ValueError("forget_cascade: levels must be non-empty")
    for i, (_, _, _, emit) in enumerate(levels):
        if emit is None and i != len(levels) - 1:
            raise ValueError(
                "forget_cascade: emit_col=None is only valid on the last level"
            )
    frontier = (
        requests.select(F.col(request_key).alias("_fk"))
        .where(F.col("_fk").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    spark = requests.sparkSession
    out: list[tuple[int, str, int, int, int, int, int]] = []
    for depth, (name, df, match_col, emit_col) in enumerate(levels):
        matched = df.join(
            frontier, on=df[match_col] == frontier["_fk"], how="inner"
        )
        stats = matched.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct(F.col(match_col)).cast("long").alias("n_hit"),
        ).collect()[0]
        key_src = emit_col if emit_col is not None else match_col
        nxt = (
            matched.select(F.col(key_src).alias("_fk"))
            .where(F.col("_fk").isNotNull())
            .distinct()
            .localCheckpoint()
        )
        dig = dataset_digest(nxt, ["_fk"]).collect()[0]
        out.append(
            (
                depth,
                name,
                int(stats.n_rows or 0),
                int(stats.n_hit or 0),
                int(dig.n_rows or 0),
                int(dig.digest1 or 0),
                int(dig.digest2 or 0),
            )
        )
        if emit_col is not None:
            frontier = nxt
    return spark.createDataFrame(
        out,
        "depth long, table_name string, n_rows long, n_matched_keys long, "
        "n_emit_keys long, digest1 long, digest2 long",
    )


def compact_changelog(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    op_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Changelog compaction: collapse a key's whole event history inside
    the window into its NET effect — the batch form of Kafka log
    compaction and the step that keeps a long-retention changelog
    replayable in O(live keys) instead of O(events). Feeding the
    compacted log to apply_changelog produces the same next snapshot as
    the full log (unit-gated equivalence), so upstream can thin history
    any time the event:key ratio grows.

    Net classification per key from (first event, last event) in
    (ts, seq) order:
      first I, last D  -> the key was born AND died inside the window:
                          emit NOTHING (the histories cancel);
      first I, last !D -> net 'I' with the last payload;
      first !I, last D -> net 'D' tombstone (the key pre-existed, so
                          downstream must still see the delete — kept,
                          exactly like Kafka retains tombstones);
      first !I, last !D-> net 'U' with the last payload.
    Output: (key, op, ts, seq, *payload_cols, n_events) — ts/seq are the
    LAST event's (the compacted event sorts where the original history
    ended), n_events is the collapsed count (the compaction-ratio audit).
    Dropping the born-and-died pair is sound under the standard CDC
    consistency contract (an 'I' only for keys absent from the base
    snapshot); an inconsistent log that 'I'nserts an existing key would
    diverge — same caveat as every log-compacted store. Ops outside
    {I, U, D} raise executor-side; NULL keys are dropped (apply_changelog
    contract). First/last are min/max over struct(ts, seq, op, payloads)
    — a total order even under duplicated (ts, seq), never a partition
    race.

    Scale shape: ONE algebraic aggregation on key computing BOTH ends
    (min + max of the same struct in one groupBy — map-side partials
    collapse a hot key's 10^6-event history per task); no window ever
    ranks raw events, no join. The reference has no changelog at all —
    it mutates rows in place one session.commit() at a time
    (utils/mysql.py:12-41)."""
    if not payload_cols:
        raise ValueError("payload_cols must be non-empty")
    op = F.col(op_col)
    checked_op = F.when(op.isin(*_OPS), op).otherwise(
        F.raise_error(
            F.concat(F.lit("compact_changelog: op must be one of I/U/D, got "), op)
        )
    )
    ev = F.struct(
        F.col(ts_col).alias("_ts"),
        F.col(seq_col).alias("_seq"),
        checked_op.alias("_op"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    g = (
        changes.where(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("_k"), ev.alias("_e"))
        .groupBy("_k")
        .agg(
            F.min("_e").alias("_f"),
            F.max("_e").alias("_l"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    born = F.col("_f._op") == "I"
    dead = F.col("_l._op") == "D"
    return g.where(~(born & dead)).select(
        F.col("_k").alias(key_col),
        F.when(dead, F.lit("D"))
        .when(born, F.lit("I"))
        .otherwise(F.lit("U"))
        .alias(op_col),
        F.col("_l._ts").alias(ts_col),
        F.col("_l._seq").alias(seq_col),
        *[F.col(f"_l._p_{c}").alias(c) for c in payload_cols],
        "n_events",
    )
