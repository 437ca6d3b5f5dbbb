"""Temporal operators: the as-of (point-in-time) join.

The reference joins each artifact event to the latest prior state of its
entity (analysis row current as of the page's ingest time —
artifact_ingestor_service.py's "most recent analysis" lookups); more
generally, "for each fact, the newest dimension row at or before its
timestamp" is the canonical event-enrichment query that plain equi-joins
cannot express and naive inequality joins explode on.

Spark has no ASOF JOIN. The scale-correct formulation here is the
union+window trick:

    1. tag right rows 0 and left rows 1, union them on (keys, ts, tag,
       tiebreak, payload);
    2. one window per key ordered by (ts, tag, tiebreak) carries
       last(payload IGNORE NULLS) forward;
    3. keep the left rows — each has absorbed the newest right payload at
       or before its own position.

Cost: ONE hash exchange on the join key plus a per-partition sort —
identical shape to any keyed window. The naive alternative
(`l JOIN r ON key AND r.ts <= l.ts`, then argmax) materializes a
candidate set quadratic in per-key row count: a user with 10^5 events on a
100 TB log yields 10^10 candidate pairs for that key alone, where this
formulation sorts 2·10^5 rows. Skewed keys degrade to a big sort, never to
a cross-product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ASOF = "__asof_payload"
_TAG = "__asof_is_left"
_TB = "__asof_tb"
_ROW = "__asof_left_row"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str,
    right_values: list[str],
    tiebreak: str,
    allow_exact_matches: bool = True,
    tolerance_seconds: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach `right_values` from the newest right row
    with equal `on` keys and right.ts <= left.ts (< when
    allow_exact_matches=False); columns are NULL when no right row
    qualifies. Ties on right.ts resolve to the largest `tiebreak` value, so
    the result is a pure function of the data — identical on any
    partitioning, cluster size or retry.

    tolerance_seconds: when set, a match older than this many seconds
    before the left timestamp is discarded (integer microsecond
    arithmetic; no float drift).

    Output: every left column unchanged, plus `{prefix}{c}` for each c in
    right_values (and `{prefix}{ts}` — the matched row's timestamp —
    appended automatically for tolerance/lineage).
    """
    keys = [on] if isinstance(on, str) else list(on)
    carry = list(dict.fromkeys([*right_values, ts]))
    # keys and ts already travel as top-level union columns; the _ROW
    # struct carries only the REST of the left row, so the big exchange
    # never ships a left key/ts twice
    rest = [c for c in left.columns if c not in {*keys, ts}]

    # schema-only probes (no jobs): the exact types each side must
    # null-pad so unionByName lines up. The tiebreak keeps its NATIVE type
    # — casting it to string would resolve ts-ties lexicographically
    # ('9' > '10'), not by value.
    # zero-field structs are invalid: pad with a constant when the left
    # row is nothing but keys + ts
    row_fields = [F.col(c) for c in rest] or [F.lit(0).alias("__none")]
    payload_t = right.select(F.struct(*[F.col(c) for c in carry]).alias(_ASOF)).schema[0].dataType
    row_t = left.select(F.struct(*row_fields).alias(_ROW)).schema[0].dataType
    tb_t = right.schema[tiebreak].dataType

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(ts).alias(ts),
        F.lit(0).alias(_TAG),
        F.col(tiebreak).alias(_TB),
        F.struct(*[F.col(c) for c in carry]).alias(_ASOF),
        F.lit(None).cast(row_t).alias(_ROW),
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(ts).alias(ts),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(tb_t).alias(_TB),
        F.lit(None).cast(payload_t).alias(_ASOF),
        F.struct(*row_fields).alias(_ROW),
    )

    # At equal ts a right row sorts BEFORE the left row iff exact matches
    # are allowed (tag 0 < 1); with strict '<' the left row sorts first and
    # never sees it. _TB ascending makes "last" = max tiebreak; left rows
    # carry a NULL tiebreak, ordered first among equals — their mutual
    # order is irrelevant since each reads only its own prefix.
    order = [F.col(ts).asc(), (F.col(_TAG).asc() if allow_exact_matches else F.col(_TAG).desc()), F.col(_TB).asc_nulls_first()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn(_ASOF, F.last(_ASOF, ignorenulls=True).over(w))
        .where(F.col(_TAG) == 1)
    )
    if tolerance_seconds is not None:
        matched = matched.withColumn(
            _ASOF,
            F.when(
                F.unix_micros(F.col(ts)) - F.unix_micros(F.col(_ASOF)[ts])
                <= F.lit(int(tolerance_seconds) * 1_000_000),
                F.col(_ASOF),
            ),
        )
    out_cols = [
        (F.col(c) if c in {*keys, ts} else F.col(f"{_ROW}.{c}")).alias(c)
        for c in left.columns
    ]
    out_cols += [F.col(f"{_ASOF}.{c}").alias(f"{prefix}{c}") for c in carry]
    return matched.select(*out_cols)


def scd2_collapse(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse an observation stream
    into attribute validity intervals — (key, attr, effective_from,
    effective_to, version), one row per maximal run of consecutive equal
    attribute values per key.

    effective_from is the run's first observation, effective_to the next
    run's first observation (half-open [from, to)), NULL for the current
    version; version numbers runs 1..n in time order. Observations are
    totally ordered by (ts, tiebreak) so same-timestamp rows collapse
    deterministically; equality is null-safe (NULL attr is a value, and a
    NULL->x transition opens a new version).

    This is how a KG keeps entity attributes AS OF a date: materialize the
    versions once, then asof_join facts against effective_from — the
    reference instead overwrites node properties in place and loses
    history (global_node_repository.py upsert).

    Scale shape: the classic gaps-and-islands build — ONE hash exchange on
    the key feeds three same-window passes (lag, running sum, lead) that
    Spark executes in a single per-partition sort, then one groupBy on
    (key, run) that arrives pre-partitioned. No joins, no Python; per-key
    cost is the sort, so skew degrades gracefully."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    # first row per key always opens run 1, even when its attr is NULL
    # (lag-eqNullSafe alone would call NULL->NULL "unchanged" there)
    changed = F.lag(F.lit(1)).over(w).isNull() | ~F.col(attr_col).eqNullSafe(
        F.lag(attr_col).over(w)
    )
    runs = df.select(key_col, ts_col, tiebreak_col, attr_col).withColumn(
        "_run",
        F.sum(F.when(changed, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ver = runs.groupBy(key_col, "_run").agg(
        F.first(attr_col).alias("attr"),  # constant within the run
        F.min(F.struct(ts_col, tiebreak_col))[ts_col].alias("effective_from"),
    )
    wv = Window.partitionBy(key_col).orderBy("_run")
    return ver.select(
        F.col(key_col).alias("key"),
        "attr",
        "effective_from",
        F.lead("effective_from").over(wv).alias("effective_to"),
        F.col("_run").cast("long").alias("version"),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    keys: list[str] | None = None,
    max_span_buckets: int = 4096,
) -> DataFrame:
    """Bucketed range join: each point row pairs with every interval row
    (matching `keys`, when given) whose half-open [start, end) contains
    the point — the "which windows cover this event" join that Spark
    plans as a BroadcastNestedLoopJoin (keyless) or an in-join range
    filter (keyed) when written naively, both of which die at scale.

    Physical strategy: quantize the axis into buckets of `bucket_width`.
    A point lives in exactly ONE bucket; an interval is exploded to the
    buckets it overlaps; the join becomes a plain EQUI-join on
    (keys..., bucket) followed by the exact range filter. Each
    (point, interval) pair can meet in at most one bucket (the point's),
    so no dedup pass is needed. Shuffle is by bucket — time-local, so a
    uniform event stream spreads evenly; pick bucket_width near the
    typical interval length (one row per interval per bucket is the
    explosion cost, enforced below).

    Guard: an interval spanning >= max_span_buckets buckets fails the job
    LOUDLY (lazy executor-side assert, same pattern as
    ngram_jaccard_pairs' group-size guard) instead of silently exploding
    the build side — widen bucket_width rather than raising the cap.

    Column names of the two inputs must be disjoint apart from `keys`
    (rename upstream, as with interval_join). Numeric and timestamp axes
    both work; bucketing casts to double (exact for |values| < 2^53 —
    microsecond epochs included), and only MONOTONICITY of the bucket fn
    matters for correctness since the exact predicate re-filters.

    Reference analog: the reference scans all "analysis windows" per
    document in Python (file_analysis_service.py loops windows per page);
    this is the one-equi-join form of that lookup.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    keys = list(keys or [])
    dup = (set(points.columns) & set(intervals.columns)) - set(keys)
    if dup:
        raise ValueError(f"overlapping non-key columns: {sorted(dup)}")

    def _bucket(df: DataFrame, c: str) -> F.Column:
        # TIMESTAMP_NTZ / DATE have no direct double cast; route through
        # TIMESTAMP (session-tz interpretation — a constant shift, so the
        # bucket fn stays monotone and both sides shift identically)
        col = F.col(c)
        if dict(df.dtypes)[c] in ("timestamp_ntz", "date"):
            col = col.cast("timestamp")
        return F.floor(col.cast("double") / F.lit(float(bucket_width))).cast("long")

    p = points.withColumn("_pb", _bucket(points, point_col))
    iv = (
        intervals.where(F.col(end_col) > F.col(start_col))
        .withColumn("_b0", _bucket(intervals, start_col))
        .withColumn("_b1", _bucket(intervals, end_col))
    )
    guard = F.assert_true(
        F.col("_b1") - F.col("_b0") < F.lit(max_span_buckets),
        F.concat(
            F.lit("range_join: an interval spans "),
            (F.col("_b1") - F.col("_b0") + 1).cast("string"),
            F.lit(
                f" buckets (cap {max_span_buckets}); widen bucket_width "
                "instead of exploding the build side"
            ),
        ),
    )
    iv = (
        iv.where(guard.isNull())
        .withColumn("_pb", F.explode(F.sequence(F.col("_b0"), F.col("_b1"))))
        .drop("_b0", "_b1")
    )
    return (
        p.join(iv, keys + ["_pb"])
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_pb")
    )


def interval_coalesce(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping-or-touching [start, end] intervals per key into
    maximal disjoint spans — (key, span_start, span_end, n_merged). The
    classic sweep-line op behind validity-interval compaction (collapse a
    fact's overlapping evidence windows into coverage spans), sessionized
    busy-time accounting, and calendar-style availability math; the
    reference stores raw per-event windows and has no way to ask "when
    was this entity covered at all".

    Sweep line as two windows on one partitioning: ordered by (start,
    end), an interval OPENS a new span iff its start is strictly after
    the running max of all earlier ends (touching intervals merge); the
    cumulative sum of open flags is the span id; one algebraic groupBy
    collapses each span. Deterministic under ties: equal (start, end)
    rows are interchangeable and the open flag compares only against the
    running max, which any tie order leaves identical.

    Scale shape: ONE hash exchange on key feeds both windows and the
    final groupBy (same partitioning, Catalyst reuses it); the sort is
    per-key within partitions. A single key with 10^8 intervals is one
    task's sort — pre-bucket by coarse time if the data has such a hub.
    """
    w = Window.partitionBy("_key").orderBy("_start", "_end")
    prev_max_end = F.max("_end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = Window.partitionBy("_key").orderBy("_start", "_end").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.select(
            F.col(key_col).alias("_key"),
            F.col(start_col).alias("_start"),
            F.col(end_col).alias("_end"),
        )
        .where(
            F.col("_key").isNotNull()
            & F.col("_start").isNotNull()
            & F.col("_end").isNotNull()
        )
        .withColumn(
            "_open",
            F.when(
                prev_max_end.isNull() | (F.col("_start") > prev_max_end), 1
            ).otherwise(0),
        )
        .withColumn("_span", F.sum("_open").over(cum))
        .groupBy("_key", "_span")
        .agg(
            F.min("_start").alias("span_start"),
            F.max("_end").alias("span_end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .select(
            F.col("_key").alias(key_col), "span_start", "span_end", "n_merged"
        )
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign gap-based session ids to every event: a new session opens
    when an event arrives more than gap_seconds after its key's previous
    event — the batch twin of streaming/windows.py's session_window
    aggregation, but keeping the EVENTS (with a session id column) so
    downstream features join per-event, where the streaming form only
    keeps per-session aggregates. Sessions are the unit of behavioral
    features (events-per-session, funnel-within-session) and of safe
    hub-key splitting (event_transitions' docstring points here).

    session_id numbers sessions 1..S per key in time order; (ts, seq)
    orders ties so the assignment is a total order on any engine.

    Scale shape: ONE hash exchange on key feeds the lag window, the
    cumulative-sum window, and any later per-(key, session) groupBy —
    the same single-sort gaps-and-islands shape as scd2_collapse. A key
    with 10^8 events is one task's sort: sessionize per coarse time
    bucket first if the log has such hubs."""
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be positive")
    w = Window.partitionBy("_key").orderBy("_ts", "_seq")
    ev = df.select(
        F.col(key_col).alias("_key"),
        F.col(ts_col).alias("_ts"),
        F.col(seq_col).alias("_seq"),
    ).where(
        F.col("_key").isNotNull()
        & F.col("_ts").isNotNull()
        & F.col("_seq").isNotNull()
    )
    # timestamp subtraction yields a day-time interval — exact integer
    # microseconds under the hood, works for TIMESTAMP and TIMESTAMP_NTZ
    # alike with no session-timezone dependence; DuckDB replays it with
    # date_diff('microsecond')
    prev = F.lag("_ts").over(w)
    opens = F.when(
        prev.isNull()
        | (
            (F.col("_ts") - prev)
            > F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")
        ),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("_open", opens)
        .withColumn(
            "session_id",
            F.sum("_open")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
        .select(
            F.col("_key").alias(key_col),
            F.col("_ts").alias(ts_col),
            F.col("_seq").alias(seq_col),
            "session_id",
        )
    )


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bucket_us: int,
    value_col: str | None = None,
) -> DataFrame:
    """Dense per-key time spine: exactly one row per (key, bucket) for
    EVERY bucket between the corpus's first and last event — shared
    bounds so keys are comparable — with event count and exact cents
    value mass, ZERO-FILLED where nothing happened. The resample/gap-fill
    every time-series consumer needs before rolling windows, drift lines
    (group_ols) or anomaly fences (mad_outliers): a missing day is a
    SIGNAL (crawler died, source went dark) that a sparse frame silently
    hides — lag()-based features silently skip gaps without this.

    Bucket = FLOOR(µs-since-epoch / bucket_us) via timestampdiff
    (TIMESTAMP/TIMESTAMP_NTZ-identical, no session-timezone dependence —
    sessionize doctrine), with the floor spelled out sign-correctly:
    Spark's DIV truncates toward zero while DuckDB's // floors, so a
    pre-1970 timestamp would otherwise bucket differently per engine
    AND give the epoch-spanning bucket double width (group_ols
    doctrine: the explicit form is the only one both engines agree
    on). Value mass on the BIGINT cents grid (exact, engine-invariant).

    Scale shape: the spine is built by exploding ONE sequence literal
    per key — a narrow map over the distinct-keys frame, never a
    crossJoin (BNLJ) and never a driver-side loop — then one left join
    against the (key, bucket) aggregate, both sides pre-shrunk to
    keys x buckets. Size the bucket so span/bucket_us stays bounded
    (a year of 1-second buckets is 31M rows per key — use minutes).
    """
    if bucket_us <= 0:
        raise ValueError("bucket_us must be > 0")
    dt = dict(df.dtypes).get(ts_col)
    epoch = (
        "TIMESTAMP_NTZ'1970-01-01 00:00:00'"
        if dt == "timestamp_ntz"
        else "TIMESTAMP'1970-01-01 00:00:00+00:00'"
    )
    us = f"timestampdiff(MICROSECOND, {epoch}, `{ts_col}`)"
    b = int(bucket_us)
    bucket = F.expr(
        f"CASE WHEN ({us}) >= 0 THEN ({us}) DIV {b}"
        f" ELSE -((-({us}) + {b} - 1) DIV {b}) END"
    )
    base = df.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        bucket.alias("bucket"),
        *([F.col(value_col).alias("_v")] if value_col else []),
    )
    lo, hi = base.agg(F.min("bucket"), F.max("bucket")).collect()[0]
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs.append(
            F.sum((F.col("_v").cast("decimal(18,2)") * 100).cast("long")).alias("_vc")
        )
    if lo is None:
        out = base.groupBy("key", "bucket").agg(*aggs)
        return (
            out.select("key", "bucket", "n", F.col("_vc").alias("value_cents"))
            if value_col
            else out
        )
    agg = base.groupBy("key", "bucket").agg(*aggs)
    spine = (
        base.select("key")
        .distinct()
        .withColumn("bucket", F.explode(F.sequence(F.lit(int(lo)), F.lit(int(hi)))))
    )
    out = spine.join(agg, ["key", "bucket"], "left").select(
        "key",
        "bucket",
        F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"),
        *(
            [F.coalesce(F.col("_vc"), F.lit(0).cast("long")).alias("value_cents")]
            if value_col
            else []
        ),
    )
    return out


def rolling_window(
    df: DataFrame,
    key_col: str,
    order_col: str,
    sum_cols: list[str],
    preceding: int,
) -> DataFrame:
    """Trailing rolling sums over a DENSE per-key series: for each row,
    sum each of `sum_cols` over the last `preceding`+1 rows in
    `order_col` order within the key — the moving-average/burst-detect
    primitive every monitoring consumer builds on top of gap_fill.

    DENSE matters: ROWS-frame windows on a sparse series silently sum
    "last k events" instead of "last k intervals" — run gap_fill first
    so row distance == time distance (that composition is the contract
    gate). Sums stay on whatever exact integer grid the inputs are on.

    Scale shape: ONE window partitioned by key (never global), all
    rolling columns computed over the same frame spec so Spark plans a
    single Window operator on one exchange; trailing ROWS frames stream
    in order-of-arrival within the partition with an O(frame) running
    buffer. Skew bound: a key's partition holds span/bucket rows — the
    gap_fill spine, not the raw events.
    """
    if preceding < 0:
        raise ValueError("preceding must be >= 0")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(-preceding, 0)
    )
    out = df
    for c in sum_cols:
        out = out.withColumn(f"{c}_roll", F.sum(c).over(w))
    return out


def interval_conflicts(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    val_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    max_span_buckets: int = 4096,
    conflicts_only: bool = True,
) -> DataFrame:
    """Temporal functional-property audit: find every pair of assertions
    about the same key whose validity intervals [start, end) OVERLAP —
    flagged `is_conflict` when their values differ. The temporal
    completion of kg_quality.functional_violations: "one value per
    subject" is too strict for facts that legitimately change (a
    customer's active priority, an entity's current name); the real
    invariant is one value AT A TIME, and its violations are overlapping
    intervals with different values. The reference stores one mutable
    value per node and loses history entirely (global_node_repository.py
    upserts in place), so it can neither detect nor report these.

    Semantics: assertions with NULL key/bounds or empty intervals
    (end <= start) are dropped (interval_coalesce contract); a NULL
    value RAISES executor-side — an audit over a feed with missing
    values would report vacuous agreement. Output one row per unordered
    overlapping pair: (*key_cols, id1, id2, val1, val2, overlap_start,
    overlap_end, is_conflict) with id1 < id2 and val1/val2 the values of
    id1/id2; conflicts_only=True keeps only the violating pairs.

    Scale shape: the naive form is a per-key self-join with a range
    predicate — Spark plans the range part as an in-join filter over the
    full key-group cross product, quadratic in a hub key's assertion
    count. Here the axis is quantized like range_join: ONE side explodes
    to its covered buckets (loudly capped at max_span_buckets, same
    guard), the other stays a single row at its START bucket, and the
    join is a plain equi-join on (keys..., bucket). Each overlapping
    pair is found EXACTLY once — it meets in the bucket holding the
    later start, owned by the unexploded side via (s_P > s_B, ties by
    id) — so no distinct pass re-shuffles the output. Shuffle is
    time-local by bucket; a hub key's assertions spread across its
    buckets instead of one task.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")

    def _bucket(frame: DataFrame, c: str) -> F.Column:
        col = F.col(c)
        if dict(frame.dtypes)[c] in ("timestamp_ntz", "date"):
            col = col.cast("timestamp")
        return F.floor(col.cast("double") / F.lit(float(bucket_width))).cast("long")

    checked_val = F.when(
        F.col(val_col).isNotNull(), F.col(val_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("interval_conflicts: NULL value for assertion id "),
                F.col(id_col).cast("string"),
            )
        )
    )
    base = (
        df.where(
            F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
            & (F.col(end_col) > F.col(start_col))
        )
        .na.drop(subset=key_cols)
        .select(
            *key_cols,
            F.col(id_col).alias("_id"),
            checked_val.alias("_v"),
            F.col(start_col).alias("_s"),
            F.col(end_col).alias("_e"),
        )
    )
    probe = base.select(
        *key_cols,
        F.col("_id").alias("_id_p"),
        F.col("_v").alias("_v_p"),
        F.col("_s").alias("_s_p"),
        F.col("_e").alias("_e_p"),
    )
    probe = probe.withColumn(
        "_bk", _bucket(probe, "_s_p")
    )
    build = base.select(
        *key_cols,
        F.col("_id").alias("_id_b"),
        F.col("_v").alias("_v_b"),
        F.col("_s").alias("_s_b"),
        F.col("_e").alias("_e_b"),
    )
    build = (
        build.withColumn("_b0", _bucket(build, "_s_b"))
        .withColumn("_b1", _bucket(build, "_e_b"))
    )
    guard = F.assert_true(
        F.col("_b1") - F.col("_b0") < F.lit(max_span_buckets),
        F.concat(
            F.lit("interval_conflicts: an interval spans "),
            (F.col("_b1") - F.col("_b0") + 1).cast("string"),
            F.lit(
                f" buckets (cap {max_span_buckets}); widen bucket_width "
                "instead of exploding the build side"
            ),
        ),
    )
    build = (
        build.where(guard.isNull())
        .withColumn("_bk", F.explode(F.sequence(F.col("_b0"), F.col("_b1"))))
        .drop("_b0", "_b1")
    )
    pairs = (
        probe.join(build, key_cols + ["_bk"])
        .where(
            # probe owns the pair: strictly later start, ties by id
            (F.col("_s_p") > F.col("_s_b"))
            | ((F.col("_s_p") == F.col("_s_b")) & (F.col("_id_p") > F.col("_id_b")))
        )
        # overlap (s_b <= s_p < e_p gives the other half for free)
        .where(F.col("_s_p") < F.col("_e_b"))
    )
    first_is_p = F.col("_id_p") < F.col("_id_b")
    out = pairs.select(
        *key_cols,
        F.when(first_is_p, F.col("_id_p")).otherwise(F.col("_id_b")).alias("id1"),
        F.when(first_is_p, F.col("_id_b")).otherwise(F.col("_id_p")).alias("id2"),
        F.when(first_is_p, F.col("_v_p")).otherwise(F.col("_v_b")).alias("val1"),
        F.when(first_is_p, F.col("_v_b")).otherwise(F.col("_v_p")).alias("val2"),
        F.greatest("_s_p", "_s_b").alias("overlap_start"),
        F.least("_e_p", "_e_b").alias("overlap_end"),
        (F.col("_v_p") != F.col("_v_b")).alias("is_conflict"),
    )
    return out.where("is_conflict") if conflicts_only else out
