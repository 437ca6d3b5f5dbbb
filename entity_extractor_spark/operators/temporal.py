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
