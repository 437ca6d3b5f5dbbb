"""Data audits + layout planning: constraints, drift, Benford, k-anonymity, profiling, zone maps, Z-order, compaction/GC, bloom pruning, skew profile.

Split out of the former monolithic contract.py (round-4, VERDICT ask #6);
query registration happens via the shared @query decorator into the
aggregating contract.Q / contract.SQL dicts in _shared.py.
"""
from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import Window  # noqa: F401

from ._shared import *  # noqa: F401,F403



@query(
    "audit_constraints",
    """WITH t AS (SELECT
         CAST(count(*) AS BIGINT) AS total,
         CAST(sum(CASE WHEN l_quantity <= 25 THEN 0 ELSE 1 END) AS BIGINT) AS v0,
         CAST(sum(CASE WHEN l_discount <= 0.06 THEN 0 ELSE 1 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v2,
         CAST(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END) AS BIGINT) AS v3
       FROM lineitem)
       SELECT rule, total AS total_rows, violations,
              CASE WHEN total > 0 THEN violations * 1000000 // total END AS violation_ppm
       FROM (SELECT 'qty_at_most_25' AS rule, total, v0 AS violations FROM t
             UNION ALL SELECT 'discount_at_most_6pct', total, v1 FROM t
             UNION ALL SELECT 'price_positive', total, v2 FROM t
             UNION ALL SELECT 'returnflag_known', total, v3 FROM t)""",
)
def audit_constraints(spark, sf_dir):
    """Single-pass data-quality audit (audit.constraint_audit): four
    Deequ-style rules over lineitem fold into ONE algebraic aggregation
    (map-side partials, whole-stage codegen) instead of one scan per rule;
    NULL rule results count as violations. Mixes heavy-violation rules
    (~50% and ~36%) with zero-violation invariants so both the counting
    and the clean path value-check. Rates are BIGINT ppm floor divisions.
    Reference analog: the ad-hoc per-row try/except validation in the
    ingest loop (artifact_ingestor_service.py) made a value-checkable
    table instead of log lines."""
    from ..operators.audit import constraint_audit

    return constraint_audit(
        _t(spark, sf_dir, "lineitem"),
        {
            "qty_at_most_25": F.col("l_quantity") <= 25,
            "discount_at_most_6pct": F.col("l_discount") <= 0.06,
            "price_positive": F.col("l_extendedprice") > 0,
            "returnflag_known": F.col("l_returnflag").isin("A", "N", "R"),
        },
    )


@query(
    "skew_profile_suppkey",
    """WITH c AS (SELECT l_suppkey AS key, count(*) AS n_rows
                  FROM lineitem GROUP BY l_suppkey),
       t AS (SELECT sum(n_rows) AS total FROM c)
       SELECT key, n_rows,
              n_rows * 1000000 // (SELECT total FROM t) AS share_ppm,
              (n_rows + 999) // 1000 AS salt_factor
       FROM c ORDER BY n_rows DESC, key LIMIT 20""",
)
def skew_profile_suppkey(spark, sf_dir):
    """Shuffle-health measurement (skew.skew_profile): the 20 heaviest
    supplier keys of the lineitem fact with exact row share (ppm) and the
    salt factor salted_join would need to cap any task at ~1000 rows of
    that key — the MEASUREMENT behind the north rule's explicit
    repartition/salting levers, run before keying a 100 TB shuffle. ONE
    groupBy pass (map-side combine) feeds both the scalar total (pagerank
    agg-collect pattern, never a 1-row crossJoin) and the
    TakeOrderedAndProject top-k."""
    from ..operators.skew import skew_profile

    return skew_profile(
        _t(spark, sf_dir, "lineitem"), "l_suppkey",
        top_k=20, target_rows_per_task=1000,
    )


@query(
    "audit_merge_conflicts",
    """SELECT n_chars // 100 AS cluster,
              CAST(count(*) AS BIGINT) AS n_members,
              CAST(count(DISTINCT lang) AS BIGINT) AS n_values,
              count(DISTINCT lang) > 1 AS has_conflict,
              min(lang) AS val_min, max(lang) AS val_max
       FROM documents GROUP BY 1""",
)
def audit_merge_conflicts(spark, sf_dir):
    """Blocking-purity / merge-conflict QA (audit.merge_conflicts): per
    candidate block (here the 100-char length band a cheap blocker might
    use), does the block mix CONTRADICTORY attribute values (language)?
    n_values counts distinct non-NULL values, val_min/val_max bound the
    disagreement so a reviewer sees what conflicts without a second
    query. The reference upserts node properties last-writer-wins and
    never notices a clobber (global_node_repository.py); this makes every
    clobber countable before it ships. ONE algebraic groupBy — no joins,
    hub clusters collapse map-side."""
    from ..operators.audit import merge_conflicts

    d = _t(spark, sf_dir, "documents").select(
        F.expr("n_chars DIV 100").cast("long").alias("band"), "lang"
    )
    return merge_conflicts(d, "band", "lang")


@query(
    "audit_profile_columns",
    """SELECT 'o_custkey' AS col_name, CAST(count(*) AS BIGINT) AS total_rows,
              CAST(count(o_custkey) AS BIGINT) AS non_null,
              CAST(count(*) - count(o_custkey) AS BIGINT) AS nulls,
              CAST((count(*) - count(o_custkey)) * 1000000 // count(*)
                   AS BIGINT) AS null_ppm,
              CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
              CAST(min(o_custkey) AS VARCHAR) AS min_str,
              CAST(max(o_custkey) AS VARCHAR) AS max_str
       FROM orders
       UNION ALL
       SELECT 'o_orderstatus', count(*), count(o_orderstatus),
              count(*) - count(o_orderstatus),
              (count(*) - count(o_orderstatus)) * 1000000 // count(*),
              count(DISTINCT o_orderstatus),
              min(o_orderstatus), max(o_orderstatus)
       FROM orders
       UNION ALL
       SELECT 'o_orderpriority', count(*), count(o_orderpriority),
              count(*) - count(o_orderpriority),
              (count(*) - count(o_orderpriority)) * 1000000 // count(*),
              count(DISTINCT o_orderpriority),
              min(o_orderpriority), max(o_orderpriority)
       FROM orders
       UNION ALL
       SELECT 'o_orderdate', count(*), count(o_orderdate),
              count(*) - count(o_orderdate),
              (count(*) - count(o_orderdate)) * 1000000 // count(*),
              count(DISTINCT o_orderdate),
              CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
       FROM orders""",
)
def audit_profile_columns(spark, sf_dir):
    """One-pass column profiler (audit.profile_columns): null counts and
    ppm, exact distinct cardinality, and value min/max rendered as
    strings, long-form one row per column — the profile a curator runs
    before writing constraint_audit rules against a new table drop. ONE
    Spark aggregation over the pruned columns (the per-column exact
    count(DISTINCT) is an Expand — the honest cost of exact cardinality);
    the oracle is the naive per-column UNION ALL, fine at oracle scale."""
    from ..operators.audit import profile_columns

    return profile_columns(
        _t(spark, sf_dir, "orders"),
        ["o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"],
    ).withColumnRenamed("column", "col_name")


@query(
    "audit_mad_outliers",
    """WITH v AS (SELECT event_type, event_id,
                         CAST(floor(value * 100) AS BIGINT) AS val
                  FROM events
                  WHERE event_type IS NOT NULL AND event_id IS NOT NULL
                    AND value IS NOT NULL),
       med AS (SELECT event_type, val,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY val) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM v),
       m1 AS (SELECT event_type, val AS med FROM med
              WHERE rn = (n + 1) // 2),
       dev AS (SELECT v.event_type, event_id, val, med,
                      abs(val - med) AS abs_dev
               FROM v JOIN m1 USING (event_type)),
       md AS (SELECT event_type, abs_dev,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY abs_dev) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM dev),
       m2 AS (SELECT event_type, abs_dev AS mad FROM md
              WHERE rn = (n + 1) // 2)
       SELECT dev.event_type, event_id, val AS value, med, abs_dev, mad,
              CASE WHEN mad > 0
                   THEN CAST(abs_dev * 1000000 // mad AS BIGINT)
                   ELSE NULL END AS robust_ppm
       FROM dev JOIN m2 USING (event_type)
       WHERE abs_dev * 1000000 > 3500000 * mad""",
)
def audit_mad_outliers(spark, sf_dir):
    """Robust per-group outliers (audit.mad_outliers): events whose value
    (in exact cents) deviates from their event-type median by more than
    3.5 x MAD — ~9% of the synthetic event values sit in that tail, so
    the gate checks real flag decisions plus the med/mad/robust_ppm
    arithmetic on every flagged row. Medians are exact type-1 integer
    ranks over DISTINCT-value-collapsed tables; the per-group (med, mad)
    tables broadcast back onto the rows, so raw data is scanned, never
    shuffled. The oracle replays both medians with row_number windows —
    the formulation that would ship every raw row at scale."""
    from ..operators.audit import mad_outliers

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    return mad_outliers(ev, "event_type", "event_id", "cents")


@query(
    "layout_zorder_key",
    f"""WITH d AS (SELECT o_orderkey, o_custkey AS x,
                  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS y
           FROM orders),
       s AS (SELECT min(x) AS lx, max(x) AS hx, min(y) AS ly, max(y) AS hy FROM d),
       z AS (SELECT o_orderkey,
                    CAST((x - s.lx) * 65536 // (s.hx - s.lx + 1) AS BIGINT) AS zx,
                    CAST((y - s.ly) * 65536 // (s.hy - s.ly + 1) AS BIGINT) AS zy
             FROM d, s)
       SELECT o_orderkey, zx, zy,
              CAST({_zinterleave_sql(16)} AS BIGINT) AS zvalue
       FROM z""",
)
def layout_zorder_key(spark, sf_dir):
    """Z-order (Morton) clustering key (layout.zorder_values): interleave
    bucketized (customer, order-day) bits so range-partitioned files
    cover compact rectangles of the tenant x time plane and predicates
    on EITHER column row-group-skip — the Delta OPTIMIZE ZORDER BY move,
    in exact integer arithmetic (value-range bucket + shift/mask
    interleave, min/max embedded as collected literals). The locality
    payoff itself (per-file bounding boxes ~4x tighter than a
    single-column sort) is gated in tests/test_layout.py; this row
    value-checks the key for every order at both scale factors."""
    from ..operators.layout import zorder_values

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("x"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("y"),
    )
    return zorder_values(o, "x", "y", bits=16).select(
        "o_orderkey", "zx", "zy", "zvalue"
    )


# ------------------------------------------------- functional dependencies --

@query(
    "audit_functional_deps",
    """WITH c AS (
         SELECT 'o_orderkey' AS determinant, 'o_custkey' AS dependent,
                CAST(o_orderkey AS VARCHAR) AS det,
                COALESCE(CAST(o_custkey AS VARCHAR), '<NULL>') AS dep
         FROM orders WHERE o_orderkey IS NOT NULL
         UNION ALL
         SELECT 'o_custkey', 'o_orderstatus', CAST(o_custkey AS VARCHAR),
                COALESCE(CAST(o_orderstatus AS VARCHAR), '<NULL>')
         FROM orders WHERE o_custkey IS NOT NULL
         UNION ALL
         SELECT 'o_orderstatus', 'o_orderpriority',
                CAST(o_orderstatus AS VARCHAR),
                COALESCE(CAST(o_orderpriority AS VARCHAR), '<NULL>')
         FROM orders WHERE o_orderstatus IS NOT NULL
         UNION ALL
         SELECT 'o_orderdate', 'o_orderstatus', CAST(o_orderdate AS VARCHAR),
                COALESCE(CAST(o_orderstatus AS VARCHAR), '<NULL>')
         FROM orders WHERE o_orderdate IS NOT NULL),
       g AS (SELECT determinant, dependent, det,
                    count(DISTINCT dep) AS nd
             FROM c GROUP BY 1, 2, 3)
       SELECT determinant, dependent,
              CAST(count(*) AS BIGINT) AS n_keys,
              CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_viol_keys,
              CAST(max(nd) AS BIGINT) AS max_distinct_deps,
              sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
       FROM g GROUP BY 1, 2""",
)
def audit_functional_deps(spark, sf_dir):
    """Functional-dependency discovery (audit.functional_dependencies):
    four candidate FDs over orders measured in ONE stacked pass — the
    primary key (o_orderkey -> o_custkey) must hold, the fan-outs
    (o_custkey -> status, status -> priority, date -> status) must report
    their exact violation counts and worst fan-out. Dates stringify via
    CAST on both engines (the raw-DATE pandas-compare lesson)."""
    from ..operators.audit import functional_dependencies

    o = _t(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("string")
    )
    return functional_dependencies(
        o,
        [
            ("o_orderkey", "o_custkey"),
            ("o_custkey", "o_orderstatus"),
            ("o_orderstatus", "o_orderpriority"),
            ("o_orderdate", "o_orderstatus"),
        ],
    )


@query(
    "layout_compaction_plan",
    """WITH f AS (
         SELECT o_orderpriority AS pt,
                'f' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS file,
                CAST(floor(o_totalprice * 100) AS BIGINT)
                  * CASE WHEN o_orderkey % 97 = 0 THEN 100 ELSE 1 END AS bytes
         FROM orders),
       c AS (
         SELECT pt, file, bytes,
                sum(bytes) OVER (PARTITION BY pt ORDER BY file
                                 ROWS UNBOUNDED PRECEDING) AS cum
         FROM f),
       g AS (SELECT pt, file, bytes,
                    (cum - bytes) // 500000000 AS grp FROM c)
       SELECT pt, file, bytes, CAST(grp AS BIGINT) AS grp,
              CAST(sum(bytes) OVER (PARTITION BY pt, grp) AS BIGINT)
                AS grp_bytes,
              CAST(count(*) OVER (PARTITION BY pt, grp) AS BIGINT)
                AS grp_files
       FROM g""",
)
def layout_compaction_plan(spark, sf_dir):
    """Small-file compaction planner (layout.compaction_plan): a synthetic
    per-order file listing (5 priority partitions; bytes = totalprice
    cents, with every 97th file inflated 100x past the target so the
    oversized-file pass-through branch carries real mass) packed into
    ~500 MB output groups by contiguous name-order first-fit — the
    deterministic planning half of Iceberg/Delta rewrite_data_files.
    One exchange on the partition key feeds the cumsum, the group id,
    and the per-group totals; the oracle replays the identical window
    arithmetic."""
    from ..operators import layout as L

    files = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pt"),
        F.expr("concat('f', lpad(CAST(o_orderkey AS STRING), 10, '0'))").alias(
            "file"
        ),
        F.expr(
            "CAST(floor(o_totalprice * 100) AS BIGINT)"
            " * CASE WHEN o_orderkey % 97 = 0 THEN 100 ELSE 1 END"
        ).alias("bytes"),
    )
    return L.compaction_plan(
        files, "file", "bytes", 500_000_000, partition_col="pt"
    )


@query(
    "layout_table_gc_plan",
    """WITH disk AS (
         SELECT DISTINCT 'data/f' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0')
                  AS file
         FROM orders WHERE o_orderkey % 13 <> 0),
       ref AS (
         SELECT DISTINCT file FROM (
           SELECT 'data/f' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0')
                    AS file
           FROM orders WHERE o_orderkey % 17 <> 0
           UNION ALL
           SELECT 'data/f' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0')
           FROM orders WHERE o_orderkey % 5 = 0))
       SELECT file, 'orphan' AS status FROM disk
       WHERE file NOT IN (SELECT file FROM ref)
       UNION ALL
       SELECT file, 'missing' AS status FROM ref
       WHERE file NOT IN (SELECT file FROM disk)""",
)
def layout_table_gc_plan(spark, sf_dir):
    """Filesystem-vs-manifest reconciliation (layout.table_gc_plan, the
    Iceberg remove_orphan_files audit + the missing-file corruption
    alarm): listing and manifest are synthesized from orders with
    deliberate disjoint dropout slices — every 13th file exists only in
    the manifest (missing -> page a human) and every 17th only on disk
    (orphan -> age-filter then delete), with every 5th file referenced
    TWICE so the multi-snapshot-dedup path carries mass; healthy files
    are not emitted. Two path-keyed hash anti-joins over deduplicated
    sides."""
    from ..operators.layout import table_gc_plan

    fname = F.expr(
        "concat('data/f', lpad(CAST(o_orderkey AS STRING), 10, '0'))"
    ).alias("file")
    o = _t(spark, sf_dir, "orders")
    disk = o.where("o_orderkey % 13 <> 0").select(fname)
    ref = o.where("o_orderkey % 17 <> 0").select(fname).unionByName(
        o.where("o_orderkey % 5 = 0").select(fname)
    )
    return table_gc_plan(disk, ref)


@query(
    "prune_bloom_semijoin",
    f"""WITH {_BLOOM_BUILD_SQL},
  probe AS (
    SELECT o_custkey,
      CAST(concat('0x', substring(md5(concat(CAST(o_custkey AS VARCHAR),
           '|1')), 1, 12)) AS BIGINT) % 2048 AS p1,
      CAST(concat('0x', substring(md5(concat(CAST(o_custkey AS VARCHAR),
           '|2')), 1, 12)) AS BIGINT) % 2048 AS p2
    FROM orders),
  flagged AS (
    SELECT o_custkey,
      coalesce((b1.bits >> CAST(p1 % 63 AS INT)) & 1, 0) = 1
      AND coalesce((b2.bits >> CAST(p2 % 63 AS INT)) & 1, 0) = 1
        AS bloom_maybe
    FROM probe
    LEFT JOIN bloom b1 ON b1.w = p1 // 63
    LEFT JOIN bloom b2 ON b2.w = p2 // 63)
  SELECT bloom_maybe, (d.k IS NOT NULL) AS is_member,
         COUNT(*) AS cnt
  FROM flagged f LEFT JOIN dim d ON f.o_custkey = d.k
  GROUP BY 1, 2""",
)
def prune_bloom_semijoin(spark, sf_dir):
    """Bloom semi-join pruning (bloom.py): build a 2048-bit / 2-hash
    filter over BUILDING-segment customer keys, probe every order's
    o_custkey, and tabulate (bloom_maybe, is_member) -> count. m is
    deliberately undersized so ALL confusion-matrix cells carry mass at
    both scale factors: true keeps, false positives (maybe but not a
    member), true prunes — and the no-false-negative invariant shows as
    the absent (is_member, NOT maybe) cell, which the oracle's identical
    grouping would expose if either engine manufactured one. Scale
    shape: build is one algebraic bit_or agg over the (tiny) dim;
    probe never shuffles the fact side (k broadcast word-joins,
    plan-gated in tests/test_bloom.py)."""
    from ..operators.bloom import bloom_build, bloom_probe

    dim = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    bloom = bloom_build(dim, "c_custkey", 2048, 2)
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    flagged = bloom_probe(orders, "o_custkey", bloom, 2048, 2)
    truth = dim.select(F.col("c_custkey").alias("_tk")).distinct()
    return (
        flagged.join(
            F.broadcast(truth), flagged.o_custkey == F.col("_tk"), "left"
        )
        .groupBy(
            "bloom_maybe", F.col("_tk").isNotNull().alias("is_member")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "prune_bloom_stats",
    f"""WITH {_BLOOM_BUILD_SQL},
  agg AS (
    SELECT COUNT(*) AS n_words,
           CAST(coalesce(sum(bit_count(bits)), 0) AS BIGINT) AS bits_set
    FROM bloom)
  SELECT CAST(n_words AS BIGINT) AS n_words, bits_set,
         CAST(CAST(bits_set AS HUGEINT) * 1000000 // 2048 AS BIGINT)
           AS saturation_ppm,
         CAST(CAST(CAST(bits_set AS HUGEINT) * 1000000 // 2048 AS HUGEINT)
              * (CAST(bits_set AS HUGEINT) * 1000000 // 2048)
              // 1000000 AS BIGINT) AS est_fp_ppm
  FROM agg""",
)
def prune_bloom_stats(spark, sf_dir):
    """Filter health report (bloom.bloom_stats) for the same filter
    prune_bloom_semijoin builds: exact integer saturation and the
    (bits_set/m)^k false-positive estimate on the ppm grid — the number
    an operator reads before shipping a filter to tomorrow's ingest.
    The oracle replays the bit_count/ppm algebra in HUGEINT."""
    from ..operators.bloom import bloom_build, bloom_stats

    dim = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return bloom_stats(bloom_build(dim, "c_custkey", 2048, 2), 2048, 2)


@query(
    "audit_distribution_drift",
    f"""WITH a AS (SELECT * FROM orders
                   WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
       b AS (SELECT * FROM orders
             WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
       ha AS (SELECT field, v, COUNT(*) AS c_a
              FROM ({_DRIFT_STACK.format(src="a")}) GROUP BY 1, 2),
       hb AS (SELECT field, v, COUNT(*) AS c_b
              FROM ({_DRIFT_STACK.format(src="b")}) GROUP BY 1, 2),
       j AS (SELECT COALESCE(ha.field, hb.field) AS field,
                    COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
             FROM ha FULL OUTER JOIN hb
               ON ha.field = hb.field
              AND ha.v IS NOT DISTINCT FROM hb.v),
       t AS (SELECT field, SUM(c_a) AS n_a, SUM(c_b) AS n_b,
                    COUNT(*) AS n_values
             FROM j GROUP BY 1),
       d AS (SELECT j.field,
                    abs(c_a * 1000000 // n_a - c_b * 1000000 // n_b) AS dd,
                    n_a, n_b, n_values
             FROM j JOIN t ON j.field = t.field)
       SELECT field, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
              CAST(n_values AS BIGINT) AS n_values,
              CAST(SUM(dd) // 2 AS BIGINT) AS tvd_ppm,
              CAST(MAX(dd) AS BIGINT) AS linf_ppm
       FROM d GROUP BY 1, 2, 3, 4""",
)
def audit_distribution_drift(spark, sf_dir):
    """Snapshot distribution drift (audit.distribution_drift): orders
    before vs after 1998-01-01 (mid-range of the synthetic 1995-2001
    span), four columns in ONE stacked pass spanning both extremes:
    o_orderstatus / o_orderpriority / a floor-cents price bucket are
    date-independent by generation, so their TVD sits near zero (~200-
    4000 ppm — the metric must NOT manufacture drift), while the
    derived order YEAR is fully disjoint across the cut, so its TVD is
    exactly 10^6 and every one of its values exercises the
    missing-on-one-side (c = 0) branch of the null-safe full-outer
    join. The oracle replays histogram -> full-outer join -> ppm
    deltas -> TVD/L-inf in HUGEINT. At 100 TB this is two histogram
    scans + joins over histogram ROWS, never data rows."""
    from ..operators.audit import distribution_drift

    o = _t(spark, sf_dir, "orders")
    derived = o.select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.expr(
            "CAST(CAST(floor(o_totalprice * 100) AS BIGINT) div 10000000"
            " AS STRING)"
        ).alias("price_bucket"),
        F.year("o_orderdate").cast("string").alias("year"),
        "o_orderdate",
    )
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    return distribution_drift(
        derived.where(F.col("o_orderdate") < cut),
        derived.where(F.col("o_orderdate") >= cut),
        ["status", "priority", "price_bucket", "year"],
    )


@query(
    "audit_k_anonymity",
    """WITH q AS (
         SELECT c_nationkey AS nat, c_mktsegment AS seg,
                (CAST(floor(c_acctbal * 100) AS BIGINT) + 100000)
                  // 100000 AS bal_bucket
         FROM customer),
       g AS (SELECT nat, seg, bal_bucket, COUNT(*) AS c
             FROM q GROUP BY 1, 2, 3)
       SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
              CAST(COUNT(*) AS BIGINT) AS n_groups,
              CAST(MIN(c) AS BIGINT) AS min_group_size,
              CAST(SUM(CASE WHEN c < 8 THEN 1 ELSE 0 END) AS BIGINT)
                AS violating_groups,
              CAST(SUM(CASE WHEN c < 8 THEN c ELSE 0 END) AS BIGINT)
                AS rows_at_risk,
              CAST(CAST(SUM(CASE WHEN c < 8 THEN c ELSE 0 END) AS BIGINT)
                   * 1000000 // CAST(SUM(c) AS BIGINT) AS BIGINT)
                AS risk_ppm,
              MIN(c) >= 8 AS k_holds
       FROM g""",
)
def audit_k_anonymity(spark, sf_dir):
    """k-anonymity audit (audit.k_anonymity_report, k = 8) over the
    quasi-identifier triple (nation, segment, account-balance bucket) —
    the privacy gate a user-derived corpus passes before release. The
    balance bucket is (floor(cents) + 100000) div 100000: the offset
    keeps the dividend positive because Spark's div truncates toward
    zero while DuckDB's // floors — they only agree on non-negative
    integers (the same class of trap as the repo's string-date
    lessons). ~1400 quasi-groups over 1500/15000 customers means
    violating AND conforming groups both carry real mass at each scale
    factor. One algebraic groupBy + one summary agg — rows touched
    once at any scale."""
    from ..operators.audit import k_anonymity_report

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.expr(
            "(CAST(floor(c_acctbal * 100) AS BIGINT) + 100000) div 100000"
        ).alias("bal_bucket"),
    )
    return k_anonymity_report(c, ["nat", "seg", "bal_bucket"], 8)


@query(
    "audit_benford_digits",
    """WITH src AS (
         SELECT 'amount' AS field, CAST(o_totalprice AS VARCHAR) AS v
         FROM orders
         UNION ALL
         SELECT 'amt_mod', CAST(o_orderkey % 1000 AS VARCHAR) FROM orders),
       cells AS (
         SELECT field,
                substr(regexp_replace(v, '[^1-9]', '', 'g'), 1, 1) AS d
         FROM src),
       counts AS (
         SELECT field, CAST(d AS BIGINT) AS digit, COUNT(*) AS n_obs
         FROM cells WHERE d <> '' GROUP BY 1, 2),
       totals AS (
         SELECT field, CAST(COUNT(*) AS BIGINT) AS n_total,
                CAST(SUM(CASE WHEN d <> '' THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_counted
         FROM cells GROUP BY 1),
       exp AS (SELECT * FROM (VALUES
            (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
            (6, 66947), (7, 57992), (8, 51153), (9, 45757))
            AS t(digit, exp_ppm))
       SELECT t.field, t.n_total, t.n_counted,
              CAST(e.digit AS BIGINT) AS digit,
              CAST(COALESCE(c.n_obs, 0) AS BIGINT) AS n_obs,
              CAST(COALESCE(c.n_obs, 0) * 1000000 // t.n_counted AS BIGINT)
                AS obs_ppm,
              CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
              CAST(abs(COALESCE(c.n_obs, 0) * 1000000 // t.n_counted
                       - e.exp_ppm) AS BIGINT) AS abs_delta_ppm
       FROM totals t CROSS JOIN exp e
       LEFT JOIN counts c ON c.field = t.field AND c.digit = e.digit""",
)
def audit_benford_digits(spark, sf_dir):
    """Benford first-significant-digit audit (audit.benford_audit) over
    two order-derived fields — the forensic screen for fabricated or
    unit-capped numeric feeds: `amount` (o_totalprice, a naturally
    multiplicative quantity whose leading digits skew low) and `amt_mod`
    (o_orderkey % 1000 — a deliberately UNIFORM counter whose histogram
    is flat, so the audit's deviation columns carry real mass, and whose
    zero rows at multiples of 1000 exercise the no-significant-digit
    exclusion: n_total > n_counted). First digits are extracted
    lexically (strip every non-1-9 character from the rendered value,
    take the first survivor — rendering-format-proof, see operator
    docstring), the log10 expectation table is OFFLINE ppm literals
    summing to exactly 10^6, everything engine-side is BIGINT. Fixed 18
    output rows (2 fields x 9 digits, absent digits present with
    n_obs = 0). ONE stacked-explode pass over the data + a broadcast
    digit spine — rows touched once at any scale."""
    from ..operators.audit import benford_audit

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("amount"),
        (F.col("o_orderkey") % 1000).alias("amt_mod"),
    )
    return benford_audit(o, ["amount", "amt_mod"])


@query(
    "layout_zone_map_prune",
    """WITH src AS (
         SELECT CASE WHEN o_orderkey % 50 = 0 THEN CAST(-1 AS BIGINT)
                     ELSE CAST(floor(o_totalprice * 100) AS BIGINT)
                          // 5000000 END AS file_id,
                CASE WHEN o_orderkey % 50 = 0 OR o_orderkey % 97 = 0
                     THEN NULL
                     ELSE CAST(floor(o_totalprice * 100) AS BIGINT)
                END AS v
         FROM orders),
       zm AS (
         SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_nulls,
                min(v) AS vmin, max(v) AS vmax
         FROM src GROUP BY file_id)
       SELECT file_id, n_rows, n_nulls, vmin, vmax,
              (vmin IS NOT NULL
               AND NOT (vmax < 12000000 OR vmin > 21000000)) AS kept,
              CASE WHEN vmin IS NOT NULL
                        AND NOT (vmax < 12000000 OR vmin > 21000000)
                   THEN n_rows - n_nulls
                   ELSE CAST(0 AS BIGINT) END AS rows_scan_upper
       FROM zm""",
)
def layout_zone_map_prune(spark, sf_dir):
    """Zone-map pruning audit (layout.zone_map + zone_map_prune): the
    min/max footer test every lakehouse planner runs, value-checked as
    a table. Files are price-clustered (file_id = total-price cents div
    5,000,000 — the post-Z-order/sort layout where zone maps actually
    bite), the predicate is cents BETWEEN 12,000,000 AND 21,000,000, so
    fully-below, straddling-lo, fully-inside, straddling-hi and
    fully-above files ALL carry real mass at both SFs; every 50th order
    routes to a sentinel all-null file (range predicates never match
    NULL -> skipped with its null count visible) and every 97th order
    NULLs its value inside normal files (kept files report partial
    nulls). rows_scan_upper is the whole-file upper bound — boundary
    files carry the bound-vs-truth gap, which is exactly what the
    before/after-re-layout comparison measures. Pure metadata
    arithmetic: ONE algebraic file agg, then file-count-sized rows."""
    from ..operators.layout import zone_map, zone_map_prune

    src = _t(spark, sf_dir, "orders").select(
        F.expr(
            "CASE WHEN o_orderkey % 50 = 0 THEN CAST(-1 AS BIGINT)"
            " ELSE CAST(floor(o_totalprice * 100) AS BIGINT)"
            " div 5000000 END"
        ).alias("fid"),
        F.expr(
            "CASE WHEN o_orderkey % 50 = 0 OR o_orderkey % 97 = 0 THEN NULL"
            " ELSE CAST(floor(o_totalprice * 100) AS BIGINT) END"
        ).alias("v"),
    )
    return zone_map_prune(
        zone_map(src, "fid", "v"), 12_000_000, 21_000_000
    )



@query(
    "layout_snapshot_retention",
    """WITH s AS (SELECT o_orderkey AS id, CAST(o_orderdate AS DATE) AS ts
               FROM orders WHERE o_orderkey % 3 = 0),
       b AS (SELECT id, ts,
                    CAST(date_diff('day', ts, DATE '2001-08-02') AS BIGINT)
                      AS age
             FROM s),
       r AS (SELECT *, row_number() OVER (PARTITION BY ts
                        ORDER BY id DESC) AS dr FROM b),
       hd AS (SELECT max(ts) AS hts FROM b),
       hi AS (SELECT max(id) AS hid FROM b, hd WHERE ts = hd.hts),
       tagged AS (
         SELECT r.id, r.ts, r.age,
                CASE WHEN r.ts = hd.hts AND r.id = hi.hid THEN 'current'
                     WHEN r.age <= 30 THEN 'recent'
                     WHEN r.age <= 365 AND r.dr = 1 THEN 'daily-rep'
                     WHEN r.age <= 365 THEN 'superseded'
                     ELSE 'aged-out' END AS reason
         FROM r CROSS JOIN hd CROSS JOIN hi)
       SELECT id AS snapshot_id, CAST(ts AS VARCHAR) AS ts,
              age AS age_days,
              CASE WHEN reason IN ('current', 'recent', 'daily-rep')
                   THEN 'keep' ELSE 'expire' END AS action,
              reason
       FROM tagged""",
)
def layout_snapshot_retention(spark, sf_dir):
    """Snapshot-retention planning (layout.snapshot_retention_plan) —
    the deterministic planning half of Iceberg/Delta expire_snapshots,
    completing the table-maintenance family: keep everything <= 30 days
    old, thin 30-365 days to each calendar day's LAST snapshot (ties by
    id DESC — a total order), expire the rest, and NEVER expire the
    table's newest snapshot whatever the policy says. as_of is a caller
    literal, never wall-clock — a retention plan must replay. Over the
    every-3rd-order snapshot log (~2 snapshots/day) all five reasons
    carry mass at both scale factors: current, recent (orders within 30
    days of the 2001-07-31 head), daily-rep + superseded in the daily
    band, aged-out beyond. One day-partitioned window + one collected
    head scalar + column arithmetic."""
    from ..operators.layout import snapshot_retention_plan

    snaps = _t(spark, sf_dir, "orders").where("o_orderkey % 3 = 0").select(
        F.col("o_orderkey").alias("id"), F.col("o_orderdate").alias("ts")
    )
    return snapshot_retention_plan(
        snaps, "id", "ts", "2001-08-02",
        keep_all_days=30, keep_daily_days=365,
    ).withColumn("ts", F.col("ts").cast("string"))


@query(
    "audit_watermark_policy",
    """WITH j AS (
         SELECT event_id, event_type, ts,
                event_id + (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)
                     || '|arr'), 1, 12)) AS BIGINT) % 41) - 20 AS arr
         FROM events),
       w AS (
         SELECT event_type, epoch_us(ts) AS tus,
                max(epoch_us(ts)) OVER (ORDER BY arr, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
         FROM j),
       fan AS (
         SELECT event_type, tus, prev,
                unnest([0, 300, 900, 1800]) AS delay_s
         FROM w)
       SELECT event_type, CAST(delay_s AS BIGINT) AS delay_s,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(count(*) FILTER (prev IS NOT NULL
                   AND tus < prev - delay_s * 1000000) AS BIGINT) AS n_late,
              CAST(count(*) FILTER (prev IS NOT NULL
                   AND tus < prev - delay_s * 1000000) * 1000000
                   // count(*) AS BIGINT) AS late_ppm
       FROM fan GROUP BY 1, 2""",
)
def audit_watermark_policy(spark, sf_dir):
    """Watermark policy tuning (audit.watermark_audit): the event stream
    with deterministic md5-jittered arrival order (±20 positions — the
    driver events are perfectly ordered, so disorder is synthesized the
    sampling-family way) replayed under candidate allowed-lateness
    values 0/300/900/1800s, reporting per event_type how many events
    each watermark WOULD drop. Delay cells span full mass to zero at
    sf0.1 (late counts 78964/50455/4261/0) and stay heavy at sf0.01 —
    the "tight watermark loses data, loose watermark bloats state"
    trade-off made measurable. The global running max is assembled from
    range partitions + a bounded per-partition-maxima collect (never a
    partitionless window); the oracle IS that partitionless window —
    the naive form the operator refuses to run."""
    from ..operators.audit import watermark_audit

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts",
        (
            F.col("event_id")
            + F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("event_id").cast("string"), F.lit("|arr"))),
                        1, 12,
                    ), 16, 10,
                ).cast("long"),
                F.lit(41),
            )
            - 20
        ).alias("arr"),
    )
    return watermark_audit(
        ev, "ts", ["arr", "event_id"], "event_type", [0, 300, 900, 1800]
    )
