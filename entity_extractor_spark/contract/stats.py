"""Exact integer statistics + sketches + funnels: OLS, winsorize, percentiles, histogram/knee/Pareto, change point, MI, KMV/CMS/HLL, retention.

Split out of the former monolithic contract.py (round-4, VERDICT ask #6);
query registration happens via the shared @query decorator into the
aggregating contract.Q / contract.SQL dicts in _shared.py.
"""
from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import Window  # noqa: F401

from ._shared import *  # noqa: F401,F403



@query(
    "sketch_cms_frequency",
    """WITH rows AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
       grid AS (SELECT unnest(generate_series(0, 3)) AS r),
       cells AS (SELECT r,
                        CAST(concat('0x', substring(md5(concat(k, '|',
                          CAST(r AS VARCHAR), '|', 'cms')), 1, 12)) AS BIGINT)
                        % 256 AS bucket,
                        count(*) AS cnt
                 FROM rows CROSS JOIN grid GROUP BY 1, 2),
       q AS (SELECT CAST(p_partkey AS VARCHAR) AS key FROM part
             WHERE p_partkey % 100 = 0),
       qr AS (SELECT key, r,
                     CAST(concat('0x', substring(md5(concat(key, '|',
                       CAST(r AS VARCHAR), '|', 'cms')), 1, 12)) AS BIGINT)
                     % 256 AS bucket
              FROM q CROSS JOIN grid)
       SELECT key, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est
       FROM qr LEFT JOIN cells USING (r, bucket) GROUP BY key""",
)
def sketch_cms_frequency(spark, sf_dir):
    """Count-Min frequency sketch (sketch.cms_table + cms_estimate): point
    frequency estimates for the round-number parts from a 4x256-cell
    sketch of the lineitem part column — the MERGEABLE frequency
    companion of text_kmv_distinct (KMV: "how many distinct"; CMS: "how
    often is THIS key"), deterministic on the md5 grid so both engines
    replay every cell and every min exactly. Build: map-side explode to
    depth rows + ONE agg to <= depth*width cells; estimate: map-side
    explode of the query keys + a broadcast join against the tiny sketch.
    Never-underestimates and mergeability are unit-gated
    (tests/test_skew_sketch_funnel.py)."""
    from ..operators.sketch import cms_estimate, cms_table

    cms = cms_table(_t(spark, sf_dir, "lineitem"), "l_partkey", depth=4, width=256)
    keys = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_partkey") % 100 == 0)
        .select(F.col("p_partkey").cast("string").alias("key"))
    )
    return cms_estimate(cms, keys, depth=4, width=256)


@query(
    "funnel_events",
    """WITH t1 AS (SELECT user_id AS key, min(ts) AS ts_1 FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
       t2 AS (SELECT e.user_id AS key, min(e.ts) AS ts_2 FROM events e
              JOIN t1 ON t1.key = e.user_id
              WHERE e.event_type = 'click' AND e.ts > t1.ts_1
              GROUP BY e.user_id),
       t3 AS (SELECT e.user_id AS key, min(e.ts) AS ts_3 FROM events e
              JOIN t2 ON t2.key = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts > t2.ts_2
              GROUP BY e.user_id)
       SELECT t1.key, ts_1, ts_2, ts_3,
              CAST(CASE WHEN ts_3 IS NOT NULL THEN 3
                        WHEN ts_2 IS NOT NULL THEN 2
                        ELSE 1 END AS BIGINT) AS stages_completed
       FROM t1 LEFT JOIN t2 USING (key) LEFT JOIN t3 USING (key)""",
)
def funnel_events(spark, sf_dir):
    """Ordered-funnel analysis (operators/funnel.py): per user, the
    earliest view -> first later click -> first later purchase, with
    NULLs where the funnel stalls — greedy earliest matching, strict
    time order (simultaneous events are not progress; unit-gated). k-1
    keyed 1:1 joins over pre-aggregated one-row-per-key frames sharing
    one hash partitioning — never a window or array walk over the raw
    event stream (the reference walks per-document events in Python,
    processors/queue.py)."""
    from ..operators.funnel import funnel

    return funnel(
        _t(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        ["view", "click", "purchase"],
    )


@query(
    "funnel_retention_cohorts",
    """WITH f AS (
         SELECT user_id, min(ts) AS first_ts FROM events
         WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY user_id),
       j AS (
         SELECT e.user_id,
                strftime(date_trunc('week', f.first_ts), '%Y-%m-%d')
                  AS cohort_week,
                CAST((CAST(date_trunc('week', e.ts) AS DATE)
                      - CAST(date_trunc('week', f.first_ts) AS DATE)) // 7
                     AS BIGINT) AS week_offset
         FROM events e JOIN f USING (user_id) WHERE e.ts IS NOT NULL)
       SELECT cohort_week, week_offset,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM j GROUP BY 1, 2""",
)
def funnel_retention_cohorts(spark, sf_dir):
    """Weekly cohort retention triangle (funnel.retention_cohorts): users
    bucketed by the Monday-aligned week of their FIRST event, counted
    distinct in every later week they reappear. Week arithmetic is pure
    integers on Monday-truncated dates (datediff of two Mondays is an
    exact multiple of 7), so both engines agree bit-for-bit with no
    epoch-origin or timezone ceremony. One groupBy(key) MIN + one
    equi-join back on the same key + one distinct-collapsing agg."""
    from ..operators.funnel import retention_cohorts

    return retention_cohorts(
        _t(spark, sf_dir, "events"), "user_id", "ts"
    ).select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_users",
    )


@query(
    "funnel_event_transitions",
    """WITH s AS (
         SELECT event_type,
                lead(event_type) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS to_stage
         FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
       SELECT event_type AS from_stage, to_stage,
              CAST(count(*) AS BIGINT) AS n_transitions
       FROM s WHERE to_stage IS NOT NULL GROUP BY 1, 2""",
)
def funnel_event_transitions(spark, sf_dir):
    """First-order Markov transition counts (funnel.event_transitions):
    what event follows what, per user, over the full log — the empirical
    stage graph. event_id breaks timestamp ties so the per-user sequence
    (and every count) is the same total order on any engine. One lead()
    window per user + one algebraic count that partial-aggregates into at
    most |stages|^2 groups map-side."""
    from ..operators.funnel import event_transitions

    return event_transitions(
        _t(spark, sf_dir, "events"), "user_id", "ts", "event_id", "event_type"
    )


@query(
    "stats_group_ols",
    """WITH v AS (
         SELECT o_orderpriority AS grp,
                CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01'
                     AS HUGEINT) AS x,
                CAST(floor(o_totalprice * 100) AS HUGEINT) AS y
         FROM orders),
       a AS (
         SELECT grp, CAST(count(*) AS HUGEINT) AS n,
                sum(x) AS sx, sum(y) AS sy,
                sum(x * y) AS sxy, sum(x * x) AS sxx
         FROM v GROUP BY grp),
       d AS (
         SELECT grp, n, sx, sy,
                n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
         FROM a),
       s AS (
         SELECT grp, n, sx, sy, num, den,
                CASE WHEN den = 0 THEN NULL
                     ELSE CASE WHEN num < 0 THEN -1 WHEN num > 0 THEN 1
                          ELSE 0 END
                          * (abs(num) * 1000000 // abs(den)) END AS slope
         FROM d)
       SELECT grp, CAST(n AS BIGINT) AS n,
              CAST(num AS VARCHAR) AS slope_num,
              CAST(den AS VARCHAR) AS slope_den,
              CAST(slope AS BIGINT) AS slope_ppm,
              CAST(CASE WHEN slope IS NULL THEN NULL
                   ELSE CASE WHEN sy * 1000000 - slope * sx < 0 THEN -1
                        WHEN sy * 1000000 - slope * sx > 0 THEN 1 ELSE 0 END
                        * (abs(sy * 1000000 - slope * sx) // n) END
                   AS BIGINT) AS intercept_ppm
       FROM s""",
)
def stats_group_ols(spark, sf_dir):
    """Per-group OLS drift line (stats.group_ols): order value in cents
    regressed on the day index, per priority — "is this segment's spend
    trending". ONE algebraic aggregation (five sums, map-side partials);
    the slope ships as an exact rational (num, den) pair rendered as
    strings (past BIGINT at sf0.1; DuckDB HUGEINT reaches pandas as
    float) plus ppm fixed-point renderings whose signed divisions are
    spelled sign * (|num| div |den|) on BOTH engines — Spark div
    truncates, DuckDB // floors, and they only agree through that
    explicit form."""
    from ..operators.stats import group_ols

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("x"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("y"),
    )
    out = group_ols(o, "grp", "x", "y")
    return out.select(
        "grp",
        "n",
        F.col("slope_num").cast("string").alias("slope_num"),
        F.col("slope_den").cast("string").alias("slope_den"),
        "slope_ppm",
        "intercept_ppm",
    )


@query(
    "stats_histogram",
    """SELECT CAST(CASE WHEN n_chars < 100 THEN -1
                   WHEN n_chars >= 500 THEN 16
                   ELSE (n_chars - 100) * 16 // 400 END AS BIGINT) AS bucket,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(min(n_chars) AS BIGINT) AS v_min,
              CAST(max(n_chars) AS BIGINT) AS v_max
       FROM documents WHERE n_chars IS NOT NULL GROUP BY 1""",
)
def stats_histogram(spark, sf_dir):
    """Equi-width histogram (stats.histogram): document lengths over
    [100, 500) in 16 bins with out-of-range mass REPORTED in buckets -1
    and 16 (both non-empty on the synthetic corpus — the under/overflow
    branches are value-checked, not just the happy path). Pure-integer
    bucket rule, one algebraic groupBy, at most nbins+2 groups leave
    the map side."""
    from ..operators.stats import histogram

    return histogram(_t(spark, sf_dir, "documents"), "n_chars", 100, 500, 16)


@query(
    "stats_percentile_rank",
    """WITH c AS (
         SELECT lang, n_chars, CAST(count(*) AS BIGINT) AS n_rows
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
         GROUP BY lang, n_chars),
       w AS (
         SELECT lang, n_chars, n_rows,
                sum(n_rows) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
                sum(n_rows) OVER (PARTITION BY lang) AS n
         FROM c)
       SELECT lang, n_chars, n_rows,
              CAST(cum * 1000000 // n AS BIGINT) AS pct_ppm
       FROM w""",
)
def stats_percentile_rank(spark, sf_dir):
    """Exact cume_dist in ppm (stats.percentile_rank): for every distinct
    (language, length) pair, the fraction of that language's documents at
    or below the length — the threshold-to-kept-mass lookup, inverse of
    text_length_percentiles. Row mass collapses to distinct pairs through
    one algebraic count before the window sorts anything."""
    from ..operators.stats import percentile_rank

    return percentile_rank(_t(spark, sf_dir, "documents"), "lang", "n_chars")


@query(
    "sketch_sample_quantiles",
    """WITH v AS (
         SELECT lang, doc_id, n_chars,
                CAST(concat('0x', substring(md5(concat(lang, '|',
                     CAST(doc_id AS VARCHAR), '|qsk')), 1, 12)) AS BIGINT)
                  AS h
         FROM documents
         WHERE lang IS NOT NULL AND doc_id IS NOT NULL
           AND n_chars IS NOT NULL),
       tot AS (SELECT lang, count(*) AS n_rows FROM v GROUP BY lang),
       s AS (SELECT lang, n_chars FROM (
               SELECT lang, n_chars,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY h, doc_id) AS rn
               FROM v) WHERE rn <= 64),
       c AS (SELECT lang, n_chars, count(*) AS cnt FROM s GROUP BY 1, 2),
       w AS (SELECT lang, n_chars, cnt,
                    sum(cnt) OVER (PARTITION BY lang
                                   ORDER BY n_chars) AS cum,
                    sum(cnt) OVER (PARTITION BY lang) AS n
             FROM c),
       p AS (SELECT lang, n_chars, cnt, cum, n,
                    unnest([50, 90, 99]) AS pct
             FROM w)
       SELECT p.lang, CAST(pct AS BIGINT) AS pct, n_chars AS value_est,
              CAST(n AS BIGINT) AS n_sampled, CAST(n_rows AS BIGINT) AS n_rows
       FROM p JOIN tot USING (lang)
       WHERE cum >= (pct * n + 99) // 100
         AND cum - cnt < (pct * n + 99) // 100""",
)
def sketch_sample_quantiles(spark, sf_dir):
    """Mergeable quantile sketch (sketch.sample_quantiles): per-language
    p50/p90/p99 of document length from the k=64 rows with the smallest
    uniform md5 hash of (lang, doc_id) — a fixed property of the data,
    so the sample (unlike approx_percentile/GK sketches, whose state is
    order-dependent) is partition/retry/engine-invariant and the oracle
    replays it bit-for-bit. Every language has > 64 docs at both scale
    factors, so the ESTIMATOR path is what's value-checked (the
    degrades-to-exact small-group path is unit-gated). WindowGroupLimit
    pre-prunes rank<=k map-side; the percentile arithmetic is
    group_percentiles' exact type-1 integer rule over the sample."""
    from ..operators.sketch import sample_quantiles

    return sample_quantiles(
        _t(spark, sf_dir, "documents"), "lang", "doc_id", "n_chars",
        (50, 90, 99), k=64,
    )


@query(
    "sketch_join_size",
    f"""WITH sa AS (SELECT l_partkey AS k FROM lineitem
                   WHERE l_partkey IS NOT NULL AND {_JSE_HASH} < {_JSE_THRESH}),
       fa AS (SELECT k, CAST(count(*) AS BIGINT) AS f FROM sa GROUP BY k)
       SELECT CAST(count(*) AS BIGINT) AS n_sampled_keys,
              CAST(COALESCE(sum(f * f), 0) AS BIGINT) AS sampled_pairs,
              CAST(CAST(COALESCE(sum(f * f), 0) AS DECIMAL(38,0)) * 1000000
                   // 200000 AS BIGINT) AS est_join_rows
       FROM fa""",
)
def sketch_join_size(spark, sf_dir):
    """Join-cardinality forecast (sketch.join_size_estimate): predict the
    size of the lineitem self-join on l_partkey — the co-order explosion
    every graph gate here pays — from a 20% hash-correlated key sample,
    BEFORE paying the shuffle (Vengerov-style correlated sampling: a key
    is sampled on both sides or neither, so hot keys contribute their
    full fA*fB when sampled; the all-or-nothing hot-key variance and the
    exact mode that avoids it are documented and unit-gated). Pushed-down
    scan filter + one p-fraction (key, count) join; pure function of
    (data, sample_ppm) on the md5 grid, DECIMAL(38,0) scale-up."""
    from ..operators.sketch import join_size_estimate

    li = _t(spark, sf_dir, "lineitem")
    return join_size_estimate(li, "l_partkey", li, "l_partkey", sample_ppm=200_000)


@query(
    "stats_winsorize",
    """WITH r AS (
         SELECT event_type AS grp, event_id AS id,
                CAST(floor(value * 100) AS BIGINT) AS value
         FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
       n AS (SELECT grp, count(*) AS n FROM r GROUP BY grp),
       ranked AS (
         SELECT grp, value,
                row_number() OVER (PARTITION BY grp ORDER BY value) AS rk
         FROM r),
       lo AS (
         SELECT ranked.grp, value AS lo FROM ranked JOIN n USING (grp)
         WHERE rk = greatest((5 * n + 99) // 100, 1)),
       hi AS (
         SELECT ranked.grp, value AS hi FROM ranked JOIN n USING (grp)
         WHERE rk = greatest((95 * n + 99) // 100, 1))
       SELECT r.grp AS event_type, r.id AS event_id, r.value, lo, hi,
              least(greatest(r.value, lo), hi) AS clamped,
              least(greatest(r.value, lo), hi) <> r.value AS was_clamped
       FROM r JOIN lo USING (grp) JOIN hi USING (grp)""",
)
def stats_winsorize(spark, sf_dir):
    """Percentile-fence clamping (stats.winsorize): event values (exact
    cents) winsorized to their event-type's [p5, p95] — ~10% of rows
    clamp, so both fences and the untouched middle all carry mass.
    Fences are exact type-1 ranks over the DISTINCT-value-collapsed
    table and broadcast back; raw rows scan once and never shuffle.
    The oracle is the naive row_number formulation (fine at oracle
    scale, the exact shape the operator avoids shipping at 100 TB)."""
    from ..operators.stats import winsorize

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    return winsorize(ev, "event_type", "event_id", "cents", 5, 95)


@query(
    "stats_knee_point",
    """WITH counts AS (
         SELECT event_type AS g, CAST(floor(value * 100) AS BIGINT) AS x,
                count(*) AS nr
         FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
         GROUP BY 1, 2),
       cdf AS (
         SELECT g, x,
                CAST(sum(nr) OVER (PARTITION BY g ORDER BY x) * 1000000
                     // sum(nr) OVER (PARTITION BY g) AS BIGINT) AS y
         FROM counts),
       ends AS (
         SELECT g, min(x) AS x1, arg_min(y, x) AS y1,
                max(x) AS x2, arg_max(y, x) AS y2
         FROM cdf GROUP BY g),
       cr AS (
         SELECT c.g, c.x, c.y, e.x1, e.x2,
                abs(CAST(e.x2 - e.x1 AS HUGEINT) * (c.y - e.y1)
                    - CAST(e.y2 - e.y1 AS HUGEINT) * (c.x - e.x1)) AS cro
         FROM cdf c JOIN ends e USING (g)),
       best AS (
         SELECT g, x, y, cro, x1, x2,
                row_number() OVER (PARTITION BY g
                                   ORDER BY cro DESC, x ASC) AS rk
         FROM cr)
       SELECT g AS event_type, x AS knee_x, y AS knee_y,
              CAST(cro AS BIGINT) AS cross_abs, x1 AS x_lo, x2 AS x_hi
       FROM best WHERE rk = 1""",
)
def stats_knee_point(spark, sf_dir):
    """Automatic operating-point detection (stats.knee_point, the Kneedle
    criterion in exact integer geometry): the knee of each event-type's
    value CDF — the point farthest from the endpoint chord by
    |cross product|, no sqrt, no floats, ties broken (|cross| DESC,
    x ASC). This is the picker for every calibration curve the engine
    emits (threshold sweeps, LSH S-curves, coverage curves); gated over
    percentile_rank's exact CDF so the composed pipeline curve -> knee
    is what's value-checked. The oracle formulates the argmax as a
    row_number window; the operator is an algebraic struct-max."""
    from ..operators.stats import knee_point, percentile_rank

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    cdf = percentile_rank(ev, "event_type", "cents")
    out = knee_point(cdf, "event_type", "cents", "pct_ppm")
    return out.select(
        "event_type",
        "knee_x",
        "knee_y",
        F.col("cross_abs").cast("long").alias("cross_abs"),
        "x_lo",
        "x_hi",
    )


@query(
    "sketch_hll_distinct",
    f"""WITH h AS (
         SELECT o_orderpriority AS grp,
                md5(concat(CAST(o_custkey AS VARCHAR), '|', 'hll')) AS hx
         FROM orders WHERE o_custkey IS NOT NULL),
       r AS (
         SELECT grp,
                CAST(concat('0x', substring(hx, 1, 2)) AS BIGINT) AS bucket,
                max(CASE WHEN CAST(concat('0x', substring(hx, 3, 12))
                              AS BIGINT) = 0 THEN 49
                         ELSE 49 - length(bin(CAST(concat('0x',
                              substring(hx, 3, 12)) AS BIGINT))) END)
                  AS register
         FROM h GROUP BY 1, 2),
       e AS (
         SELECT grp, COUNT(*) AS nb,
                SUM(CAST(1 AS BIGINT) << CAST(49 - register AS INT))
                  AS s_nonzero
         FROM r GROUP BY 1),
       x AS (
         SELECT o_orderpriority AS grp,
                COUNT(DISTINCT o_custkey) AS exact_distinct
         FROM orders GROUP BY 1),
       est AS (
         SELECT grp, CAST(nb AS BIGINT) AS n_buckets,
                CAST({_HLL_M8} - nb AS BIGINT) AS zero_buckets,
                CAST(CAST({_HLL_NUM} AS HUGEINT)
                     // (CAST({_HLL_DEN_ALPHA} AS HUGEINT)
                         * (CAST(s_nonzero AS HUGEINT)
                            + ({_HLL_M8} - nb)
                              * CAST({1 << 49} AS HUGEINT)))
                     AS BIGINT) AS est_distinct
         FROM e)
       SELECT est.grp, n_buckets, zero_buckets, est_distinct,
              exact_distinct,
              CAST(abs(est_distinct - exact_distinct) * 1000000
                   // exact_distinct AS BIGINT) AS err_ppm
       FROM est JOIN x ON est.grp = x.grp""",
)
def sketch_hll_distinct(spark, sf_dir):
    """HLL distinct sketch (sketch.hll_registers/hll_estimate, b = 8 so
    m = 256 and per-priority custkey counts sit in the sketch's healthy
    n > 2.5m regime at BOTH scale factors): per order priority, the
    register-table estimate of distinct customers NEXT TO the exact
    count and the realized err_ppm — the error is measured and shipped
    in the row, not asserted away (std err ~1.04/sqrt(256) = 6.5%;
    Python-replay over 20 independent key sets: mean bias -0.4%,
    stdev 4.6%. The five priorities share one custkey universe, hence
    ONE correlated hash draw — their errors move together by design).
    The oracle replays bucket extraction, bin()-based rho, register
    max, and the exact-rational alpha quotient in HUGEINT. Scale
    shape: build is ONE algebraic groupBy max (registers merge across
    shards/days by max — unit-proven), estimate is one m-bounded agg;
    the exact side here is the yardstick, not part of the operator."""
    from ..operators.sketch import hll_estimate, hll_registers

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"), "o_custkey"
    )
    regs = hll_registers(o, ["grp"], "o_custkey", 8)
    est = hll_estimate(regs, ["grp"], 8)
    exact = o.groupBy("grp").agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    return (
        est.join(F.broadcast(exact), "grp")
        .withColumn(
            "err_ppm",
            F.expr(
                "CAST(abs(est_distinct - exact_distinct) * 1000000"
                " div exact_distinct AS BIGINT)"
            ),
        )
        .select(
            "grp", "n_buckets", "zero_buckets", "est_distinct",
            "exact_distinct", "err_ppm",
        )
    )


@query(
    "sketch_hll_sliding",
    f"""WITH base AS (
         SELECT (year(o_orderdate) - 1992) * 12 + month(o_orderdate)
                  AS idx,
                o_custkey AS ck
         FROM orders WHERE o_custkey IS NOT NULL),
       h AS (
         SELECT idx,
                md5(concat(CAST(ck AS VARCHAR), '|', 'hll')) AS hx
         FROM base),
       r AS (
         SELECT idx,
                CAST(concat('0x', substring(hx, 1, 2)) AS BIGINT) AS bucket,
                max(CASE WHEN CAST(concat('0x', substring(hx, 3, 12))
                              AS BIGINT) = 0 THEN 49
                         ELSE 49 - length(bin(CAST(concat('0x',
                              substring(hx, 3, 12)) AS BIGINT))) END)
                  AS register
         FROM h GROUP BY 1, 2),
       ends AS (SELECT DISTINCT idx AS win_end FROM base),
       m AS (
         SELECT t.win_end, r.bucket, max(r.register) AS register
         FROM r, unnest(generate_series(r.idx, r.idx + 2)) AS t(win_end)
         WHERE t.win_end IN (SELECT win_end FROM ends)
         GROUP BY 1, 2),
       e AS (
         SELECT win_end, COUNT(*) AS nb,
                SUM(CAST(1 AS BIGINT) << CAST(49 - register AS INT))
                  AS s_nonzero
         FROM m GROUP BY 1),
       x AS (
         SELECT w.win_end, COUNT(DISTINCT d.ck) AS exact_distinct
         FROM ends w
         JOIN (SELECT DISTINCT idx, ck FROM base) d
           ON d.idx BETWEEN w.win_end - 2 AND w.win_end
         GROUP BY 1),
       est AS (
         SELECT win_end, CAST(nb AS BIGINT) AS n_buckets,
                CAST({_HLL_M8} - nb AS BIGINT) AS zero_buckets,
                CAST(CAST({_HLL_NUM} AS HUGEINT)
                     // (CAST({_HLL_DEN_ALPHA} AS HUGEINT)
                         * (CAST(s_nonzero AS HUGEINT)
                            + ({_HLL_M8} - nb)
                              * CAST({1 << 49} AS HUGEINT)))
                     AS BIGINT) AS est_distinct
         FROM e)
       SELECT CAST(est.win_end AS BIGINT) AS win_end, n_buckets,
              zero_buckets, est_distinct, exact_distinct,
              CAST(abs(est_distinct - exact_distinct) * 1000000
                   // exact_distinct AS BIGINT) AS err_ppm
       FROM est JOIN x ON est.win_end = x.win_end""",
)
def sketch_hll_sliding(spark, sf_dir):
    """Sliding-window distinct customers via HLL register max-merge
    (sketch.hll_registers + hll_sliding + hll_estimate, b = 8, trailing
    3 months over order months) — the flagship reason registers beat
    counts as persisted state: sliding distincts cannot be SUMMED from
    per-month counts (customers overlap across months), but register
    tables MERGE, so 'distinct buyers over the trailing quarter,
    monthly' is a k-bounded metadata merge instead of re-scanning the
    raw orders per window. ~84 month-end windows at both SFs, the first
    two partial (head windows merge what exists — that branch carries
    mass), exact count and realized err_ppm shipped next to every
    estimate. The oracle replays bucket/rho/register max, the
    generate_series window explode, and the exact-rational alpha
    quotient in HUGEINT. Scale shape: raw data touched ONCE (monthly
    register build, one algebraic max agg); the sliding stage is pure
    register arithmetic — k-bounded explode over m-bounded tables, one
    (win_end, bucket) max; the exact side is the yardstick, not part
    of the operator."""
    from ..operators.sketch import hll_estimate, hll_registers, hll_sliding

    o = _t(spark, sf_dir, "orders").select(
        F.expr(
            "(year(o_orderdate) - 1992) * 12 + month(o_orderdate)"
        ).alias("idx"),
        "o_custkey",
    )
    regs = hll_registers(o, ["idx"], "o_custkey", 8)
    est = hll_estimate(hll_sliding(regs, "idx", 3), ["win_end"], 8)
    exact = (
        o.where(F.col("o_custkey").isNotNull())
        .select("idx", F.col("o_custkey").alias("ck"))
        .distinct()
        .select(
            F.explode(
                F.sequence(F.col("idx"), F.col("idx") + 2)
            ).alias("win_end"),
            "ck",
        )
        .join(
            F.broadcast(o.select(F.col("idx").alias("win_end")).distinct()),
            "win_end",
        )
        .groupBy("win_end")
        .agg(F.countDistinct("ck").cast("long").alias("exact_distinct"))
    )
    return est.join(exact, "win_end").select(
        F.col("win_end").cast("long").alias("win_end"),
        "n_buckets",
        "zero_buckets",
        "est_distinct",
        "exact_distinct",
        F.expr(
            "CAST(abs(est_distinct - exact_distinct) * 1000000"
            " div exact_distinct AS BIGINT)"
        ).alias("err_ppm"),
    )


@query(
    "stats_equal_freq_bins",
    """WITH counts AS (
         SELECT l_returnflag AS grp, l_quantity AS val,
                CAST(count(*) AS BIGINT) AS n_rows
         FROM lineitem
         WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
         GROUP BY 1, 2),
       cum AS (
         SELECT grp, val, n_rows,
                CAST(COALESCE(sum(n_rows) OVER (PARTITION BY grp
                  ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) AS below,
                CAST(sum(n_rows) OVER (PARTITION BY grp) AS BIGINT) AS n
         FROM counts)
       SELECT grp, val, n_rows,
              CAST(least(9, below * 10 // n) AS BIGINT) AS bin
       FROM cum""",
)
def stats_equal_freq_bins(spark, sf_dir):
    """Equal-frequency decile binning (stats.equal_freq_bins): lineitem
    quantities per return flag into 10 quantile bins from the EXACT
    strictly-below rank — ties land every occurrence of a value in one
    deterministic bin (the ~50 distinct integer quantities per flag make
    tie handling the whole game; percentile_approx cuts would be
    engine-unstable), the first bin starts at 0, and the emitted per-bin
    row counts make tie-imbalance measurable. One DISTINCT
    (group, value) collapse then windows over the collapsed ~50-row
    table — the percentile_rank scale shape."""
    from ..operators.stats import equal_freq_bins

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"), F.col("l_quantity").alias("val")
    )
    return equal_freq_bins(li, "grp", "val", 10)


@query(
    "stats_pareto_frontier",
    """WITH pts AS (
         SELECT DISTINCT p_brand, p_size,
                CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents
         FROM part
         WHERE p_brand IS NOT NULL AND p_size IS NOT NULL
           AND p_retailprice IS NOT NULL),
       sl AS (SELECT p_brand, p_size, min(price_cents) AS price_cents
              FROM pts GROUP BY 1, 2),
       w AS (SELECT p_brand, p_size, price_cents,
                    min(price_cents) OVER (PARTITION BY p_brand
                      ORDER BY p_size ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS pm
             FROM sl)
       SELECT p_brand, p_size, price_cents
       FROM w WHERE pm IS NULL OR price_cents < pm""",
)
def stats_pareto_frontier(spark, sf_dir):
    """2-D Pareto frontier (stats.pareto_frontier_2d): per brand, the
    parts not dominated on (size, price) — smaller AND cheaper beats
    both — the multi-criteria trade-off primitive whose output knee_point
    picks among. Dominance in 2-D linearizes: DISTINCT point collapse,
    per-x-slice min (sizes are heavily tied integers, so the slice
    branch carries real mass), then one running-min window ordered by x
    over the collapsed cloud — zero joins, never the quadratic
    "exists a dominator" self-join the naive form runs."""
    from ..operators.stats import pareto_frontier_2d

    p = _t(spark, sf_dir, "part").select(
        "p_brand", "p_size",
        F.expr("CAST(floor(p_retailprice * 100) AS BIGINT)").alias("price_cents"),
    )
    return pareto_frontier_2d(p, "p_brand", "p_size", "price_cents")


@query(
    "stats_change_point",
    """WITH base AS (
         SELECT event_type AS k, ts, event_id AS tb,
                CAST(floor(value * 100) AS BIGINT) AS v
         FROM events
         WHERE event_type IS NOT NULL AND ts IS NOT NULL
           AND value IS NOT NULL),
       cum AS (
         SELECT k, ts, v,
                CAST(row_number() OVER w AS BIGINT) AS i,
                CAST(sum(v) OVER (PARTITION BY k ORDER BY ts, tb
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS c,
                CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
                CAST(sum(v) OVER (PARTITION BY k) AS BIGINT) AS tot
         FROM base
         WINDOW w AS (PARTITION BY k ORDER BY ts, tb)),
       scored AS (
         SELECT *, abs(CAST(n AS HUGEINT) * c - CAST(i AS HUGEINT) * tot)
                     AS d
         FROM cum WHERE i < n AND n >= 2),
       ranked AS (
         SELECT *, row_number() OVER (PARTITION BY k
                     ORDER BY d DESC, i) AS rn
         FROM scored)
       SELECT k, n, i AS cp_index, CAST(ts AS VARCHAR) AS cp_ts,
              CAST(d // n AS BIGINT) AS mag,
              CAST(c // i AS BIGINT) AS mean_before,
              CAST((tot - c) // (n - i) AS BIGINT) AS mean_after
       FROM ranked WHERE rn = 1""",
)
def stats_change_point(spark, sf_dir):
    """CUSUM change-point location (stats.change_point — Page's
    at-most-one-change estimator): per event_type, the split where the
    cumulative value deviates furthest from the no-change diagonal,
    with before/after means — "did this metric's level SHIFT, and
    when", where mad_outliers flags single rows. The statistic
    multiplies through by n so the argmax is exact DECIMAL(38,0)/
    HUGEINT integer arithmetic (no float mean — the located index is
    partition-invariant); ties break earliest. ONE key exchange feeds
    row_number + running sum + totals, argmax is an algebraic
    min(struct); the oracle replays it with a row_number."""
    from ..operators.stats import change_point

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("k"), "ts",
        F.col("event_id").alias("tb"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v"),
    )
    out = change_point(ev, "k", "ts", "tb", "v")
    return out.withColumn(
        "cp_ts", F.col("cp_ts").cast("string")
    )


@query(
    "stats_mutual_information",
    f"""WITH cells AS (
         SELECT l_returnflag AS x, l_linestatus AS y,
                CAST(count(*) AS BIGINT) AS c
         FROM lineitem GROUP BY 1, 2),
       xm AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM cells GROUP BY 1),
       ym AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM cells GROUP BY 1),
       nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
       qv AS (SELECT c,
                GREATEST(CAST(CAST(c AS HUGEINT) * nn.n * 1048576
                     // (CAST(cx AS HUGEINT) * cy) AS BIGINT), 1) AS _q
              FROM cells JOIN xm USING (x) JOIN ym USING (y) CROSS JOIN nn),
       pch AS (SELECT c, {_MI_P_COLS} FROM qv),
       mi AS (SELECT CAST(GREATEST(sum(CAST(c AS HUGEINT)
                       * (_p_a6 - 1280)), 0)
                     // (SELECT n FROM nn) AS BIGINT) AS mi_fp,
                     CAST(count(*) AS BIGINT) AS n_cells
              FROM pch),
       hxq AS (SELECT cx AS c,
                      CAST((SELECT n FROM nn) * 1048576 // cx AS BIGINT)
                        AS _q
               FROM xm),
       hxc AS (SELECT c, {_MI_HX_COLS} FROM hxq),
       hx AS (SELECT CAST(sum(CAST(c AS HUGEINT) * (_hx_a6 - 1280))
                     // (SELECT n FROM nn) AS BIGINT) AS h FROM hxc),
       hyq AS (SELECT cy AS c,
                      CAST((SELECT n FROM nn) * 1048576 // cy AS BIGINT)
                        AS _q
               FROM ym),
       hyc AS (SELECT c, {_MI_HY_COLS} FROM hyq),
       hy AS (SELECT CAST(sum(CAST(c AS HUGEINT) * (_hy_a6 - 1280))
                     // (SELECT n FROM nn) AS BIGINT) AS h FROM hyc)
       SELECT nn.n, mi.n_cells, mi.mi_fp,
              hx.h AS h_x_fp, hy.h AS h_y_fp,
              CASE WHEN least(hx.h, hy.h) > 0
                   THEN CAST(mi.mi_fp * 1000000 // least(hx.h, hy.h)
                        AS BIGINT) END AS nmi_ppm
       FROM nn, mi, hx, hy""",
)
def stats_mutual_information(spark, sf_dir):
    """Mutual information + normalized MI (stats.mutual_information)
    between lineitem's return flag and line status — genuinely
    associated columns (returns only happen on filled lines), so MI
    carries real mass and NMI lands strictly inside (0, 1e6). All logs
    ride the SAME generated log2fp chain as BM25/PMI, weighted sums in
    DECIMAL(38,0)/HUGEINT, MI clamped at 0 before the division (the
    engines disagree on negative integer division — the clamp is also
    what keeps quantization dips deterministic). One cell count + two
    marginal re-aggs + three one-row aggregations; raw table scans
    once."""
    from ..operators.stats import mutual_information

    li = _t(spark, sf_dir, "lineitem")
    return mutual_information(li, "l_returnflag", "l_linestatus", k=6)


@query(
    "stats_ks_two_sample",
    """WITH base AS (
         SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
         FROM lineitem WHERE l_returnflag IN ('R', 'A')),
       counts AS (SELECT g, v, count(*) AS n FROM base GROUP BY g, v),
       tot AS (SELECT
                 CAST(sum(CASE WHEN g = 'R' THEN n ELSE 0 END) AS BIGINT) AS na,
                 CAST(sum(CASE WHEN g = 'A' THEN n ELSE 0 END) AS BIGINT) AS nb
               FROM counts),
       grid AS (SELECT v, g FROM (SELECT DISTINCT v FROM counts)
                CROSS JOIN (SELECT unnest(['R', 'A']) AS g)),
       filled AS (SELECT grid.g, grid.v, COALESCE(counts.n, 0) AS n
                  FROM grid LEFT JOIN counts ON grid.g = counts.g AND grid.v = counts.v),
       cum AS (SELECT g, v, SUM(n) OVER (PARTITION BY g ORDER BY v) AS c FROM filled),
       j AS (SELECT a.v, a.c AS ca, b.c AS cb
             FROM cum a JOIN cum b ON a.v = b.v AND a.g = 'R' AND b.g = 'A'),
       scored AS (SELECT v, ca, cb,
                         abs(ca * (SELECT nb FROM tot) - cb * (SELECT na FROM tot)) AS dnum
                  FROM j)
       SELECT (SELECT na FROM tot) AS n_a,
              (SELECT nb FROM tot) AS n_b,
              CAST(v AS BIGINT) AS at_value,
              CAST(dnum AS BIGINT) AS d_num,
              CAST(CAST(dnum AS HUGEINT) * 1000000
                   // (CAST((SELECT na FROM tot) AS HUGEINT)
                       * (SELECT nb FROM tot)) AS BIGINT) AS d_ppm,
              CAST(CAST(ca AS HUGEINT) * 1000000
                   // (SELECT na FROM tot) AS BIGINT) AS cdf_a_ppm,
              CAST(CAST(cb AS HUGEINT) * 1000000
                   // (SELECT nb FROM tot) AS BIGINT) AS cdf_b_ppm
       FROM scored ORDER BY dnum DESC, v LIMIT 1""",
)
def stats_ks_two_sample(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov statistic (stats.ks_statistic)
    between returned ('R') and accepted-return-flag 'A' lineitem quantity
    distributions: D located by cross-multiplied BIGINT cumulative counts
    over the union value axis, argmax earliest-value-tie-broken — the
    ordered-numeric drift test audit_distribution_drift's categorical
    TVD cannot express. Windows are group-partitioned (never
    partitionless), the value axis fans to both groups by exploding a
    2-literal array (no BNLJ), and the two totals fold in as collected
    scalars (the bm25 scalar doctrine). The two flags' quantity
    distributions are near-identical by construction, so D is small but
    nonzero — the gate checks exact location+magnitude agreement, which
    is where float ECDFs diverge."""
    from ..operators.stats import ks_statistic

    return ks_statistic(
        _t(spark, sf_dir, "lineitem"), "l_returnflag", "l_quantity", "R", "A"
    )
