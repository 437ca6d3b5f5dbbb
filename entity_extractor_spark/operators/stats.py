"""Exact distributed statistics: per-group OLS trend, integer histogram,
percentile rank.

The monitoring layer of a corpus pipeline: "is this source's document
length drifting", "what does the size distribution look like", "what
fraction of the corpus is below this quality score". The reference has
no aggregate statistics at all — per-document rows go to MySQL and any
reporting is ad-hoc SQL outside the codebase.

Doctrine (same as pagerank/group_percentiles): every published number is
integer arithmetic on BIGINT/DECIMAL(38,0) — ppm/1e-6 fixed point for
ratios, rational numerator/denominator pairs where a division would
round — so results are bit-identical across engines, partitionings and
retries. One deliberate subtlety: Spark's `div` TRUNCATES toward zero
while DuckDB's `//` FLOORS, and OLS slopes can be negative, so every
signed division here is spelled sign(num) * (|num| div |den|) with a
positive den (den = n*Sxx - Sx^2 >= 0 by Cauchy-Schwarz) — the
two definitions agree on non-negative operands, and the explicit form
agrees everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PPM = 1_000_000
_D38 = "decimal(38,0)"


def group_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group least-squares line y = slope * x + intercept over
    INTEGER x/y columns — the drift detector ("tokens per document by
    ingest day, per source: which sources are trending down?"). Returns
    (group, n, slope_num, slope_den, slope_ppm, intercept_ppm):

        slope_num = n*Sxy - Sx*Sy          (exact, DECIMAL(38,0))
        slope_den = n*Sxx - Sx*Sx          (exact; 0 when all x equal)
        slope_ppm = trunc(slope_num * 1e6 / slope_den)   (NULL if den=0)
        intercept_ppm = trunc((Sy*1e6 - slope_ppm*Sx) / n)

    The rational (num, den) pair IS the exact answer; the ppm fields are
    the fixed-point rendering (intercept is defined over the ppm-rounded
    slope so it stays pure integer arithmetic — the 1e-6 slope quantum
    is the documented precision). Envelope: |x|,|y| <= ~1e6 with n up to
    ~1e9 keeps n*Sxy*1e6 under DECIMAL(38,0)/HUGEINT range; quantize
    coarser inputs first (the cents/day grids used here are far inside).

    Scale shape: ONE algebraic aggregation — five sums that partial-
    aggregate map-side; no joins, no windows, no second pass. A group
    with 10^10 rows costs the same shuffle rows as a group with 10."""
    g = F.col(group_col)
    x = F.col(x_col).cast(_D38)
    y = F.col(y_col).cast(_D38)
    agg = (
        df.where(
            g.isNotNull() & F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
        )
        .groupBy(g.alias(group_col))
        .agg(
            F.count(F.lit(1)).cast(_D38).alias("_n"),
            F.sum(x).alias("_sx"),
            F.sum(y).alias("_sy"),
            F.sum(x * y).alias("_sxy"),
            F.sum(x * x).alias("_sxx"),
        )
    )
    num = F.expr("_n * _sxy - _sx * _sy")
    den = F.expr("_n * _sxx - _sx * _sx")
    sgn = F.when(num < 0, F.lit(-1)).when(num > 0, F.lit(1)).otherwise(F.lit(0))
    slope = F.when(
        den != 0,
        (
            sgn
            * F.expr(
                f"abs(_n * _sxy - _sx * _sy) * {_PPM} div abs(_n * _sxx - _sx * _sx)"
            )
        ).cast("long"),
    )
    out = agg.select(
        group_col,
        F.col("_n").cast("long").alias("n"),
        num.cast(_D38).alias("slope_num"),
        den.cast(_D38).alias("slope_den"),
        slope.alias("slope_ppm"),
        "_sx",
        "_sy",
    )
    inum = F.expr(f"_sy * {_PPM} - slope_ppm * _sx")
    isgn = F.when(inum < 0, F.lit(-1)).when(inum > 0, F.lit(1)).otherwise(F.lit(0))
    intercept = F.when(
        F.col("slope_ppm").isNotNull(),
        (
            isgn * F.expr(f"abs(_sy * {_PPM} - slope_ppm * _sx) div n")
        ).cast("long"),
    )
    return out.select(
        group_col,
        "n",
        "slope_num",
        "slope_den",
        "slope_ppm",
        intercept.alias("intercept_ppm"),
    )


def histogram(
    df: DataFrame,
    value_col: str,
    lo: int,
    hi: int,
    nbins: int,
) -> DataFrame:
    """Equi-width histogram of an INTEGER column over [lo, hi): bucket
    b covers [lo + b*(hi-lo)/nbins, ...) by the pure-integer rule
    b = (v - lo) * nbins div (hi - lo); values below lo land in bucket
    -1 and values >= hi in bucket nbins, so out-of-range mass is
    REPORTED, never silently clamped into the edge bars. Returns
    (bucket, n_rows, v_min, v_max) — min/max inside each bucket show
    the actual occupied sub-range. One algebraic groupBy on a derived
    column: at most nbins+2 groups leave the map side."""
    if hi <= lo:
        raise ValueError("hi must be > lo")
    if nbins <= 0:
        raise ValueError("nbins must be positive")
    v = F.col(value_col)
    # (v - lo) is non-negative on the in-range branch, so div == floor
    bucket = (
        F.when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(nbins))
        .otherwise(F.expr(f"({value_col} - {lo}) * {nbins} div ({hi} - {lo})"))
        .cast("long")
    )
    return (
        df.where(v.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(v).cast("long").alias("v_min"),
            F.max(v).cast("long").alias("v_max"),
        )
    )


def percentile_rank(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Exact percentile rank (cume_dist) in ppm for every DISTINCT value
    per group: pct_ppm = rows_at_or_below * 1e6 div group_rows — the
    inverse of group_percentiles ("what fraction of en documents are
    shorter than 2000 chars" instead of "what is p90"), the lookup a
    curator uses to turn a proposed threshold into kept-mass. All
    quantities non-negative, so div == floor on both engines.

    Scale shape: the row mass collapses to DISTINCT (group, value)
    pairs through one algebraic count, then one window over the
    collapsed table — identical shape to group_percentiles; a 10^9-row
    group with 10^4 distinct values sorts 10^4 rows."""
    counts = df.where(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).groupBy(
        F.col(group_col).alias(group_col), F.col(value_col).alias(value_col)
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    w = Window.partitionBy(group_col).orderBy(value_col)
    return (
        counts.withColumn("_cum", F.sum("n_rows").over(w))
        .withColumn("_n", F.sum("n_rows").over(Window.partitionBy(group_col)))
        .select(
            group_col,
            value_col,
            "n_rows",
            F.expr(f"_cum * {_PPM} div _n").cast("long").alias("pct_ppm"),
        )
    )


def half_life_decayed(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    half_life_days: int,
    value_col: str | None = None,
) -> DataFrame:
    """Half-life-decayed aggregates in exact integer arithmetic: each
    event weighs 2^-floor(age / half_life) on the ppm grid — i.e.
    weight_ppm = 1_000_000 >> (age_days div half_life_days), zero once
    the shift exceeds 62. Age is whole 86400-second blocks before the
    corpus's newest event: age_days = (max(ts_us) - ts_us) div 86400e6,
    computed with timestampdiff(MICROSECOND, ...) so TIMESTAMP and
    TIMESTAMP_NTZ behave identically (no session-timezone dependence,
    same doctrine as sessionize/asof_join).

    This is the recency weighting every freshness-sensitive corpus use
    needs — trending-entity scores, decayed source reputation, "how
    alive is this crawl seed" — expressed so the result is bit-identical
    across engines, partitionings and retries: exponential decay through
    floats would make every sum order-dependent; halving on the integer
    ppm grid makes it algebraic BIGINT addition. The step-wise halving
    (piecewise-constant within each half-life) is the documented
    tradeoff for exactness.

    Output per key: n events, decayed_count_ppm = sum(weight), and (when
    value_col is given) decayed_value_cents_ppm = sum(cents * weight)
    with cents = CAST(value AS DECIMAL(18,2)) * 100 — exact BIGINT up to
    ~9.2e18 cents*ppm per key.

    Scale shape: one max-scalar job (collected, embedded as a literal —
    never a crossJoin(broadcast(1-row)), which plans as BNLJ), then ONE
    algebraic aggregation; hot keys collapse map-side. The anchor pass
    is a pruned single-column scan.
    """
    if half_life_days <= 0:
        raise ValueError("half_life_days must be > 0")
    dt = dict(df.dtypes).get(ts_col)
    epoch = (
        "TIMESTAMP_NTZ'1970-01-01 00:00:00'"
        if dt == "timestamp_ntz"
        else "TIMESTAMP'1970-01-01 00:00:00+00:00'"
    )
    us = F.expr(f"timestampdiff(MICROSECOND, {epoch}, `{ts_col}`)")
    base = df.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()).select(
        F.col(key_col).alias("key"), us.alias("_us"),
        *( [F.col(value_col).alias("_v")] if value_col else [] ),
    )
    anchor = base.agg(F.max("_us")).collect()[0][0]
    if anchor is None:
        # zero qualifying rows: keep the FULL output schema (a scheduled
        # consumer selecting decayed_* must get an empty frame, not an
        # AnalysisException) — weight 0 over no rows is vacuously exact
        w = F.lit(0)
    else:
        w = F.expr(
            f"shiftright({_PPM}, CAST(least(({int(anchor)} - _us) DIV 86400000000"
            f" DIV {int(half_life_days)}, 62) AS INT))"
        )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(w).alias("decayed_count_ppm"),
    ]
    if value_col:
        cents = (F.col("_v").cast("decimal(18,2)") * 100).cast("long")
        aggs.append(F.sum(cents * w).alias("decayed_value_cents_ppm"))
    return base.groupBy("key").agg(*aggs)


def winsorize(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    lo_pct: int = 1,
    hi_pct: int = 99,
) -> DataFrame:
    """Per-group percentile-fence clamping — the feature-normalization
    step that tames heavy tails before a model or a fixed-point score
    sees them (a 10^9-cent order in a cents feature, a 10^6-token doc in
    a length feature):

        (group, id, value, lo, hi, clamped, was_clamped)

    lo/hi are EXACT type-1 percentiles (value at rank ceil(p*n/100) —
    pure integer rank arithmetic, the group_percentiles definition;
    never percentile_approx, whose double interpolation is neither exact
    nor cross-engine stable), so the fences are a deterministic function
    of the data and the same row clamps identically on any engine,
    partitioning, or retry. clamped = least(greatest(value, lo), hi);
    was_clamped marks the touched rows so the clamp RATE is auditable
    (a fence that touches 30% of a group is a data bug, not a tail).

    Scale shape: fences come from the DISTINCT-value-collapsed table
    (one algebraic count + one window over the collapsed rows — a
    10^9-row group with 10^4 distinct values sorts 10^4 rows); the
    (group, lo, hi) fence table is tiny and broadcast-joins back onto
    the raw rows, which are scanned once and never shuffled. NULL
    groups/values are excluded from both fence estimation and output
    (a NULL feature is the imputation stage's job, not the clamp's)."""
    if not (0 <= lo_pct <= hi_pct <= 100):
        raise ValueError("winsorize: need 0 <= lo_pct <= hi_pct <= 100")
    rows = df.where(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.col(value_col).alias("value"),
    )
    counts = rows.groupBy("grp", "value").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("grp").orderBy("value")
    # localCheckpoint: both fences derive from this one collapsed+windowed
    # table — without it each fence() re-runs the scan, the shuffle, and
    # both window passes (the repo's shared-intermediate doctrine)
    cum = (
        counts.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy("grp")))
        .localCheckpoint()
    )
    def fence(p: int, name: str) -> DataFrame:
        return (
            # greatest(..., 1): p = 0 means "clamp at the min" (rank 1),
            # not an empty fence that would inner-join the group away
            cum.withColumn(
                "t", F.expr(f"greatest(({int(p)} * n + 99) div 100, 1)")
            )
            .where(
                (F.col("cum") >= F.col("t"))
                & (F.col("cum") - F.col("cnt") < F.col("t"))
            )
            .select("grp", F.col("value").alias(name))
        )

    fences = fence(lo_pct, "lo").join(fence(hi_pct, "hi"), "grp")
    return (
        rows.join(F.broadcast(fences), "grp")
        .withColumn("clamped", F.expr("least(greatest(value, lo), hi)"))
        .select(
            F.col("grp").alias(group_col),
            F.col("id").alias(id_col),
            "value",
            "lo",
            "hi",
            "clamped",
            (F.col("clamped") != F.col("value")).alias("was_clamped"),
        )
    )


def knee_point(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Deterministic knee/elbow detection per group — the point of a
    monotone-ish curve farthest from the chord between its endpoints
    (the Kneedle criterion reduced to exact integer geometry): the
    automatic operating-point picker for the calibration outputs this
    engine produces (er_threshold_sweep's precision/recall curves,
    lsh_curve's S-curves, vocab_coverage's size/coverage trade-off,
    histogram CDFs):

        (group, knee_x, knee_y, cross_abs, x_lo, x_hi)

    For endpoints (x1,y1)-(x2,y2) (min-x / max-x points) each point's
    distance to the chord is |cross| / |chord| with
    cross = (x2-x1)(y-y1) - (y2-y1)(x-x1); the chord length is constant
    within a group, so argmax|cross| IS argmax distance — computed in
    pure integers, no sqrt, no floats. Ties break (|cross| DESC, x ASC):
    a deterministic single row per group on any engine/partitioning.
    Endpoints themselves have cross = 0, so a 1-2 point group returns
    its min-x point with cross_abs 0 — degenerate, not an error (the
    caller can see it in cross_abs).

    Scale shape: inputs are CURVES — already collapsed to per-group
    (x, y) points (dozens to thousands of rows), never raw data; one
    algebraic struct-min/max per group for the endpoints, a broadcast
    join back, one algebraic struct-max for the argmax: no windows, no
    shuffle beyond the group key. Cross products run in DECIMAL(38,0)
    — two 10^12-scale coordinates multiply past BIGINT. NULL x/y raise
    executor-side (a curve with holes is an upstream bug)."""
    ok = F.col("_x").isNotNull() & F.col("_y").isNotNull()
    pts = df.select(
        F.col(group_col).alias("_g"),
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
    ).select(
        "_g",
        F.when(
            F.assert_true(
                ok, F.lit("knee_point: curve points must be non-NULL")
            ).isNull(),
            F.col("_x"),
        ).alias("_x"),
        "_y",
    )
    ends = pts.groupBy("_g").agg(
        F.min(F.struct("_x", "_y")).alias("_lo"),
        F.max(F.struct("_x", "_y")).alias("_hi"),
    ).select(
        "_g",
        F.col("_lo._x").alias("_x1"),
        F.col("_lo._y").alias("_y1"),
        F.col("_hi._x").alias("_x2"),
        F.col("_hi._y").alias("_y2"),
    )
    crossed = pts.join(F.broadcast(ends), "_g").withColumn(
        "_cross",
        F.expr(
            "abs(CAST(_x2 - _x1 AS DECIMAL(38,0)) * (_y - _y1)"
            " - CAST(_y2 - _y1 AS DECIMAL(38,0)) * (_x - _x1))"
        ),
    )
    best = crossed.groupBy("_g").agg(
        F.max(
            F.struct(
                F.col("_cross"),
                (-F.col("_x")).alias("_negx"),
                F.col("_y").alias("_besty"),
                F.col("_x1").alias("_bx1"),
                F.col("_x2").alias("_bx2"),
            )
        ).alias("_b")
    )
    return best.select(
        F.col("_g").alias(group_col),
        (-F.col("_b._negx")).alias("knee_x"),
        F.col("_b._besty").alias("knee_y"),
        F.col("_b._cross").cast("decimal(38,0)").alias("cross_abs"),
        F.col("_b._bx1").alias("x_lo"),
        F.col("_b._bx2").alias("x_hi"),
    )


def equal_freq_bins(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_bins: int,
) -> DataFrame:
    """Equal-frequency discretization: assign every row's value to one
    of n_bins quantile bins per group — the feature-engineering step
    behind decile features, calibration buckets, and monotone binning
    for downstream models. A value's bin derives from its exact
    percentile rank: bin = min(n_bins-1, (cum_below * n_bins) div N)
    where cum_below counts rows with STRICTLY smaller values (so ties —
    the reason approximate quantile cuts are irreproducible — always
    land every occurrence of a value in ONE deterministic bin, and the
    first bin starts at 0). With heavy ties bins are as balanced as the
    data allows; the per-bin row counts in the output make the
    imbalance measurable rather than silent. never percentile_approx:
    interpolated double cuts are neither exact nor engine-stable
    (the winsorize doctrine).

    Output: one row per DISTINCT (group, value): (group, value, n_rows,
    bin) with bin in [0, n_bins) — join it back to the raw table to tag
    rows (the percentile_rank composition pattern), which keeps this
    operator one collapsed-table pass instead of shipping the raw mass
    through a window.

    Scale shape: identical to percentile_rank — one algebraic DISTINCT
    (group, value) count, then one window over the COLLAPSED table;
    NULL groups/values are dropped (audit-input convention)."""
    if not 2 <= int(n_bins) <= 10_000:
        raise ValueError("n_bins must be in [2, 10000]")
    counts = (
        df.where(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias(group_col), F.col(value_col).alias(value_col)
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    w = Window.partitionBy(group_col).orderBy(value_col)
    return (
        counts.withColumn(
            "_below",
            F.coalesce(
                F.sum("n_rows").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("_n", F.sum("n_rows").over(Window.partitionBy(group_col)))
        .select(
            group_col,
            value_col,
            F.col("n_rows").cast("long").alias("n_rows"),
            F.least(
                F.lit(int(n_bins) - 1),
                F.expr(f"_below * {int(n_bins)} div _n"),
            )
            .cast("long")
            .alias("bin"),
        )
    )


def pareto_frontier_2d(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """2-D Pareto frontier per group — the rows not DOMINATED by any
    other (dominated: another row is <= on both axes and < on at least
    one; both axes minimized — negate a column upstream to maximize).
    The multi-criteria trade-off primitive behind curation decisions
    ("quality loss vs tokens removed", "recall vs candidate volume"):
    er_threshold_sweep and lsh_curve emit whole curves, this extracts
    the undominated set of ANY (x, y) point cloud, the points knee_point
    then picks among.

    Semantics: ties collapse first (DISTINCT (group, x, y) — duplicate
    points are one frontier member; join back by (group, x, y) to
    recover row identity); NULL groups/coordinates are dropped (the
    audit-input convention). Output: (group, x, y) — exactly the
    frontier, ordered by nothing (sort downstream).

    Why this formulation: the naive test is a quadratic self-join
    ("exists a row that dominates me"). In 2-D, dominance linearizes:
    scanning DISTINCT points by (x asc, y asc), a point is on the
    frontier iff its y is strictly below the running minimum y of all
    points with STRICTLY SMALLER x — equal-x points compare within
    their x-slice by keeping only the slice's min y. One window over
    the distinct-collapsed cloud (the percentile_rank scale shape:
    a 10^9-row group with 10^4 distinct points sorts 10^4 rows), zero
    joins.
    """
    pts = (
        df.where(
            F.col(group_col).isNotNull()
            & F.col(x_col).isNotNull()
            & F.col(y_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("_g"),
            F.col(x_col).alias("_x"),
            F.col(y_col).alias("_y"),
        )
        .distinct()
    )
    # within an equal-x slice only the min-y point can be undominated
    slice_min = pts.groupBy("_g", "_x").agg(F.min("_y").alias("_y"))
    w = (
        Window.partitionBy("_g")
        .orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        slice_min.withColumn("_prev_min", F.min("_y").over(w))
        .where(F.col("_prev_min").isNull() | (F.col("_y") < F.col("_prev_min")))
        .select(
            F.col("_g").alias(group_col),
            F.col("_x").alias(x_col),
            F.col("_y").alias(y_col),
        )
    )


def change_point(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
) -> DataFrame:
    """Single change-point estimation per key — the CUSUM argmax
    (Page 1954 / the standard at-most-one-change mean-shift estimator):
    the split index i maximizing |n*cum_i - i*total|, i.e. where the
    cumulative sum deviates furthest from the no-change diagonal. The
    alerting question behind every event-stream audit ("did this
    metric's level SHIFT, and when"): mad_outliers (above) flags single
    rows, this locates a sustained regime change. Multiplying the
    classic statistic cum_i - i*mean through by n keeps the argmax
    EXACT in integer arithmetic (DECIMAL(38,0) — n*cum can pass 2^63)
    with no float mean, so the located index is engine- and
    partition-invariant; ties break earliest.

    Output per key: (key, n, cp_index, cp_ts, mag, mean_before,
    mean_after) — cp_index the 1-based last index of the BEFORE
    segment (restricted to 1..n-1: a change point needs both sides;
    keys with n < 2 are absent), cp_ts that row's timestamp, mag =
    |n*cum_i - i*total| div n (the deviation in value units), means by
    floor division. value_col must already be integer (quantize
    upstream — the winsorize doctrine); NULL keys/values/timestamps
    are dropped.

    Scale shape: ONE hash exchange on key feeds row_number + running
    sum (one per-partition sort), the per-key totals ride the same
    aggregation, and the argmax is an algebraic min(struct) — no
    second exchange, no global window. Statistical caveat (documented,
    not hidden): this LOCATES the best single split; whether the shift
    is significant needs a permutation or bootstrap test the caller
    runs on the located split."""
    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(value_col).cast("long").alias("_v"),
    )
    w = Window.partitionBy("_k").orderBy("_ts", "_tb")
    cum = (
        base.withColumn("_i", F.row_number().over(w).cast("long"))
        .withColumn(
            "_cum",
            F.sum("_v").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("_k")))
        .withColumn("_tot", F.sum("_v").over(Window.partitionBy("_k")))
    )
    scored = cum.where((F.col("_i") < F.col("_n")) & (F.col("_n") >= 2)).withColumn(
        "_d",
        F.expr(
            "abs(CAST(_n AS DECIMAL(38,0)) * _cum"
            " - CAST(_i AS DECIMAL(38,0)) * _tot)"
        ),
    )
    best = scored.groupBy("_k").agg(
        F.min(
            F.struct(
                (-F.col("_d")).alias("nd"),
                F.col("_i").alias("i"),
                F.col("_ts").alias("ts"),
                F.col("_cum").alias("cum"),
                F.col("_n").alias("n"),
                F.col("_tot").alias("tot"),
            )
        ).alias("_b")
    )
    # Floor division, explicitly: Spark's `div` truncates toward zero while
    # DuckDB's `//` floors, so for negative cumulative sums the two engines
    # would disagree by 1 (the same div-vs-floor discrepancy
    # mutual_information clamps around). Denominators here are always
    # strictly positive (i in 1..n-1), so flooring only needs a -1 adjust
    # when the numerator is negative and the division is inexact. mag's
    # numerator is an abs() and needs no adjustment.
    def _floordiv(num: str, den: str) -> str:
        return (
            f"CAST(CASE WHEN ({num}) < 0 AND ({num}) % ({den}) != 0 "
            f"THEN ({num}) div ({den}) - 1 ELSE ({num}) div ({den}) END AS BIGINT)"
        )

    return best.select(
        F.col("_k").alias(key_col),
        F.col("_b.n").cast("long").alias("n"),
        F.col("_b.i").cast("long").alias("cp_index"),
        F.col("_b.ts").alias("cp_ts"),
        F.expr("CAST((-_b.nd) div _b.n AS BIGINT)").alias("mag"),
        F.expr(_floordiv("_b.cum", "_b.i")).alias("mean_before"),
        F.expr(_floordiv("_b.tot - _b.cum", "_b.n - _b.i")).alias("mean_after"),
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
    k: int = 6,
) -> DataFrame:
    """Mutual information (and normalized MI) between two categorical
    columns on the float-free fixed-point log2 grid — the
    feature-association audit behind "is this column redundant given
    that one", leakage checks (a feature that near-determines the label
    is a leak suspect), and functional-dependency SCREENING by strength
    where audit.functional_dependencies is exact-or-nothing.

        MI   = sum_cells p_xy * log2(p_xy / (p_x p_y))
        H(c) = -sum p_c log2 p_c

    computed as integer-weighted sums of the SAME log2fp chain BM25 and
    pmi_collocations use: per cell q = c_xy*N*2^20 div (c_x*c_y)
    clamped >= 1, pmi_fp = log2fp(q, k) - 20*2^k, MI_fp =
    sum(c_xy * pmi_fp) div N — every step floor-exact BIGINT/
    DECIMAL(38,0), so the reported association is engine- and
    partition-invariant (a float MI would depend on summation order).
    The floors make each reported value a deterministic estimate within
    ~2^-k bits per term of the real quantity — the same one-sided
    truncation contract as log2fp itself.

    Output ONE row: (n, n_cells, mi_fp, h_x_fp, h_y_fp, nmi_ppm) in
    2^-k-bit units; nmi_ppm = mi_fp * 1e6 div min(h_x_fp, h_y_fp)
    (NULL when either entropy is 0 — a constant column carries no
    information to normalize by). NULL category values raise
    executor-side (confusion_matrix convention).

    Scale shape: one (x, y) cell count with map-side combine, two
    marginal re-aggs of the tiny cell table, N as one collected scalar
    (the bm25 doctrine), then pure codegen'd arithmetic and THREE
    one-row aggregations — the raw table scans once; everything after
    is cell-table-sized."""
    from .ranking import with_log2fp

    checked = df.select(
        F.when(F.col(x_col).isNotNull(), F.col(x_col).cast("string"))
        .otherwise(F.raise_error(F.lit("mutual_information: NULL x value")))
        .alias("_x"),
        F.when(F.col(y_col).isNotNull(), F.col(y_col).cast("string"))
        .otherwise(F.raise_error(F.lit("mutual_information: NULL y value")))
        .alias("_y"),
    )
    cells = checked.groupBy("_x", "_y").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    ).localCheckpoint(eager=True)
    xm = cells.groupBy("_x").agg(F.sum("_c").cast("long").alias("_cx"))
    ym = cells.groupBy("_y").agg(F.sum("_c").cast("long").alias("_cy"))
    n = int(cells.agg(F.sum("_c").alias("s")).collect()[0].s or 0)
    if n == 0:
        raise ValueError("mutual_information: empty input")
    shift = 20 * (1 << int(k))
    joined = (
        cells.join(F.broadcast(xm), "_x")
        .join(F.broadcast(ym), "_y")
        .withColumn(
            "_q",
            F.expr(
                f"GREATEST(CAST(CAST(_c AS DECIMAL(38,0)) * {n} * 1048576"
                " div (CAST(_cx AS DECIMAL(38,0)) * _cy) AS BIGINT), 1L)"
            ),
        )
    )
    mi_row = (
        with_log2fp(joined, "_q", "_pfp", int(k))
        .agg(
            # clamp at 0 BEFORE dividing: MI is non-negative, but the
            # one-sided per-term floors can dip the sum slightly below
            # for near-independent columns — and the two engines
            # disagree on negative integer division (Spark div
            # truncates, DuckDB // floors), so the clamp is also what
            # keeps the gate bit-exact
            F.expr(
                "CAST(GREATEST(sum(CAST(_c AS DECIMAL(38,0))"
                f" * (_pfp - {shift})), CAST(0 AS DECIMAL(38,0)))"
                f" div {n} AS BIGINT)"
            ).alias("mi_fp"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
        )
        .collect()[0]
    )

    def _entropy(marg: DataFrame, ccol: str) -> int:
        scored = marg.withColumn(
            "_q", F.expr(f"CAST({n}L * 1048576 div {ccol} AS BIGINT)")
        )
        row = (
            with_log2fp(scored, "_q", "_hfp", int(k))
            .agg(
                F.expr(
                    f"CAST(sum(CAST({ccol} AS DECIMAL(38,0)) * (_hfp - {shift}))"
                    f" div {n} AS BIGINT)"
                ).alias("h")
            )
            .collect()[0]
        )
        return int(row.h)

    hx = _entropy(xm, "_cx")
    hy = _entropy(ym, "_cy")
    spark = df.sparkSession
    nmi = (
        int(mi_row.mi_fp) * 1_000_000 // min(hx, hy) if min(hx, hy) > 0 else None
    )
    return spark.createDataFrame(
        [(n, int(mi_row.n_cells), int(mi_row.mi_fp), hx, hy, nmi)],
        "n long, n_cells long, mi_fp long, h_x_fp long, h_y_fp long, nmi_ppm long",
    )


def ks_statistic(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between two groups'
    value distributions — the ordered-numeric drift test that
    audit.distribution_drift's categorical TVD cannot express (TVD sees
    "bin 30 gained mass"; KS sees "the whole distribution shifted
    right"). The classic D = max_v |ECDF_a(v) - ECDF_b(v)| is kept
    float-free by cross-multiplying: D_num = max_v |cum_a(v)*n_b -
    cum_b(v)*n_a| over the UNION of observed values, reported with
    d_ppm = D_num * 1e6 div (n_a*n_b) — the cross-multiplies are
    non-negative BIGINT (exact to n_a*n_b < 2^63, i.e. ~3e9 rows per
    group) and the *1e6 ppm rescale runs in DECIMAL(38,0) on Spark /
    HUGEINT on DuckDB (the mutual_information doctrine), since
    D_num*1e6 would wrap BIGINT past ~3e6 rows per group; div == floor
    on both engines, ties in the argmax broken by the earliest value,
    so location and magnitude are engine- and partition-invariant. value_col must already be integral (quantize
    upstream — the winsorize doctrine). Statistical caveat, stated
    plainly: this computes the STATISTIC; the caller supplies the
    critical value / permutation test for significance, as with
    change_point.

    Output ONE row: (n_a, n_b, at_value, d_num, d_ppm, cdf_a_ppm,
    cdf_b_ppm) — the ECDFs at the argmax on the same ppm grid.

    Scale shape: the row mass collapses to DISTINCT (group, value)
    counts through one algebraic aggregation (the percentile_rank
    pattern); the value axis materializes once and fans to both groups
    by exploding a 2-literal array (narrow — no cross join, no BNLJ);
    cumulative sums run in windows PARTITIONED BY GROUP (never a
    partitionless window); the two ECDFs meet in one equi-join on
    value; totals are two collected scalars folded in as literals (the
    bm25/pagerank scalar doctrine); the argmax is an algebraic
    min(struct). A 10^9-row pair with 10^4 distinct values windows 10^4
    rows."""
    ga, gb = str(group_a), str(group_b)
    if ga == gb:
        raise ValueError("group_a and group_b must differ")
    base = df.where(
        F.col(group_col).cast("string").isin(ga, gb) & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(value_col).cast("long").alias("_v"),
    )
    counts = base.groupBy("_g", "_v").agg(F.count(F.lit(1)).alias("_n"))
    totals = {
        r["_g"]: int(r["t"])
        for r in counts.groupBy("_g").agg(F.sum("_n").alias("t")).collect()
    }
    n_a, n_b = totals.get(ga, 0), totals.get(gb, 0)
    if n_a == 0 or n_b == 0:
        raise ValueError(f"both groups need rows: {ga}={n_a}, {gb}={n_b}")
    grid = (
        counts.select("_v").distinct()
        .select("_v", F.explode(F.array(F.lit(ga), F.lit(gb))).alias("_g"))
    )
    filled = grid.join(counts, ["_g", "_v"], "left").fillna({"_n": 0})
    w = Window.partitionBy("_g").orderBy("_v")
    cum = filled.withColumn("_c", F.sum("_n").over(w))
    a_side = cum.where(F.col("_g") == ga).select("_v", F.col("_c").alias("_ca"))
    b_side = cum.where(F.col("_g") == gb).select("_v", F.col("_c").alias("_cb"))
    scored = a_side.join(b_side, "_v").select(
        "_v", "_ca", "_cb",
        F.abs(F.col("_ca") * F.lit(n_b) - F.col("_cb") * F.lit(n_a)).alias("_d"),
    )
    best = scored.agg(
        F.min(
            F.struct(
                (-F.col("_d")).alias("nd"),
                F.col("_v").alias("v"),
                F.col("_ca").alias("ca"),
                F.col("_cb").alias("cb"),
            )
        ).alias("_b")
    )
    return best.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.col("_b.v").cast("long").alias("at_value"),
        (-F.col("_b.nd")).cast("long").alias("d_num"),
        F.expr(
            f"CAST(CAST((-_b.nd) AS DECIMAL(38,0)) * 1000000"
            f" div (CAST({n_a} AS DECIMAL(38,0)) * {n_b}) AS BIGINT)"
        ).alias("d_ppm"),
        F.expr(
            f"CAST(CAST(_b.ca AS DECIMAL(38,0)) * 1000000 div {n_a} AS BIGINT)"
        ).alias("cdf_a_ppm"),
        F.expr(
            f"CAST(CAST(_b.cb AS DECIMAL(38,0)) * 1000000 div {n_b} AS BIGINT)"
        ).alias("cdf_b_ppm"),
    )
