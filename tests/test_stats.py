"""group_ols / histogram / percentile_rank: exact integer replays,
sign-of-division semantics, out-of-range reporting."""

from __future__ import annotations

import random

import pytest

from entity_extractor_spark.operators.stats import (
    group_ols,
    histogram,
    percentile_rank,
)

PPM = 1_000_000


def _trunc_div(a: int, b: int) -> int:
    s = -1 if (a < 0) != (b < 0) else 1
    return s * (abs(a) // abs(b))


def _brute_ols(rows):
    byg: dict = {}
    for g, x, y in rows:
        if None not in (g, x, y):
            byg.setdefault(g, []).append((x, y))
    out = {}
    for g, pts in byg.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if den == 0:
            out[g] = (n, num, den, None, None)
        else:
            slope = _trunc_div(num * PPM, den)
            out[g] = (n, num, den, slope, _trunc_div(sy * PPM - slope * sx, n))
    return out


def _collect_ols(spark, rows):
    df = spark.createDataFrame(rows, "g string, x long, y long")
    return {
        r["g"]: (r["n"], int(r["slope_num"]), int(r["slope_den"]),
                 r["slope_ppm"], r["intercept_ppm"])
        for r in group_ols(df, "g", "x", "y").collect()
    }


def test_ols_exact_line(spark):
    # y = 3x + 7 exactly: slope_ppm 3e6, intercept_ppm 7e6
    rows = [("g", x, 3 * x + 7) for x in range(10)]
    got = _collect_ols(spark, rows)
    assert got["g"][3] == 3 * PPM and got["g"][4] == 7 * PPM


def test_ols_negative_slope_truncates_toward_zero(spark):
    # y = -x with a perturbation so the ppm slope is NOT an integer
    # multiple: checks sign(num) * (|num| div |den|), not floor
    rows = [("g", 0, 0), ("g", 1, -1), ("g", 2, -2), ("g", 3, -4)]
    got = _collect_ols(spark, rows)
    assert got["g"] == _brute_ols(rows)["g"]
    assert got["g"][3] < 0


def test_ols_vertical_group_is_null_not_crash(spark):
    rows = [("g", 5, 1), ("g", 5, 9)]  # all x equal: den = 0
    got = _collect_ols(spark, rows)
    n, num, den, slope, intercept = got["g"]
    assert (den, slope, intercept) == (0, None, None)


@pytest.mark.parametrize("seed", [51, 52])
def test_ols_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    rows = [
        (f"g{rng.randrange(3)}", rng.randrange(-50, 50), rng.randrange(-1000, 1000))
        for _ in range(300)
    ]
    assert _collect_ols(spark, rows) == _brute_ols(rows)


# ---------------------------------------------------------------- histogram --

def test_histogram_known_answer(spark):
    rows = [(v,) for v in [0, 5, 9, 10, 19, 25, -3, 40, 40]]
    df = spark.createDataFrame(rows, "v long")
    got = {r["bucket"]: (r["n_rows"], r["v_min"], r["v_max"])
           for r in histogram(df, "v", 0, 40, 4).collect()}
    # width 10 over [0, 40): buckets 0..3, -1 underflow, 4 overflow
    assert got == {
        -1: (1, -3, -3),
        0: (3, 0, 9),
        1: (2, 10, 19),
        2: (1, 25, 25),
        4: (2, 40, 40),
    }


def test_histogram_validates(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        histogram(df, "v", 10, 10, 4)
    with pytest.raises(ValueError):
        histogram(df, "v", 0, 10, 0)


# ---------------------------------------------------------- percentile rank --

def test_percentile_rank_known_answer(spark):
    rows = [("g", v) for v in [1, 1, 2, 4]]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["v"]: (r["n_rows"], r["pct_ppm"])
           for r in percentile_rank(df, "g", "v").collect()}
    assert got == {1: (2, 500_000), 2: (1, 750_000), 4: (1, 1_000_000)}


def test_percentile_rank_matches_bruteforce(spark):
    rng = random.Random(53)
    rows = [(f"g{rng.randrange(2)}", rng.randrange(20)) for _ in range(200)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {(r["g"], r["v"]): (r["n_rows"], r["pct_ppm"])
           for r in percentile_rank(df, "g", "v").collect()}
    byg: dict = {}
    for g, v in rows:
        byg.setdefault(g, []).append(v)
    want = {}
    for g, vals in byg.items():
        n = len(vals)
        for v in set(vals):
            at = vals.count(v)
            cum = sum(1 for x in vals if x <= v)
            want[(g, v)] = (at, cum * PPM // n)
    assert got == want


def test_half_life_decayed_python_replay(spark):
    from datetime import datetime, timedelta

    from entity_extractor_spark.operators.stats import half_life_decayed

    base = datetime(2024, 1, 1)
    rows = []
    # ages chosen to straddle halving boundaries incl. the same-day and
    # far-past (weight 0 beyond shift 62 is unreachable here; shift 21+
    # zeroes on the ppm grid)
    for i, days in enumerate([0, 1, 3, 4, 5, 8, 12, 100]):
        rows.append((i % 2, base + timedelta(days=-days, hours=1), float(i)))
    df = spark.createDataFrame(rows, "k long, ts timestamp_ntz, v double")
    out = {r.key: (r.n, r.decayed_count_ppm, r.decayed_value_cents_ppm)
           for r in half_life_decayed(df, "k", "ts", 4, value_col="v").collect()}
    anchor = max(r[1] for r in rows)
    want = {}
    for k in (0, 1):
        mine = [r for r in rows if r[0] == k]
        ws = []
        for _, ts, v in mine:
            age_days = int((anchor - ts).total_seconds() * 1_000_000) // 86_400_000_000
            w = 1_000_000 >> min(age_days // 4, 62)
            ws.append((w, int(v * 100) * w))
        want[k] = (len(mine), sum(w for w, _ in ws), sum(x for _, x in ws))
    assert out == want


def test_half_life_decayed_validates_and_handles_empty(spark):
    from entity_extractor_spark.operators.stats import half_life_decayed

    df = spark.createDataFrame([], "k long, ts timestamp_ntz, v double")
    with pytest.raises(ValueError):
        half_life_decayed(df, "k", "ts", 0)
    empty = half_life_decayed(df, "k", "ts", 7, value_col="v")
    # full schema preserved on empty input (scheduled consumers select
    # the decayed columns unconditionally)
    assert empty.columns == ["key", "n", "decayed_count_ppm", "decayed_value_cents_ppm"]
    assert empty.count() == 0


# ---------------------------------------------------------------- winsorize --

def test_winsorize_brute(spark):
    """Random heavy-tailed groups vs a pure-Python type-1 fence replay —
    fences, clamped values, and flags exact; duplicates and a singleton
    group included."""
    import math
    import random

    from entity_extractor_spark.operators.stats import winsorize

    rng = random.Random(31)
    rows = [
        (f"g{i % 3}", i, rng.choice([rng.randrange(100), rng.randrange(10**6)]))
        for i in range(300)
    ] + [("solo", 9001, 42)]
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    got = {
        r.id: (r.lo, r.hi, r.clamped, r.was_clamped)
        for r in winsorize(df, "grp", "id", "v", 5, 95).collect()
    }
    by_g: dict = {}
    for g, i, v in rows:
        by_g.setdefault(g, []).append(v)
    fences = {}
    for g, vs in by_g.items():
        s = sorted(vs)
        t = lambda p: s[max(math.ceil(p * len(s) / 100), 1) - 1]  # noqa: E731
        fences[g] = (t(5), t(95))
    want = {}
    for g, i, v in rows:
        lo, hi = fences[g]
        c = min(max(v, lo), hi)
        want[i] = (lo, hi, c, c != v)
    assert got == want
    assert any(f for *_, f in got.values()) and not all(
        f for *_, f in got.values()
    )


def test_winsorize_p0_p100_and_validation(spark):
    """p0/p100 degrade to min/max (nothing clamps); bad bounds raise."""
    import pytest

    from entity_extractor_spark.operators.stats import winsorize

    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate([5, 1, 9, 7])],
        "grp string, id long, v long",
    )
    out = winsorize(df, "grp", "id", "v", 0, 100).collect()
    assert all(r.lo == 1 and r.hi == 9 and not r.was_clamped for r in out)
    with pytest.raises(ValueError):
        winsorize(df, "grp", "id", "v", 50, 40)


# --------------------------------------------------------------- knee point --

def test_knee_point_brute(spark):
    """Random curves vs a pure-Python max-|cross| replay — ties broken
    (|cross| DESC, x ASC); degenerate 1-point groups return themselves
    with cross 0."""
    import random

    from entity_extractor_spark.operators.stats import knee_point

    rng = random.Random(67)
    rows = []
    for g in range(4):
        xs = sorted(rng.sample(range(100), rng.randrange(2, 20)))
        for x in xs:
            rows.append((f"g{g}", x, rng.randrange(0, 1000)))
    rows.append(("solo", 7, 42))
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    got = {
        r.grp: (r.knee_x, r.knee_y, int(r.cross_abs), r.x_lo, r.x_hi)
        for r in knee_point(df, "grp", "x", "y").collect()
    }
    by_g: dict = {}
    for g, x, y in rows:
        by_g.setdefault(g, []).append((x, y))
    want = {}
    for g, pts in by_g.items():
        x1, y1 = min(pts)
        x2, y2 = max(pts)
        scored = sorted(
            (
                (-abs((x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)), x, y)
                for x, y in pts
            )
        )
        c, x, y = scored[0]
        want[g] = (x, y, -c, x1, x2)
    assert got == want
    assert got["solo"] == (7, 42, 0, 7, 7)


def test_knee_point_finds_the_obvious_elbow(spark):
    """An L-shaped curve's corner is its knee."""
    from entity_extractor_spark.operators.stats import knee_point

    pts = [(0, 0), (10, 900), (20, 950), (100, 1000)]
    df = spark.createDataFrame(
        [("L", x, y) for x, y in pts], "grp string, x long, y long"
    )
    r = knee_point(df, "grp", "x", "y").collect()[0]
    assert (r.knee_x, r.knee_y) == (10, 900)


def test_knee_point_rejects_null_points(spark):
    import pytest

    from entity_extractor_spark.operators.stats import knee_point

    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, None)], "grp string, x long, y long"
    )
    with pytest.raises(Exception, match="Exception|non-NULL"):
        knee_point(df, "grp", "x", "y").collect()


# ----------------------------------------------------------- equal_freq_bins --


def test_bins_uniform_and_tie_collapse(spark):
    from entity_extractor_spark.operators.stats import equal_freq_bins

    # 20 distinct values -> 4 bins of exactly 5 values
    rows = [("g", float(v)) for v in range(20)]
    df = spark.createDataFrame(rows, "grp string, val double")
    out = {r["val"]: r["bin"] for r in equal_freq_bins(df, "grp", "val", 4).collect()}
    assert out == {float(v): v // 5 for v in range(20)}
    # a value occupying 60% of mass: every occurrence in ONE bin, later
    # values pushed into the top bins
    rows = [("g", 1.0)] * 12 + [("g", 2.0)] * 4 + [("g", 3.0)] * 4
    df = spark.createDataFrame(rows, "grp string, val double")
    got = {
        r["val"]: (r["bin"], r["n_rows"])
        for r in equal_freq_bins(df, "grp", "val", 4).collect()
    }
    # below(1.0)=0 -> bin 0; below(2.0)=12 -> 12*4//20=2; below(3.0)=16 -> 3
    assert got == {1.0: (0, 12), 2.0: (2, 4), 3.0: (3, 4)}


def test_bins_python_replay_and_validation(spark):
    import random

    import pytest

    from entity_extractor_spark.operators.stats import equal_freq_bins

    rng = random.Random(3)
    rows = [(g, float(rng.randrange(0, 15))) for g in "ab" for _ in range(50)]
    df = spark.createDataFrame(rows, "grp string, val double")
    got = {
        (r["grp"], r["val"]): r["bin"]
        for r in equal_freq_bins(df, "grp", "val", 5).collect()
    }
    for g in "ab":
        vals = sorted(v for gg, v in rows if gg == g)
        n = len(vals)
        for v in set(vals):
            below = sum(1 for x in vals if x < v)
            assert got[(g, v)] == min(4, below * 5 // n)
    with pytest.raises(ValueError, match="n_bins"):
        equal_freq_bins(df, "grp", "val", 1)


# ------------------------------------------------------- pareto_frontier_2d --


def test_pareto_known_cloud(spark):
    from entity_extractor_spark.operators.stats import pareto_frontier_2d

    pts = [
        ("g", 1, 9), ("g", 1, 5),  # equal-x slice: only (1,5) survives
        ("g", 2, 7),               # dominated by nothing yet y=7 >= 5 -> dominated
        ("g", 3, 4),               # frontier
        ("g", 4, 4),               # equal y to running min -> dominated (<= both, < on x? no: (3,4) dominates (4,4))
        ("g", 5, 2),               # frontier
        ("g", 5, 2),               # duplicate point collapses
        ("h", 10, 10),             # other group: trivially frontier
    ]
    df = spark.createDataFrame(pts, "g string, x int, y int")
    out = {(r["g"], r["x"], r["y"]) for r in pareto_frontier_2d(df, "g", "x", "y").collect()}
    assert out == {("g", 1, 5), ("g", 3, 4), ("g", 5, 2), ("h", 10, 10)}


def test_pareto_brute_force_replay(spark):
    import random

    from entity_extractor_spark.operators.stats import pareto_frontier_2d

    rng = random.Random(9)
    pts = [("g", rng.randrange(0, 12), rng.randrange(0, 12)) for _ in range(120)]
    df = spark.createDataFrame(pts, "g string, x int, y int")
    got = {(r["x"], r["y"]) for r in pareto_frontier_2d(df, "g", "x", "y").collect()}
    uniq = set((x, y) for _, x, y in pts)
    want = {
        (x, y)
        for (x, y) in uniq
        if not any(
            (a <= x and b <= y and (a < x or b < y)) for (a, b) in uniq
        )
    }
    assert got == want


# --------------------------------------------------------------- change_point --


def test_change_point_planted_shift(spark):
    """Level shift 10 -> 50 at index 30 of 60: CUSUM argmax lands on
    the boundary with the right means."""
    from entity_extractor_spark.operators.stats import change_point

    rows = [("k", i, i, 10 if i < 30 else 50) for i in range(60)]
    df = spark.createDataFrame(rows, "k string, ts long, tb long, v long")
    r = change_point(df, "k", "ts", "tb", "v").collect()[0]
    assert (r["cp_index"], r["mean_before"], r["mean_after"]) == (30, 10, 50)
    assert r["n"] == 60


def test_change_point_brute_force_and_edges(spark):
    import random

    from entity_extractor_spark.operators.stats import change_point

    rng = random.Random(17)
    rows = []
    for k in "ab":
        for i in range(40):
            rows.append((k, i, i, rng.randrange(0, 100)))
    rows.append(("single", 0, 0, 5))  # n=1: absent
    df = spark.createDataFrame(rows, "k string, ts long, tb long, v long")
    got = {
        r["k"]: (r["cp_index"], r["mag"], r["mean_before"], r["mean_after"])
        for r in change_point(df, "k", "ts", "tb", "v").collect()
    }
    assert "single" not in got
    for k in "ab":
        vs = [v for kk, _, _, v in rows if kk == k]
        n, tot = len(vs), sum(vs)
        best = None
        cum = 0
        for i in range(1, n):
            cum += vs[i - 1]
            d = abs(n * cum - i * tot)
            if best is None or d > best[0]:
                best = (d, i, cum)
        d, i, cum = best
        assert got[k] == (i, d // n, cum // i, (tot - cum) // (n - i)), k


# --------------------------------------------------------- mutual_information --


def test_mi_python_replay(spark):
    from entity_extractor_spark.operators.ranking import log2fp_py
    from entity_extractor_spark.operators.stats import mutual_information

    rows = (
        [("a", "u")] * 30 + [("a", "v")] * 10
        + [("b", "u")] * 5 + [("b", "v")] * 55
    )
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y", k=6).collect()[0]
    from collections import Counter

    cells = Counter(rows)
    cx = Counter(x for x, _ in rows)
    cy = Counter(y for _, y in rows)
    n = len(rows)
    mi_sum = 0
    for (x, y), c in cells.items():
        q = max(c * n * 1_048_576 // (cx[x] * cy[y]), 1)
        mi_sum += c * (log2fp_py(q, 6) - 1280)
    want_mi = max(mi_sum, 0) // n
    hx = sum(c * (log2fp_py(n * 1_048_576 // c, 6) - 1280) for c in cx.values()) // n
    hy = sum(c * (log2fp_py(n * 1_048_576 // c, 6) - 1280) for c in cy.values()) // n
    assert (r["n"], r["n_cells"], r["mi_fp"], r["h_x_fp"], r["h_y_fp"]) == (
        n, 4, want_mi, hx, hy
    )
    assert r["nmi_ppm"] == want_mi * 1_000_000 // min(hx, hy)
    assert 0 < r["nmi_ppm"] < 1_000_000  # associated but not determined


def test_mi_extremes(spark):
    from entity_extractor_spark.operators.stats import mutual_information

    # perfectly dependent: NMI = 1e6 exactly on the grid
    dep = spark.createDataFrame(
        [("a", "u")] * 8 + [("b", "v")] * 8, "x string, y string"
    )
    r = mutual_information(dep, "x", "y").collect()[0]
    assert r["nmi_ppm"] == 1_000_000
    # constant y: zero entropy -> NULL nmi, MI clamps to 0
    const = spark.createDataFrame(
        [("a", "u")] * 4 + [("b", "u")] * 4, "x string, y string"
    )
    r2 = mutual_information(const, "x", "y").collect()[0]
    assert (r2["mi_fp"], r2["h_y_fp"], r2["nmi_ppm"]) == (0, 0, None)
    import pytest

    with pytest.raises(Exception, match="NULL x value"):
        mutual_information(
            spark.createDataFrame([(None, "u")], "x string, y string"), "x", "y"
        ).collect()


def test_change_point_negative_values_floor_division(spark):
    """Means use FLOOR division on both engines (DuckDB // floors; Spark
    div truncates toward zero — the explicit floor-adjust keeps negative
    cumulative sums bit-exact cross-engine, ADVICE r04)."""
    from entity_extractor_spark.operators.stats import change_point

    # values sum to negatives: before-segment mean = -7/2 -> floor -4
    # (truncation would report -3)
    rows = [("k", 0, 0, -3), ("k", 1, 1, -4), ("k", 2, 2, 10), ("k", 3, 3, 12)]
    df = spark.createDataFrame(rows, "k string, ts long, tb long, v long")
    r = change_point(df, "k", "ts", "tb", "v").collect()[0]
    vs = [-3, -4, 10, 12]
    n, tot = 4, sum(vs)
    best = None
    cum = 0
    for i in range(1, n):
        cum += vs[i - 1]
        d = abs(n * cum - i * tot)
        if best is None or d > best[0]:
            best = (d, i, cum)
    d, i, cum = best
    assert (r["cp_index"], r["mean_before"], r["mean_after"]) == (
        i, cum // i, (tot - cum) // (n - i)
    )
    assert r["mean_before"] == -4  # floor(-7/2), not trunc -3


# ---------------------------------------------------------------- ks_statistic --


def test_ks_known_answer_and_brute_force(spark):
    """Planted shift: group b = group a shifted right by 2 -> D peaks
    between the supports; verify exact D and location against a pure-
    Python ECDF replay."""
    from entity_extractor_spark.operators.stats import ks_statistic

    a_vals = [1, 1, 2, 3, 3, 4, 5, 5, 5, 6]
    b_vals = [v + 2 for v in a_vals] + [9]
    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    df = spark.createDataFrame(rows, "g string, v long")
    r = ks_statistic(df, "g", "v", "a", "b").collect()[0]
    n_a, n_b = len(a_vals), len(b_vals)
    vals = sorted(set(a_vals + b_vals))
    best = None
    for v in vals:
        ca = sum(1 for x in a_vals if x <= v)
        cb = sum(1 for x in b_vals if x <= v)
        d = abs(ca * n_b - cb * n_a)
        if best is None or d > best[0]:
            best = (d, v, ca, cb)
    d, v, ca, cb = best
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    assert (r["d_num"], r["at_value"]) == (d, v)
    assert r["d_ppm"] == d * 1_000_000 // (n_a * n_b)
    assert r["cdf_a_ppm"] == ca * 1_000_000 // n_a
    assert r["cdf_b_ppm"] == cb * 1_000_000 // n_b
    assert r["d_ppm"] > 400_000  # the planted shift carries real mass (5/11)


def test_ks_identical_and_validation(spark):
    import pytest

    from entity_extractor_spark.operators.stats import ks_statistic

    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = ks_statistic(df, "g", "v", "a", "b").collect()[0]
    assert r["d_num"] == 0 and r["d_ppm"] == 0
    assert r["at_value"] == 1  # earliest-value tie-break among all-zero rows
    with pytest.raises(ValueError, match="must differ"):
        ks_statistic(df, "g", "v", "a", "a")
    with pytest.raises(ValueError, match="both groups"):
        ks_statistic(df, "g", "v", "a", "zz")


def test_ks_ppm_no_bigint_overflow(spark):
    """ADVICE r04: d_num can reach n_a*n_b, so d_num*1e6 wraps BIGINT once
    n_a*n_b > ~9.2e12 (~3M rows per group). 4M disjoint rows per group put
    d_num = 1.6e13; the DECIMAL(38,0) ppm rescale must still report exactly
    1e6 ppm (the distributions are perfectly separated)."""
    from pyspark.sql import functions as F

    from entity_extractor_spark.operators.stats import ks_statistic

    n = 4_000_000
    df = spark.range(2 * n).select(
        F.when(F.col("id") < n, "a").otherwise("b").alias("g"),
        F.when(F.col("id") < n, F.lit(1)).otherwise(F.lit(2)).cast("long").alias("v"),
    )
    r = ks_statistic(df, "g", "v", "a", "b").collect()[0]
    assert r["n_a"] == n and r["n_b"] == n
    assert r["at_value"] == 1
    assert r["d_num"] == n * n  # 1.6e13 — already past the BIGINT*1e6 wrap point
    assert r["d_ppm"] == 1_000_000
    assert r["cdf_a_ppm"] == 1_000_000 and r["cdf_b_ppm"] == 0
