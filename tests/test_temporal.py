"""as-of join: brute-force equivalence, partitioning invariance, strict
inequality and tolerance semantics."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.operators.temporal import asof_join

T0 = dt.datetime(2024, 1, 1)


def _mk_events(seed: int, n: int, users: int, dup_ts_every: int = 5):
    """Random (id, user, ts, val) rows; every dup_ts_every-th row reuses the
    previous timestamp so tie handling is actually exercised."""
    rng = random.Random(seed)
    rows, prev_ts = [], T0
    for i in range(n):
        ts = prev_ts if (i % dup_ts_every == 0 and i) else T0 + dt.timedelta(
            seconds=rng.randrange(0, 100_000)
        )
        prev_ts = ts
        rows.append((i, rng.randrange(users), ts, float(rng.randrange(1000)) / 4))
    return rows


def _brute_asof(left, right, exact=True, tol=None):
    """argmax over the candidate set — the quadratic reference semantics."""
    out = {}
    for lid, lu, lts, _ in left:
        cands = [
            (rts, rid, rval)
            for rid, ru, rts, rval in right
            if ru == lu
            and (rts <= lts if exact else rts < lts)
            and (tol is None or (lts - rts).total_seconds() <= tol)
        ]
        out[lid] = max(cands)[1:] if cands else (None, None)
    return out


SCHEMA = "id bigint, user bigint, ts timestamp, val double"


@pytest.mark.parametrize("seed,exact", [(1, True), (2, False), (3, True)])
def test_asof_matches_bruteforce(spark, seed, exact):
    left = _mk_events(seed, 80, users=7)
    right = _mk_events(seed + 100, 120, users=7)
    ldf = spark.createDataFrame(left, SCHEMA)
    rdf = spark.createDataFrame(right, SCHEMA)
    got = {
        r["id"]: (r["asof_id"], r["asof_val"])
        for r in asof_join(
            ldf, rdf, on="user", ts="ts", right_values=["id", "val"],
            tiebreak="id", allow_exact_matches=exact,
        ).collect()
    }
    expect = {
        lid: (rid, rval)
        for lid, (rid, rval) in _brute_asof(left, right, exact=exact).items()
    }
    assert got == expect


def test_asof_partitioning_invariant_and_keeps_left_columns(spark):
    left = _mk_events(7, 60, users=5)
    right = _mk_events(77, 90, users=5)
    ldf = spark.createDataFrame(left, SCHEMA)
    rdf = spark.createDataFrame(right, SCHEMA)
    base = asof_join(ldf, rdf, "user", "ts", ["id"], tiebreak="id")
    assert base.columns == ["id", "user", "ts", "val", "asof_id", "asof_ts"]
    a = sorted(map(tuple, base.collect()))
    b = sorted(
        map(
            tuple,
            asof_join(
                ldf.repartition(13), rdf.repartition(3), "user", "ts", ["id"], tiebreak="id"
            ).collect(),
        )
    )
    assert a == b and len(a) == 60


def test_asof_tolerance(spark):
    left = _mk_events(9, 50, users=4)
    right = _mk_events(99, 70, users=4)
    ldf = spark.createDataFrame(left, SCHEMA)
    rdf = spark.createDataFrame(right, SCHEMA)
    got = {
        r["id"]: (r["asof_id"], r["asof_val"])
        for r in asof_join(
            ldf, rdf, "user", "ts", ["id", "val"], tiebreak="id",
            tolerance_seconds=5_000,
        ).collect()
    }
    expect = {
        lid: (rid, rval)
        for lid, (rid, rval) in _brute_asof(left, right, tol=5_000).items()
    }
    assert got == expect


def test_asof_empty_right(spark):
    left = _mk_events(4, 10, users=2)
    ldf = spark.createDataFrame(left, SCHEMA)
    rdf = spark.createDataFrame([], SCHEMA)
    rows = asof_join(ldf, rdf, "user", "ts", ["id"], tiebreak="id").collect()
    assert len(rows) == 10 and all(r["asof_id"] is None for r in rows)


def test_asof_tiebreak_is_numeric_not_lexicographic(spark):
    """Two right rows at the SAME timestamp with ids 9 and 10: the winner
    must be 10 (largest value), not 9 (lexicographically largest string) —
    regression for the string-cast tiebreak bug."""
    t = T0
    ldf = spark.createDataFrame([(100, 1, t, 0.0)], SCHEMA)
    rdf = spark.createDataFrame([(9, 1, t, 9.0), (10, 1, t, 10.0)], SCHEMA)
    row = asof_join(ldf, rdf, "user", "ts", ["id", "val"], tiebreak="id").collect()[0]
    assert (row["asof_id"], row["asof_val"]) == (10, 10.0)


def test_asof_left_of_only_keys_and_ts(spark):
    """A left table with no payload beyond (key, ts) still works (the
    internal row struct must not be empty)."""
    ldf = spark.createDataFrame([(1, T0)], "user bigint, ts timestamp")
    rdf = spark.createDataFrame([(7, 1, T0, 1.5)], SCHEMA)
    row = asof_join(ldf, rdf, "user", "ts", ["id"], tiebreak="id").collect()[0]
    assert row["user"] == 1 and row["asof_id"] == 7


def test_scd2_collapse_runs_and_intervals(spark):
    """Hand-built observation stream: runs collapse, half-open intervals
    chain (to == next from), last version open-ended, versions 1..n."""
    from entity_extractor_spark.operators.temporal import scd2_collapse

    rows = [
        ("u1", 1, 1, "a"),
        ("u1", 2, 2, "a"),
        ("u1", 3, 3, "b"),
        ("u1", 4, 4, "b"),
        ("u1", 5, 5, "a"),
        ("u2", 1, 6, "x"),
    ]
    df = spark.createDataFrame(rows, "k string, ts long, eid long, attr string")
    out = sorted(
        scd2_collapse(df, "k", "ts", "attr", "eid").collect(),
        key=lambda r: (r["key"], r["version"]),
    )
    u1 = [(r["attr"], r["effective_from"], r["effective_to"], r["version"])
          for r in out if r["key"] == "u1"]
    assert u1 == [("a", 1, 3, 1), ("b", 3, 5, 2), ("a", 5, None, 3)]
    u2 = [(r["attr"], r["effective_from"], r["effective_to"], r["version"])
          for r in out if r["key"] == "u2"]
    assert u2 == [("x", 1, None, 1)]


def test_scd2_null_attr_is_a_version(spark):
    """NULL attribute opens/closes versions like any value; a leading NULL
    run is still version 1."""
    from entity_extractor_spark.operators.temporal import scd2_collapse

    rows = [("u", 1, 1, None), ("u", 2, 2, None), ("u", 3, 3, "a"), ("u", 4, 4, None)]
    df = spark.createDataFrame(rows, "k string, ts long, eid long, attr string")
    out = sorted(
        scd2_collapse(df, "k", "ts", "attr", "eid").collect(),
        key=lambda r: r["version"],
    )
    assert [(r["attr"], r["version"]) for r in out] == [
        (None, 1), ("a", 2), (None, 3)
    ]
    assert [r["effective_to"] for r in out] == [3, 4, None]


def test_scd2_same_ts_tiebreak_deterministic(spark):
    """Two observations at one timestamp order by the tiebreak column, so
    the collapsed history is partition-invariant."""
    from entity_extractor_spark.operators.temporal import scd2_collapse

    rows = [("u", 1, 2, "late"), ("u", 1, 1, "early"), ("u", 2, 3, "late")]
    df = spark.createDataFrame(rows, "k string, ts long, eid long, attr string")
    out = sorted(
        scd2_collapse(df, "k", "ts", "attr", "eid").collect(),
        key=lambda r: r["version"],
    )
    assert [(r["attr"], r["version"]) for r in out] == [("early", 1), ("late", 2)]


def _naive_range_join(pts, ivs):
    return sorted(
        (p[0], i[0])
        for p in pts
        for i in ivs
        if i[1] <= p[1] < i[2]
    )


def test_range_join_keyless_matches_naive(spark):
    """Random-ish integer axis: bucketed equi-join result == brute-force
    double loop, including points on bucket boundaries."""
    from entity_extractor_spark.operators.temporal import range_join

    pts = [(f"p{i}", (i * 37) % 100) for i in range(60)]
    ivs = [(f"w{j}", j * 7, j * 7 + 11) for j in range(15)]
    p = spark.createDataFrame(pts, "pid string, x long")
    iv = spark.createDataFrame(ivs, "wid string, s long, e long")
    out = range_join(p, iv, "x", "s", "e", bucket_width=8)
    got = sorted((r["pid"], r["wid"]) for r in out.collect())
    assert got == _naive_range_join(pts, ivs)
    assert len(got) > 0


def test_range_join_half_open_boundaries(spark):
    """point == start joins; point == end does not."""
    from entity_extractor_spark.operators.temporal import range_join

    p = spark.createDataFrame([("a", 10), ("b", 20)], "pid string, x long")
    iv = spark.createDataFrame([("w", 10, 20)], "wid string, s long, e long")
    got = [r["pid"] for r in range_join(p, iv, "x", "s", "e", 5).collect()]
    assert got == ["a"]


def test_range_join_keyed(spark):
    """With keys, only same-key (point, interval) pairs join."""
    from entity_extractor_spark.operators.temporal import range_join

    p = spark.createDataFrame(
        [("u1", "a", 5), ("u2", "b", 5)], "user string, pid string, x long"
    )
    iv = spark.createDataFrame(
        [("u1", "w1", 0, 10), ("u2", "w2", 0, 10)],
        "user string, wid string, s long, e long",
    )
    got = sorted(
        (r["pid"], r["wid"])
        for r in range_join(p, iv, "x", "s", "e", 4, keys=["user"]).collect()
    )
    assert got == [("a", "w1"), ("b", "w2")]


def test_range_join_span_guard_raises(spark):
    """An interval spanning >= max_span_buckets buckets fails loudly."""
    import pytest

    from entity_extractor_spark.operators.temporal import range_join

    p = spark.createDataFrame([("a", 1)], "pid string, x long")
    iv = spark.createDataFrame([("w", 0, 1000)], "wid string, s long, e long")
    bad = range_join(p, iv, "x", "s", "e", bucket_width=1, max_span_buckets=100)
    with pytest.raises(Exception, match="range_join"):
        bad.collect()


def test_range_join_rejects_bad_args(spark):
    import pytest

    from entity_extractor_spark.operators.temporal import range_join

    p = spark.createDataFrame([("a", 1)], "pid string, x long")
    iv = spark.createDataFrame([("a", 0, 2)], "pid string, s long, e long")
    with pytest.raises(ValueError):
        range_join(p, iv, "x", "s", "e", bucket_width=0)
    with pytest.raises(ValueError, match="overlapping"):
        range_join(p, iv, "x", "s", "e", bucket_width=1)


def test_range_join_timestamps(spark):
    """Timestamp axis: microsecond-precision containment survives the
    double-cast bucketing (only monotonicity matters; the exact predicate
    re-filters)."""
    from datetime import datetime, timedelta

    from entity_extractor_spark.operators.temporal import range_join

    t0 = datetime(2024, 1, 1, 12, 0, 0, 500000)
    p = spark.createDataFrame(
        [("in", t0 + timedelta(seconds=10)), ("out", t0 + timedelta(seconds=90))],
        "pid string, ts timestamp",
    )
    iv = spark.createDataFrame(
        [("w", t0, t0 + timedelta(seconds=60))], "wid string, s timestamp, e timestamp"
    )
    got = [r["pid"] for r in range_join(p, iv, "ts", "s", "e", 30.0).collect()]
    assert got == ["in"]


# -------------------------------------------------------- interval coalesce --

def _brute_coalesce(rows):
    """Sweep per key: merge overlapping-or-touching intervals."""
    out = []
    byk: dict = {}
    for k, s, e in rows:
        if k is None or s is None or e is None:
            continue
        byk.setdefault(k, []).append((s, e))
    for k, ivs in byk.items():
        spans = []
        for s, e in sorted(ivs):
            if spans and s <= spans[-1][1]:
                ps, pe, n = spans[-1]
                spans[-1] = (ps, max(pe, e), n + 1)
            else:
                spans.append((s, e, 1))
        out.extend((k, *sp) for sp in spans)
    return sorted(out)


def test_interval_coalesce_known_answer(spark):
    from entity_extractor_spark.operators.temporal import interval_coalesce

    rows = [
        # k1: [1,5]+[4,8] overlap; [8,10] TOUCHES (8 > 8 false -> merges);
        # [12,15] opens a new span
        ("k1", 4, 8), ("k1", 1, 5), ("k1", 8, 10), ("k1", 12, 15),
        # k2: disjoint by one unit -> two spans
        ("k2", 1, 2), ("k2", 3, 4),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = sorted(
        (r["k"], r["span_start"], r["span_end"], r["n_merged"])
        for r in interval_coalesce(df, "k", "s", "e").collect()
    )
    assert got == [
        ("k1", 1, 10, 3), ("k1", 12, 15, 1),
        ("k2", 1, 2, 1), ("k2", 3, 4, 1),
    ]


def test_interval_coalesce_contained_interval_extends_nothing(spark):
    from entity_extractor_spark.operators.temporal import interval_coalesce

    # [2,3] sits inside [1,10]; [4,20] must still merge against the
    # RUNNING MAX end (10), not the previous row's end (3)
    rows = [("k", 1, 10), ("k", 2, 3), ("k", 4, 20)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = [(r["span_start"], r["span_end"], r["n_merged"])
           for r in interval_coalesce(df, "k", "s", "e").collect()]
    assert got == [(1, 20, 3)]


def test_interval_coalesce_null_rows_dropped(spark):
    from entity_extractor_spark.operators.temporal import interval_coalesce

    rows = [("k", 1, 2), (None, 1, 2), ("k", None, 9), ("k", 5, None)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = [(r["k"], r["span_start"], r["span_end"])
           for r in interval_coalesce(df, "k", "s", "e").collect()]
    assert got == [("k", 1, 2)]


@pytest.mark.parametrize("seed", [21, 22])
def test_interval_coalesce_matches_bruteforce(spark, seed):
    from entity_extractor_spark.operators.temporal import interval_coalesce

    rng = random.Random(seed)
    rows = []
    for _ in range(300):
        s = rng.randrange(0, 500)
        rows.append((f"k{rng.randrange(4)}", s, s + rng.randrange(0, 30)))
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = sorted(
        (r["k"], r["span_start"], r["span_end"], r["n_merged"])
        for r in interval_coalesce(df, "k", "s", "e").collect()
    )
    assert got == _brute_coalesce(rows)


def test_interval_coalesce_timestamps(spark):
    from entity_extractor_spark.operators.temporal import interval_coalesce

    rows = [
        ("k", T0, T0 + dt.timedelta(minutes=15)),
        ("k", T0 + dt.timedelta(minutes=10), T0 + dt.timedelta(minutes=25)),
        ("k", T0 + dt.timedelta(hours=2), T0 + dt.timedelta(hours=3)),
    ]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    got = [(r["span_start"], r["span_end"], r["n_merged"])
           for r in interval_coalesce(df, "k", "s", "e").collect()]
    assert sorted(got) == [
        (T0, T0 + dt.timedelta(minutes=25), 2),
        (T0 + dt.timedelta(hours=2), T0 + dt.timedelta(hours=3), 1),
    ]


# ----------------------------------------------------------------- sessionize --

def test_sessionize_known_answer(spark):
    from entity_extractor_spark.operators.temporal import sessionize

    rows = [
        ("u", T0, 0),
        ("u", T0 + dt.timedelta(seconds=30), 1),           # same session
        ("u", T0 + dt.timedelta(seconds=91), 2),           # 61s gap: new
        ("u", T0 + dt.timedelta(seconds=151), 3),          # exactly 60s: same
        ("v", T0, 0),                                       # other key
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, seq long")
    got = {(r["k"], r["seq"]): r["session_id"]
           for r in sessionize(df, "k", "ts", "seq", 60).collect()}
    assert got == {
        ("u", 0): 1, ("u", 1): 1, ("u", 2): 2, ("u", 3): 2, ("v", 0): 1,
    }


def test_sessionize_tie_ordered_by_seq(spark):
    from entity_extractor_spark.operators.temporal import sessionize

    rows = [("u", T0, 2), ("u", T0, 1),
            ("u", T0 + dt.timedelta(seconds=120), 3)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, seq long")
    got = {r["seq"]: r["session_id"]
           for r in sessionize(df, "k", "ts", "seq", 60).collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_sessionize_matches_bruteforce(spark):
    from entity_extractor_spark.operators.temporal import sessionize

    rng = random.Random(63)
    rows = [
        (f"u{rng.randrange(4)}",
         T0 + dt.timedelta(seconds=rng.randrange(0, 3600)), i)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, seq long")
    got = {(r["k"], r["seq"]): r["session_id"]
           for r in sessionize(df, "k", "ts", "seq", 45).collect()}
    want = {}
    byk: dict = {}
    for k, ts, seq in rows:
        byk.setdefault(k, []).append((ts, seq))
    for k, evs in byk.items():
        sid, prev = 0, None
        for ts, seq in sorted(evs):
            if prev is None or (ts - prev).total_seconds() > 45:
                sid += 1
            want[(k, seq)] = sid
            prev = ts
    assert got == want


def test_sessionize_validates(spark):
    from entity_extractor_spark.operators.temporal import sessionize

    df = spark.createDataFrame([("u", T0, 0)], "k string, ts timestamp, seq long")
    with pytest.raises(ValueError):
        sessionize(df, "k", "ts", "seq", 0)


def test_gap_fill_zero_fills_and_replays(spark):
    from datetime import datetime

    from entity_extractor_spark.operators.temporal import gap_fill

    rows = [
        ("a", datetime(2024, 1, 1, 0, 30), 1.50),
        ("a", datetime(2024, 1, 1, 0, 45), 2.25),
        ("a", datetime(2024, 1, 1, 3, 10), 4.00),
        ("b", datetime(2024, 1, 1, 1, 5), 10.00),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, v double")
    out = {(r.key, r.bucket): (r.n, r.value_cents)
           for r in gap_fill(df, "k", "ts", 3_600_000_000, value_col="v").collect()}
    base = datetime(2024, 1, 1).timestamp()  # UTC in test env? use integer µs math
    import calendar
    lo = calendar.timegm(datetime(2024, 1, 1, 0, 30).timetuple()) * 1_000_000 // 3_600_000_000
    hi = calendar.timegm(datetime(2024, 1, 1, 3, 10).timetuple()) * 1_000_000 // 3_600_000_000
    # spine: 2 keys x 4 hourly buckets, zero-filled gaps
    assert len(out) == 2 * (hi - lo + 1) == 8
    assert out[("a", lo)] == (2, 375)
    assert out[("a", lo + 1)] == (0, 0)
    assert out[("a", lo + 3)] == (1, 400)
    assert out[("b", lo + 1)] == (1, 1000)
    assert out[("b", lo + 3)] == (0, 0)


def test_gap_fill_empty_and_validation(spark):
    from entity_extractor_spark.operators.temporal import gap_fill

    df = spark.createDataFrame([], "k string, ts timestamp_ntz, v double")
    assert gap_fill(df, "k", "ts", 1_000_000, value_col="v").count() == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        gap_fill(df, "k", "ts", 0)


def test_rolling_window_replay(spark):
    from entity_extractor_spark.operators.temporal import rolling_window

    rows = [("a", b, b + 1, 10 * b) for b in range(6)] + [("b", b, 1, 5) for b in range(3)]
    df = spark.createDataFrame(rows, "k string, bucket long, n long, cents long")
    out = {(r.k, r.bucket): (r.n_roll, r.cents_roll) for r in
           rolling_window(df, "k", "bucket", ["n", "cents"], preceding=2).collect()}
    for k, b, n, c in rows:
        window = [(rn, rc) for (rk, rb, rn, rc) in rows if rk == k and b - 2 <= rb <= b]
        assert out[(k, b)] == (sum(x for x, _ in window), sum(y for _, y in window))


def test_rolling_window_validates(spark):
    from entity_extractor_spark.operators.temporal import rolling_window

    import pytest as _pt

    with _pt.raises(ValueError):
        rolling_window(None, "k", "b", ["n"], -1)


def test_gap_fill_pre_epoch_buckets_floor_not_truncate(spark):
    from datetime import datetime

    from entity_extractor_spark.operators.temporal import gap_fill

    rows = [
        ("a", datetime(1969, 12, 31, 23, 30), 1.00),   # µs = -1.8e9 -> bucket -1
        ("a", datetime(1970, 1, 1, 0, 30), 2.00),      # bucket 0
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, v double")
    out = {(r.key, r.bucket): (r.n, r.value_cents) for r in
           gap_fill(df, "k", "ts", 3_600_000_000, value_col="v").collect()}
    # truncation toward zero would merge both events into bucket 0
    assert out == {("a", -1): (1, 100), ("a", 0): (1, 200)}


# ------------------------------------------------------ interval_conflicts --


def _conf(spark, rows, width=10.0, conflicts_only=False, **kw):
    from entity_extractor_spark.operators.temporal import interval_conflicts

    df = spark.createDataFrame(
        rows, "k string, id long, v string, s double, e double"
    )
    return interval_conflicts(
        df, ["k"], "id", "v", "s", "e", bucket_width=width,
        conflicts_only=conflicts_only, **kw
    )


def test_conflicts_basic_pairs_and_flag(spark):
    rows = [
        ("a", 1, "x", 0.0, 10.0),
        ("a", 2, "y", 5.0, 15.0),   # overlaps 1, different value
        ("a", 3, "x", 9.0, 12.0),   # overlaps 1 (same val) and 2 (diff)
        ("a", 4, "z", 20.0, 30.0),  # disjoint
        ("b", 5, "x", 0.0, 10.0),   # other key
    ]
    out = {(r["id1"], r["id2"]): r for r in _conf(spark, rows).collect()}
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    assert out[(1, 2)]["is_conflict"] and out[(2, 3)]["is_conflict"]
    assert not out[(1, 3)]["is_conflict"]
    assert (out[(1, 2)]["overlap_start"], out[(1, 2)]["overlap_end"]) == (5.0, 10.0)
    only = {(r["id1"], r["id2"]) for r in
            _conf(spark, rows, conflicts_only=True).collect()}
    assert only == {(1, 2), (2, 3)}


def test_conflicts_exactly_once_across_buckets(spark):
    """A pair overlapping across MANY buckets must appear exactly once,
    including equal-start ties and containment."""
    rows = [
        ("a", 1, "x", 0.0, 100.0),   # spans 10 buckets
        ("a", 2, "y", 0.0, 100.0),   # equal start tie
        ("a", 3, "z", 55.0, 60.0),   # contained, later start
        ("a", 4, "w", 95.0, 200.0),  # tail overlap
    ]
    out = [(r["id1"], r["id2"]) for r in _conf(spark, rows).collect()]
    assert sorted(out) == [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
    assert len(out) == len(set(out))  # no duplicates from the explode


def test_conflicts_brute_force_replay(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(120):
        k = rng.choice("abc")
        s = float(rng.randrange(0, 200))
        rows.append((k, i, rng.choice("xy"), s, s + rng.randrange(1, 40)))
    got = {
        (r["k"], r["id1"], r["id2"], r["is_conflict"])
        for r in _conf(spark, rows, width=7.0).collect()
    }
    want = set()
    for (k1, i1, v1, s1, e1) in rows:
        for (k2, i2, v2, s2, e2) in rows:
            if k1 == k2 and i1 < i2 and s1 < e2 and s2 < e1:
                want.add((k1, i1, i2, v1 != v2))
    assert got == want


def test_conflicts_guards(spark):
    import pytest
    from entity_extractor_spark.operators.temporal import interval_conflicts

    # empty / inverted intervals and NULL bounds are dropped silently
    rows = [("a", 1, "x", 5.0, 5.0), ("a", 2, "y", None, 9.0),
            ("a", 3, "z", 1.0, 9.0)]
    assert _conf(spark, rows).count() == 0
    # NULL value raises executor-side
    df = spark.createDataFrame(
        [("a", 1, None, 0.0, 5.0), ("a", 2, "y", 1.0, 6.0)],
        "k string, id long, v string, s double, e double",
    )
    with pytest.raises(Exception, match="NULL value"):
        interval_conflicts(df, ["k"], "id", "v", "s", "e", 10.0).collect()
    # over-wide interval trips the span guard loudly
    wide = [("a", 1, "x", 0.0, 1e6), ("a", 2, "y", 5.0, 6.0)]
    with pytest.raises(Exception, match="spans"):
        _conf(spark, wide, width=1.0).count()
    with pytest.raises(ValueError, match="bucket_width"):
        _conf(spark, wide, width=0)
    with pytest.raises(ValueError, match="key_cols"):
        interval_conflicts(df, [], "id", "v", "s", "e", 10.0)
