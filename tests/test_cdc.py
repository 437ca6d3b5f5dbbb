"""apply_changelog: upsert/delete fold semantics, last-writer-wins by
(ts, seq), pass-through of untouched keys, loud unknown-op failure."""

from __future__ import annotations

import pytest

from entity_extractor_spark.operators.cdc import apply_changelog

SNAP = "k string, val string"
CHG = "k string, ts long, seq long, op string, val string"


def _apply(spark, snap_rows, chg_rows, payload=("val",)):
    snap = spark.createDataFrame(snap_rows, SNAP)
    chg = spark.createDataFrame(chg_rows, CHG)
    return {
        r["k"]: tuple(r[c] for c in payload)
        for r in apply_changelog(
            snap, chg, "k", "ts", "seq", "op", list(payload)
        ).collect()
    }


def test_upsert_delete_passthrough(spark):
    got = _apply(
        spark,
        [("k1", "a"), ("k2", "b"), ("k3", "c")],
        [
            ("k2", 1, 0, "U", "b2"), ("k2", 2, 0, "U", "b3"),  # newest wins
            ("k3", 1, 0, "D", None),                            # deleted
            ("k4", 1, 0, "I", "d"),                             # inserted
            ("k5", 1, 0, "U", "e"),              # update-of-absent upserts
        ],
    )
    assert got == {"k1": ("a",), "k2": ("b3",), "k4": ("d",), "k5": ("e",)}


def test_delete_then_later_insert_resurrects(spark):
    got = _apply(
        spark,
        [("k1", "a")],
        [("k1", 1, 0, "D", None), ("k1", 1, 1, "I", "a2")],  # seq breaks tie
    )
    assert got == {"k1": ("a2",)}


def test_insert_then_later_delete_removes(spark):
    got = _apply(spark, [], [("k1", 1, 0, "I", "a"), ("k1", 2, 0, "D", None)])
    assert got == {}


def test_delete_of_absent_key_is_noop(spark):
    got = _apply(spark, [("k1", "a")], [("k9", 5, 0, "D", None)])
    assert got == {"k1": ("a",)}


def test_duplicate_ts_seq_winner_is_struct_max_not_partition_race(spark):
    # two changes share (ts, seq): winner = lexicographic max on
    # (op, payload) -> ("U", "z") beats ("I", "a"), on every run
    for _ in range(3):
        got = _apply(
            spark, [], [("k1", 1, 0, "I", "a"), ("k1", 1, 0, "U", "z")]
        )
        assert got == {"k1": ("z",)}


def test_multi_column_payload(spark):
    s = spark.createDataFrame(
        [("k1", "a", 1), ("k2", "b", 1)], "k string, val string, n long"
    )
    c = spark.createDataFrame(
        [("k2", 1, 0, "U", "bb", 9)],
        "k string, ts long, seq long, op string, val string, n long",
    )
    got = {
        r["k"]: (r["val"], r["n"])
        for r in apply_changelog(s, c, "k", "ts", "seq", "op", ["val", "n"]).collect()
    }
    assert got == {"k1": ("a", 1), "k2": ("bb", 9)}


def test_unknown_op_fails_loudly(spark):
    snap = spark.createDataFrame([("k1", "a")], SNAP)
    chg = spark.createDataFrame([("k1", 1, 0, "X", "b")], CHG)
    with pytest.raises(Exception, match="op must be one of I/U/D"):
        apply_changelog(snap, chg, "k", "ts", "seq", "op", ["val"]).collect()


def test_empty_payload_validates(spark):
    snap = spark.createDataFrame([("k1", "a")], SNAP)
    chg = spark.createDataFrame([], CHG)
    with pytest.raises(ValueError):
        apply_changelog(snap, chg, "k", "ts", "seq", "op", [])


def test_incremental_agg_fold_equals_full_recompute(spark):
    import random

    from entity_extractor_spark.operators.cdc import incremental_agg

    random.seed(41)
    batches = [
        [(random.randint(0, 20), random.randint(1, 9), random.randint(-5, 5))
         for _ in range(200)]
        for _ in range(3)
    ]
    schema = "k long, a long, b long"
    state = None
    for rows in batches:
        state = incremental_agg(state, spark.createDataFrame(rows, schema), "k", ["a", "b"])
    got = {r.key: (r.n, r.a, r.b) for r in state.collect()}
    allrows = [r for rows in batches for r in rows]
    want = {}
    for k, a, b in allrows:
        n0, a0, b0 = want.get(k, (0, 0, 0))
        want[k] = (n0 + 1, a0 + a, b0 + b)
    assert got == want


def test_incremental_agg_untouched_keys_pass_through(spark):
    from entity_extractor_spark.operators.cdc import incremental_agg

    s0 = incremental_agg(
        None, spark.createDataFrame([(1, 10), (2, 20)], "k long, a long"), "k", ["a"]
    )
    s1 = incremental_agg(
        s0, spark.createDataFrame([(2, 5), (3, 7)], "k long, a long"), "k", ["a"]
    )
    assert {r.key: (r.n, r.a) for r in s1.collect()} == {
        1: (1, 10), 2: (2, 25), 3: (1, 7),
    }


def test_incremental_agg_null_keys_dropped_not_splintered(spark):
    from entity_extractor_spark.operators.cdc import incremental_agg

    schema = "k long, a long"
    s0 = incremental_agg(
        None, spark.createDataFrame([(None, 1), (1, 2)], schema), "k", ["a"]
    )
    s1 = incremental_agg(
        s0, spark.createDataFrame([(None, 3), (1, 4)], schema), "k", ["a"]
    )
    rows = s1.collect()
    assert {r.key: (r.n, r.a) for r in rows} == {1: (2, 6)}
    assert len(rows) == 1  # no splinter NULL rows accumulating per batch


# --------------------------------------------------------------- as-of state --

_AOF_SCHEMA = "k long, ts long, seq long, op string, bal long"
_AOF_LOG = [
    # key 1: born at 10, updated at 20, deleted at 30
    (1, 10, 1, "I", 100), (1, 20, 2, "U", 150), (1, 30, 3, "D", 0),
    # key 2: born at 25 only
    (2, 25, 4, "I", 200),
    # key 3: same-ts tie broken by seq
    (3, 20, 5, "I", 300), (3, 20, 6, "U", 350),
]


def _aof(spark, as_of):
    from entity_extractor_spark.operators.cdc import as_of_state

    df = spark.createDataFrame(_AOF_LOG, _AOF_SCHEMA)
    out = as_of_state(df, "k", "ts", "seq", "op", ["bal"], as_of)
    return {r.k: (r.bal, r.as_of_ts, r.as_of_seq) for r in out.collect()}


def test_as_of_state_timeline(spark):
    assert _aof(spark, 5) == {}                       # before anything was born
    assert _aof(spark, 10) == {1: (100, 10, 1)}       # inclusive boundary
    assert _aof(spark, 22) == {1: (150, 20, 2), 3: (350, 20, 6)}
    assert _aof(spark, 99) == {2: (200, 25, 4), 3: (350, 20, 6)}  # 1 deleted


def test_as_of_state_matches_apply_changelog_at_end_of_time(spark):
    """Replaying the whole log as-of +inf equals folding it into an empty
    snapshot — the two operators are two views of one semantics."""
    from entity_extractor_spark.operators.cdc import apply_changelog, as_of_state

    df = spark.createDataFrame(_AOF_LOG, _AOF_SCHEMA)
    empty = spark.createDataFrame([], "k long, bal long")
    via_fold = {
        (r.k, r.bal)
        for r in apply_changelog(empty, df, "k", "ts", "seq", "op", ["bal"]).collect()
    }
    via_asof = {
        (r.k, r.bal)
        for r in as_of_state(df, "k", "ts", "seq", "op", ["bal"], 10**9).collect()
    }
    assert via_fold == via_asof


def test_as_of_state_rejects_bad_op(spark):
    import pytest

    from entity_extractor_spark.operators.cdc import as_of_state

    df = spark.createDataFrame([(1, 10, 1, "X", 5)], _AOF_SCHEMA)
    with pytest.raises(Exception, match="Exception|I/U/D"):
        as_of_state(df, "k", "ts", "seq", "op", ["bal"], 99).collect()


def test_forget_cascade_chain_and_guards(spark):
    from entity_extractor_spark.operators.cdc import forget_cascade
    from entity_extractor_spark.operators.snapshot import dataset_digest

    cust = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "ck long, name string"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3), (14, None)],
        "ok long, ck long",
    )
    items = spark.createDataFrame(
        [(10, "x"), (10, "y"), (12, "z"), (99, "w")], "ok long, sku string"
    )
    reqs = spark.createDataFrame([(1,), (2,), (777,), (None,)], "k long")
    out = {
        r.table_name: r
        for r in forget_cascade(
            reqs, "k",
            [
                ("customer", cust, "ck", "ck"),
                ("orders", orders, "ck", "ok"),
                ("items", items, "ok", None),
            ],
        ).collect()
    }
    c, o, i = out["customer"], out["orders"], out["items"]
    assert (c.depth, c.n_rows, c.n_matched_keys, c.n_emit_keys) == (0, 2, 2, 2)
    # customers 1,2 -> orders 10,11,12 (order 14 has NULL ck: untouched)
    assert (o.depth, o.n_rows, o.n_matched_keys, o.n_emit_keys) == (1, 3, 2, 3)
    # orders 10,12 hit items (11 has none, 99 not in frontier)
    assert (i.depth, i.n_rows, i.n_matched_keys, i.n_emit_keys) == (2, 3, 2, 2)
    # the digest pins the frontier key SET: recompute independently
    exp = dataset_digest(
        spark.createDataFrame([(10,), (11,), (12,)], "_fk long"), ["_fk"]
    ).collect()[0]
    assert (o.digest1, o.digest2) == (exp.digest1, exp.digest2)
    # unknown request keys shrink nothing downstream; empty digest is 0
    none_hit = forget_cascade(
        spark.createDataFrame([(777,)], "k long"), "k",
        [("customer", cust, "ck", None)],
    ).collect()[0]
    assert (none_hit.n_rows, none_hit.digest1, none_hit.digest2) == (0, 0, 0)
    import pytest

    with pytest.raises(ValueError, match="last level"):
        forget_cascade(reqs, "k", [("a", cust, "ck", None), ("b", orders, "ck", None)])
    with pytest.raises(ValueError, match="non-empty"):
        forget_cascade(reqs, "k", [])


# ------------------------------------------------------- compact_changelog --


def _compact(spark, chg_rows):
    from entity_extractor_spark.operators.cdc import compact_changelog

    chg = spark.createDataFrame(chg_rows, CHG)
    return {
        r["k"]: (r["op"], r["ts"], r["seq"], r["val"], r["n_events"])
        for r in compact_changelog(
            chg, "k", "ts", "seq", "op", ["val"]
        ).collect()
    }


def test_compact_four_net_classes(spark):
    """born+died cancels; born->net I; pre-existing->net U; pre-existing
    ending in delete keeps a tombstone. ts/seq/payload come from the
    LAST event; n_events counts the collapsed history."""
    out = _compact(
        spark,
        [
            # a: I then U then D inside the window -> cancelled
            ("a", 1, 1, "I", "a1"), ("a", 2, 2, "U", "a2"), ("a", 3, 3, "D", None),
            # b: I then U -> net I with last payload
            ("b", 1, 4, "I", "b1"), ("b", 5, 5, "U", "b2"),
            # c: U then U -> net U
            ("c", 2, 6, "U", "c1"), ("c", 4, 7, "U", "c2"),
            # d: U then D -> tombstone kept
            ("d", 1, 8, "U", "d1"), ("d", 9, 9, "D", None),
            # e: single U
            ("e", 7, 10, "U", "e1"),
        ],
    )
    assert "a" not in out
    assert out["b"] == ("I", 5, 5, "b2", 2)
    assert out["c"] == ("U", 4, 7, "c2", 2)
    assert out["d"] == ("D", 9, 9, None, 2)
    assert out["e"] == ("U", 7, 10, "e1", 1)
    # d-then-I resurrection inside the window: first=D (pre-existed),
    # last=I payload -> net U
    out2 = _compact(
        spark, [("x", 1, 1, "D", None), ("x", 2, 2, "I", "x2")]
    )
    assert out2["x"] == ("U", 2, 2, "x2", 2)


def test_compact_duplicate_ts_seq_total_order(spark):
    """Under duplicated (ts, seq) the first/last are struct min/max —
    op then payload break the tie deterministically, same as
    apply_changelog's winner."""
    out = _compact(
        spark,
        [("k", 1, 1, "I", "p1"), ("k", 1, 1, "U", "p9"), ("k", 1, 1, "U", "p2")],
    )
    # last = max(struct) -> op 'U', payload 'p9'; first = min -> op 'I'
    assert out["k"] == ("I", 1, 1, "p9", 3)


def test_compact_apply_equivalence(spark):
    """Consistency contract: applying the COMPACTED log to a snapshot the
    log is consistent with (born keys absent from it) yields the same
    next snapshot as applying the FULL log."""
    snap_rows = [("c", "c0"), ("d", "d0"), ("z", "z0")]
    chg_rows = [
        ("a", 1, 1, "I", "a1"), ("a", 3, 2, "D", None),      # cancelled
        ("b", 1, 3, "I", "b1"), ("b", 5, 4, "U", "b2"),      # born
        ("c", 2, 5, "U", "c1"), ("c", 4, 6, "U", "c2"),      # updated
        ("d", 1, 7, "U", "d1"), ("d", 9, 8, "D", None),      # deleted
    ]
    from entity_extractor_spark.operators.cdc import compact_changelog

    full = _apply(spark, snap_rows, chg_rows)
    compacted_df = compact_changelog(
        spark.createDataFrame(chg_rows, CHG), "k", "ts", "seq", "op", ["val"]
    ).select("k", "ts", "seq", "op", "val")
    snap = spark.createDataFrame(snap_rows, SNAP)
    via_compact = {
        r["k"]: (r["val"],)
        for r in apply_changelog(
            snap, compacted_df, "k", "ts", "seq", "op", ["val"]
        ).collect()
    }
    assert full == via_compact == {"b": ("b2",), "c": ("c2",), "z": ("z0",)}


def test_compact_rejects_bad_op_and_empty_payload(spark):
    from entity_extractor_spark.operators.cdc import compact_changelog

    chg = spark.createDataFrame([("k", 1, 1, "Z", "v")], CHG)
    with pytest.raises(Exception, match="op must be one of"):
        compact_changelog(chg, "k", "ts", "seq", "op", ["val"]).collect()
    with pytest.raises(ValueError, match="non-empty"):
        compact_changelog(chg, "k", "ts", "seq", "op", [])
