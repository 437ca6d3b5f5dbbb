"""golden_record: per-rule survivor resolution vs a pure-Python replay."""

from __future__ import annotations

from collections import Counter

import pytest

from entity_extractor_spark.operators.survivorship import golden_record

ROWS = [
    # cluster, seg, bal, seen, name
    (1, "AUTO", 10.0, 3, "zeta"),
    (1, "AUTO", 7.5, 1, "alpha"),
    (1, "BIKE", 99.0, 2, "mid"),
    (2, "BIKE", -4.0, 9, "solo"),
    (3, None, 1.0, 5, "n1"),
    (3, None, 2.0, 4, "n2"),
]
SCHEMA = "cluster long, seg string, bal double, seen long, name string"


def test_golden_record_rules(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {
        r.cluster: r.asDict()
        for r in golden_record(
            df,
            "cluster",
            mode_cols=["seg"],
            max_cols=["bal"],
            min_cols=["seen"],
            first_by=("seen", ["name"]),
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    # cluster 1: AUTO beats BIKE 2-1; max bal 99; min seen 1 -> name alpha
    c1 = out[1]
    assert (c1["n_members"], c1["seg_mode"], c1["seg_nvals"]) == (3, "AUTO", 2)
    assert (c1["bal_max"], c1["seen_min"], c1["name_first"]) == (99.0, 1, "alpha")
    # cluster 2: singleton passes through
    c2 = out[2]
    assert (c2["seg_mode"], c2["seg_nvals"], c2["name_first"]) == ("BIKE", 1, "solo")
    # cluster 3: mode col all-null -> NULL mode, NULL nvals (left join)
    c3 = out[3]
    assert c3["seg_mode"] is None and c3["seg_nvals"] is None
    assert c3["name_first"] == "n2"  # min (seen, name) = (4, n2)


def test_mode_tie_breaks_ascending(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (1, "a"), (1, "b"), (1, "c")], "cluster long, seg string"
    )
    row = golden_record(df, "cluster", mode_cols=["seg"]).collect()[0]
    assert row.seg_mode == "a" and row.seg_nvals == 3  # a,b tie at 2 -> min value


def test_replay_on_random_clusters(spark):
    import random

    random.seed(5)
    rows = [
        (random.randint(1, 8), random.choice("xyz"), float(random.randint(0, 50)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "cluster long, seg string, bal double")
    got = {
        r.cluster: (r.n_members, r.bal_max, r.seg_mode, r.seg_nvals)
        for r in golden_record(
            df, "cluster", mode_cols=["seg"], max_cols=["bal"]
        ).collect()
    }
    for c in {r[0] for r in rows}:
        mine = [r for r in rows if r[0] == c]
        cnt = Counter(r[1] for r in mine)
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[c] == (len(mine), max(r[2] for r in mine), best, len(cnt))


def test_missing_column_raises(spark):
    df = spark.createDataFrame([(1, "a")], "cluster long, seg string")
    with pytest.raises(ValueError, match="not in frame"):
        golden_record(df, "cluster", mode_cols=["nope"])
