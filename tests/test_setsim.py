"""set_similarity_join: brute-force replay, prefix-filter completeness,
threshold edge cases, hub-item guard."""

from __future__ import annotations

import itertools
import random

import pytest

from entity_extractor_spark.operators.dedupe import set_similarity_join

DENOM = 1_000_000


def _mk(spark, sets: dict[int, set]):
    rows = [(i, it) for i, items in sets.items() for it in items]
    return spark.createDataFrame(rows, "id long, item long")


def _brute(sets: dict[int, set], t_ppm: int):
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if i * DENOM >= t_ppm * u:
            out[(a, b)] = (len(sets[a]), len(sets[b]), i, u, i * DENOM // u)
    return out


def _collect(df):
    return {
        (r.id1, r.id2): (r.n1, r.n2, r.inter, r.uni, r.jac_ppm) for r in df.collect()
    }


@pytest.mark.parametrize("t_ppm", [300_000, 500_000, 800_000, 1_000_000])
def test_matches_bruteforce(spark, t_ppm):
    random.seed(13)
    sets = {
        i: set(random.sample(range(25), random.randint(1, 9))) for i in range(60)
    }
    got = _collect(set_similarity_join(_mk(spark, sets), "id", "item", t_ppm))
    assert got == _brute(sets, t_ppm)


def test_exact_duplicates_at_threshold_one(spark):
    sets = {0: {1, 2, 3}, 1: {1, 2, 3}, 2: {1, 2}, 3: {9}, 4: {9}}
    got = _collect(set_similarity_join(_mk(spark, sets), "id", "item", DENOM))
    assert got == {(0, 1): (3, 3, 3, 3, DENOM), (3, 4): (1, 1, 1, 1, DENOM)}


def test_duplicate_input_rows_and_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2), (1, 1), (1, 2), (None, 5), (2, None)],
        "id long, item long",
    )
    got = _collect(set_similarity_join(df, "id", "item", 900_000))
    assert got == {(0, 1): (2, 2, 2, 2, DENOM)}


def test_hub_item_guard_raises(spark):
    # one item shared by every set -> prefix df explodes past the limit
    sets = {i: {999, 1000 + i} for i in range(30)}
    df = _mk(spark, sets)
    with pytest.raises(Exception, match="max_prefix_df"):
        set_similarity_join(df, "id", "item", 300_000, max_prefix_df=10).collect()
    # same data passes when the guard is sized (and matches brute force)
    got = _collect(set_similarity_join(df, "id", "item", 300_000, max_prefix_df=50))
    assert got == _brute(sets, 300_000)


def test_threshold_validation():
    with pytest.raises(ValueError):
        set_similarity_join(None, "id", "item", 0)
    with pytest.raises(ValueError):
        set_similarity_join(None, "id", "item", DENOM + 1)
