"""connected_components: driver union-find fast path vs distributed
hash-min loop must agree exactly (the fast path is an adaptive physical
strategy, not a semantic change)."""

from __future__ import annotations

import random

import pytest

from entity_extractor_spark.operators import graph as G


def _random_edges(seed: int, n_vertices: int, n_edges: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    return [
        (f"v{rng.randrange(n_vertices):04d}", f"v{rng.randrange(n_vertices):04d}")
        for _ in range(n_edges)
    ]


def _brute_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    # canonicalize to true min of each component
    comps: dict[str, list[str]] = {}
    for v in parent:
        comps.setdefault(find(v), []).append(v)
    return {v: min(vs) for r, vs in comps.items() for v in vs}


@pytest.mark.parametrize("seed,nv,ne", [(1, 50, 80), (2, 200, 150), (3, 30, 200)])
def test_small_path_matches_bruteforce(spark, seed, nv, ne):
    edges = _random_edges(seed, nv, ne)
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["vertex"]: r["component"] for r in G.connected_components(df).collect()}
    assert got == _brute_components(edges)


def test_distributed_path_matches_small_path(spark, monkeypatch):
    edges = _random_edges(7, 120, 100)
    df = spark.createDataFrame(edges, "src string, dst string")
    small = {r["vertex"]: r["component"] for r in G.connected_components(df).collect()}
    monkeypatch.setattr(G, "SMALL_GRAPH_EDGES", 0)
    dist = {r["vertex"]: r["component"] for r in G.connected_components(df).collect()}
    assert small == dist


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert G.connected_components(df).count() == 0
