"""triple_evidence, rrf_fuse, edge_lift, coarsen — unit gates for the
edge cases the contract rows don't isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.operators import graph as G
from entity_extractor_spark.operators.kg_quality import triple_evidence
from entity_extractor_spark.operators.ranking import rrf_fuse


def test_triple_evidence_rollup(spark):
    obs = spark.createDataFrame(
        [
            ("a", "p", "x", "s1", "2024-01-03"),
            ("a", "p", "x", "s1", "2024-01-01"),
            ("a", "p", "x", "s2", "2024-01-02"),
            ("b", "p", "y", "s1", "2024-02-01"),
        ],
        "subj string, pred string, obj string, source string, ts string",
    )
    rows = {r.subj: r for r in triple_evidence(obs, k=2).collect()}
    a = rows["a"]
    assert (a.support, a.n_sources, a.first_seen, a.last_seen) == (
        3, 2, "2024-01-01", "2024-01-03",
    )
    assert a.confidence_ppm == 3 * 1_000_000 // 5
    assert rows["b"].confidence_ppm == 1_000_000 // 3
    with pytest.raises(ValueError):
        triple_evidence(obs, k=-1)


def test_rrf_fuse_math_and_ties(spark):
    ra = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2)], "q int, i string, r int"
    )
    rb = spark.createDataFrame(
        [(1, "y", 1), (1, "z", 2)], "q int, i string, r int"
    )
    out = {
        r.item: r
        for r in rrf_fuse([ra, rb], "q", "i", "r", k=60, top_n=3).collect()
    }
    # y: 1e9//62 + 1e9//61 beats x: 1e9//61 and z: 1e9//62
    assert out["y"].n_rankers == 2
    assert out["y"].rrf_score == 10**9 // 62 + 10**9 // 61
    assert [out["y"].rank, out["x"].rank, out["z"].rank] == [1, 2, 3]
    with pytest.raises(ValueError):
        rrf_fuse([], "q", "i", "r")


def test_rrf_tiebreak_by_item(spark):
    ra = spark.createDataFrame(
        [(1, "b", 1), (1, "a", 2)], "q int, i string, r int"
    )
    rb = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2)], "q int, i string, r int"
    )
    rows = rrf_fuse([ra, rb], "q", "i", "r", top_n=2).collect()
    by_rank = sorted((r.rank, r.item) for r in rows)
    assert by_rank == [(1, "a"), (2, "b")]  # equal scores -> item asc


def test_edge_lift_known_values(spark):
    # pairs: (1,2) c=4, (1,3) c=1, (2,3) c=1; T=6
    pc = spark.createDataFrame(
        [(1, 2, 4), (1, 3, 1), (2, 3, 1)], "src int, dst int, n int"
    )
    rows = G.edge_lift(pc, top_k=10, min_support=1).collect()
    got = {(r.src, r.dst): (r.c_ab, r.lift_ppm) for r in rows}
    # deg: 1->5, 2->5, 3->2
    assert got[(1, 2)] == (4, 4 * 6 * 1_000_000 // (5 * 5))
    assert got[(1, 3)] == (1, 1 * 6 * 1_000_000 // (5 * 2))
    # min_support prunes the c=1 edges
    assert {(r.src, r.dst) for r in G.edge_lift(pc, 10, min_support=2).collect()} == {(1, 2)}


def test_edge_lift_empty_and_validation(spark):
    pc = spark.createDataFrame([], "src int, dst int, n int")
    assert G.edge_lift(pc, top_k=5).count() == 0
    with pytest.raises(ValueError):
        G.edge_lift(pc, top_k=0)


def test_coarsen_self_loops_and_missing_label(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src int, dst int"
    )
    labels = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B")], "vertex int, label string"
    )
    out = {(r.label_a, r.label_b): r.n_edges
           for r in G.coarsen(edges, labels).collect()}
    assert out == {("A", "B"): 2}
    full = {(r.label_a, r.label_b): r.n_edges
            for r in G.coarsen(edges, labels, keep_self_loops=True).collect()}
    assert full == {("A", "A"): 1, ("A", "B"): 2, ("B", "B"): 1}
    partial = labels.where(F.col("vertex") != 4)
    with pytest.raises(Exception, match="label map|assert"):
        G.coarsen(edges, partial).collect()


def test_modularity_two_cliques_bridge(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "src int, dst int",
    )
    labels = spark.createDataFrame(
        [(v, "A" if v <= 3 else "B") for v in range(1, 7)],
        "vertex int, label string",
    )
    r = G.modularity(edges, labels).collect()[0]
    # Q = 2*(3/7 - (7/14)^2) = 5/14 -> floor(357142.857) ppm
    assert (r.m_edges, r.n_communities, r.q_ppm) == (7, 2, 357142)


def test_modularity_negative_floor(spark):
    # path 1-2-3-4, labels {1},{2},{3,4}: Q = -2/36 -> floor(-55555.55)
    # = -55556; a truncating division would report -55555
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src int, dst int"
    )
    labels = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C"), (4, "C")], "vertex int, label string"
    )
    r = G.modularity(edges, labels).collect()[0]
    assert (r.m_edges, r.n_communities, r.q_ppm) == (3, 3, -55556)


def test_modularity_guards(spark):
    import pytest as _pt

    labels = spark.createDataFrame([(1, "A"), (2, "A")], "vertex int, label string")
    loop = spark.createDataFrame([(1, 1)], "src int, dst int")
    with _pt.raises(Exception, match="self-loop|assert"):
        G.modularity(loop, labels).collect()
    edges = spark.createDataFrame([(1, 3)], "src int, dst int")
    with _pt.raises(Exception, match="label map|assert"):
        G.modularity(edges, labels).collect()
    empty = spark.createDataFrame([], "src int, dst int")
    assert G.modularity(empty, labels).count() == 0


def test_vocab_coverage_hand_case(spark):
    from entity_extractor_spark.operators.text_quality import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a a b b 9", "g"), (2, "a a b c d", "g")],
        "doc_id int, text string, lang string",
    )
    rows = {
        r.target_pct: r
        for r in vocab_coverage(docs, "text", "lang", (50, 90, 99)).collect()
    }
    # freqs: a=5, b=3, c=1, d=1 (total 10; '9' filtered)
    assert (rows[50].vocab_size, rows[50].covered_tokens) == (1, 5)
    assert (rows[90].vocab_size, rows[90].covered_tokens) == (3, 9)
    assert (rows[99].vocab_size, rows[99].covered_tokens) == (4, 10)
    assert rows[50].total_tokens == 10
    import pytest as _pt

    with _pt.raises(ValueError):
        vocab_coverage(docs, "text", "lang", (0, 50))
