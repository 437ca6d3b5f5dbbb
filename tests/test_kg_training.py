"""negative_sample / random_walks gates: determinism, filtered-positive
semantics, python replay of the hash draws, dead-end and argument edges."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.operators.kg_training import negative_sample, random_walks


def _h48(*parts) -> int:
    s = "|".join(str(p) for p in parts)
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_negative_sample_matches_python_replay(spark):
    triples = [(1, "r", 10), (2, "r", 20), (1, "s", 30)]
    ents = [(e,) for e in (10, 20, 30, 40, 50)]
    tdf = spark.createDataFrame(triples, "src long, rel string, dst long")
    edf = spark.createDataFrame(ents, "entity long")
    got = sorted(
        (r["src"], r["rel"], r["dst"], r["trial"])
        for r in negative_sample(tdf, edf, 3, salt="t").collect()
    )
    # python replay: permutation index by (md5(e|t), e), draw, filter
    order = sorted((e,) for (e,) in ents)
    perm = sorted((_h48(e, "t"), e) for (e,) in ents)
    idx2ent = {i: e for i, (_, e) in enumerate(perm)}
    positives = set(triples)
    exp = []
    for s, r, d in triples:
        for j in range(3):
            cand = idx2ent[_h48(s, r, d, j, "t") % len(ents)]
            if (s, r, cand) not in positives:
                exp.append((s, r, cand, j))
    assert got == sorted(exp)
    assert len(got) > 0


def test_negative_sample_never_emits_positives(spark):
    """With only 2 entities both of which are true tails for src 1/rel r,
    every draw collides and the output is empty for that (src, rel)."""
    tdf = spark.createDataFrame(
        [(1, "r", 10), (1, "r", 20)], "src long, rel string, dst long"
    )
    edf = spark.createDataFrame([(10,), (20,)], "entity long")
    out = negative_sample(tdf, edf, 4)
    assert out.count() == 0


def test_negative_sample_validates_args(spark):
    tdf = spark.createDataFrame([(1, "r", 10)], "src long, rel string, dst long")
    edf = spark.createDataFrame([(10,)], "entity long")
    with pytest.raises(ValueError):
        negative_sample(tdf, edf, 0)
    empty = spark.createDataFrame([], "entity long")
    with pytest.raises(ValueError):
        negative_sample(tdf, empty, 1)


def test_random_walks_matches_python_replay(spark):
    edges = [(1, 2), (2, 3), (3, 4), (1, 3), (2, 4)]
    starts = [(1,), (4,)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame(starts, "vertex long")
    got = sorted(
        (r["start"], r["step"], r["vertex"])
        for r in random_walks(edf, sdf, 3, salt="w").collect()
    )
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    exp = []
    for (s,) in starts:
        cur = s
        exp.append((s, 0, s))
        for t in range(1, 4):
            cur = min(adj[cur], key=lambda c: (_h48(cur, t, c, "w"), c))
            exp.append((s, t, cur))
    assert got == sorted(exp)


def test_random_walks_dead_end_stops(spark):
    """An isolated start vertex yields only its step-0 row."""
    edf = spark.createDataFrame([(1, 2)], "src long, dst long")
    sdf = spark.createDataFrame([(9,)], "vertex long")
    got = [(r["start"], r["step"], r["vertex"]) for r in random_walks(edf, sdf, 5).collect()]
    assert got == [(9, 0, 9)]


def test_random_walks_zero_length(spark):
    edf = spark.createDataFrame([(1, 2)], "src long, dst long")
    sdf = spark.createDataFrame([(1,)], "vertex long")
    got = [(r["start"], r["step"], r["vertex"]) for r in random_walks(edf, sdf, 0).collect()]
    assert got == [(1, 0, 1)]


# -------------------------------------------------------- sampled adjacency --

def test_sampled_adjacency_star_caps_hub_only(spark):
    from entity_extractor_spark.operators.kg_training import sampled_adjacency

    edges = [("hub", f"l{i}") for i in range(6)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["vertex"]: r for r in sampled_adjacency(df, fanout=3).collect()}
    hub = got["hub"]
    assert (hub["degree"], hub["k_sampled"]) == (6, 3)
    picked = hub["neighbors_csv"].split(",")
    assert len(picked) == 3 and set(picked) <= {f"l{i}" for i in range(6)}
    # hash-determined pick: smallest _hash48(hub, leaf), leaf tiebreak
    want = sorted(
        sorted((f"l{i}" for i in range(6)),
               key=lambda d: (_h48("hub", d), d))[:3]
    )
    assert picked == want
    for i in range(6):
        leaf = got[f"l{i}"]
        assert (leaf["degree"], leaf["k_sampled"], leaf["neighbors_csv"]) == (
            1, 1, "hub",
        )


def test_sampled_adjacency_deterministic_across_partitionings(spark):
    from entity_extractor_spark.operators.kg_training import sampled_adjacency

    rng = __import__("random").Random(62)
    edges = [(f"v{rng.randrange(30)}", f"v{rng.randrange(30)}") for _ in range(150)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, sampled_adjacency(df, fanout=4).collect()))
    b = sorted(map(tuple, sampled_adjacency(df.repartition(5), fanout=4).collect()))
    assert a == b


def test_sampled_adjacency_validates(spark):
    from entity_extractor_spark.operators.kg_training import sampled_adjacency

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        sampled_adjacency(df, fanout=0)


def test_hard_negatives_properties(spark):
    import math

    import pytest as _pt

    from entity_extractor_spark.operators.kg_training import hard_negatives

    rng = __import__("random").Random(7)
    dims = 8
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dims)], i % 3)
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>, label int"
    )
    out = hard_negatives(df, dims=dims, bits=2, bands=2, k=4).collect()
    assert out, "small corpus with 4 buckets must produce candidates"
    # replicate quantization driver-side from the FLOAT32 values Spark saw
    f32 = {i: [float(__import__("numpy").float32(x)) for x in v] for i, v, _ in rows}
    ma = max(abs(x) for v in f32.values() for x in v)
    q = {i: [math.floor(x * 127.0 / ma + 0.5) for x in v] for i, v in f32.items()}
    lab = {i: l for i, _, l in rows}
    per_anchor: dict[int, list] = {}
    for r in out:
        assert lab[r.anchor] != lab[r.negative]
        assert r.qscore == sum(a * b for a, b in zip(q[r.anchor], q[r.negative]))
        per_anchor.setdefault(r.anchor, []).append((r.rank, r.qscore, r.negative))
    for a, lst in per_anchor.items():
        lst.sort()
        assert [r for r, _, _ in lst] == list(range(1, len(lst) + 1))
        scores = [s for _, s, _ in lst]
        assert scores == sorted(scores, reverse=True)
        assert len(lst) <= 4
    with _pt.raises(ValueError):
        hard_negatives(df, dims=dims, k=0)


# -------------------------------------------------------- mention contexts --

def test_mention_contexts_brute(spark):
    """Random corpora vs a pure-Python window replay — every occurrence
    (including repeats in one doc), edge truncation, and blank docs."""
    import random

    from entity_extractor_spark.operators.kg_training import mention_contexts

    rng = random.Random(61)
    vocab = ["join", "scan", "row", "x", "y", "z"]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12))))
        for d in range(40)
    ] + [(90, ""), (91, "   "), (92, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kws = ["join", "row"]
    got = {
        (r.doc_id, r.pos): (r.keyword, r.left_ctx, r.right_ctx)
        for r in mention_contexts(df, "doc_id", "text", kws, k=3).collect()
    }
    want = {}
    for d, tx in rows:
        toks = tx.strip().lower().split() if tx else []
        for i, t in enumerate(toks):
            if t in kws:
                want[(d, i)] = (
                    t,
                    " ".join(toks[max(i - 3, 0) : i]),
                    " ".join(toks[i + 1 : i + 4]),
                )
    assert got == want
    assert want, "test premise: at least one hit"


def test_mention_contexts_validates(spark):
    import pytest

    from entity_extractor_spark.operators.kg_training import mention_contexts

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        mention_contexts(df, "doc_id", "text", [], k=4)
    with pytest.raises(ValueError):
        mention_contexts(df, "doc_id", "text", ["a"], k=0)


# ---------------------------------------------------------- mention_salience --


def test_salience_formula_and_positions(spark):
    from entity_extractor_spark.operators.kg_training import mention_salience

    # 10 tokens; 'spark' at 0 and 8; 'join' at 9; 'absent' never
    doc = "spark a b c d e f g spark join"
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    out = {
        r["keyword"]: r.asDict()
        for r in mention_salience(df, "doc_id", "text", ["spark", "join", "absent"]).collect()
    }
    assert set(out) == {"spark", "join"}
    s = out["spark"]
    assert (s["n_mentions"], s["first_pos"], s["last_pos"], s["spread"]) == (2, 0, 8, 8)
    # early = (10-0)*1e6//10 = 1e6; freq = 2*1e6//10 = 200000
    assert s["salience_ppm"] == (7 * 1_000_000 + 3 * 200_000) // 10
    j = out["join"]
    # early = (10-9)*1e6//10 = 100000; freq = 100000
    assert j["salience_ppm"] == (7 * 100_000 + 3 * 100_000) // 10
    # first-position dominance: spark must outrank join
    assert s["salience_ppm"] > j["salience_ppm"]


def test_salience_case_blank_and_validation(spark):
    import pytest
    from entity_extractor_spark.operators.kg_training import mention_salience

    df = spark.createDataFrame(
        [(1, "SPARK spark Spark"), (2, "   "), (3, "")],
        "doc_id long, text string",
    )
    out = mention_salience(df, "doc_id", "text", ["Spark"]).collect()
    assert len(out) == 1 and out[0]["n_mentions"] == 3  # case-folded both sides
    assert out[0]["salience_ppm"] == 1_000_000  # early 1e6, freq 1e6
    with pytest.raises(ValueError, match="keywords"):
        mention_salience(df, "doc_id", "text", [])
    with pytest.raises(ValueError, match="early_weight"):
        mention_salience(df, "doc_id", "text", ["x"], early_weight=11)
