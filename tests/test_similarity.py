"""Embedding near-dup blocking: adaptive signature width + banded recall.

Gates the two 100-TB properties of embedding_near_dup_pairs:
  * cardinality — signature bits grow with corpus size so bucket occupancy
    (and with it the within-bucket self-join) stays ~TARGET_BUCKET_ROWS,
    i.e. candidate pairs are LINEAR in the corpus, not n^2/2^const;
  * recall — wider signatures drop borderline pairs; independent bands
    (MinHash-LSH style) win them back without touching precision (the
    cosine inside the block is exact)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from entity_extractor_spark.operators.similarity import (
    TARGET_BUCKET_ROWS,
    adaptive_signature_bits,
    embedding_near_dup_pairs,
    hyperplane_signature,
)

DIMS = 8


def _vec_df(spark, arr: np.ndarray):
    rows = [(str(i).zfill(6), [float(x) for x in v]) for i, v in enumerate(arr)]
    return spark.createDataFrame(rows, "vec_id string, embedding array<float>")


def test_adaptive_bits_formula():
    assert adaptive_signature_bits(0) == 8
    assert adaptive_signature_bits(TARGET_BUCKET_ROWS) == 8
    assert adaptive_signature_bits(64 * 2**9) == 9
    assert adaptive_signature_bits(64 * 2**9 + 1) == 10
    assert adaptive_signature_bits(10**9) == 24  # hi clamp
    # monotone non-decreasing
    widths = [adaptive_signature_bits(n) for n in (10, 10**4, 10**6, 10**8, 10**10)]
    assert widths == sorted(widths)


def test_near_dup_adaptive_bucket_cardinality(spark):
    """20k corpus -> 9-bit signature; max bucket and candidate-pair mass
    stay far below the fixed-8-bit quadratic blowup."""
    n = 20_000
    rng = np.random.RandomState(7)
    df = _vec_df(spark, rng.standard_normal((n, DIMS))).cache()
    bits = adaptive_signature_bits(n)
    assert bits == 9
    sizes = (
        df.select(hyperplane_signature(F.col("embedding"), DIMS, bits).alias("b"))
        .groupBy("b").count().select("count").collect()
    )
    counts = [r["count"] for r in sizes]
    assert max(counts) < n / 10  # no runaway bucket
    cand_pairs = sum(c * (c - 1) // 2 for c in counts)
    assert cand_pairs < n * n / 50  # blocking removed >= 98% of all pairs
    df.unpersist()


def test_near_dup_banding_recall_and_exact_precision(spark):
    """Planted ~0.96-cos pairs at threshold 0.95: 4 bands recover pairs a
    single wide signature loses; every reported pair is a true pair."""
    rng = np.random.RandomState(11)
    base = rng.standard_normal((150, DIMS))
    # near-duplicates: small additive noise => cos ~0.95-0.99
    dup = base + 0.18 * rng.standard_normal((150, DIMS))
    noise = rng.standard_normal((300, DIMS))
    arr = np.vstack([base, dup, noise])
    df = _vec_df(spark, arr).cache()

    # ground truth over ALL pairs (exact numpy cosine)
    nrm = arr / np.linalg.norm(arr, axis=1, keepdims=True)
    cos = nrm @ nrm.T
    ids = [str(i).zfill(6) for i in range(len(arr))]
    truth = {
        (ids[i], ids[j])
        for i in range(len(arr))
        for j in range(i + 1, len(arr))
        if cos[i, j] >= 0.95 - 1e-9
    }
    assert len(truth) >= 50  # the plant worked

    single = {
        (r["id1"], r["id2"])
        for r in embedding_near_dup_pairs(df, DIMS, bits=12, n_bands=1).collect()
    }
    banded = {
        (r["id1"], r["id2"])
        for r in embedding_near_dup_pairs(df, DIMS, bits=12, n_bands=4).collect()
    }
    slack = {
        (ids[i], ids[j])
        for i in range(len(arr))
        for j in range(i + 1, len(arr))
        if cos[i, j] >= 0.95 - 1e-4
    }
    assert single <= slack and banded <= slack  # exact cosine -> no false pairs
    assert single <= banded  # band 0 is the single-band family
    assert len(banded) > len(single)  # extra bands recovered lost pairs
    assert len(banded) >= 0.8 * len(truth)
    df.unpersist()


def test_topk_excludes_zero_norm_vectors(spark):
    """Zero-norm embeddings (e.g. token-less chunks) must be excluded from
    cosine top-k — not crash with ANSI DIVIDE_BY_ZERO, not rank first."""
    from entity_extractor_spark.operators.similarity import brute_force_topk

    rows = [("a", [1.0, 0.0]), ("z", [0.0, 0.0]), ("b", [0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    got = brute_force_topk(df, [1.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in got] == ["a", "b"]
    assert got[0]["rank"] == 1


def test_topk_zero_query_vector_is_empty(spark):
    from entity_extractor_spark.operators.similarity import brute_force_topk

    df = spark.createDataFrame([("a", [1.0, 0.0])], "vec_id string, embedding array<float>")
    assert brute_force_topk(df, [0.0, 0.0], k=3).count() == 0


def test_kmeans_centroids_deterministic_and_complete(spark):
    """Lloyd refinement must be partitioning-invariant (the 6-decimal mean
    rounding is what pins it) and keep one centroid per cell even when a
    cell loses all members."""
    from entity_extractor_spark.operators.similarity import kmeans_centroids

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=DIMS)]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    def centdict(d):
        return {r["cid"]: tuple(r["cv"]) for r in d.collect()}

    c1 = centdict(kmeans_centroids(df, n_cells=4, n_iter=2))
    c2 = centdict(kmeans_centroids(df.repartition(7), n_cells=4, n_iter=2))
    assert c1 == c2
    assert sorted(c1) == [0, 1, 2, 3]
    # refinement moved the seeds (means differ from the raw seed vectors)
    seeds = {r["vec_id"]: tuple(float(x) for x in r["embedding"]) for r in df.where("vec_id < 4").collect()}
    assert any(c1[c] != seeds[c] for c in c1)


def test_multiprobe_supersets_single_bucket(spark):
    """Multi-probe candidates contain the exact-bucket candidates, so
    recall@k can only go up; radius=0 degenerates to lsh_bucketed_topk."""
    from entity_extractor_spark.operators import similarity as S

    rng = np.random.default_rng(11)
    df = _vec_df(spark, rng.normal(size=(400, DIMS)))
    qv = [float(x) for x in df.where("vec_id = '000000'").head()["embedding"]]
    rest = df.where("vec_id <> '000000'")
    single = S.lsh_bucketed_topk(rest, qv, dims=DIMS, k=10, bits=5)
    multi = S.lsh_multiprobe_topk(rest, qv, dims=DIMS, k=10, bits=5, radius=1)
    zero = S.lsh_multiprobe_topk(rest, qv, dims=DIMS, k=10, bits=5, radius=0)
    exact = S.brute_force_topk(rest, qv, "vec_id", "embedding", 10)

    ids = lambda d: {r["vec_id"] for r in d.select("vec_id").collect()}  # noqa: E731
    assert ids(zero) == ids(single)
    ex = ids(exact)
    assert len(ids(multi) & ex) >= len(ids(single) & ex)
    # the probe ball at radius 1 genuinely widens the candidate set
    assert multi.count() >= single.count()


def test_hamming_ball():
    from entity_extractor_spark.operators.similarity import hamming_ball

    assert hamming_ball("00", 0) == ["00"]
    assert hamming_ball("00", 1) == ["00", "01", "10"]
    ball = hamming_ball("101", 2)
    assert "101" in ball and len(ball) == 1 + 3 + 3
    assert ball == sorted(set(ball))


def test_rp_projection_matches_python_replay(spark):
    import random

    from entity_extractor_spark.operators import similarity as S

    rng = random.Random(5)
    rows = [
        (i, [rng.randrange(-127, 128) for _ in range(8)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, qvec array<int>")
    got = {
        r.vec_id: list(r.rvec)
        for r in S.rp_project_coded(df, in_dim=8, out_dim=4).collect()
    }
    for vid, vec in rows:
        exp = [
            sum(v * S.rp_sign(i, j) for i, v in enumerate(vec))
            for j in range(4)
        ]
        assert got[vid] == exp, vid
    # driver-side twin agrees with the distributed projection
    assert S.rp_query(rows[0][1], 4) == got[rows[0][0]]


def test_rp_projection_guards(spark):
    import pytest

    from entity_extractor_spark.operators import similarity as S

    df = spark.createDataFrame([(1, [1, 2, 3])], "vec_id long, qvec array<int>")
    with pytest.raises(Exception, match="expected 8-dim"):
        S.rp_project_coded(df, in_dim=8, out_dim=4).collect()
    with pytest.raises(ValueError):
        S.rp_project_coded(df, in_dim=3, out_dim=0)


def test_rp_topk_prefers_aligned_vectors(spark):
    from entity_extractor_spark.operators import similarity as S

    # the projected dot must still rank an identical vector above an
    # anti-aligned one: JL preserves sign structure of large dots
    base = [100, -50, 80, -20, 60, -90, 40, -10]
    rows = [(1, base), (2, [-v for v in base]), (3, [0] * 8)]
    df = spark.createDataFrame(rows, "vec_id long, qvec array<int>")
    proj = S.rp_project_coded(df, in_dim=8, out_dim=6)
    q = S.rp_query(base, 6)
    out = {r.vec_id: r for r in S.rp_topk(proj, q, k=3).collect()}
    assert out[1].rank == 1
    assert out[1].qscore > 0 and out[2].qscore == -out[1].qscore
    assert out[3].qscore == 0
