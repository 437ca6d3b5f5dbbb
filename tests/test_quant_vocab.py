"""Int8 scalar quantization (similarity.quantized_topk) and tokenizer
vocabulary / OOV-rate (text_quality.build_vocab/oov_stats) unit gates.

Quantization gate: codes are floor(v*L/ma + 0.5) in pure IEEE double ops —
hand-computable, bounded in [-L, L] by construction, and the integer-dot
ranking key is exact BIGINT arithmetic (the cross-engine property the
ann_quantized_topk contract row relies on)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.operators.similarity import (
    QUANT_LEVELS,
    corpus_max_abs,
    quantize_embeddings,
    quantized_topk,
)
from entity_extractor_spark.operators.text_quality import build_vocab, oov_stats


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_quantize_known_codes(spark):
    # ma = 2.0; scale = 127/2 = 63.5
    df = _emb(spark, [(1, [2.0, -2.0, 1.0, 0.0]), (2, [0.5, -0.5, 0.25, 2.0])])
    assert corpus_max_abs(df) == 2.0
    got = {r["vec_id"]: r["qvec"] for r in quantize_embeddings(df).collect()}
    # floor(v*63.5 + 0.5): 2.0->127, -2.0->floor(-126.5)=-127, 1.0->64 (63.5+0.5),
    # 0.0->0, 0.5->floor(32.25)=32, -0.5->floor(-31.25)=-32, 0.25->floor(16.375)=16
    assert got[1] == [127, -127, 64, 0]
    assert got[2] == [32, -32, 16, 127]
    # bounded by construction
    for codes in got.values():
        assert all(-QUANT_LEVELS <= c <= QUANT_LEVELS for c in codes)


def test_quantized_topk_exact_integer_ranking(spark):
    corpus = _emb(
        spark,
        [
            (10, [1.0, 0.0, 0.0, 0.0]),
            (11, [1.0, 1.0, 0.0, 0.0]),
            (12, [-1.0, 0.0, 0.0, 0.0]),
            (13, [0.0, 0.0, 1.0, 0.0]),
        ],
    )
    out = quantized_topk(corpus, [1.0, 1.0, 0.0, 0.0], k=3, max_abs=1.0).collect()
    # query codes = [127,127,0,0]; qscores: 11 -> 127*127*2=32258,
    # 10 -> 16129, 13 -> 0, 12 -> -16129 (cut by k=3)
    assert [(r["vec_id"], r["qscore"], r["rank"]) for r in out] == [
        (11, 32258, 1),
        (10, 16129, 2),
        (13, 0, 3),
    ]


def test_quantized_query_matches_corpus_codes(spark):
    # the driver-side query quantization must be bit-identical to the
    # distributed corpus quantization for the same vector
    vec = [0.37, -1.93, 0.005, 1.2]
    df = _emb(spark, [(0, vec)])
    ma = 1.93
    spark_codes = quantize_embeddings(df, max_abs=ma).head()["qvec"]
    # replicate quantized_topk's driver-side path; float32 storage means the
    # corpus side quantizes the float32-rounded value — do the same here
    import struct

    f32 = [struct.unpack("f", struct.pack("f", v))[0] for v in vec]
    py_codes = [int(math.floor(v * float(QUANT_LEVELS) / ma + 0.5)) for v in f32]
    assert list(spark_codes) == py_codes


def test_corpus_max_abs_rejects_zero(spark):
    df = _emb(spark, [(1, [0.0, 0.0])])
    with pytest.raises(ValueError):
        corpus_max_abs(df)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_build_vocab_deterministic_tiebreak(spark):
    d = _docs(spark, [(1, "a a b c"), (2, "a d")])
    v = build_vocab(d, "doc_id", "text", vocab_size=2).collect()
    # tf: a=3, b=c=d=1 -> tie broken by term asc -> b
    assert [(r["term"], r["tf"]) for r in v] == [("a", 3), ("b", 1)]


def test_oov_stats_known_answer(spark):
    d = _docs(spark, [(1, "a a b c"), (2, "a d"), (3, "   ")])
    out = {
        r["doc_id"]: (r["total_tokens"], r["oov_tokens"], r["oov_ppm"])
        for r in oov_stats(d, "doc_id", "text", vocab_size=2).collect()
    }
    # vocab = {a, b}; doc1: 4 tokens, oov c -> 1 -> 250000 ppm
    # doc2: 2 tokens, oov d -> 1 -> 500000 ppm; doc3: no tokens -> no row
    assert out == {1: (4, 1, 250000), 2: (2, 1, 500000)}


def test_oov_stats_explicit_vocab(spark):
    d = _docs(spark, [(1, "x y z z")])
    v = spark.createDataFrame([("z",)], "term string")
    row = oov_stats(d, "doc_id", "text", vocab=v).head()
    assert (row["total_tokens"], row["oov_tokens"], row["oov_ppm"]) == (4, 2, 500000)


# ------------------------------------------------------ product quantization
from entity_extractor_spark.operators.similarity import (  # noqa: E402
    pq_codebooks,
    pq_encode,
    pq_topk,
    quantize_embeddings as _qe,
)


def test_pq_known_answer(spark):
    # 4 dims, m=2 subspaces of 2; centroids = rows 0,1; ma = 1.0
    rows = [
        (0, [1.0, 0.0, 0.0, 1.0]),   # centroid 0: subs [127,0] / [0,127]
        (1, [0.0, 1.0, 1.0, 0.0]),   # centroid 1: subs [0,127] / [127,0]
        (2, [1.0, 0.0, 1.0, 0.0]),   # codes -> [0, 1]
        (3, [0.0, 1.0, 0.0, 1.0]),   # codes -> [1, 0]
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    coded = _qe(df, max_abs=1.0)
    books = pq_codebooks(coded, m=2, k_c=2)
    assert books[0] == [[127, 0], [0, 127]] and books[1] == [[0, 127], [127, 0]]
    enc = {r["vec_id"]: list(r["codes"]) for r in pq_encode(coded, books).collect()}
    assert enc == {0: [0, 0], 1: [1, 1], 2: [0, 1], 3: [1, 0]}
    # query = row 2's vector: ADC dist to row 2 itself is 0; row 3 is the
    # opposite assignment -> dist = 2 subspace distances of 127^2*2 each
    out = pq_topk(df, [1.0, 0.0, 1.0, 0.0], m=2, k_c=2, k=4, max_abs=1.0,
                  exclude_ids=[0, 1]).collect()
    assert [(r["vec_id"], r["pq_dist"], r["rank"]) for r in out] == [
        (2, 0, 1),
        (3, 4 * 127 * 127, 2),
    ]


def test_pq_assignment_tie_breaks_low_cid(spark):
    # two identical centroids: assignment must pick cid 0
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    coded = _qe(df, max_abs=1.0)
    books = pq_codebooks(coded, m=1, k_c=2)
    enc = {r["vec_id"]: list(r["codes"]) for r in pq_encode(coded, books).collect()}
    assert enc[2] == [0]


def test_pq_rejects_bad_shapes(spark):
    df = _emb(spark, [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])])
    coded = _qe(df, max_abs=1.0)
    with pytest.raises(ValueError):
        pq_codebooks(coded, m=2, k_c=2)  # 3 dims not divisible by 2
    with pytest.raises(ValueError):
        pq_codebooks(coded, m=1, k_c=5)  # only 2 seed rows


def test_pq_codebooks_ids_need_not_start_at_zero(spark):
    # seeds are the first k_c rows by id ORDER, not id VALUE
    rows = [(1000 + i, [float(i % 3), 1.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    coded = _qe(df, max_abs=2.0)
    books = pq_codebooks(coded, m=1, k_c=4)
    assert len(books[0]) == 4  # rows 1000..1003, by order


# ------------------------------------------------------------------ IVF-PQ
from entity_extractor_spark.operators.similarity import ivf_pq_topk  # noqa: E402


def test_ivf_pq_probe_all_equals_pq(spark):
    """With n_probe = n_cells the coarse stage prunes nothing, so IVF-PQ
    must reproduce pq_topk exactly (same codebooks, same ADC table, same
    ranking) — the composition adds only the cell filter."""
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qv = rows[0][1]
    want = [
        (r["vec_id"], r["pq_dist"], r["rank"])
        for r in pq_topk(df, qv, m=2, k_c=4, k=5, exclude_ids=[0]).collect()
    ]
    got = [
        (r["vec_id"], r["pq_dist"], r["rank"])
        for r in ivf_pq_topk(
            df, qv, n_cells=4, n_probe=4, m=2, k_c=4, k=5, exclude_ids=[0]
        ).collect()
    ]
    assert got == want


def test_ivf_pq_prunes_to_probed_cells(spark):
    """On a corpus with two well-separated clusters, probing 1 of 2 cells
    must return only vectors coarse-assigned to the query's cell — the
    pruning that cuts the ADC scan to ~n_probe/n_cells of the corpus."""
    # cluster A around +e0, cluster B around +e1; ids interleaved so the
    # first-2 training-free centroids (ids 0,1) land one in each cluster
    rows = []
    for i in range(20):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0, 0.0]
        rows.append((i, [v + 0.01 * ((i % 5) - 2) * v for v in base]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qv = [1.0, 0.05, 0.0, 0.0]  # clearly cluster A (even ids)
    out = ivf_pq_topk(
        df, qv, n_cells=2, n_probe=1, m=2, k_c=4, k=10, exclude_ids=[0]
    ).collect()
    assert len(out) > 0
    assert all(r["vec_id"] % 2 == 0 for r in out), [r["vec_id"] for r in out]
