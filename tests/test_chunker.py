"""X4 chunker + S8 embed-and-write tests.

The fixed chunker is gated by an exact pure-Python replay (same
sequence/filter/substring algebra); the semantic chunker is gated by a full
pure-Python replay of the reference pipeline (sentence split -> hashed-TF
cosine distances -> Q3 + 1.5*IQR breakpoints -> cumulative grouping ->
fallback resplit), mirroring embedding_service.py:36-68 semantics."""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import functions as F

from entity_extractor_spark.operators.chunker import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    build_chunk_embeddings,
    chunk_documents,
    embed_chunks,
    semantic_chunk_documents,
)
from entity_extractor_spark.operators.disambiguate import N_BUCKETS

DOCS = [
    ("d1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ("d2", "short"),
    ("d3", "x" * 120),          # exactly one chunk at size 120
    ("d4", "y" * 121),          # one char past -> second chunk
    ("d5", "word " * 80),       # long, trailing space
]


# ------------------------------------------------------------- pure-Python --


def py_chunk_starts(L: int, size: int, step: int) -> list[int]:
    hi = max(L - 1, 0)
    return [s for s in range(0, hi + 1, step) if s == 0 or s - step + size < L]


def py_chunks(doc_id: str, text: str, size: int, overlap: int):
    step = size - overlap
    L = len(text)
    out = []
    for idx, s in enumerate(py_chunk_starts(L, size, step)):
        out.append(
            (doc_id, idx, f"{doc_id}:{idx}", text[s : s + size], s, min(s + size, L))
        )
    return out


def py_bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:12], 16) % N_BUCKETS


def py_tf(text: str) -> dict[int, float]:
    v: dict[int, float] = {}
    for tok in re.split(r"\s+", text.lower()):
        if tok:
            b = py_bucket(tok)
            v[b] = v.get(b, 0.0) + 1.0
    return v


def py_cos(a: dict[int, float], b: dict[int, float]) -> float:
    dot = sum(a[k] * b[k] for k in a.keys() & b.keys())
    na = math.sqrt(sum(x * x for x in a.values()))
    nb = math.sqrt(sum(x * x for x in b.values()))
    return dot / (na * nb) if na > 0 and nb > 0 else 0.0


def py_percentile(xs: list[float], p: float) -> float:
    """Spark exact F.percentile: linear interpolation at p*(n-1)."""
    s = sorted(xs)
    pos = p * (len(s) - 1)
    lo = int(math.floor(pos))
    frac = pos - lo
    return s[lo] if frac == 0 else s[lo] + frac * (s[lo + 1] - s[lo])


def py_semantic_chunks(doc_id: str, text: str, iqr: float, max_chars: int):
    sents = [s for s in re.split(r"(?<=[.!?])\s+", text) if s.strip() != ""]
    if len(sents) < 3:
        groups = [sents] if sents else []
    else:
        dists = [1.0 - py_cos(py_tf(sents[i]), py_tf(sents[i + 1])) for i in range(len(sents) - 1)]
        thr = py_percentile(dists, 0.75) + iqr * (
            py_percentile(dists, 0.75) - py_percentile(dists, 0.25)
        )
        groups = [[sents[0]]]
        for i in range(1, len(sents)):
            if dists[i - 1] > thr:
                groups.append([])
            groups[-1].append(sents[i])
    out, idx = [], 0
    step = CHUNK_SIZE - CHUNK_OVERLAP
    for g in groups:
        gtext = " ".join(g)
        pieces = (
            [gtext]
            if len(gtext) <= max_chars
            else [gtext[s : s + CHUNK_SIZE] for s in py_chunk_starts(len(gtext), CHUNK_SIZE, step)]
        )
        for p in pieces:
            out.append((doc_id, idx, f"{doc_id}:{idx}", p, len(g)))
            idx += 1
    return out


# -------------------------------------------------------------------- fixed --


def test_fixed_chunker_matches_python_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    got = sorted(
        tuple(r)
        for r in chunk_documents(df, chunk_size=120, overlap=24)
        .select("doc_id", "chunk_idx", "chunk_id", "text", "start_offset", "end_offset")
        .collect()
    )
    want = sorted(c for d, t in DOCS for c in py_chunks(d, t, 120, 24))
    assert got == want


def test_fixed_chunker_overlap_reconstructs_text(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    rows = (
        chunk_documents(df, chunk_size=120, overlap=24)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    by_doc: dict[str, str] = {}
    for r in rows:
        prev = by_doc.get(r["doc_id"], "")
        # drop the overlap prefix on every chunk after the first
        by_doc[r["doc_id"]] = prev + (r["text"] if r["chunk_idx"] == 0 else r["text"][24:])
    assert by_doc == dict(DOCS)


def test_fixed_chunker_no_trailing_contained_chunk(spark):
    # L = exactly chunk_size -> 1 chunk; L = chunk_size+1 -> 2 chunks
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    counts = {
        r["doc_id"]: r["n"]
        for r in chunk_documents(df, chunk_size=120, overlap=24)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts["d2"] == 1 and counts["d3"] == 1 and counts["d4"] == 2


def test_fixed_chunker_plan_has_no_shuffle(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow map only


# ----------------------------------------------------------------- semantic --


SEM_DOCS = [
    ("s1", "The cat sat on the mat. The cat sat on a hat. "
           "Quarterly revenue grew nine percent! Revenue margins improved. "
           "The cat returned home."),
    ("s2", "One sentence only."),
    ("s3", "Two sentences here. Second one."),
    ("s4", "spark spark spark. spark spark. totally different words now? "
           "unrelated vocabulary appears! spark spark again."),
    # one semantic group (identical sentences) long enough to force the
    # fixed-fallback resplit at max_chunk_chars
    ("s5", " ".join(["aaaa bbbb cccc dddd." for _ in range(400)])),
]


def test_semantic_chunker_matches_python_replay(spark):
    df = spark.createDataFrame(SEM_DOCS, "doc_id string, text string")
    got = sorted(
        tuple(r)
        for r in semantic_chunk_documents(df)
        .select("doc_id", "chunk_idx", "chunk_id", "text", "n_sentences")
        .collect()
    )
    want = sorted(
        c for d, t in SEM_DOCS for c in py_semantic_chunks(d, t, 1.5, 2 * CHUNK_SIZE)
    )
    assert got == want
    # s5 is one semantic group >4000 chars -> fallback resplit kicked in
    assert sum(1 for c in want if c[0] == "s5") > 1


# -------------------------------------------------------------------- embed --


def test_embed_chunks_dense_matches_python_tf(spark):
    df = spark.createDataFrame(DOCS + [("empty", "   ")], "chunk_id string, text string")
    rows = {r["chunk_id"]: r["embedding"] for r in embed_chunks(df).collect()}
    for doc_id, text in DOCS:
        sparse = py_tf(text)
        want = [float(sparse.get(b, 0.0)) for b in range(N_BUCKETS)]
        assert rows[doc_id] == want
    assert rows["empty"] == [0.0] * N_BUCKETS  # tokenless text -> zero vector


def test_build_chunk_embeddings_writes_ann_compatible_table(spark, tmp_path):
    from entity_extractor_spark.operators.similarity import brute_force_topk

    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    table = build_chunk_embeddings(
        spark, df, str(tmp_path), chunk_size=120, overlap=24
    )
    assert set(table.columns) == {"chunk_id", "doc_id", "chunk_idx", "embedding"}
    assert table.schema["embedding"].dataType.simpleString() == "array<float>"
    q = [1.0] + [0.0] * (N_BUCKETS - 1)
    top = brute_force_topk(table, q, id_col="chunk_id", vec_col="embedding", k=3)
    assert top.count() == 3


def test_whitespace_doc_survives_semantic_chunker_and_rag_topk(spark):
    """A whitespace-only document flows through semantic chunk -> embed ->
    cosine top-k without ANSI DIVIDE_BY_ZERO and without vanishing: it
    yields one empty chunk (doc set preserved, like the fixed chunker)
    whose zero-norm embedding is excluded from ranking."""
    from entity_extractor_spark.operators.chunker import embed_chunks, semantic_chunk_documents
    from entity_extractor_spark.operators.similarity import brute_force_topk

    docs = spark.createDataFrame(
        [("d1", "Water is wet. Fire is hot. Ice is cold."), ("d2", "   "), ("d3", "")],
        "doc_id string, text string",
    )
    chunks = semantic_chunk_documents(docs)
    by_doc = {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()}
    assert by_doc == {"d1", "d2", "d3"}
    emb = embed_chunks(chunks)
    top = brute_force_topk(emb, [1.0] * 64, id_col="chunk_id", k=10).collect()
    assert len(top) >= 1
    assert all(not r["vec_id"].startswith(("d2", "d3")) for r in top)


def test_pack_sequences_python_replay_and_invariance(spark):
    """pack_sequences == the pure-Python concat-and-cut replay (md5-bucket
    order within shards), and the layout survives repartitioning."""
    from entity_extractor_spark.operators.chunker import pack_sequences
    from entity_extractor_spark.operators.sampling import DENOM

    import random

    rng = random.Random(31)
    rows = [(i, rng.randrange(0, 900)) for i in range(300)] + [(999, 0)]
    df = spark.createDataFrame(rows, "doc_id bigint, tok bigint")
    got = {
        r["doc_id"]: (r["shard"], r["start_bin"], r["end_bin"], r["bin_offset"])
        for r in pack_sequences(df, "doc_id", "tok", budget=500, shards=4).collect()
    }

    def bucket_and_shard(doc_id: int) -> tuple[int, int]:
        # ordering bucket = hex chars 0-12; shard = the INDEPENDENT slice
        # (chars 12-24), mirroring pack_sequences' substring(h,13,12)
        h = hashlib.md5(f"{doc_id}|pack0".encode()).hexdigest()
        return int(h[:12], 16) % DENOM, int(h[12:24], 16) % 4

    shards: dict[int, list[tuple[int, int, int]]] = {}
    for did, tok in rows:
        b, sh = bucket_and_shard(did)
        shards.setdefault(sh, []).append((b, did, tok))
    expect = {}
    for sh, members in shards.items():
        cum = 0
        for b, did, tok in sorted(members):
            start = cum // 500
            end = (cum + tok - 1) // 500 if tok > 0 else start
            expect[did] = (sh, start, end, cum % 500)
            cum += tok
    assert got == expect

    got17 = {
        r["doc_id"]: (r["shard"], r["start_bin"], r["end_bin"], r["bin_offset"])
        for r in pack_sequences(
            df.repartition(17), "doc_id", "tok", budget=500, shards=4
        ).collect()
    }
    assert got17 == got
    # every doc with tokens spans a contiguous, budget-consistent range
    assert all(s <= e for _, (sh, s, e, off) in got.items())
