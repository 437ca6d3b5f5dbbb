"""BM25 + fixed-point log2: exactness vs pure-Python replays, ranking
sanity, and the DuckDB render of the shared log2fp chain."""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.operators.ranking import (
    bm25_topk,
    log2fp_chain,
    log2fp_py,
    with_log2fp,
)


def test_log2fp_py_bounds_and_monotone():
    rng = random.Random(7)
    xs = sorted(
        {1, 2, 3, (1 << 62) - 1}
        | {rng.randrange(1, 1 << 62) for _ in range(500)}
    )
    prev = -1
    for x in xs:
        got = log2fp_py(x, 6)
        true = math.log2(x) * 64
        # one-sided truncation: within [0, 1) fixed-point units below the
        # true value (float-evaluated here, hence the 1e-6 slack)
        assert true - 1 - 1e-6 < got <= true + 1e-6
        assert got >= prev
        prev = got


def test_log2fp_spark_matches_python(spark):
    rng = random.Random(11)
    xs = [1, 2, 3, 7, (1 << 62) - 1] + [
        rng.randrange(1, 1 << 62) for _ in range(200)
    ]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    rows = with_log2fp(df, "x", "l2", k=6).collect()
    for r in rows:
        assert r.l2 == log2fp_py(r.x, 6), r.x


def test_log2fp_duckdb_render_matches_python():
    rng = random.Random(13)
    xs = [1, 2, 3, (1 << 62) - 1] + [rng.randrange(1, 1 << 62) for _ in range(200)]
    chain = log2fp_chain("x", 6, div="//", wide="HUGEINT")
    cols = ", ".join(f"{e} AS {a}" for a, e in chain)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest($1::BIGINT[]) AS x", [xs]
    )
    got = dict(
        con.sql(f"SELECT x, _l2_a6 FROM (SELECT x, {cols} FROM t)").fetchall()
    )
    for x in xs:
        assert got[x] == log2fp_py(x, 6), x


def test_log2fp_rejects_nonpositive(spark):
    df = spark.createDataFrame([(0,)], "x long")
    with pytest.raises(Exception, match="log2fp"):
        with_log2fp(df, "x", "l2").collect()


def _bm25_py(docs: dict[str, str], queries: dict[str, str], log_bits=6):
    """Pure-Python replay of bm25_topk's integer formulas."""
    td: dict[tuple[str, str], int] = {}
    dl: dict[str, int] = {}
    for d, text in docs.items():
        toks = text.lower().split()
        if not toks:
            continue
        dl[d] = len(toks)
        for t in toks:
            td[(t, d)] = td.get((t, d), 0) + 1
    n, l_tot = len(dl), sum(dl.values())
    df: dict[str, int] = {}
    for (t, _d) in td:
        df[t] = df.get(t, 0) + 1
    f_bits = 20
    idf = {
        t: log2fp_py(((2 * n + 2) << f_bits) // (2 * v + 1), log_bits)
        - f_bits * (1 << log_bits)
        for t, v in df.items()
    }
    out = {}
    for q, qtext in queries.items():
        scores: dict[str, list[int]] = {}
        for t in set(qtext.lower().split()):
            if t not in idf:
                continue
            for d in dl:
                tf = td.get((t, d))
                if not tf:
                    continue
                sc = (idf[t] * 22 * tf * l_tot) // (
                    10 * l_tot * tf + 3 * l_tot + 9 * dl[d] * n
                )
                scores.setdefault(d, []).append(sc)
        ranked = sorted(
            ((sum(v), len(v), d) for d, v in scores.items()),
            key=lambda r: (-r[0], r[2]),
        )
        out[q] = [(d, s, m) for s, m, d in ranked]
    return out


def test_bm25_matches_python_replay(spark):
    rng = random.Random(3)
    vocab = ["spark", "scan", "join", "hash", "sort", "agg", "row", "col"]
    docs = {
        f"d{i}": " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 30)))
        for i in range(40)
    }
    docs["empty"] = "   "
    queries = {"q1": "spark join", "q2": "sort agg row", "q3": "zzz unknown"}
    ddf = spark.createDataFrame(list(docs.items()), "doc_id string, text string")
    qdf = spark.createDataFrame(list(queries.items()), "qid string, qtext string")
    got = bm25_topk(ddf, qdf, "doc_id", "text", "qid", "qtext", top_n=10)
    ref = _bm25_py(docs, queries)
    by_q: dict[str, list] = {}
    for r in got.orderBy("query_id", "rank").collect():
        by_q.setdefault(r.query_id, []).append((r.doc_id, r.bm25_fp, r.n_terms))
    for q, exp in ref.items():
        assert by_q.get(q, []) == exp[:10], q
    assert "q3" not in by_q  # no corpus term -> no rows


def test_bm25_ranking_sanity(spark):
    # a short doc with both terms must beat a long one with one term;
    # the rare term outweighs the common one at equal tf/dl.
    docs = [
        ("both", "rare common"),
        ("one_long", "common common common common common common common"),
        ("rare_only", "rare filler"),
        ("common_only", "common filler"),
    ] + [(f"pad{i}", "common filler") for i in range(6)]
    ddf = spark.createDataFrame(docs, "doc_id string, text string")
    qdf = spark.createDataFrame([("q", "rare common")], "qid string, qtext string")
    rows = bm25_topk(ddf, qdf, "doc_id", "text", "qid", "qtext", top_n=10).collect()
    ranked = [r.doc_id for r in sorted(rows, key=lambda r: r.rank)]
    assert ranked[0] == "both"
    assert ranked.index("rare_only") < ranked.index("common_only")
    with pytest.raises(ValueError):
        bm25_topk(ddf, qdf, "doc_id", "text", "qid", "qtext", top_n=0)


def test_bm25_empty_corpus_raises(spark):
    ddf = spark.createDataFrame([("d", "  ")], "doc_id string, text string")
    qdf = spark.createDataFrame([("q", "x")], "qid string, qtext string")
    with pytest.raises(ValueError, match="no non-empty"):
        bm25_topk(ddf, qdf, "doc_id", "text", "qid", "qtext")


def test_hybrid_topk_fuses_both_rankers(spark):
    from entity_extractor_spark.operators.ranking import hybrid_topk

    # "lexonly" shares rare exact terms with the query (BM25 finds it);
    # "denseonly" is made dense-similar by repeating one query token so
    # its hashed-TF vector points the same way.
    docs = [
        ("both", "alpha beta"),
        ("lexonly", "alpha beta gamma delta epsilon zeta"),
        ("denseonly", "alpha alpha alpha alpha alpha alpha alpha alpha"),
    ] + [(f"pad{i}", "omicron sigma tau") for i in range(5)]
    ddf = spark.createDataFrame(docs, "doc_id string, text string")
    qdf = spark.createDataFrame([("q", "alpha beta")], "qid string, qtext string")
    rows = {
        r.doc_id: r
        for r in hybrid_topk(
            ddf, qdf, "doc_id", "text", "qid", "qtext",
            lexical_top=2, dense_top=2, top_n=5,
        ).collect()
    }
    # "both" tops both rankers -> n_rankers == 2 and rank 1
    assert rows["both"].n_rankers == 2 and rows["both"].rank == 1
    # the ranker-specific docs each survive with one contribution
    assert rows["lexonly"].n_rankers == 1
    assert rows["denseonly"].n_rankers == 1


# ---------------------------------------------------------------- mmr_rerank --


def _mmr(spark, cand_rows, sim_rows, k=3, lam=500000):
    from entity_extractor_spark.operators.ranking import mmr_rerank

    cand = spark.createDataFrame(cand_rows, "q string, doc string, rel long")
    sims = spark.createDataFrame(
        sim_rows, "q string, doc1 string, doc2 string, sim long"
    )
    return [
        (r["q"], r["doc"], r["mmr_rank"], r["msim"])
        for r in mmr_rerank(cand, sims, "q", "doc", "rel", "sim", k, lam)
        .orderBy("q", "mmr_rank")
        .collect()
    ]


def test_mmr_diversifies_against_pure_relevance(spark):
    """b is the 2nd-most relevant but nearly identical to a; MMR at
    lambda=0.5 picks the dissimilar c second instead."""
    cand = [("q", "a", 900000), ("q", "b", 800000), ("q", "c", 500000)]
    sims = []
    for x, y, s in [("a", "b", 950000), ("a", "c", 50000), ("b", "c", 60000)]:
        sims += [("q", x, y, s), ("q", y, x, s)]
    out = _mmr(spark, cand, sims)
    assert out == [
        ("q", "a", 1, 0),
        ("q", "c", 2, 50000),   # 0.5*500k-0.5*50k  > 0.5*800k-0.5*950k
        ("q", "b", 3, 950000),
    ]


def test_mmr_pure_relevance_at_lambda_1(spark):
    cand = [("q", "a", 900000), ("q", "b", 800000), ("q", "c", 500000)]
    sims = [("q", "a", "b", 999999), ("q", "b", "a", 999999)]
    out = _mmr(spark, cand, sims, lam=1_000_000)
    assert [d for (_, d, _, _) in out] == ["a", "b", "c"]


def test_mmr_exhaustion_ties_and_missing_sims(spark):
    """Fewer candidates than k -> short list; absent sim pairs read as
    0; score ties break by id ascending."""
    cand = [("q1", "a", 700000), ("q1", "b", 700000), ("q2", "z", 100000)]
    out = _mmr(spark, cand, [], k=5)
    assert out == [
        ("q1", "a", 1, 0), ("q1", "b", 2, 0), ("q2", "z", 1, 0),
    ]


def test_mmr_validation(spark):
    import pytest
    from entity_extractor_spark.operators.ranking import mmr_rerank

    cand = spark.createDataFrame([("q", "a", 1)], "q string, doc string, rel long")
    sims = spark.createDataFrame([], "q string, doc1 string, doc2 string, sim long")
    with pytest.raises(ValueError, match="k must be"):
        mmr_rerank(cand, sims, "q", "doc", "rel", "sim", k=0)
    with pytest.raises(ValueError, match="lambda_ppm"):
        mmr_rerank(cand, sims, "q", "doc", "rel", "sim", lambda_ppm=2_000_000)


# ---------------------------------------------------------- min_cover_window --


def _mcw(spark, pos_rows, nt_rows, max_terms=4):
    from entity_extractor_spark.operators.ranking import min_cover_window

    p = spark.createDataFrame(
        pos_rows, "query_id string, doc_id long, pos long, idx int"
    )
    nt = spark.createDataFrame(nt_rows, "query_id string, n_terms long")
    return {
        (r["query_id"], r["doc_id"]): (
            r["n_terms"], r["win_len"], r["win_start"], r["win_end"]
        )
        for r in min_cover_window(
            p, "query_id", "doc_id", "pos", "idx", nt, max_terms
        ).collect()
    }


def test_mcw_known_answer(spark):
    """doc tokens: t1 . . t2 t1 t2 -> best window for {t1,t2} is [3,4]
    len 2, not the [0,3] len 4 that greedy-first would give."""
    pos = [
        ("q", 1, 0, 1), ("q", 1, 3, 2), ("q", 1, 4, 1), ("q", 1, 5, 2),
        # doc 2 misses idx 2 entirely -> absent
        ("q", 2, 0, 1), ("q", 2, 9, 1),
    ]
    out = _mcw(spark, pos, [("q", 2)])
    assert out == {("q", 1): (2, 2, 3, 4)}


def test_mcw_brute_force_replay(spark):
    import random

    rng = random.Random(11)
    docs = {}
    for d in range(30):
        docs[d] = [rng.randrange(0, 5) for _ in range(rng.randrange(3, 40))]
    T = 3  # terms are token values 0,1,2 with idx = value+1
    pos_rows, want = [], {}
    for d, toks in docs.items():
        for p, t in enumerate(toks):
            if t < T:
                pos_rows.append(("q", d, p, t + 1))
        best = None
        for i in range(len(toks)):
            seen = {}
            for j in range(i, len(toks)):
                if toks[j] < T:
                    seen[toks[j]] = j
                if len(seen) == T:
                    cand = (j - i + 1, j, i)
                    if toks[i] < T and (best is None or cand < best):
                        best = cand
                    break
        if best:
            want[("q", d)] = (T, best[0], best[2], best[1])
    got = _mcw(spark, pos_rows, [("q", T)])
    assert got == want


def test_mcw_guards(spark):
    import pytest
    from entity_extractor_spark.operators.ranking import min_cover_window

    p = spark.createDataFrame(
        [("q", 1, 0, 1)], "query_id string, doc_id long, pos long, idx int"
    )
    big = spark.createDataFrame([("q", 9)], "query_id string, n_terms long")
    with pytest.raises(Exception, match="more distinct terms"):
        min_cover_window(p, "query_id", "doc_id", "pos", "idx", big, 4).collect()
    with pytest.raises(ValueError, match="max_terms"):
        min_cover_window(p, "query_id", "doc_id", "pos", "idx", big, 0)
