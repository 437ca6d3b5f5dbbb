"""Reciprocal-rank fusion — combining heterogeneous retrieval signals
into one ranking without score calibration.

A RAG/recommendation stack retrieves the same items through several
rankers whose raw scores are incomparable (cosine similarity vs BM25 vs
recency). RRF (Cormack, Clarke & Buettcher 2009, "Reciprocal Rank Fusion
outperforms Condorcet and individual rank learning methods") fuses on
RANKS alone: score(item) = sum over rankers of 1 / (k + rank). The
reference returns its single exact cosine top-5 (`vector_repository.py:
56-67`); a production retrieval layer fuses that with lexical and
freshness signals — this operator is that layer.

Everything stays on the integer grid: each contribution is
10^9 div (k + rank) (numerator large enough that distinct ranks never
collide after floor division for any k + rank <= ~30k), so fused scores
are engine-order-invariant BIGINTs — no float summation ceremony.

Scale shape: one union of the (already-ranked) inputs, one algebraic
sum groupBy (query, item), one per-query row_number window (partitioned
by query — never a global window) for the final top-n. Rankers are
expected to emit bounded per-query lists (top-m each), so the fused
set is O(queries * m * rankers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NUM = 1_000_000_000


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str,
    item_col: str,
    rank_col: str,
    k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Fuse per-query rankings (1-based rank_col) into (query, item,
    rrf_score, n_rankers, rank). Ties in fused score break by item
    ascending — deterministic on any engine. Items missing from a ranker
    simply contribute nothing for it (standard RRF)."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k < 0 or top_n <= 0:
        raise ValueError("k must be >= 0 and top_n > 0")
    stacked = None
    for r in rankings:
        part = r.select(
            F.col(query_col).alias("query"),
            F.col(item_col).alias("item"),
            F.expr(f"{_NUM} DIV ({int(k)} + CAST({rank_col} AS BIGINT))").alias(
                "_c"
            ),
        )
        stacked = part if stacked is None else stacked.unionAll(part)
    fused = stacked.groupBy("query", "item").agg(
        F.sum("_c").cast("bigint").alias("rrf_score"),
        F.count(F.lit(1)).cast("bigint").alias("n_rankers"),
    )
    w = Window.partitionBy("query").orderBy(
        F.col("rrf_score").desc(), F.col("item")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= top_n)
    )

# ------------------------------------------------------------------ BM25 --
#
# Lexical ranked retrieval — the standard BM25 scoring function (Robertson
# et al., TREC-3) over the same whitespace tokenization the inverted index
# exports, on the exact integer grid so scores (and therefore ranks) are
# engine/partitioning/retry-invariant. The reference retrieves by exact
# vector distance only (vector_repository.py:56-67); BM25 is the lexical
# half every production RAG stack fuses with it (see rrf_fuse).
#
# Two places BM25 needs a log/division that floats would make
# engine-dependent; both are made exact:
#
#   * idf = log2((N + 1) / (df + 0.5))  [Lucene's +1 form: never negative]
#     computed as a FIXED-POINT BASE-2 LOG over pure integers: the rational
#     is scaled to q = (2N+2) * 2^F div (2df+1), then floor(2^k * log2(q))
#     comes from the float-free exponent/mantissa algorithm below
#     (log2fp_chain) — both engines replay the identical arithmetic.
#   * the tf saturation (k1 = 1.2, b = 0.75 — the standard defaults) is a
#     rational in integers once avgdl = L/N is substituted symbolically:
#         tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
#       = 22*tf*L / (10*L*tf + 3*L + 9*dl*N)
#     so each term's score is ONE floor division in DECIMAL(38,0)/HUGEINT:
#         score_term = idf_fp * 22 * tf * L  div  (10*L*tf + 3*L + 9*dl*N)
#
# log2fp_chain: floor(2^k * log2(x)) for BIGINT x >= 1 with no floats.
#   e  = floor(log2(x))           -- length(bin(x)) - 1, exact in both engines
#   m0 = floor(x * 2^30 / 2^e)    -- mantissa normalized into [2^30, 2^31)
#   k refinement steps: square the mantissa (m*m < 2^62, BIGINT-safe),
#   rescale by 2^30; if the square crossed 2^31 the next log2 bit is 1 and
#   the mantissa halves. Each step is exact integer arithmetic; the result
#   is within [0, 2^-k) BITS below the true log2 (truncation is one-sided,
#   so the map stays monotone: x <= y  =>  log2fp(x) <= log2fp(y)).
#   power(2, e) is exactly representable in a double and IEEE-exact in
#   both engines, so the cast back to the wide integer type is exact.

_L2_HI = 2_147_483_648  # 2^31
_L2_SC = 1_073_741_824  # 2^30


def log2fp_chain(
    x_expr: str, k: int, div: str, wide: str, prefix: str = "_l2"
) -> list[tuple[str, str]]:
    """The (alias, sql_expr) chain computing floor(2^k * log2(x_expr)) —
    ONE source of truth rendered for either engine: Spark uses
    div='DIV', wide='DECIMAL(38,0)'; DuckDB uses div='//',
    wide='HUGEINT'. Each expr may reference earlier aliases (applied as
    chained projections on the Spark side, lateral column aliases on
    the DuckDB side). Final alias: f'{prefix}_a{k}'."""
    if k < 1 or k > 12:
        raise ValueError("k must be in [1, 12]")
    p = prefix
    cols: list[tuple[str, str]] = [
        (f"{p}_e", f"CAST(length(bin(CAST({x_expr} AS BIGINT))) - 1 AS BIGINT)"),
        (
            f"{p}_m0",
            f"CAST(CAST({x_expr} AS {wide}) * {_L2_SC} {div} "
            f"CAST(power(2, {p}_e) AS {wide}) AS BIGINT)",
        ),
        (f"{p}_a0", f"{p}_e"),
    ]
    for i in range(1, k + 1):
        cols.append((f"{p}_s{i}", f"({p}_m{i-1} * {p}_m{i-1}) {div} {_L2_SC}"))
        cols.append(
            (
                f"{p}_m{i}",
                f"CASE WHEN {p}_s{i} >= {_L2_HI} THEN {p}_s{i} {div} 2 "
                f"ELSE {p}_s{i} END",
            )
        )
        cols.append(
            (
                f"{p}_a{i}",
                f"{p}_a{i-1} * 2 + (CASE WHEN {p}_s{i} >= {_L2_HI} "
                f"THEN 1 ELSE 0 END)",
            )
        )
    return cols


def with_log2fp(df: DataFrame, x_col: str, out_col: str, k: int = 6) -> DataFrame:
    """Append out_col = floor(2^k * log2(x_col)) (x_col BIGINT >= 1;
    x < 1 raises executor-side — a non-positive log argument is an
    upstream bug, not a scorable row). Intermediates are dropped."""
    checked = (
        f"CASE WHEN {x_col} >= 1 THEN {x_col} "
        f"ELSE CAST(raise_error(concat('log2fp: x must be >= 1, got ', "
        f"CAST({x_col} AS STRING))) AS BIGINT) END"
    )
    chain = log2fp_chain(checked, k, div="DIV", wide="DECIMAL(38,0)")
    out = df
    for alias, expr in chain:
        out = out.withColumn(alias, F.expr(expr))
    return out.select(*df.columns, F.col(f"_l2_a{k}").cast("bigint").alias(out_col))


def log2fp_py(x: int, k: int) -> int:
    """Pure-Python replay of log2fp_chain (unit-test reference)."""
    if x < 1:
        raise ValueError("x must be >= 1")
    e = x.bit_length() - 1
    m = (x << 30) // (1 << e)
    acc = e
    for _ in range(k):
        s = (m * m) >> 30
        bit = 1 if s >= _L2_HI else 0
        acc = acc * 2 + bit
        m = s >> 1 if bit else s
    return acc


_IDF_F = 20  # fractional bits when scaling (N+1)/(df+0.5) onto the int grid


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    query_id_col: str,
    query_text_col: str,
    top_n: int = 10,
    log_bits: int = 6,
) -> DataFrame:
    """BM25 top-n per query: (query_id, doc_id, bm25_fp, n_terms, rank).

    bm25_fp is the score in units of 2^-log_bits BITS of idf (floor'd
    per term then summed — deterministic on any engine/partitioning).
    Query terms are deduplicated (query-side tf is ignored — the
    standard short-query simplification) and terms absent from the
    corpus contribute nothing. Docs with zero tokens are unrankable and
    absent. k1 = 1.2, b = 0.75 (the standard defaults, baked into the
    exact rational — see module comment).

    Scale shape: the corpus collapses to the inverted-index tables once
    — (term, doc, tf) with map-side partials, (doc, dl), (term, df) —
    and N/L are two collected scalars (pagerank scalar doctrine, never
    a 1-row crossJoin). The query side is tiny and broadcast into the
    term-keyed join; per-query top-n is a query-partitioned row_number
    (WindowGroupLimit pre-prunes map-side), never a global window."""
    if top_n <= 0:
        raise ValueError("top_n must be > 0")
    tok = lambda c: F.split(F.trim(F.lower(F.col(c))), r"\s+")  # noqa: E731
    td = (
        docs.select(F.col(id_col).alias("_d"), F.explode(tok(text_col)).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term", "_d")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    ).localCheckpoint()
    dl = td.groupBy("_d").agg(F.sum("tf").cast("long").alias("dl"))
    scal = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("l"),
    ).collect()[0]
    n_docs, l_tot = int(scal.n or 0), int(scal.l or 0)
    if n_docs == 0:
        raise ValueError("bm25_topk: corpus has no non-empty documents")
    stats = td.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = with_log2fp(
        stats.withColumn(
            "_q",
            F.expr(
                f"CAST(CAST({2 * n_docs + 2} AS DECIMAL(38,0)) * {1 << _IDF_F} "
                f"DIV (2 * df + 1) AS BIGINT)"
            ),
        ),
        "_q",
        "_lq",
        k=log_bits,
    ).select(
        "term",
        (F.col("_lq") - F.lit(_IDF_F * (1 << log_bits))).cast("long").alias("idf_fp"),
    )
    qt = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(tok(query_text_col)).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    hits = (
        qt.join(td, "term")
        .join(idf, "term")
        .join(dl, "_d")
        .withColumn(
            "_sc",
            F.expr(
                f"CAST(CAST(idf_fp AS DECIMAL(38,0)) * 22 * tf * {l_tot} DIV "
                f"(10 * CAST({l_tot} AS DECIMAL(38,0)) * tf + {3 * l_tot} "
                f"+ 9 * dl * {n_docs}) AS BIGINT)"
            ),
        )
    )
    scored = hits.groupBy("query_id", "_d").agg(
        F.sum("_sc").cast("long").alias("bm25_fp"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25_fp").desc(), F.col("_d")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= top_n)
        .select(
            "query_id",
            F.col("_d").alias("doc_id"),
            "bm25_fp",
            "n_terms",
            "rank",
        )
    )


def hybrid_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    query_id_col: str,
    query_text_col: str,
    lexical_top: int = 10,
    dense_top: int = 10,
    k: int = 60,
    top_n: int = 5,
) -> DataFrame:
    """Hybrid retrieval: BM25 (lexical) and hashed-TF cosine (dense)
    each produce a per-query top list; rrf_fuse combines them on ranks
    alone — the production RAG shape (incomparable raw scores, rank-only
    fusion). Returns rrf_fuse's (query, item, rrf_score, n_rankers,
    rank) with query/item aliased to query_id/doc_id.

    Dense scores are exact despite the doubles: TF counts are integers,
    so dots are exact sums; sqrt/divide are IEEE-correctly-rounded in
    any engine — identical doubles, identical order. Scale shape: both
    rankers end in query-partitioned row_numbers over already-pruned
    candidate sets; fusion is one union + algebraic sum."""
    from .disambiguate import cosine_scores, hashed_tf

    lex = bm25_topk(
        docs, queries, id_col, text_col, query_id_col, query_text_col,
        top_n=lexical_top,
    ).select(F.col("query_id").alias("q"), F.col("doc_id").alias("i"), "rank")
    dense_sc = cosine_scores(
        hashed_tf(queries, query_id_col, query_text_col),
        hashed_tf(docs, id_col, text_col),
    )
    wd = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    dense = (
        dense_sc.withColumn("rank", F.row_number().over(wd).cast("bigint"))
        .where(F.col("rank") <= dense_top)
        .select(F.col("qid").alias("q"), F.col("cid").alias("i"), "rank")
    )
    fused = rrf_fuse([lex, dense], "q", "i", "rank", k=k, top_n=top_n)
    return fused.select(
        F.col("query").alias("query_id"),
        F.col("item").alias("doc_id"),
        "rrf_score",
        "n_rankers",
        "rank",
    )


def mmr_rerank(
    candidates: DataFrame,
    pair_sims: DataFrame,
    query_col: str,
    id_col: str,
    rel_col: str,
    sim_col: str,
    k: int = 5,
    lambda_ppm: int = 700000,
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998):
    greedily pick k items per query maximizing
        lambda * relevance - (1 - lambda) * max-similarity-to-selected,
    the standard diversification pass between retrieval and a RAG
    context window — rrf_fuse (above) merges rankers, this stops the
    merged list from being five paraphrases of the same passage. The
    reference returns its raw exact cosine top-5 with no
    diversification (vector_repository.py:56-67).

    Inputs: `candidates` (query, id, rel) — the BOUNDED per-query pool
    (top-m from any retriever; the caller owns the bound, same contract
    as rrf_fuse's top-m rankings); `pair_sims` (query, id1, id2, sim)
    with BOTH orientations present (or none for a zero-sim pair —
    absent pairs read as similarity 0). rel and sim must live on the
    same integer grid (ppm Jaccard here); scores are then pure BIGINT:
    score = lambda_ppm*rel - (10^6-lambda_ppm)*max_sim, ties broken by
    id ascending — deterministic on any engine or partitioning.

    Output: (query, id, mmr_rank 1..k, rel, msim, score) where msim is
    the max similarity to the already-selected set at selection time
    (0 for rank 1).

    Scale shape: k is a small constant, so the greedy loop unrolls into
    k rounds of {anti-join out the selected, one equi-join of the
    selected picks against pair_sims, one algebraic max per candidate,
    one argmax per query via min(struct(-score, id))} — every step an
    equi-join or map-side-combining agg on the query key, no windows,
    no driver data movement. The inputs and each round's one-row-per-
    query pick are localCheckpoint'd (the winsorize shared-intermediate
    convention): `selected` feeds THREE places per round (anti-join,
    sim lookup, union), so an unmaterialized lineage would triple in
    size per round — 3^k plan blowup — where the pinned form keeps
    every round a constant-size plan over materialized inputs.
    Candidate and pair volumes are the caller's m and m^2 per query
    (document the m you feed it, as the contract query does with
    m=12)."""
    if not 1 <= int(k) <= 64:
        raise ValueError("k must be in [1, 64]")
    if not 0 <= int(lambda_ppm) <= 1_000_000:
        raise ValueError("lambda_ppm must be in [0, 1e6]")
    lam = int(lambda_ppm)
    q, d = query_col, id_col
    cand = candidates.select(
        F.col(q).alias("_q"), F.col(d).alias("_d"),
        F.col(rel_col).cast("long").alias("_rel"),
    ).localCheckpoint(eager=True)
    sims = pair_sims.select(
        F.col(q).alias("_q"), F.col(f"{d}1").alias("_d1"),
        F.col(f"{d}2").alias("_d2"), F.col(sim_col).cast("long").alias("_sim"),
    ).localCheckpoint(eager=True)

    def _pick(scored: DataFrame, rank: int) -> DataFrame:
        best = scored.groupBy("_q").agg(
            F.min(F.struct((-F.col("_score")).alias("ns"), F.col("_d").alias("d")))
            .alias("_b")
        )
        return (
            scored.join(best, "_q")
            .where(
                (F.col("_score") == -F.col("_b.ns")) & (F.col("_d") == F.col("_b.d"))
            )
            .select(
                "_q", "_d", F.lit(rank).cast("long").alias("mmr_rank"),
                "_rel", "_msim", "_score",
            )
        )

    first = _pick(
        cand.select(
            "_q", "_d", "_rel", F.lit(0).cast("long").alias("_msim"),
            (F.lit(lam) * F.col("_rel")).alias("_score"),
        ),
        1,
    )
    selected = first.localCheckpoint(eager=True)
    for r in range(2, int(k) + 1):
        rem = cand.join(selected.select("_q", "_d"), ["_q", "_d"], "left_anti")
        sel_sims = sims.join(
            selected.select("_q", F.col("_d").alias("_d2")), ["_q", "_d2"]
        )
        ms = (
            rem.join(
                sel_sims.select("_q", F.col("_d1").alias("_d"), "_sim"),
                ["_q", "_d"],
                "left",
            )
            .groupBy("_q", "_d", "_rel")
            .agg(F.coalesce(F.max("_sim"), F.lit(0)).cast("long").alias("_msim"))
        )
        scored = ms.select(
            "_q", "_d", "_rel", "_msim",
            (
                F.lit(lam) * F.col("_rel")
                - F.lit(1_000_000 - lam) * F.col("_msim")
            ).alias("_score"),
        )
        selected = selected.unionByName(_pick(scored, r)).localCheckpoint(
            eager=True
        )
    return selected.select(
        F.col("_q").alias(q), F.col("_d").alias(d), "mmr_rank",
        F.col("_rel").alias(rel_col), F.col("_msim").alias("msim"),
        F.col("_score").alias("score"),
    )


def min_cover_window(
    positions: DataFrame,
    query_col: str,
    id_col: str,
    pos_col: str,
    idx_col: str,
    nterms: DataFrame,
    max_terms: int = 8,
) -> DataFrame:
    """Minimal covering window — proximity relevance (the classic
    positional-IR signal, Clarke et al. 2000 "Relevance ranking for one
    to three term queries"): for each (query, doc) where the doc
    contains ALL the query's distinct terms, the length of the shortest
    token span containing at least one occurrence of each term. BM25
    (above) counts matches; this measures whether they CO-OCCUR — "fast
    hash join" in one phrase vs scattered over 400 tokens — the rerank
    signal between lexical retrieval and a cross-encoder.

    Inputs: `positions` (query, id, pos, idx) — one row per occurrence
    of a query term in a doc, pos the 0-based token position, idx the
    term's 1-based index among the query's DISTINCT terms (any fixed
    assignment; the contract uses alphabetical); `nterms` (query,
    n_terms) — the distinct-term count per query, <= max_terms (raises
    loudly beyond: widen the cap consciously, the range_join guard
    convention).

    Algorithm (the O(n log n) sweep, never the m^T occurrence
    cross-join): scanning each (query, doc)'s occurrences in position
    order, carry the LATEST seen position of every term index i —
    max(CASE idx=i THEN pos) over the running window, statically
    unrolled for i in 1..max_terms; a scan row is a valid window END
    iff all T carries are non-null, and its best window is
    [min(carries), pos]. The per-(query, doc) minimum (ties: smallest
    end) is the answer. Output: (query, id, n_terms, win_len, win_start,
    win_end) in token units, win_len = win_end - win_start + 1.

    Scale shape: ONE hash exchange on (query, doc) feeds the ordered
    carry window and the final argmin agg; the carries are fixed-width
    codegen'd CASE columns (an array, never a per-term join), so cost is
    the per-group sort — identical to any keyed window — and docs
    missing any term never produce a valid end, vanishing without a
    dedicated filter pass."""
    if not 1 <= int(max_terms) <= 16:
        raise ValueError("max_terms must be in [1, 16]")
    checked_T = F.when(
        F.col("_T").between(1, int(max_terms)), F.col("_T")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("min_cover_window: query "),
                F.col("_q").cast("string"),
                F.lit(f" has more distinct terms than max_terms={max_terms}"),
            )
        )
    )
    p = positions.select(
        F.col(query_col).alias("_q"), F.col(id_col).alias("_d"),
        F.col(pos_col).cast("long").alias("_p"),
        F.col(idx_col).cast("int").alias("_i"),
    )
    nt = nterms.select(
        F.col(query_col).alias("_q"), F.col("n_terms").alias("_T")
    ).select("_q", checked_T.alias("_T"))
    w = (
        Window.partitionBy("_q", "_d")
        .orderBy("_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carries = [
        F.max(F.when(F.col("_i") == i, F.col("_p"))).over(w)
        for i in range(1, int(max_terms) + 1)
    ]
    scanned = (
        p.join(F.broadcast(nt), "_q")
        .withColumn("_carr", F.array(*carries))
        .withColumn("_sl", F.slice(F.col("_carr"), 1, F.col("_T")))
        .where(
            F.size(F.filter(F.col("_sl"), lambda x: x.isNotNull()))
            == F.col("_T")
        )
        .select(
            "_q", "_d", "_T",
            (F.col("_p") - F.array_min("_sl") + 1).alias("_len"),
            F.array_min("_sl").alias("_ws"),
            F.col("_p").alias("_we"),
        )
    )
    best = scanned.groupBy("_q", "_d").agg(
        F.max("_T").alias("_Tm"),
        F.min(F.struct(F.col("_len").alias("l"), F.col("_we").alias("e"),
                       F.col("_ws").alias("s"))).alias("_b"),
    )
    return best.select(
        F.col("_q").alias(query_col),
        F.col("_d").alias(id_col),
        F.col("_Tm").cast("long").alias("n_terms"),
        F.col("_b.l").cast("long").alias("win_len"),
        F.col("_b.s").cast("long").alias("win_start"),
        F.col("_b.e").cast("long").alias("win_end"),
    )
