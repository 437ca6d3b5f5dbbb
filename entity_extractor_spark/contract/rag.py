"""RAG lifecycle (X4/S8): chunkers, chunk retrieval, BM25 ranking/eval, hybrid RRF, MMR, proximity rerank.

Split out of the former monolithic contract.py (round-4, VERDICT ask #6);
query registration happens via the shared @query decorator into the
aggregating contract.Q / contract.SQL dicts in _shared.py.
"""
from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import Window  # noqa: F401

from ._shared import *  # noqa: F401,F403



@query(
    "x4_chunk_fixed",
    f"""WITH {_CHUNK_SQL_BODY}
        SELECT doc_id, chunk_idx, chunk_id, text, start_offset, end_offset
        FROM chunks""",
)
def x4_chunk_fixed(spark, sf_dir):
    """X4 — fixed-window chunker (the reference's
    RecursiveCharacterTextSplitter(2000,200) fallback, constants.py:122-130;
    parameters scaled to the test corpus so multi-chunk docs + the
    no-trailing-contained-chunk rule are exercised). Pure column algebra;
    DuckDB replays the identical sequence/substr windows."""
    from ..operators.chunker import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, "doc_id", "text", chunk_size=120, overlap=24)


@query(
    "rag_chunk_topk",
    f"""WITH {_CHUNK_SQL_BODY},
        t AS (
          SELECT chunk_id AS id, tok FROM (
            SELECT chunk_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM chunks) WHERE tok != ''
        ),
        cv AS (SELECT id, {_TFIDF_BUCKET_SQL} AS bucket, CAST(count(*) AS DOUBLE) AS tf
               FROM t GROUP BY 1, 2),
        q AS (
          SELECT tok FROM (SELECT unnest(string_split_regex(lower(
            'hash join order by window agg scan'), '\\s+')) AS tok) WHERE tok != ''
        ),
        qv AS (SELECT {_TFIDF_BUCKET_SQL} AS bucket, CAST(count(*) AS DOUBLE) AS tf
               FROM q GROUP BY 1),
        qn AS (SELECT sqrt(sum(tf * tf)) AS qnorm FROM qv),
        cn AS (SELECT id, sqrt(sum(tf * tf)) AS cnorm FROM cv GROUP BY 1 HAVING sum(tf * tf) > 0),
        dots AS (SELECT cv.id, sum(qv.tf * cv.tf) AS dot
                 FROM cv JOIN qv USING (bucket) GROUP BY 1),
        scores AS (SELECT cn.id, ROUND(COALESCE(dot, 0.0) / (qnorm * cnorm), 5) AS score
                   FROM cn LEFT JOIN dots ON cn.id = dots.id CROSS JOIN qn),
        ranked AS (SELECT id, score,
                          row_number() OVER (ORDER BY score DESC, id ASC) AS rn
                   FROM scores)
        SELECT id AS chunk_id, score, CAST(rn AS BIGINT) AS rank
        FROM ranked WHERE rn <= 20""",
)
def rag_chunk_topk(spark, sf_dir):
    """S8 + W1 — the full RAG lifecycle (§3.3): chunk the corpus (X4),
    embed every chunk (dense hashed-TF), WRITE the embeddings table (the
    pgvector-table analog, vector_repository.py:16-54), then rank the
    written table against a query embedding with the distributed top-k.
    The DuckDB oracle replays chunking, the md5 bucket formula and the
    cosine ranking end-to-end. TF counts are integers, so every sum is
    exact in double and the engines agree bit-for-bit before ROUND."""
    import tempfile

    from ..operators.chunker import build_chunk_embeddings, embed_chunks
    from ..operators.similarity import brute_force_topk

    d = _t(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="rag_s8_")
    table = build_chunk_embeddings(spark, d, out, chunk_size=120, overlap=24)

    qdf = spark.createDataFrame([("q", "hash join order by window agg scan")], "id string, text string")
    qvec = [float(x) for x in embed_chunks(qdf, "id", "text").collect()[0]["embedding"]]
    top = brute_force_topk(table, qvec, id_col="chunk_id", vec_col="embedding", k=20)
    return top.select(F.col("vec_id").alias("chunk_id"), "score", "rank")


@query(
    "x4_chunk_semantic",
    f"""WITH d AS (
         SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                replace(text, ' the ', '. ') AS mod
         FROM documents),
       lists AS (
         SELECT doc_id,
                list_filter(string_split(replace(mod, '. ', '.' || chr(30)), chr(30)),
                            s -> trim(s) != '') AS ss
         FROM d),
       sents AS (
         SELECT doc_id, CAST(i - 1 AS BIGINT) AS sent_idx, ss[i] AS sentence
         FROM (SELECT doc_id, ss, unnest(range(1, len(ss) + 1)) AS i FROM lists)),
       toks AS (
         SELECT doc_id, sent_idx, tok FROM (
           SELECT doc_id, sent_idx,
                  unnest(string_split_regex(lower(sentence), '\\s+')) AS tok
           FROM sents) WHERE tok != ''),
       v AS (SELECT doc_id, sent_idx, {_TFIDF_BUCKET_SQL} AS bucket,
                    CAST(count(*) AS DOUBLE) AS tf
             FROM toks GROUP BY 1, 2, 3),
       dots AS (SELECT a.doc_id, a.sent_idx AS i, sum(a.tf * b.tf) AS dot
                FROM v a JOIN v b ON a.doc_id = b.doc_id AND a.bucket = b.bucket
                                 AND b.sent_idx = a.sent_idx + 1
                GROUP BY 1, 2),
       norms AS (SELECT doc_id, sent_idx, sqrt(sum(tf * tf)) AS nrm
                 FROM v GROUP BY 1, 2),
       gaps AS (
         SELECT na.doc_id, na.sent_idx AS i,
                1.0 - COALESCE(dt.dot / (na.nrm * nb.nrm), 0.0) AS dist
         FROM norms na
         JOIN norms nb ON na.doc_id = nb.doc_id AND nb.sent_idx = na.sent_idx + 1
         LEFT JOIN dots dt ON dt.doc_id = na.doc_id AND dt.i = na.sent_idx),
       qs AS (SELECT doc_id, list_sort(list(dist)) AS ds,
                     count(*) AS n_gaps
              FROM gaps GROUP BY 1),
       pos AS (SELECT doc_id, ds, n_gaps,
                      0.75 * (n_gaps - 1) AS p3, 0.25 * (n_gaps - 1) AS p1
               FROM qs),
       thr AS (
         SELECT doc_id, n_gaps, q3 + 1.5 * (q3 - q1) AS threshold FROM (
           SELECT doc_id, n_gaps,
                  CASE WHEN floor(p3) = ceil(p3)
                       THEN ds[CAST(p3 AS BIGINT) + 1]
                       ELSE (ceil(p3) - p3) * ds[CAST(floor(p3) AS BIGINT) + 1]
                          + (p3 - floor(p3)) * ds[CAST(ceil(p3) AS BIGINT) + 1]
                  END AS q3,
                  CASE WHEN floor(p1) = ceil(p1)
                       THEN ds[CAST(p1 AS BIGINT) + 1]
                       ELSE (ceil(p1) - p1) * ds[CAST(floor(p1) AS BIGINT) + 1]
                          + (p1 - floor(p1)) * ds[CAST(ceil(p1) AS BIGINT) + 1]
                  END AS q1
           FROM pos)),
       breaks AS (
         SELECT g.doc_id, g.i + 1 AS sent_idx,
                CASE WHEN g.dist > t.threshold AND t.n_gaps >= 2
                     THEN 1 ELSE 0 END AS brk
         FROM gaps g JOIN thr t ON g.doc_id = t.doc_id),
       marked AS (
         SELECT s.doc_id, s.sent_idx, s.sentence, COALESCE(b.brk, 0) AS brk
         FROM sents s LEFT JOIN breaks b
           ON s.doc_id = b.doc_id AND s.sent_idx = b.sent_idx),
       grouped AS (
         SELECT doc_id, sent_idx, sentence,
                sum(brk) OVER (PARTITION BY doc_id ORDER BY sent_idx
                               ROWS UNBOUNDED PRECEDING) AS grp
         FROM marked),
       chunks AS (
         SELECT doc_id, grp, string_agg(sentence, ' ' ORDER BY sent_idx) AS text,
                count(*) AS n_sentences
         FROM grouped GROUP BY 1, 2)
       SELECT doc_id,
              CAST(row_number() OVER (PARTITION BY doc_id ORDER BY grp) - 1
                   AS INT) AS chunk_idx,
              concat(doc_id, ':',
                     CAST(row_number() OVER (PARTITION BY doc_id ORDER BY grp) - 1
                          AS VARCHAR)) AS chunk_id,
              text, n_sentences
       FROM chunks""",
)
def x4_chunk_semantic(spark, sf_dir):
    """X4 proper — the SEMANTIC chunker's IQR-breakpoint semantics
    (embedding_service.py:36-68), cross-engine value-checked: corpus text
    sentence-ified by a literal ' the ' -> '. ' replace (the raw corpus
    has no punctuation, which would make this gate vacuous), split on the
    sentence regex, consecutive-sentence hashed-TF cosine distances,
    per-doc breakpoint threshold Q3 + 1.5*IQR with Spark's EXACT
    percentile interpolation ((hi-pos)*lower + (pos-lo)*upper — replayed
    verbatim in the oracle; distances are integer-dot/rounded-norm doubles
    so both engines compute identical bits), break-flag cumsum chunk
    assignment. The oversized-chunk re-split path never triggers at these
    doc lengths (max 553 chars < 4000) — the fixed splitter is separately
    value-checked by x4_chunk_fixed."""
    from ..operators.chunker import semantic_chunk_documents

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.replace(F.col("text"), F.lit(" the "), F.lit(". ")).alias("text")
    )
    return semantic_chunk_documents(d)


@query(
    "rag_rrf_fusion",
    """WITH base AS (
         SELECT o.o_custkey AS c, l.l_partkey AS p,
                CAST(l.l_quantity AS BIGINT) AS q, l.l_shipdate AS d
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE o.o_custkey % 7 = 0),
       ra AS (
         SELECT c, p, row_number() OVER (PARTITION BY c
                   ORDER BY sum(q) DESC, p) AS rnk
         FROM base GROUP BY c, p QUALIFY rnk <= 10),
       rb AS (
         SELECT c, p, row_number() OVER (PARTITION BY c
                   ORDER BY max(d) DESC, p) AS rnk
         FROM base GROUP BY c, p QUALIFY rnk <= 10),
       stacked AS (
         SELECT c, p, 1000000000 // (60 + rnk) AS s FROM ra
         UNION ALL
         SELECT c, p, 1000000000 // (60 + rnk) AS s FROM rb),
       fused AS (
         SELECT c AS query, p AS item, CAST(sum(s) AS BIGINT) AS rrf_score,
                CAST(count(*) AS BIGINT) AS n_rankers
         FROM stacked GROUP BY 1, 2)
       SELECT query, item, rrf_score, n_rankers,
              CAST(rank AS BIGINT) AS rank
       FROM (SELECT *, row_number() OVER (PARTITION BY query
                  ORDER BY rrf_score DESC, item) AS rank FROM fused)
       WHERE rank <= 5""",
)
def rag_rrf_fusion(spark, sf_dir):
    """Multi-signal retrieval fusion (ranking.rrf_fuse): per customer,
    a volume ranker (parts by total quantity) and a freshness ranker
    (parts by last ship date) each emit a top-10; RRF fuses them on the
    10^9 div (60 + rank) integer grid into a final top-5 — rank-only
    fusion, no score calibration, engine-order-invariant BIGINT sums.
    Items in both rankers carry n_rankers=2; single-ranker stragglers
    survive with one contribution (standard RRF)."""
    from ..operators.ranking import rrf_fuse

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") % 7 == 0)
    base = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("c"),
        F.col("l_partkey").alias("p"),
        F.col("l_quantity").cast("bigint").alias("q"),
        F.col("l_shipdate").alias("d"),
    )
    wq = Window.partitionBy("c")
    ra = (
        base.groupBy("c", "p")
        .agg(F.sum("q").alias("_q"))
        .withColumn(
            "rnk",
            F.row_number().over(wq.orderBy(F.col("_q").desc(), F.col("p"))),
        )
        .where(F.col("rnk") <= 10)
    )
    rb = (
        base.groupBy("c", "p")
        .agg(F.max("d").alias("_d"))
        .withColumn(
            "rnk",
            F.row_number().over(wq.orderBy(F.col("_d").desc(), F.col("p"))),
        )
        .where(F.col("rnk") <= 10)
    )
    return rrf_fuse([ra, rb], "c", "p", "rnk", k=60, top_n=5)


@query(
    "rag_bm25_topk",
    rf"""WITH {_BM25_SQL_BODY}
       SELECT query_id, doc_id, bm25_fp, n_terms, CAST(rank AS BIGINT) AS rank
       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY bm25_fp DESC, doc_id) AS rank FROM bm_scored)
       WHERE rank <= 10""",
)
def rag_bm25_topk(spark, sf_dir):
    """BM25 lexical retrieval (ranking.bm25_topk): six fixed multi-term
    queries over the documents corpus, top-10 each — the lexical half of
    a hybrid RAG stack (rrf_fuse is the fusion layer, the ANN family the
    dense half; the reference retrieves by vector distance only,
    vector_repository.py:56-67). Scores are exact integers: idf =
    log2((N+1)/(df+0.5)) via the float-free fixed-point log2 chain
    (log2fp_chain, 2^-6-bit grid — the SAME generated expression text
    runs in both engines), tf saturation (k1=1.2, b=0.75) as one
    DECIMAL(38,0)/HUGEINT floor division after substituting avgdl = L/N
    symbolically. q5 mixes present ('vector') and absent ('quantum',
    'flux') terms — absent terms contribute nothing; q1-q4/q6 span
    common and rare vocabulary so idf ordering carries real mass."""
    from ..operators.ranking import bm25_topk

    qdf = spark.createDataFrame(_BM25_QUERIES, "qid string, qtext string")
    return bm25_topk(
        _t(spark, sf_dir, "documents"), qdf,
        "doc_id", "text", "qid", "qtext", top_n=10,
    )



@query(
    "rag_hybrid_topk",
    rf"""WITH {_BM25_SQL_BODY},
       lex_rk AS (SELECT query_id AS q, doc_id AS i,
                         row_number() OVER (PARTITION BY query_id
                             ORDER BY bm25_fp DESC, doc_id) AS rnk
                  FROM bm_scored QUALIFY rnk <= 10),
       dv AS (SELECT d AS id, {_TFIDF_BUCKET_SQL} AS bucket,
                     CAST(count(*) AS DOUBLE) AS tf
              FROM (SELECT d, term AS tok FROM t WHERE term <> '')
              GROUP BY 1, 2),
       qv2 AS (SELECT qid, {_TFIDF_BUCKET_SQL} AS bucket,
                      CAST(count(*) AS DOUBLE) AS tf
               FROM (SELECT qid, unnest(string_split_regex(trim(lower(qtext)),
                              '\s+')) AS tok FROM qs) WHERE tok <> ''
               GROUP BY 1, 2),
       dn AS (SELECT id, sqrt(sum(tf * tf)) AS dnorm FROM dv GROUP BY 1),
       qn2 AS (SELECT qid, sqrt(sum(tf * tf)) AS qnorm FROM qv2 GROUP BY 1),
       dots AS (SELECT qv2.qid, dv.id, sum(qv2.tf * dv.tf) AS dot
                FROM qv2 JOIN dv USING (bucket) GROUP BY 1, 2),
       dense_rk AS (SELECT qid AS q, dots.id AS i,
                           row_number() OVER (PARTITION BY qid
                               ORDER BY dot / (qnorm * dnorm) DESC, dots.id) AS rnk
                    FROM dots JOIN qn2 USING (qid) JOIN dn ON dots.id = dn.id
                    QUALIFY rnk <= 10),
       stacked AS (
         SELECT q, i, 1000000000 // (60 + rnk) AS s FROM lex_rk
         UNION ALL
         SELECT q, i, 1000000000 // (60 + rnk) AS s FROM dense_rk),
       fused AS (SELECT q AS query_id, i AS doc_id,
                        CAST(sum(s) AS BIGINT) AS rrf_score,
                        CAST(count(*) AS BIGINT) AS n_rankers
                 FROM stacked GROUP BY 1, 2)
       SELECT query_id, doc_id, rrf_score, n_rankers,
              CAST(rank AS BIGINT) AS rank
       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY rrf_score DESC, doc_id) AS rank FROM fused)
       WHERE rank <= 5""",
)
def rag_hybrid_topk(spark, sf_dir):
    """Hybrid retrieval end-to-end (ranking.hybrid_topk): the SAME six
    queries ranked by BM25 (exact-integer lexical) AND hashed-TF cosine
    (dense — integer TFs make the doubles exact before the IEEE-
    deterministic sqrt/divide), fused by RRF on the 10^9 div (60+rank)
    grid into a final top-5 — the production RAG shape the reference's
    vector-only top-5 lacks. Docs found by only one ranker survive with
    one contribution (n_rankers=1), which the gate exercises because the
    lexical and dense top-10s genuinely diverge on this corpus. The
    oracle replays BOTH rankers and the fusion in one DuckDB query."""
    from ..operators.ranking import hybrid_topk

    qdf = spark.createDataFrame(_BM25_QUERIES, "qid string, qtext string")
    return hybrid_topk(
        _t(spark, sf_dir, "documents"), qdf,
        "doc_id", "text", "qid", "qtext",
        lexical_top=10, dense_top=10, k=60, top_n=5,
    )



@query(
    "rag_bm25_eval",
    rf"""WITH {_BM25_SQL_BODY},
       top10 AS (SELECT query_id, doc_id, bm25_fp,
                        row_number() OVER (PARTITION BY query_id
                            ORDER BY bm25_fp DESC, doc_id) AS rnk
                 FROM bm_scored QUALIFY rnk <= 10),
       qn AS (SELECT qid, CAST(count(*) AS BIGINT) AS qn FROM qt GROUP BY 1),
       cover AS (SELECT qt.qid, td.d, CAST(count(*) AS BIGINT) AS nt
                 FROM qt JOIN td USING (term) GROUP BY 1, 2),
       truth AS (SELECT c.qid AS query_id, c.d AS doc_id
                 FROM cover c JOIN qn ON c.qid = qn.qid WHERE c.nt = qn.qn),
       rk AS (SELECT query_id, doc_id,
                     CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY bm25_fp DESC, doc_id) AS BIGINT) AS _rk
              FROM top10),
       j AS (SELECT t.query_id, t.doc_id, rk._rk FROM truth t
             LEFT JOIN rk ON rk.query_id = t.query_id
                          AND rk.doc_id = t.doc_id)
       SELECT CAST(count(*) AS BIGINT) AS n_truth,
              CAST(count(_rk) AS BIGINT) AS n_found,
              CAST(sum(COALESCE(1000000 // _rk, 0)) // count(*) AS BIGINT)
                AS mrr_ppm,
              CAST(count(CASE WHEN _rk <= 1 THEN 1 END) * 1000000 // count(*)
                AS BIGINT) AS hits_1_ppm,
              CAST(count(CASE WHEN _rk <= 10 THEN 1 END) * 1000000 // count(*)
                AS BIGINT) AS hits_10_ppm
       FROM j""",
)
def rag_bm25_eval(spark, sf_dir):
    """The retrieval scorecard closing the lexical loop: BM25's top-10
    per query graded by er_metrics.ranking_metrics against a
    deterministic relevance set — docs containing EVERY query term
    (conjunctive containment, the classic lexical-relevance proxy).
    Full-coverage docs outside the top-10 stay in the denominator
    (n_found shows the recall gap — on the common-vocabulary queries
    the relevance set is far larger than 10, so Hits@10 genuinely
    measures something at both scale factors). Demonstrates the SAME
    evaluation harness grades IR rankers and KG link predictors
    (kg_lp_eval) — one scorecard, two domains. All-integer MRR/Hits
    as everywhere: floor-mean of 10^6 div rank."""
    from ..operators.er_metrics import ranking_metrics
    from ..operators.ranking import bm25_topk

    d = _t(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(_BM25_QUERIES, "qid string, qtext string")
    cand = bm25_topk(d, qdf, "doc_id", "text", "qid", "qtext", top_n=10)
    tok = lambda df, idc, tc: (  # noqa: E731
        df.select(
            F.col(idc).alias("_i"),
            F.explode(F.split(F.trim(F.lower(F.col(tc))), r"\s+")).alias("term"),
        ).where("term <> ''").distinct()
    )
    dt = tok(d, "doc_id", "text")
    qt = tok(qdf, "qid", "qtext")
    qn = qt.groupBy("_i").agg(F.count(F.lit(1)).alias("_qn"))
    cover = (
        qt.select(F.col("_i").alias("_q"), "term")
        .join(dt.select(F.col("_i").alias("_d"), "term"), "term")
        .groupBy("_q", "_d")
        .agg(F.count(F.lit(1)).alias("_nt"))
    )
    truth = (
        cover.join(qn, cover._q == qn._i)
        .where("_nt = _qn")
        .select(F.col("_q").alias("query_id"), F.col("_d").alias("doc_id"))
    )
    return ranking_metrics(
        cand, truth, "query_id", "doc_id", ["bm25_fp"], ks=(1, 10)
    )


@query("rag_mmr_topk", _mmr_oracle_sql())
def rag_mmr_topk(spark, sf_dir):
    """MMR diversified rerank (ranking.mmr_rerank — Carbonell & Goldstein
    1998): the six BM25-suite queries retrieve a 12-candidate pool by
    query-doc token-Jaccard (ppm grid), candidate pairs get doc-doc
    Jaccard sims, and five greedy rounds pick the item maximizing
    0.7*rel - 0.3*max_sim_to_selected — the diversification pass that
    stops a RAG context from being five paraphrases of one passage. rel
    and sim share the exact ppm grid so the score is pure BIGINT; ties
    break by doc_id; the oracle is the round-by-round unrolled CTE
    replay of the same greedy loop. Every step is an equi-join or
    map-side-combining agg on the query key — no windows in the
    operator, plan depth O(k)."""
    from ..operators.ranking import mmr_rerank

    d = _t(spark, sf_dir, "documents")
    qs = spark.createDataFrame(
        [
            ("q1", "spark table scan"), ("q2", "fast hash join"),
            ("q3", "window agg group"), ("q4", "customer order line"),
            ("q5", "vector quantum flux"), ("q6", "slow query filter sort"),
        ],
        "query_id string, qtext string",
    )
    dt = (
        d.select(
            F.col("doc_id").alias("d"),
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    nd = dt.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("c"))
    qt = (
        qs.select(
            F.col("query_id").alias("qq"),
            F.explode(F.split(F.trim(F.lower("qtext")), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    nq = qt.groupBy("qq").agg(F.count(F.lit(1)).cast("long").alias("c"))
    iq = qt.join(dt, "term").groupBy("qq", "d").agg(
        F.count(F.lit(1)).cast("long").alias("i")
    )
    relt = (
        iq.join(F.broadcast(nq.withColumnRenamed("c", "cq")), "qq")
        .join(nd.withColumnRenamed("c", "cd"), "d")
        .select(
            "qq", "d",
            F.expr("CAST(i * 1000000 div (cq + cd - i) AS BIGINT)").alias("rel"),
        )
        .where(F.col("rel") > 0)
    )
    wq = Window.partitionBy("qq").orderBy(F.col("rel").desc(), F.col("d"))
    cand = relt.withColumn("rn", F.row_number().over(wq)).where("rn <= 12").drop("rn")
    cd = cand.select("qq", "d").join(dt, "d").select("qq", "d", "term")
    a = cd.select("qq", F.col("d").alias("d1"), "term")
    b = cd.select("qq", F.col("d").alias("d2"), "term")
    pi = (
        a.join(b, ["qq", "term"])
        .where(F.col("d1") != F.col("d2"))
        .groupBy("qq", "d1", "d2")
        .agg(F.count(F.lit(1)).cast("long").alias("i"))
    )
    sims = (
        pi.join(nd.select(F.col("d").alias("d1"), F.col("c").alias("c1")), "d1")
        .join(nd.select(F.col("d").alias("d2"), F.col("c").alias("c2")), "d2")
        .select(
            "qq", "d1", "d2",
            F.expr("CAST(i * 1000000 div (c1 + c2 - i) AS BIGINT)").alias("sim"),
        )
    )
    out = mmr_rerank(
        cand.withColumnRenamed("d", "doc"),
        sims.withColumnRenamed("d1", "doc1").withColumnRenamed("d2", "doc2"),
        "qq", "doc", "rel", "sim", k=5, lambda_ppm=700000,
    )
    return out.select(
        F.col("qq").alias("query_id"), F.col("doc").alias("doc_id"),
        "mmr_rank", "rel", "msim", "score",
    )


@query(
    "rag_proximity_window",
    r"""WITH qs(query_id, qtext) AS (VALUES
         ('q1', 'spark table scan'), ('q2', 'fast hash join'),
         ('q3', 'window agg group'), ('q4', 'customer order line'),
         ('q5', 'vector quantum flux'), ('q6', 'slow query filter sort')),
       qt AS (SELECT query_id, term,
                     CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY term) AS INT) AS idx
              FROM (SELECT DISTINCT query_id,
                           unnest(string_split_regex(trim(lower(qtext)),
                                  '\s+')) AS term
                    FROM qs) WHERE term <> ''),
       nt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_terms
              FROM qt GROUP BY 1),
       tt AS (SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\s+') AS parts
              FROM documents),
       ix AS (SELECT doc_id, parts,
                     unnest(generate_series(1, len(parts))) AS i FROM tt),
       tok AS (SELECT doc_id, parts[i] AS term, CAST(i - 1 AS BIGINT) AS pos
               FROM ix WHERE parts[i] <> ''),
       p AS (SELECT qt.query_id, tok.doc_id, tok.pos, qt.idx, nt.n_terms
             FROM tok JOIN qt USING (term) JOIN nt USING (query_id)),
       sc AS (
         SELECT query_id, doc_id, pos, n_terms,
                max(CASE WHEN idx = 1 THEN pos END) OVER w AS l1,
                max(CASE WHEN idx = 2 THEN pos END) OVER w AS l2,
                max(CASE WHEN idx = 3 THEN pos END) OVER w AS l3,
                max(CASE WHEN idx = 4 THEN pos END) OVER w AS l4
         FROM p
         WINDOW w AS (PARTITION BY query_id, doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       val AS (
         SELECT query_id, doc_id, pos, n_terms,
                CASE WHEN n_terms = 1 THEN l1
                     WHEN n_terms = 2 THEN least(l1, l2)
                     WHEN n_terms = 3 THEN least(l1, l2, l3)
                     ELSE least(l1, l2, l3, l4) END AS ws
         FROM sc
         WHERE CASE WHEN n_terms = 1 THEN l1 IS NOT NULL
                    WHEN n_terms = 2 THEN l1 IS NOT NULL AND l2 IS NOT NULL
                    WHEN n_terms = 3 THEN l1 IS NOT NULL AND l2 IS NOT NULL
                         AND l3 IS NOT NULL
                    ELSE l1 IS NOT NULL AND l2 IS NOT NULL
                         AND l3 IS NOT NULL AND l4 IS NOT NULL END),
       ranked AS (
         SELECT query_id, doc_id, n_terms,
                pos - ws + 1 AS win_len, ws AS win_start, pos AS win_end,
                row_number() OVER (PARTITION BY query_id, doc_id
                  ORDER BY pos - ws + 1, pos, ws) AS rn
         FROM val)
       SELECT query_id, doc_id, n_terms,
              CAST(win_len AS BIGINT) AS win_len,
              CAST(win_start AS BIGINT) AS win_start,
              CAST(win_end AS BIGINT) AS win_end
       FROM ranked WHERE rn = 1""",
)
def rag_proximity_window(spark, sf_dir):
    """Minimal covering window (ranking.min_cover_window — Clarke et al.
    positional proximity): for each (query, doc) containing ALL the
    query's distinct terms, the shortest token span covering one
    occurrence of each — the co-occurrence rerank signal BM25's bag of
    counts can't see. The O(n log n) sweep carries the latest position
    of each term index as statically-unrolled windowed CASE columns
    (never the m^T occurrence cross-join); docs missing a term never
    form a valid window end and vanish (q5's absent 'quantum flux'
    prunes whole queries — presence and absence both carry mass). ONE
    hash exchange on (query, doc) feeds the carry window and the final
    argmin; ties break by (len, end)."""
    from ..operators.ranking import min_cover_window

    d = _t(spark, sf_dir, "documents")
    qs = spark.createDataFrame(
        [
            ("q1", "spark table scan"), ("q2", "fast hash join"),
            ("q3", "window agg group"), ("q4", "customer order line"),
            ("q5", "vector quantum flux"), ("q6", "slow query filter sort"),
        ],
        "query_id string, qtext string",
    )
    qterms = (
        qs.select(
            "query_id",
            F.explode(F.split(F.trim(F.lower("qtext")), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    wq = Window.partitionBy("query_id").orderBy("term")
    qt = qterms.withColumn("idx", F.row_number().over(wq).cast("int"))
    nt = qt.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms")
    )
    tok = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.trim(F.lower("text")), r"\s+")).alias(
                "pos", "term"
            ),
        )
        .where(F.col("term") != "")
        .select("doc_id", "term", F.col("pos").cast("long").alias("pos"))
    )
    positions = tok.join(F.broadcast(qt), "term").select(
        "query_id", "doc_id", "pos", "idx"
    )
    return min_cover_window(
        positions, "query_id", "doc_id", "pos", "idx", nt, max_terms=4
    )
