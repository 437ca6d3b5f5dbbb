"""Similarity search over embedding columns (array<float>).

The reference ranks pgvector rows by L2 against a query embedding with
LIMIT 5 (common/repositories/vector_repository.py:56-67, W1). Here:

  * brute_force_topk — exact cosine/L2 top-k, computed with built-in
    higher-order functions (zip_with + aggregate) so the scoring stays
    JVM-side; one narrow map + one top-k.
  * lsh_bucketed_topk — the scale path: random-hyperplane signatures put
    vectors into buckets; the query probes only its bucket(s). Hyperplanes
    are derived deterministically from md5 so any engine can replay them.
  * pairwise cosine near-dup — embedding-based near-duplicate detection via
    bucketed self-join.

On a 1000-executor cluster the brute-force variant is a full scan per
query (fine for batched scoring, wrong for point lookups); the LSH variant
prunes ~(1 - 1/2^bits) of the corpus per probe.
"""

from __future__ import annotations

import hashlib
from math import floor as math_floor

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array<float> columns (zip_with +
    aggregate — no Python, no explode)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm of an array<float> column, JVM-side."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns; NULL (never a
    divide-by-zero) when either vector has zero norm."""
    # null (not an ANSI DIVIDE_BY_ZERO crash) when either vector has zero
    # norm — cosine is undefined there; consumers filter zero-norm rows out
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


def l2(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _query_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k: (id, score, rank). Deterministic tie-break on id.

    Scale shape: orderBy().limit(k) plans as a distributed
    TakeOrderedAndProject — every partition keeps its local top-k and only
    k rows per partition reach the driver-side merge. No global Window (a
    partitionless Window would serialize the whole scored corpus through
    one task; gated by tests/test_plans.py). rank is derived from the <= k
    survivors with array ops (collect_list -> array_sort -> posexplode),
    so the post-limit plan touches k rows, not the corpus."""
    q = _query_lit(query_vec)
    if metric == "cosine":
        # cosine is undefined for zero-norm vectors: a zero query matches
        # nothing; zero-norm corpus rows (e.g. token-less chunks) are
        # unrankable and excluded — same semantics as the DuckDB oracle's
        # HAVING sum(tf*tf) > 0 (rag_chunk_topk).
        if not any(float(v) != 0.0 for v in query_vec):
            embeddings = embeddings.where(F.lit(False))
        embeddings = embeddings.where(norm(F.col(vec_col)) > 0)
        score = cosine(F.col(vec_col), q)
    else:
        score = -l2(F.col(vec_col), q)
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"), F.round(score, 5).alias("score")
    )
    top = scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(k)
    # rank over the k survivors without a Window: pack into one array,
    # sort by (-score, vec_id) via struct field order, explode with position.
    packed = top.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("score")).alias("_neg_score"),
                    F.col("vec_id").alias("vec_id"),
                    F.col("score").alias("score"),
                )
            )
        ).alias("arr")
    )
    return packed.select(
        F.posexplode("arr").alias("_pos", "_r")
    ).select(
        F.col("_r.vec_id").alias("vec_id"),
        F.col("_r.score").alias("score"),
        (F.col("_pos") + 1).cast("long").alias("rank"),
    )


TARGET_BUCKET_ROWS = 64  # expected rows per LSH bucket the blocking aims for


def adaptive_signature_bits(
    n_rows: int, target: int = TARGET_BUCKET_ROWS, lo: int = 8, hi: int = 24
) -> int:
    """Signature width as a function of corpus size: expected bucket
    occupancy n/2^bits stays near `target`, so the within-bucket self-join
    cost n * bucket_size stays LINEAR in the corpus instead of n^2/2^bits
    with a fixed width. Clamped to [lo, hi] (2^24 buckets carries a
    10^9-row corpus at ~64 rows/bucket)."""
    import math

    if n_rows <= target:
        return lo
    return min(hi, max(lo, math.ceil(math.log2(n_rows / target))))


def hyperplane_signature(vec_col: Column, dims: int, bits: int = 8, band: int = 0) -> Column:
    """Deterministic random-hyperplane LSH signature (bit string).

    plane(j, d) = +1 if the first hex digit of md5('j:d') < 8 else -1;
    bit j = 1 iff ROUND(sum_d plane(j,d) * v[d], 5) > 0. md5-derived planes
    replay in any engine (the DuckDB oracle recomputes them). The projection
    is ROUNDED before the sign test — same convention as ivf_topk's cell
    scores — so the float summation ORDER of different engines (Spark folds
    in d-order, DuckDB group-sums unordered) cannot flip a near-zero bit.
    band > 0 derives an independent plane family (key 'b{band}:j:d');
    band 0 keeps the original keys so existing signatures/oracles are
    unchanged."""
    def bit(j: int) -> Column:
        terms = F.zip_with(
            vec_col,
            F.array(*[_plane_sign(j, d, band) for d in range(dims)]),
            lambda v, s: v.cast("double") * s,
        )
        s = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(F.round(s, 5) > 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit(j) for j in range(bits)])


def _plane_sign(j: int, d: int, band: int = 0) -> Column:
    key = f"{j}:{d}" if band == 0 else f"b{band}:{j}:{d}"
    hexdig = F.substring(F.md5(F.lit(key)), 1, 1)
    return F.when(F.instr(F.lit("0123456789abcdef"), hexdig) - 1 < 8, F.lit(-1.0)).otherwise(
        F.lit(1.0)
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int = 8,
) -> DataFrame:
    """ANN: probe only the query's hyperplane bucket, exact cosine inside.
    Recall < 1 by construction; the candidate pruning is the point."""
    sig = hyperplane_signature(F.col(vec_col), dims, bits)
    bucketed = embeddings.withColumn("bucket", sig)
    cand = bucketed.where(F.col("bucket") == query_signature(query_vec, bits))
    return brute_force_topk(cand, query_vec, id_col, vec_col, k)


def query_signature(query_vec: list[float], bits: int) -> str:
    """Driver-side signature of a query vector under the same md5-derived
    hyperplanes (and the same HALF_UP rounding) as the distributed
    hyperplane_signature — the probe key for bucket lookups."""
    return "".join(
        "1" if _round5_half_up(_py_plane_dot(query_vec, j)) > 0 else "0"
        for j in range(bits)
    )


def hamming_ball(sig: str, radius: int) -> list[str]:
    """All bit strings within Hamming distance `radius` of `sig` (the
    multi-probe set), sorted for deterministic plans."""
    from itertools import combinations

    probes = {sig}
    for r in range(1, radius + 1):
        for idxs in combinations(range(len(sig)), r):
            s = list(sig)
            for i in idxs:
                s[i] = "0" if s[i] == "1" else "1"
            probes.add("".join(s))
    return sorted(probes)


def lsh_multiprobe_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int = 8,
    radius: int = 1,
) -> DataFrame:
    """Multi-probe ANN: probe the query's hyperplane bucket AND every
    bucket within Hamming distance `radius` of it — the standard recall
    recovery for single-table LSH (a near neighbor that lands one
    flipped-bit away is reachable without a second hash table or a wider
    candidate join). radius=1 probes bits+1 buckets; radius=0 degenerates
    to lsh_bucketed_topk.

    Scale shape: the probe set is a tiny driver-side literal IN list —
    the scan stays an equi-filter (partition/bucket-prunable when the
    index table is laid out by signature), candidates grow ~(bits+1)x the
    single-bucket occupancy, and the exact-cosine re-rank inside is the
    same distributed TakeOrderedAndProject as brute_force_topk."""
    sig = hyperplane_signature(F.col(vec_col), dims, bits)
    bucketed = embeddings.withColumn("bucket", sig)
    probes = hamming_ball(query_signature(query_vec, bits), radius)
    cand = bucketed.where(F.col("bucket").isin(probes))
    return brute_force_topk(cand, query_vec, id_col, vec_col, k)


def _py_plane_dot(vec: list[float], j: int) -> float:
    import hashlib

    s = 0.0
    for d, v in enumerate(vec):
        h = hashlib.md5(f"{j}:{d}".encode()).hexdigest()[0]
        sign = -1.0 if int(h, 16) < 8 else 1.0
        s += float(v) * sign
    return s


def _round5_half_up(x: float) -> float:
    """round(x, 5) with F.round's HALF_UP mode (python round() is
    half-to-even) — the query-side signature bit must round exactly like
    the distributed one."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.00001"), ROUND_HALF_UP))


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int | None = None,
    n_bands: int = 1,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-join —
    the blocking keeps the join from being all-pairs.

    bits=None sizes the signature from the corpus (one count job):
    bucket occupancy stays ~TARGET_BUCKET_ROWS so candidate pairs grow
    linearly with the corpus, never n^2/2^const. Wider signatures lower
    recall for borderline pairs; n_bands > 1 restores it MinHash-LSH-style
    (dedupe.py banding): each band is an independent plane family, a pair
    is a candidate if ANY band buckets them together, duplicates collapse
    with one distinct. Cosine is exact, so precision is unaffected by the
    blocking parameters."""
    if bits is None:
        bits = adaptive_signature_bits(embeddings.count())
    sigs = F.array(
        *[hyperplane_signature(F.col(vec_col), dims, bits, band=t) for t in range(n_bands)]
    )
    b = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.posexplode(sigs).alias("band", "bucket"),
    )
    a = b.select(F.col("id").alias("id1"), F.col("v").alias("v1"), "band", "bucket")
    c = b.select(F.col("id").alias("id2"), F.col("v").alias("v2"), "band", "bucket")
    pairs = (
        a.join(c, ["band", "bucket"])
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2", F.round(cosine(F.col("v1"), F.col("v2")), 5).alias("cos"))
        .where(F.col("cos") >= threshold)
    )
    # same pair can collide in several bands; single-band output is unique
    return pairs.distinct() if n_bands > 1 else pairs


def probe_cells(query_vec: list[float], centroid_rows, n_probe: int) -> list:
    """Driver-side probe-cell selection shared by ivf_topk / ivf_pq_topk
    and the bench recall report: rank the (tiny, already-collected)
    centroid rows by HALF_UP-rounded cosine to the query (the same
    rounding the distributed assignment and the DuckDB oracle use; ties
    -> lowest cid) and return the n_probe best cell ids."""
    import math

    def _cos(a: list[float], b: list[float]) -> float:
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        if na == 0.0 or nb == 0.0:
            return -2.0  # undefined cosine ranks below every real one
        return _round5_half_up(d / (na * nb))

    ranked = sorted(
        centroid_rows, key=lambda r: (-_cos(query_vec, list(r["cv"])), r["cid"])
    )
    return [r["cid"] for r in ranked][:n_probe]


def _assign_to_cells(df: DataFrame, cents, vec: Column, key: str) -> DataFrame:
    """Argmax-cosine cell assignment (the IVF/k-means quantization step):
    score every row against the broadcast centroid table, keep the
    max-ROUNDED-cosine cell, ties -> lowest cid. Keeps df's columns + cid."""
    w = Window.partitionBy(key).orderBy(F.desc("csim"), F.asc("cid"))
    return (
        df.join(cents)
        .withColumn("csim", F.round(cosine(vec, F.col("cv")), 5))
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .drop("csim", "rn", "cv")
    )


def kmeans_centroids(
    embeddings: DataFrame,
    n_cells: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic distributed Lloyd refinement -> (cid, cv array<double>).

    Seeds are the first n_cells corpus vectors by id (same training-free
    quantizer ivf_topk defaults to); each iteration assigns every vector to
    its max-ROUNDED-cosine centroid (ties -> lowest cid, the ivf_topk
    convention) and recomputes centroids as the per-dimension mean of the
    assigned vectors, ROUNDED to 6 decimals so the float summation order of
    different engines/partitionings cannot leak into the next iteration's
    assignments. A cell that loses all members keeps its previous centroid.

    Scale shape: assignment is corpus x broadcast(n_cells) — one narrow
    pass; the mean is a posexplode to (cid, dim) keyed partial aggregation
    (map-side combine, n_cells*dims output rows). No driver-side data moves
    until the (tiny) final centroid table. The DuckDB oracle
    (contract.py ann_ivf_kmeans) replays the identical unrolled iterations.
    """
    cents = F.broadcast(
        embeddings.where(F.col(id_col) < n_cells).select(
            F.col(id_col).cast("int").alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
    )
    vecs = embeddings.select(
        F.col(id_col).alias("_vid"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    for _ in range(n_iter):
        assign = _assign_to_cells(vecs, cents, F.col("_v"), "_vid").select(
            "_vid", "_v", "cid"
        )
        means = (
            assign.select("cid", F.posexplode("_v").alias("d", "val"))
            .groupBy("cid", "d")
            .agg(F.round(F.avg("val"), 6).alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "m"))), lambda s: s["m"]
                ).alias("cv_new")
            )
        )
        cents = F.broadcast(
            cents.join(means, "cid", "left").select(
                "cid", F.coalesce(F.col("cv_new"), F.col("cv")).alias("cv")
            )
        )
    return cents


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exclude_ids: list | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN: coarse-quantize vectors into n_cells inverted lists, probe
    the n_probe lists nearest the query, exact cosine inside.

    The default quantizer is training-free and fully deterministic — the
    centroids ARE the first n_cells corpus vectors (by id) — so any engine
    can replay the assignment (the DuckDB oracle does). Pass
    centroids=kmeans_centroids(...) for Lloyd-refined cells (value-checked
    by contract:ann_ivf_kmeans) — the dataflow is unchanged. Cell scores
    are rounded before the argmax so the float summation order of
    different engines cannot flip an assignment; ties break on cell id.

    Scale: centroids broadcast (tiny); assignment is one narrow map over
    the corpus; the probe prunes ~(1 - n_probe/n_cells) of candidates.
    """
    cents = (
        F.broadcast(centroids.select("cid", "cv"))
        if centroids is not None
        else F.broadcast(
            embeddings.where(F.col(id_col) < n_cells).select(
                F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
            )
        )
    )
    assign = _assign_to_cells(embeddings, cents, F.col(vec_col), id_col).select(
        id_col, "cid"
    )
    # driver-side probe-cell selection (centroids are tiny and local);
    # probe_cells shares the HALF_UP rounding mode with the distributed
    # assignment (F.round) and the DuckDB oracle (ROUND) — all three agree.
    probe = probe_cells(query_vec, cents.collect(), n_probe)
    cand = embeddings.join(assign, id_col).where(F.col("cid").isin(probe))
    if exclude_ids:
        # the query vector itself stays in the quantizer (it is corpus
        # data) but is excluded from the result list
        cand = cand.where(~F.col(id_col).isin(exclude_ids))
    return brute_force_topk(cand, query_vec, id_col, vec_col, k)


# ------------------------------------------------------- int8 quantization --
QUANT_LEVELS = 127  # symmetric int8 grid: q in [-127, 127]


def corpus_max_abs(embeddings: DataFrame, vec_col: str = "embedding") -> float:
    """Largest |component| across the corpus — the symmetric-quantization
    scale denominator. One algebraic MAX aggregation (order-invariant and
    therefore bit-exact on any engine/partitioning, unlike a float SUM);
    collected as a driver scalar the same way pagerank collects its vertex
    count (scalar agg -> literal; never crossJoin(broadcast(1 row)) which
    plans as BNLJ)."""
    row = embeddings.agg(
        F.max(
            F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
        ).alias("ma")
    ).head()
    ma = row["ma"] if row else None
    if ma is None or ma <= 0.0:
        raise ValueError("corpus has no non-zero embedding component to scale by")
    return float(ma)


def _quantize_expr(vec: Column, max_abs: float, levels: int = QUANT_LEVELS) -> Column:
    # q = floor(v * L / ma + 0.5): round-half-up in pure IEEE double ops.
    # Both engines evaluate ((v * L) / ma) + 0.5 in the same order on the
    # same doubles, and floor is exact — so the int8 code is bit-identical
    # cross-engine by construction (never ROUND(double, n): Spark's
    # BigDecimal-string path and DuckDB's binary scaling disagree on
    # 1-ulp-from-half values; see the pagerank fixed-point lesson).
    # |v| <= ma guarantees the result lands in [-L, L]: floor(L + 0.5) = L.
    return F.transform(
        vec,
        lambda x: F.floor(
            x.cast("double") * F.lit(float(levels)) / F.lit(float(max_abs)) + F.lit(0.5)
        ).cast("int"),
    )


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_abs: float | None = None,
    levels: int = QUANT_LEVELS,
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column: (id, qvec).

    The scale-out rationale is bandwidth, not math: a 100 TB float32
    embedding store shrinks 4x as int8, and the integer dot product below
    ranks candidates without ever touching the float column — this is the
    standard first compression step of a production vector pipeline
    (scalar quantization; same shape as FAISS SQ8). The codes are a pure
    map over the corpus (no shuffle); the scale is one MAX agg."""
    ma = corpus_max_abs(embeddings, vec_col) if max_abs is None else float(max_abs)
    return embeddings.select(
        F.col(id_col).alias(id_col),
        _quantize_expr(F.col(vec_col), ma, levels).alias("qvec"),
    )


def quantize_query(
    query_vec: list[float], max_abs: float, levels: int = QUANT_LEVELS
) -> list[int]:
    """The driver-side twin of _quantize_expr: same floor(v*L/ma + 0.5)
    round-half-up in IEEE doubles, so query and corpus codes live on one
    integer grid."""
    ma = float(max_abs)
    return [
        int(math_floor(float(v) * float(levels) / ma + 0.5)) for v in query_vec
    ]


def quantized_topk_coded(
    coded: DataFrame,
    q8: list[int],
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """quantized_topk over an already-quantized (id, qvec) frame — the
    batched-scoring entry point: quantize the corpus ONCE (and cache it),
    then score any number of queries against it without re-planning the
    quantization map per query. Output is identical to quantized_topk by
    construction (same scoring/ranking code path)."""
    qlit = F.array(*[F.lit(int(v)) for v in q8])
    scored = coded.select(
        F.col(id_col).alias("vec_id"),
        F.aggregate(
            F.zip_with(F.col("qvec"), qlit, lambda a, b: (a * b).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("qscore"),
    )
    top = scored.orderBy(F.desc("qscore"), F.asc("vec_id")).limit(k)
    packed = top.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("qscore")).alias("_neg"),
                    F.col("vec_id").alias("vec_id"),
                    F.col("qscore").alias("qscore"),
                )
            )
        ).alias("arr")
    )
    return packed.select(F.posexplode("arr").alias("_pos", "_r")).select(
        F.col("_r.vec_id").alias("vec_id"),
        F.col("_r.qscore").alias("qscore"),
        (F.col("_pos") + 1).cast("long").alias("rank"),
    )


def quantized_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    max_abs: float | None = None,
    levels: int = QUANT_LEVELS,
) -> DataFrame:
    """Top-k by int8-quantized dot product: (vec_id, qscore, rank).

    The ranking key is a BIGINT sum of int8*int8 products — exact integer
    arithmetic, so the ordering (and the DuckDB oracle replay) is bit-exact
    by construction, with none of the float-rounding ceremony the cosine
    paths need. Ties break on vec_id. Pass max_abs when the query comes
    from the same table the corpus was filtered out of, so both sides use
    one scale.

    Scale shape: quantization is a narrow map; the scoring is a 64-wide
    integer fold per row (whole-stage friendly, 4x less memory traffic
    than the float column); top-k is orderBy().limit(k) =
    TakeOrderedAndProject — per-partition heaps, k rows to the driver,
    no global Window (same gate as brute_force_topk)."""
    ma = corpus_max_abs(embeddings, vec_col) if max_abs is None else float(max_abs)
    q8 = quantize_query(query_vec, ma, levels)
    coded = quantize_embeddings(embeddings, id_col, vec_col, max_abs=ma, levels=levels)
    return quantized_topk_coded(coded, q8, id_col, k)


# ---------------------------------------------------- product quantization --
def pq_codebooks(
    coded: DataFrame,
    id_col: str = "vec_id",
    m: int = 8,
    k_c: int = 16,
) -> list[list[list[int]]]:
    """Training-free PQ codebooks over int8-quantized vectors: subspace j's
    centroids are the j-th subvectors of the first k_c corpus rows (by id
    ORDER, not id value — ids need not start at 0 or be numeric; the
    selection is a distributed TakeOrderedAndProject) — the same
    deterministic any-engine-can-replay quantizer ivf_topk uses for its
    coarse cells. Returns [m][k_c][dims/m] ints (driver-side: k_c rows,
    tiny)."""
    rows = sorted(
        coded.orderBy(id_col).limit(k_c).select(id_col, "qvec").collect(),
        key=lambda r: r[id_col],
    )
    if len(rows) < k_c:
        raise ValueError(f"need {k_c} seed rows for codebooks, found {len(rows)}")
    dims = len(rows[0]["qvec"])
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    d_sub = dims // m
    return [
        [[int(x) for x in r["qvec"][j * d_sub : (j + 1) * d_sub]] for r in rows]
        for j in range(m)
    ]


def _sub_l2sq(sub: Column, cent: list[int]) -> Column:
    # fixed-order integer sum of squared deltas: exact on any engine
    out = None
    for i, c in enumerate(cent):
        term = (F.element_at(sub, i + 1).cast("long") - F.lit(c)) ** 2
        out = term if out is None else out + term
    return out.cast("long")


def pq_encode(
    coded: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each subvector to its nearest codebook centroid (integer L2,
    ties to the lowest centroid id): (id, codes array<int> of length m).
    8 codes replace 64 floats — 32x less candidate-scan traffic at 100 TB.
    Pure column expressions (k_c*m literal comparisons unrolled into
    whole-stage codegen), no shuffle, no Python."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    code_cols = []
    for j, cents in enumerate(codebooks):
        sub = F.slice(F.col("qvec"), j * d_sub + 1, d_sub)
        best = F.array_min(
            F.array(
                *[
                    F.struct(
                        _sub_l2sq(sub, c).alias("dist"),
                        F.lit(ci).alias("cid"),
                    )
                    for ci, c in enumerate(cents)
                ]
            )
        )
        code_cols.append(best["cid"].alias(f"_c{j}"))
    enc = coded.select(F.col(id_col), "qvec", *code_cols)
    return enc.select(
        id_col, F.array(*[F.col(f"_c{j}") for j in range(m)]).alias("codes")
    )


def pq_topk_encoded(
    enc: DataFrame,
    books: list[list[list[int]]],
    q8: list[int],
    id_col: str = "vec_id",
    k: int = 10,
    exclude_ids: list | None = None,
) -> DataFrame:
    """pq_topk over an already-encoded (id, codes) frame — the batched
    entry point: encode the corpus ONCE (the k_c*m-centroid assignment
    expression is the expensive plan to build and run), cache it, then
    each query costs only its m*k_c-literal ADC lookup table. Output is
    identical to pq_topk by construction (same LUT/scoring/ranking code)."""
    m = len(books)
    d_sub = len(books[0][0])
    qdist = [
        [sum((q8[j * d_sub + i] - c[i]) ** 2 for i in range(d_sub)) for c in cents]
        for j, cents in enumerate(books)
    ]
    if exclude_ids:
        enc = enc.where(~F.col(id_col).isin(exclude_ids))
    score = None
    for j in range(m):
        lut = F.array(*[F.lit(int(d)).cast("long") for d in qdist[j]])
        term = F.element_at(lut, F.element_at(F.col("codes"), j + 1) + 1)
        score = term if score is None else score + term
    scored = enc.select(F.col(id_col).alias("vec_id"), score.alias("pq_dist"))
    top = scored.orderBy(F.asc("pq_dist"), F.asc("vec_id")).limit(k)
    packed = top.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("pq_dist").alias("pq_dist"),
                    F.col("vec_id").alias("vec_id"),
                )
            )
        ).alias("arr")
    )
    return packed.select(F.posexplode("arr").alias("_pos", "_r")).select(
        F.col("_r.vec_id").alias("vec_id"),
        F.col("_r.pq_dist").alias("pq_dist"),
        (F.col("_pos") + 1).cast("long").alias("rank"),
    )


def pq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k_c: int = 16,
    k: int = 10,
    max_abs: float | None = None,
    exclude_ids: list | None = None,
) -> DataFrame:
    """PQ/ADC top-k: (vec_id, pq_dist, rank) by ascending asymmetric
    distance — the sum over subspaces of the query-to-assigned-centroid
    integer L2. The table-lookup shape of a production PQ scan: the m*k_c
    query-distance table is computed once driver-side and baked in as
    literals; per row the score is m array lookups + a fixed-order BIGINT
    sum. Composing PQ over the int8 codes (not raw floats) is what makes
    every step exact integer arithmetic — assignment argmin, distance
    table, and ranking are bit-identical on any engine, so the DuckDB
    oracle replays it verbatim (contract:ann_pq_adc_topk).

    Scale: codebooks are k_c rows collected once; encoding is a
    zero-shuffle codegen map; top-k is TakeOrderedAndProject."""
    ma = corpus_max_abs(embeddings, vec_col) if max_abs is None else float(max_abs)
    coded = quantize_embeddings(embeddings, id_col, vec_col, max_abs=ma)
    books = pq_codebooks(coded, id_col, m=m, k_c=k_c)
    q8 = quantize_query(query_vec, ma)
    enc = pq_encode(coded, books, id_col)
    return pq_topk_encoded(enc, books, q8, id_col, k, exclude_ids)


# ------------------------------------------------ random projection (JL) --

def rp_sign(i: int, j: int, salt: str = "rp0") -> int:
    """The +1/-1 Johnson-Lindenstrauss projection cell s_ij, md5-derived
    (Achlioptas 2003 sign matrix) — one source of truth: the operator
    embeds these as literals and the DuckDB oracles rebuild the identical
    matrix from the same seed strings."""
    v = int(hashlib.md5(f"rp:{salt}:{i}:{j}".encode()).hexdigest()[:2], 16)
    return 1 if v % 2 == 0 else -1


def rp_project_coded(
    coded: DataFrame,
    in_dim: int,
    out_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "qvec",
    salt: str = "rp0",
) -> DataFrame:
    """Project already-quantized integer vectors to out_dim dimensions
    with the +/-1 JL matrix: (id, rvec) where rvec[j] = sum_i v_i*s_ij —
    exact BIGINT arithmetic, so projections (and any ranking over them)
    are engine/partitioning-invariant.

    Why on the QUANTIZED codes: int8 in, ~15-bit ints out — the reduced
    store is another ~(in_dim/out_dim)x smaller than the SQ8 codes and
    the scoring dot touches out_dim multiplies instead of in_dim. This
    is the coarse pre-ranker of a quantize -> project -> rerank-exact
    funnel; JL guarantees pairwise dots distort by O(1/sqrt(out_dim)).

    Scale shape: a pure map over the corpus (no shuffle, no UDF — one
    F.aggregate per output dim inside whole-stage codegen); a wrong
    vector length raises executor-side (a silently-truncated zip would
    corrupt every score downstream)."""
    if in_dim <= 0 or out_dim <= 0:
        raise ValueError("in_dim and out_dim must be > 0")
    checked = F.when(
        F.size(F.col(vec_col)) == in_dim, F.col(vec_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"rp_project: expected {in_dim}-dim vector, got "),
                F.size(F.col(vec_col)).cast("string"),
            )
        )
    )
    outs = []
    for j in range(out_dim):
        signs = F.array(*[F.lit(rp_sign(i, j, salt)) for i in range(in_dim)])
        outs.append(
            F.aggregate(
                F.zip_with(checked, signs, lambda a, b: (a * b).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias(f"_r{j}")
        )
    return coded.select(F.col(id_col), *outs).select(
        F.col(id_col),
        F.array(*[F.col(f"_r{j}") for j in range(out_dim)]).alias("rvec"),
    )


def rp_query(q_codes: list[int], out_dim: int, salt: str = "rp0") -> list[int]:
    """Driver-side twin of rp_project_coded for a single query vector."""
    in_dim = len(q_codes)
    return [
        sum(int(v) * rp_sign(i, j, salt) for i, v in enumerate(q_codes))
        for j in range(out_dim)
    ]


def rp_topk(
    projected: DataFrame,
    q_rp: list[int],
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Top-k by integer dot in the projected space: (vec_id, qscore,
    rank) — same distributed TakeOrderedAndProject scoring path as the
    int8 ranker (quantized_topk_coded), just over the reduced vectors."""
    return quantized_topk_coded(
        projected.select(F.col(id_col), F.col("rvec").alias("qvec")),
        q_rp,
        id_col=id_col,
        k=k,
    )


# ----------------------------------------------------------------- IVF-PQ --

def ivf_pq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 8,
    k_c: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    max_abs: float | None = None,
    exclude_ids: list | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ ANN — the standard FAISS pairing (IndexIVFPQ): coarse
    cells prune WHICH rows are scanned, PQ-ADC codes shrink WHAT each
    scanned row costs. Coarse stage is ivf_topk's quantizer verbatim
    (training-free first-n_cells centroids or a supplied
    kmeans_centroids table; rounded-cosine argmax, ties -> lowest cid);
    fine stage is pq_topk's int8 -> m-subspace -> k_c-centroid ADC
    ranking verbatim, restricted to the n_probe probed cells. Output
    (vec_id, pq_dist, rank) by ascending ADC distance — the lossy
    approximation of the reference's exact top-k L2 retrieval
    (/root/reference/common/repositories/vector_repository.py:56-67).

    Codebooks are trained on the FULL corpus (first k_c rows by id),
    not the probed subset: encoding is query-independent, so a batched
    caller encodes once and every query pays only its cell probe plus
    the tiny ADC LUT — the production IVF-PQ serving shape.

    Scale: centroids and codebooks are broadcast-sized; assignment and
    encoding are zero-shuffle codegen maps over the corpus; the probe
    cuts the ADC scan to ~n_probe/n_cells of the corpus; top-k is
    TakeOrderedAndProject. Every ranking step after the int8 cast is
    exact BIGINT arithmetic, so the DuckDB oracle
    (contract:ann_ivf_pq_topk) replays it bit-identically."""
    ma = corpus_max_abs(embeddings, vec_col) if max_abs is None else float(max_abs)
    coded = quantize_embeddings(embeddings, id_col, vec_col, max_abs=ma)
    books = pq_codebooks(coded, id_col, m=m, k_c=k_c)
    q8 = quantize_query(query_vec, ma)

    cents = (
        F.broadcast(centroids.select("cid", "cv"))
        if centroids is not None
        else F.broadcast(
            embeddings.where(F.col(id_col) < n_cells).select(
                F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
            )
        )
    )
    assign = _assign_to_cells(embeddings, cents, F.col(vec_col), id_col).select(
        id_col, "cid"
    )
    probe = probe_cells(query_vec, cents.collect(), n_probe)
    cand_ids = assign.where(F.col("cid").isin(probe)).select(id_col)
    enc = pq_encode(coded.join(cand_ids, id_col), books, id_col)
    return pq_topk_encoded(enc, books, q8, id_col, k, exclude_ids)
