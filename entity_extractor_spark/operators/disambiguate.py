"""s4b — retrieval-scored disambiguation for residual linking ambiguity.

Reference analog: the entity_extractor module ranks all chunks of a document
by embedding distance before invoking the extractor
(utils/llm_invoker.py:106-120, pgvector L2 top-k
common/repositories/vector_repository.py:56-67). In the batch linking
cascade (J5) keys resolve almost everything; when an observation matches NO
key, the north-star design scores it against the candidate dictionary with
a TF-IDF/embedding cosine and links to the best candidate above a floor
(W1 top-k + W3 first-match-wins).

Implementation is a deterministic HASHED-TF cosine, entirely in built-in
column functions (no fitted vocabulary, no Python): tokens hash into B
buckets via md5 (portable — the DuckDB oracle replays the identical
formula), per-text bucket counts form the vector, cosine is computed by a
bucket-equi join + partial-agg dot product. At 10^12-doc scale the
candidate side is a broadcast dimension and the token explode is a narrow
map; the only shuffle is the (id, bucket) count agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 64


def hashed_tf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, bucket, tf) sparse vectors: bucket = md5(token) mod B over
    lowercased whitespace tokens; tf = token count in the bucket."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")).alias("tok"),
    )
    bucket = F.pmod(F.conv(F.substring(F.md5(F.col("tok")), 1, 12), 16, 10).cast("long"), F.lit(N_BUCKETS))
    return toks.withColumn("bucket", bucket).groupBy("id", "bucket").agg(
        F.count("*").cast("double").alias("tf")
    )


def cosine_scores(query_vecs: DataFrame, cand_vecs: DataFrame) -> DataFrame:
    """(query id `qid`, candidate id `cid`, cos) for every pair sharing at
    least one bucket. Norms are per-id aggregates; the dot product is a
    bucket-equi join — both algebraic, map-side combinable."""
    qn = query_vecs.groupBy("id").agg(F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("qnorm"))
    cn = cand_vecs.groupBy("id").agg(F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("cnorm"))
    q = query_vecs.select(F.col("id").alias("qid"), "bucket", F.col("tf").alias("qtf"))
    c = cand_vecs.select(F.col("id").alias("cid"), "bucket", F.col("tf").alias("ctf"))
    dots = (
        q.join(c, "bucket")
        .groupBy("qid", "cid")
        .agg(F.sum(F.col("qtf") * F.col("ctf")).alias("dot"))
    )
    return (
        dots.join(qn.withColumnRenamed("id", "qid"), "qid")
        .join(cn.withColumnRenamed("id", "cid"), "cid")
        .select("qid", "cid", (F.col("dot") / (F.col("qnorm") * F.col("cnorm"))).alias("cos"))
    )


def best_candidate(
    queries: DataFrame,
    candidates: DataFrame,
    query_id: str,
    query_text: str,
    cand_id: str,
    cand_text: str,
    min_score: float = 0.0,
) -> DataFrame:
    """Top-1 candidate per query by hashed-TF cosine (W1 rank + W3
    first-match-wins; candidate id breaks score ties deterministically)."""
    scores = cosine_scores(
        hashed_tf(queries, query_id, query_text),
        hashed_tf(candidates, cand_id, cand_text),
    ).where(F.col("cos") > min_score)
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            F.col("qid"),
            F.col("cid").alias("best_candidate"),
            F.round("cos", 6).alias("score"),
        )
    )


def link_prior(
    observations: DataFrame,
    mention_col: str,
    entity_col: str,
) -> DataFrame:
    """Commonness prior P(entity | mention) from observed link history —
    the Milne-Witten prior every production entity linker consults
    before any context model runs ("jaguar" -> the car 70%, the cat 25%,
    the OS 5%):

        (mention, entity, cnt, mention_total, prior_ppm, rank)

    prior_ppm = cnt * 10^6 div mention_total (exact integer floor);
    rank is row_number over (cnt DESC, entity ASC) — entity is unique
    within a mention so the order is total and tie-free: rank 1 is THE
    argmax candidate on any engine/partitioning.
    The prior is what turns the linking cascade's "no key matched" path
    from uniform-over-candidates into measured-popularity-first, and the
    rank-1 share doubles as an ambiguity score (a mention whose top
    entity holds < ~70% needs the cosine context model; one at 10^6
    needs nothing).

    Scale shape: ONE (mention, entity)-keyed algebraic count over the
    observation log (map-side combine collapses hot mentions), the
    mention marginal is a window-sum over the collapsed pair table (tiny
    relative to the log: |distinct pairs|, not |observations|), and the
    rank runs over the same mention-partitioned exchange — one shuffle
    total. NULL mentions/entities are excluded (an unlinked observation
    teaches the prior nothing). Counts cast to BIGINT; the ppm product
    runs in DECIMAL(38,0) — a 10^12-observation mention must widen, not
    wrap."""
    pairs = (
        observations.where(
            F.col(mention_col).isNotNull() & F.col(entity_col).isNotNull()
        )
        .groupBy(
            F.col(mention_col).alias("mention"),
            F.col(entity_col).alias("entity"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("mention")
    wr = w.orderBy(F.col("cnt").desc(), F.col("entity").asc())
    return pairs.select(
        "mention",
        "entity",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("mention_total"),
        F.expr(
            "CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000"
            " DIV sum(cnt) OVER (PARTITION BY mention) AS BIGINT)"
        ).alias("prior_ppm"),
        F.row_number().over(wr).cast("long").alias("rank"),
    )
