"""X4 semantic chunker + S8 chunk->embed->write stage (the RAG lifecycle).

Reference behavior (SURVEY.md §3.3):
  * semantic chunking with interquartile breakpoints (threshold amount 1.5)
    and a RecursiveCharacterTextSplitter(2000, 200) fallback
    (app/modules/entity_extractor/services/embedding_service.py:36-68,
    entity_extractor/constants.py:122-130);
  * chunks are embedded and written to a pgvector table
    (common/repositories/vector_repository.py:16-54).

Spark-first design:
  * fixed chunking is pure column algebra — sequence() of start offsets,
    posexplode, substring — whole-stage codegen, replayable in ANSI SQL
    (the DuckDB oracle does);
  * semantic chunking sentence-splits with a lookbehind regex, embeds each
    sentence with the deterministic hashed-TF (disambiguate.py), computes
    consecutive-sentence cosine distances with one self-join on
    (doc, sent_idx+1), derives each doc's breakpoint threshold
    Q3 + 1.5*IQR with the EXACT percentile aggregate (no approx — the
    pure-Python pytest oracle must replay bit-for-bit), and assigns
    chunk ids with a windowed cumulative sum over break flags;
  * the embed stage emits DENSE array<float> vectors (bucket-indexed
    hashed-TF) so the output table is schema-compatible with the driver's
    embeddings.parquet and every ANN operator in similarity.py;
  * everything shuffles on doc-aligned keys only (doc_id / chunk_id) —
    no global ordering, no driver loop; at 10^12 docs each stage is a
    narrow map + one keyed agg.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .disambiguate import N_BUCKETS, hashed_tf

CHUNK_SIZE = 2000     # constants.py:122-130 (fallback splitter)
CHUNK_OVERLAP = 200
BREAKPOINT_IQR = 1.5  # embedding_service.py: interquartile threshold_amount
SENT_RE = r"(?<=[.!?])\s+"


def _chunk_starts(text_len, size: int, step: int):
    """Start offsets 0, step, 2*step, ... — a start is kept iff it is the
    first chunk or the PREVIOUS chunk did not already reach end-of-text
    (no fully-contained trailing chunk)."""
    starts = F.sequence(F.lit(0), F.greatest(text_len - 1, F.lit(0)), F.lit(step))
    return F.filter(starts, lambda s: (s == 0) | (s - step + size < text_len))


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Fixed-window chunker (the reference's fallback splitter, 2000/200):
    (doc_id, chunk_idx, chunk_id, text, start_offset, end_offset).
    Pure column ops; one narrow map, no shuffle."""
    step = chunk_size - overlap
    tlen = F.length(F.col(text_col))
    out = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("_t"),
        F.posexplode(_chunk_starts(tlen, chunk_size, step)).alias("chunk_idx", "start_offset"),
    )
    return out.select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(":", "doc_id", F.col("chunk_idx").cast("string")).alias("chunk_id"),
        F.substring(F.col("_t"), F.col("start_offset") + 1, chunk_size).alias("text"),
        "start_offset",
        F.least(F.col("start_offset") + chunk_size, F.length("_t")).alias("end_offset"),
    )


def semantic_chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    iqr_amount: float = BREAKPOINT_IQR,
    max_chunk_chars: int = 2 * CHUNK_SIZE,
) -> DataFrame:
    """Semantic chunker: split at sentence boundaries whose consecutive
    hashed-TF cosine DISTANCE exceeds Q3 + iqr_amount*IQR of the doc's
    distances (embedding_service.py:36-68). Docs with < 3 sentences come
    through as one chunk; chunks longer than max_chunk_chars are re-split
    by the fixed fallback (token-limit analog, constants.py:128).

    Output: (doc_id, chunk_idx, chunk_id, text, n_sentences)."""
    sents = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), SENT_RE), lambda s: F.trim(s) != "")
        ).alias("sent_idx", "sentence"),
    )
    sents = sents.withColumn("sid", F.concat_ws("#", "doc_id", F.col("sent_idx").cast("string")))

    # consecutive-sentence cosine via sparse hashed-TF self-join
    tf = hashed_tf(sents, "sid", "sentence")
    ids = sents.select("sid", "doc_id", "sent_idx")
    v = tf.join(ids, tf["id"] == ids["sid"]).select("doc_id", "sent_idx", "bucket", "tf")
    a = v.select("doc_id", F.col("sent_idx").alias("i"), "bucket", F.col("tf").alias("tfa"))
    b = v.select(
        "doc_id", (F.col("sent_idx") - 1).alias("i"), "bucket", F.col("tf").alias("tfb")
    )
    dots = a.join(b, ["doc_id", "i", "bucket"]).groupBy("doc_id", "i").agg(
        F.sum(F.col("tfa") * F.col("tfb")).alias("dot")
    )
    norms = v.groupBy("doc_id", "sent_idx").agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("nrm")
    )
    na = norms.select("doc_id", F.col("sent_idx").alias("i"), F.col("nrm").alias("na"))
    nb = norms.select("doc_id", (F.col("sent_idx") - 1).alias("i"), F.col("nrm").alias("nb"))
    # distance BEFORE sentence i+1 (gap i -> i+1); disjoint-bucket pairs get
    # no dots row -> cos 0 -> distance 1 (left join from the norm pairs)
    gaps = (
        na.join(nb, ["doc_id", "i"])
        .join(dots, ["doc_id", "i"], "left")
        .select(
            "doc_id",
            F.col("i"),
            (F.lit(1.0) - F.coalesce(F.col("dot") / (F.col("na") * F.col("nb")), F.lit(0.0))).alias("dist"),
        )
    )
    thr = gaps.groupBy("doc_id").agg(
        (
            F.percentile("dist", F.lit(0.75))
            + iqr_amount * (F.percentile("dist", F.lit(0.75)) - F.percentile("dist", F.lit(0.25)))
        ).alias("threshold"),
        F.count("*").alias("n_gaps"),
    )
    breaks = gaps.join(thr, "doc_id").select(
        "doc_id",
        (F.col("i") + 1).alias("sent_idx"),
        # docs with < 3 sentences (< 2 gaps): no statistics -> never split
        ((F.col("dist") > F.col("threshold")) & (F.col("n_gaps") >= 2)).cast("int").alias("brk"),
    )
    marked = sents.join(breaks, ["doc_id", "sent_idx"], "left").fillna({"brk": 0})
    w = Window.partitionBy("doc_id").orderBy("sent_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    grouped = marked.withColumn("grp", F.sum("brk").over(w))
    chunks = (
        grouped.groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sent_idx", "sentence"))),
                    lambda s: s["sentence"],
                ),
                " ",
            ).alias("text"),
            F.count("*").alias("n_sentences"),
        )
    )
    # token-limit analog: oversized semantic chunks re-split by the fixed
    # fallback within the chunk (same sequence/substring algebra)
    step = CHUNK_SIZE - CHUNK_OVERLAP
    resplit = chunks.withColumn(
        "pieces",
        F.when(F.length("text") <= max_chunk_chars, F.array(F.col("text"))).otherwise(
            F.transform(
                _chunk_starts(F.length("text"), CHUNK_SIZE, step),
                lambda s: F.col("text").substr(s + 1, F.lit(CHUNK_SIZE)),
            )
        ),
    ).select("doc_id", "grp", "n_sentences", F.posexplode("pieces").alias("sub_idx", "text"))
    w2 = Window.partitionBy("doc_id").orderBy("grp", "sub_idx")
    out = (
        resplit.withColumn("chunk_idx", (F.row_number().over(w2) - 1).cast("int"))
        .select(
            "doc_id",
            "chunk_idx",
            F.concat_ws(":", "doc_id", F.col("chunk_idx").cast("string")).alias("chunk_id"),
            "text",
            "n_sentences",
        )
    )
    # docs with zero non-empty sentences (empty/whitespace text) still come
    # through as one empty chunk — same doc_id preservation as the fixed
    # chunker, so switching chunkers never changes the downstream doc set
    empty_docs = (
        docs.select(F.col(id_col).cast("string").alias("doc_id"))
        .distinct()
        .join(out.select("doc_id").distinct(), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.lit(0).cast("int").alias("chunk_idx"),
            F.concat_ws(":", "doc_id", F.lit("0")).alias("chunk_id"),
            F.lit("").alias("text"),
            F.lit(0).cast("bigint").alias("n_sentences"),
        )
    )
    return out.unionByName(empty_docs)


def embed_chunks(chunks: DataFrame, id_col: str = "chunk_id", text_col: str = "text") -> DataFrame:
    """Dense hashed-TF embedding per chunk: (chunk_id, embedding
    array<float> of length N_BUCKETS). Bucket counts scatter into the dense
    vector with pure column algebra (map_from_entries + transform) — no
    Python, schema-compatible with the driver embeddings table and every
    similarity.py operator."""
    tf = hashed_tf(chunks, id_col, text_col)
    dense = (
        tf.groupBy("id")
        .agg(F.map_from_entries(F.collect_list(F.struct("bucket", "tf"))).alias("m"))
        .select(
            F.col("id").alias(id_col),
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BUCKETS - 1)),
                lambda b: F.coalesce(
                    F.element_at(F.col("m"), b.cast("long")), F.lit(0.0)
                ).cast("float"),
            ).alias("embedding"),
        )
    )
    # chunks whose text had no tokens embed as the zero vector
    zero = F.transform(F.sequence(F.lit(0), F.lit(N_BUCKETS - 1)), lambda b: F.lit(0.0).cast("float"))
    return (
        chunks.select(id_col)
        .join(dense, id_col, "left")
        .select(id_col, F.coalesce("embedding", zero).alias("embedding"))
    )


def build_chunk_embeddings(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """S8 — the chunk -> embed -> write pipeline stage
    (vector_repository.py:16-54): materializes chunks + their dense
    embeddings as a parquet table (the pgvector-table analog) and returns
    the written table read back (so downstream ANN runs over the committed
    artifact, not the lineage)."""
    chunks = chunk_documents(docs, id_col, text_col, chunk_size, overlap)
    emb = embed_chunks(chunks).join(
        chunks.select("chunk_id", "doc_id", "chunk_idx"), "chunk_id"
    )
    path = os.path.join(out_dir, "chunk_embeddings")
    emb.select("chunk_id", "doc_id", "chunk_idx", "embedding").write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    shards: int = 64,
    salt: str = "pack0",
) -> DataFrame:
    """Concat-and-cut sequence packing: lay documents end-to-end in a
    deterministic order and cut every `budget` tokens — the standard
    pretraining batch-assembly step (each training sequence is a window of
    the concatenated token stream; a document may straddle a cut). Returns
    per document:

        (id, shard, start_bin, end_bin, bin_offset)

    where start_bin/end_bin are the first/last training sequences the doc
    lands in within its shard and bin_offset is its token position inside
    start_bin. Dataloaders map (shard, bin) -> one training sequence.

    Determinism: docs are sharded by md5 bucket and ordered inside each
    shard by (bucket, id) — the same total order sampling uses — so the
    layout is a pure function of (ids, token counts, salt): identical on
    any partitioning, cluster size or retry, and stable under corpus
    append ONLY within untouched shards (packing is inherently
    order-sensitive; shard-local layout bounds the blast radius of a
    corpus delta to the shards whose membership changed — pairs with
    snapshot_diff for incremental repacking).

    Scale shape: ONE exchange on the shard key, then a per-shard running
    sum (window cumsum over rows already sorted by the exchange's sort
    key). `shards` bounds per-window data at corpus_tokens/shards — size
    it so a shard's rows fit one task (at 100 TB: tens of thousands of
    shards). The shard comes from its own md5 slice (hex chars 13-24),
    independent of the ordering bucket (chars 1-12), so shard mass is
    uniform to ~shards/16^12 for ANY shard count — a bucket%shards
    derivation would hand some shards a whole extra residue class of the
    [0, 1e6) bucket grid whenever shards doesn't divide 10^6.
    """
    h = F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(salt)))
    b = F.pmod(F.conv(F.substring(h, 1, 12), 16, 10).cast("long"), F.lit(1_000_000))
    shard = F.pmod(
        F.conv(F.substring(h, 13, 12), 16, 10).cast("long"), F.lit(int(shards))
    )
    w = (
        Window.partitionBy("_shard")
        .orderBy("_bucket", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(tokens_col).alias("_tok"),
            b.alias("_bucket"),
            shard.cast("int").alias("_shard"),
        )
        .withColumn("_cum", F.sum("_tok").over(w))
        .select(
            F.col(id_col),
            F.col("_shard").alias("shard"),
            F.expr(f"(_cum - _tok) div {int(budget)}").alias("start_bin"),
            # a zero-token doc occupies no span; pin it to its start bin
            F.expr(
                f"CASE WHEN _tok > 0 THEN (_cum - 1) div {int(budget)} "
                f"ELSE (_cum - _tok) div {int(budget)} END"
            ).alias("end_bin"),
            F.expr(f"(_cum - _tok) % {int(budget)}").alias("bin_offset"),
        )
    )
