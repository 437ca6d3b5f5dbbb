"""Benchmark-decontamination scan: per-document n-gram overlap against an
evaluation set — the check a pre-training pipeline runs so eval benchmarks
do not leak into the training corpus (the PaLM/GPT-3 "13-gram overlap"
procedure, here parameterized over word n-grams).

Scale shape at 100 TB:
  * the evaluation side (benchmarks) is tiny relative to the corpus — its
    distinct n-gram set aggregates map-side and BROADCASTS, so the
    membership test is a broadcast hash join under every corpus partition
    with NO corpus shuffle on the join;
  * corpus documents contribute their DISTINCT n-grams only (array_distinct
    before the explode — doc-local dedup, narrow), so the exploded row
    count is bounded by vocabulary growth, not raw token count;
  * the per-doc overlap aggregation groups on doc_id, which partial-
    aggregates map-side because the exploded grams of one doc stay in the
    partition that produced them (explode preserves partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_ngrams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc_id, gram) — each document's DISTINCT word n-grams; documents
    with fewer than n tokens yield no rows (they have no n-gram and are
    absent from the overlap report, mirroring the oracle).

    Gram construction zips n shifted slices of the token array and joins
    each struct — one lambda evaluation per gram. The sequence +
    per-position element_at form costs ~2.4x more (n indexed array reads
    with bound checks per interpreted lambda call; HOF lambdas do not
    reach codegen)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    width = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, width) for j in range(n)])
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)])
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(grams)).alias("gram"),
    )


def ngram_contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per corpus document: how many of its distinct word n-grams appear
    anywhere in the evaluation set, and the contaminated fraction.

    Returns (doc_id, n_grams, n_hit, contamination) — `contamination`
    rounded to 6 decimals for exact cross-engine comparison. A downstream
    curation pass drops (or flags) docs above a threshold.
    """
    eval_grams = (
        _doc_ngrams(eval_docs, id_col, text_col, n).select("gram").distinct()
    )
    doc_grams = _doc_ngrams(corpus, id_col, text_col, n)
    joined = doc_grams.join(
        F.broadcast(eval_grams.withColumn("hit", F.lit(1))), "gram", "left"
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hit"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_hit") / F.col("n_grams").cast("double"), 6),
        )
    )


def cross_split_leakage(
    pairs: DataFrame, labels: DataFrame, id_col: str = "doc_id", split_col: str = "split"
) -> DataFrame:
    """Near-duplicate pairs that STRADDLE split boundaries — the
    train/eval leakage audit run after assign_splits + LSH pairing: a
    test document with a near-duplicate in train silently inflates eval
    scores, which is the same failure class as benchmark contamination
    (ngram_contamination) but internal to the corpus. Input `pairs`
    (doc1, doc2) from any pair generator (dedupe.lsh_candidate_pairs,
    simhash radius, embedding near-dup); `labels` (id, split) from
    sampling.assign_splits. Output: the offending pairs with both labels.

    Scale shape: two hash equi-joins of the (small) pair table against the
    label table and a codegen'd filter — no new shuffle structure beyond
    what the pair generator already paid. Fix-up action downstream:
    quarantine the eval side or re-assign the pair to one split.
    """
    l1 = labels.select(F.col(id_col).alias("doc1"), F.col(split_col).alias("split1"))
    l2 = labels.select(F.col(id_col).alias("doc2"), F.col(split_col).alias("split2"))
    return (
        pairs.join(l1, "doc1")
        .join(l2, "doc2")
        .where(F.col("split1") != F.col("split2"))
        .select("doc1", "doc2", "split1", "split2")
    )
