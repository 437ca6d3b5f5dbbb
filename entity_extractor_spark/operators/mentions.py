"""Stage s2 — mention detection: gazetteer keyword scan over text spans.

Reference predicate (file_analysis_service.py:68-121): a word matches
keyword k iff
  re.search((r'\\b' + re.escape(k) + r'\\b').lower(), word.lower())
  OR k.lower() in word.lower()
(the pattern string itself is lowercased after escaping — :84-87). The scan
is per whitespace word, so multi-word keywords can never match — that quirk
is preserved (and pinned by tests).

Subsumption: the regex branch matching implies the escaped literal
k.lower() occurs in word.lower() (the \\b anchors only ADD boundary
constraints around that same literal), so branch-1 ⟹ branch-2 and the whole
predicate reduces to case-insensitive substring containment. The oracle
(oracle.scan_mentions) implements BOTH branches literally and the e2e test
asserts equality, pinning this equivalence.

That reduction lets the scan run entirely JVM-side: explode spans -> words
with built-in array functions, then a broadcast join against the tiny
gazetteer dimension (S5, keywords_service.py:35-47) on a `contains`
predicate — whole-stage codegen, no Python, no Arrow transfer. Cost is
O(words x keywords) vectorized character scans; for gazetteers large
enough that the product matters, swap the broadcast join for an
Aho-Corasick pass in mapInPandas (SURVEY.md §7 risk (c)) — the surrounding
plumbing is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_mentions(documents: DataFrame, keywords: list[dict]) -> DataFrame:
    """documents(doc_id, spans) -> mentions(doc_id, span_offset, keyword,
    word, confidence, mtype, word_idx). confidence is 100.0 (synthetic spans
    carry no OCR confidence; F3 transform = round(conf*100,2))."""
    spark = documents.sparkSession
    kw = F.broadcast(
        spark.createDataFrame(
            [(k["keyword"], k["keyword"].lower(), k["mtype"]) for k in keywords],
            "keyword string, kw_lower string, mtype string",
        )
    )
    # python str.split(): whitespace split, empties dropped; word_idx indexes
    # the non-empty tokens — filter() before posexplode reproduces that.
    words = (
        documents.select("doc_id", F.explode("spans").alias("span"))
        .where((F.col("span.kind") == "text") & (F.col("span.text") != ""))
        .select(
            "doc_id",
            F.col("span.offset").alias("span_offset"),
            F.posexplode(F.filter(F.split("span.text", r"\s+"), lambda x: x != "")).alias(
                "word_idx", "word"
            ),
        )
        .withColumn("word_lower", F.lower("word"))
    )
    # Match against the DISTINCT lowered vocabulary, not the word stream:
    # natural-language word streams have vocabulary orders of magnitude
    # smaller than their length, and the distinct() is map-side combined so
    # the shuffle moves only per-partition vocabularies. The surviving
    # (vocab x keyword) nested-loop substring join is then tiny, and its
    # result — still keyword-dimension sized — broadcast-hash-joins back to
    # the stream: O(words) hash lookups instead of O(words x keywords)
    # substring scans.
    vocab = words.select("word_lower").distinct()
    matched = F.broadcast(vocab.join(kw, F.col("word_lower").contains(F.col("kw_lower"))))
    return (
        words.join(matched, "word_lower")
        .select(
            "doc_id",
            "span_offset",
            "keyword",
            "word",
            F.round(F.lit(1.0) * 100, 2).alias("confidence"),  # F3
            "mtype",
            "word_idx",
        )
    )


def mention_counts(mentions: DataFrame) -> DataFrame:
    """A1 — per-(doc, span) total + distinct-keyword counts
    (file_analysis_service.py:75-121)."""
    return mentions.groupBy("doc_id", "span_offset").agg(
        F.count("*").alias("matched_keywords_count"),
        F.countDistinct("keyword").alias("unique_matched_keywords_count"),
    )


def doc_rollup(page_counts: DataFrame) -> DataFrame:
    """A2 — file-level rollup: total matches + ordered per-span breakdown
    (file_analysis_service.py:775-789)."""
    return page_counts.groupBy("doc_id").agg(
        F.sum("matched_keywords_count").alias("words_count_matched"),
        F.array_sort(
            F.collect_list(F.struct("span_offset", "matched_keywords_count"))
        ).alias("pagewise"),
    )
