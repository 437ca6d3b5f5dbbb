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


# Above this many distinct matched words, the span-prefilter array literal
# stops being "tiny" and the prefilter is skipped (the join alone is fine).
PREFILTER_VOCAB_MAX = 512

_MENTIONS_SCHEMA = (
    "doc_id string, span_offset int, keyword string, word string, "
    "confidence double, mtype string, word_idx int"
)


def detect_mentions(documents: DataFrame, keywords: list[dict]) -> DataFrame:
    """documents(doc_id, spans) -> mentions(doc_id, span_offset, keyword,
    word, confidence, mtype, word_idx). confidence is 100.0 (synthetic spans
    carry no OCR confidence; F3 transform = round(conf*100,2)).

    Two JVM passes, no Python in either:
      1. vocab pass — match the DISTINCT lowered word vocabulary against
         the gazetteer (vocabulary is orders of magnitude smaller than the
         word stream; the distinct() is map-side combined). The surviving
         (word, keyword) pairs are collected — keyword-dimension sized.
      2. probe pass — spans are first pruned by a codegen'd
         arrays_overlap(split(lower(text)), <matched words literal>), so
         the expensive word explode runs only over spans that can produce a
         match; survivors explode and broadcast-hash-join the matched
         pairs. O(words_of_matching_spans) hash lookups, zero substring
         scans on the stream.
    The pair collect makes this operator eager (like any broadcast build);
    at gazetteer sizes past ~10^4 swap stage 2 for an Aho-Corasick
    mapInPandas — the surrounding plumbing is unchanged."""
    spark = documents.sparkSession
    kw = F.broadcast(
        spark.createDataFrame(
            [(k["keyword"], k["keyword"].lower(), k["mtype"]) for k in keywords],
            "keyword string, kw_lower string, mtype string",
        )
    )
    spans = documents.select("doc_id", F.explode("spans").alias("span")).where(
        (F.col("span.kind") == "text") & (F.col("span.text") != "")
    )

    # python str.split(): whitespace split, empties dropped; word_idx indexes
    # the non-empty tokens — filter() before posexplode reproduces that.
    def words_of(sp: DataFrame) -> DataFrame:
        return sp.select(
            "doc_id",
            F.col("span.offset").alias("span_offset"),
            F.posexplode(F.filter(F.split("span.text", r"\s+"), lambda x: x != "")).alias(
                "word_idx", "word"
            ),
        ).withColumn("word_lower", F.lower("word"))

    vocab = words_of(spans).select("word_lower").distinct()
    matched_rows = vocab.join(
        kw, F.col("word_lower").contains(F.col("kw_lower"))
    ).collect()
    if not matched_rows:
        return spark.createDataFrame([], _MENTIONS_SCHEMA)
    matched = F.broadcast(
        spark.createDataFrame(
            matched_rows, "word_lower string, keyword string, kw_lower string, mtype string"
        )
    )
    matched_words = sorted({r["word_lower"] for r in matched_rows})
    if len(matched_words) <= PREFILTER_VOCAB_MAX:
        # lower() the whole text THEN split: identical tokens to
        # split-then-lower (case has no whitespace), and everything stays
        # inside whole-stage codegen (no higher-order lambdas).
        spans = spans.where(
            F.arrays_overlap(
                F.split(F.lower("span.text"), r"\s+"),
                F.array(*[F.lit(x) for x in matched_words]),
            )
        )
    return (
        words_of(spans)
        .join(matched, "word_lower")
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
