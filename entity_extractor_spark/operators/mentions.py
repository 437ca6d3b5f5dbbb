"""Stage s2 — mention detection: gazetteer keyword scan over text spans.

Reproduces the reference's per-word predicate exactly
(file_analysis_service.py:68-121): a word matches keyword k iff
  re.search(r'\\b' + re.escape(k) + r'\\b' applied LOWERCASED, word.lower())
  OR k.lower() in word.lower()
(the pattern string itself is lowercased after escaping — :84-87). The scan
is per whitespace word, so multi-word keywords can never match — that quirk
is preserved (and pinned by tests).

Implementation: mapInPandas (Arrow-batched; north rule: no per-row Python
UDFs). Per batch we explode spans -> words vectorized in pandas, prefilter
words with ONE combined alternation regex (the cheap pass that discards
~all words), then run the exact per-keyword predicate only on surviving
words. The gazetteer is a plain broadcast list (tiny dimension — S5,
keywords_service.py:35-47).

Scale: cost ~ O(words)·1 regex + O(survivors × keywords). For very large
gazetteers swap the prefilter for an Aho-Corasick pass per partition
(SURVEY.md §7 risk (c)); plumbing stays identical.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import MENTIONS_SCHEMA

_MENTIONS_OUT = MENTIONS_SCHEMA.add("word_idx", "integer", False)


def detect_mentions(documents: DataFrame, keywords: list[dict]) -> DataFrame:
    """documents(doc_id, spans) -> mentions(doc_id, span_offset, keyword,
    word, confidence, mtype, word_idx). confidence is 100.0 (synthetic spans
    carry no OCR confidence; F3 transform = round(conf*100,2))."""
    kws = [(k["keyword"], k["mtype"]) for k in keywords]

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # compile once per task, not per batch
        exact = [
            (k, m, re.compile(r"\b" + re.escape(k).lower() + r"\b"), k.lower())
            for k, m in kws
        ]
        pre = re.compile("|".join(re.escape(k.lower()) for k, _ in kws)) if kws else None
        for pdf in batches:
            out = {
                "doc_id": [], "span_offset": [], "keyword": [], "word": [],
                "confidence": [], "mtype": [], "word_idx": [],
            }
            if pre is None or pdf.empty:
                yield pd.DataFrame(out)
                continue
            # explode spans -> word rows, all vectorized
            doc_ids, offsets, words = [], [], []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                for s in spans:
                    if s["kind"] != "text" or not s["text"]:
                        continue
                    for wi, w in enumerate(s["text"].split()):
                        doc_ids.append(doc_id)
                        offsets.append(s["offset"])
                        words.append((wi, w))
            if not words:
                yield pd.DataFrame(out)
                continue
            base = pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "span_offset": offsets,
                    "word_idx": [wi for wi, _ in words],
                    "word": [w for _, w in words],
                }
            )
            base["lower"] = base["word"].str.lower()
            survivors = base[base["lower"].str.contains(pre, regex=True)]
            frames = []
            for k, m, rx, klow in exact:
                hit = survivors["lower"].str.contains(rx, regex=True) | survivors[
                    "lower"
                ].str.contains(klow, regex=False)
                if hit.any():
                    f = survivors.loc[hit, ["doc_id", "span_offset", "word", "word_idx"]].copy()
                    f["keyword"] = k
                    f["mtype"] = m
                    frames.append(f)
            if frames:
                res = pd.concat(frames, ignore_index=True)
                res["confidence"] = round(1.0 * 100, 2)  # F3
                yield res[
                    ["doc_id", "span_offset", "keyword", "word", "confidence", "mtype", "word_idx"]
                ]
            else:
                yield pd.DataFrame(out)

    return documents.mapInPandas(scan, schema=_MENTIONS_OUT)


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
