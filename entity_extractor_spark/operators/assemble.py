"""Stage s1 — assemble: per-doc concatenated text + span-sequence
fingerprint (W2 invariant, BASELINE.json input_hint).

reference: page-order text concat file_analysis_service.py:556-564,760-773.
All column ops — stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import page_text_concat, span_sequence_fingerprint


def assemble(documents: DataFrame) -> DataFrame:
    """F10 document assembly: per-doc concatenated page text plus the
    ordered span-sequence fingerprint (the input_hint per-row invariant's
    check column) — one narrow projection, no shuffle."""
    return documents.select(
        "doc_id",
        "spans",
        page_text_concat(F.col("spans")).alias("text"),
        span_sequence_fingerprint(F.col("spans")).alias("span_fingerprint"),
        F.size("spans").alias("n_spans"),
    )


def check_span_invariant(before: DataFrame, after: DataFrame) -> int:
    """Count rows whose ordered span sequence changed between two doc-level
    tables; 0 required (input_hint per-row invariant). Join on doc_id and
    compare fingerprints — a full shuffle-free check when both sides share
    partitioning."""
    b = before.select("doc_id", span_sequence_fingerprint(F.col("spans")).alias("f1"))
    a = after.select("doc_id", span_sequence_fingerprint(F.col("spans")).alias("f2"))
    return (
        b.join(a, "doc_id", "full")
        .where((F.col("f1").isNull()) | (F.col("f2").isNull()) | (F.col("f1") != F.col("f2")))
        .count()
    )
