"""ngram_jaccard_pairs quadratic-blocking guard: a hub group larger than
max_group_size fails loudly instead of silently going n²; the blocked path
(groups within the limit) returns the same pairs with or without the guard."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from entity_extractor_spark.operators import dedupe as D


def _docs(spark, n_hub: int):
    rows = [
        Row(doc_id=i, text=f"alpha beta gamma delta token{i % 3}", lang="en")
        for i in range(n_hub)
    ]
    rows += [Row(doc_id=1000 + i, text="uno dos tres cuatro", lang="es") for i in range(3)]
    return spark.createDataFrame(rows)


def test_hub_group_raises(spark):
    df = _docs(spark, n_hub=12)
    pairs = D.ngram_jaccard_pairs(
        df, "doc_id", "text", "lang", threshold=0.0, max_group_size=10
    )
    with pytest.raises(Exception, match="max_group_size"):
        pairs.collect()


def test_guarded_path_matches_unguarded(spark):
    df = _docs(spark, n_hub=8)
    guarded = D.ngram_jaccard_pairs(
        df, "doc_id", "text", "lang", threshold=0.1, max_group_size=10
    )
    unguarded = D.ngram_jaccard_pairs(
        df, "doc_id", "text", "lang", threshold=0.1, max_group_size=None
    )
    key = lambda r: (r.doc1, r.doc2)  # noqa: E731
    g = sorted(guarded.collect(), key=key)
    u = sorted(unguarded.collect(), key=key)
    assert g == u
    assert len(g) > 0
