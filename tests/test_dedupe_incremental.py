"""Incremental LSH dedup: the new-batch-vs-index join must find exactly
the cross-split subset of the full batch self-join's candidate pairs —
recompute nothing, lose nothing."""

from __future__ import annotations

from entity_extractor_spark.operators import dedupe as D

SF = "/root/testdata/sf0.001"


def test_incremental_lsh_equals_cross_split_pairs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").where("doc_id % 2 = 0")
    index_df = docs.where("doc_id % 4 = 0")
    new_df = docs.where("doc_id % 4 = 2")

    idx = D.lsh_bucket_table(index_df, "doc_id", "text")
    got = {
        (r["new_id"], r["index_id"])
        for r in D.incremental_lsh_matches(new_df, idx, "doc_id", "text").collect()
    }

    full = {
        (r["doc1"], r["doc2"])
        for r in D.lsh_candidate_pairs(
            D.minhash_signatures(docs, "doc_id", "text")
        ).collect()
    }
    expect = set()
    for a, b in full:
        if a % 4 == 2 and b % 4 == 0:
            expect.add((a, b))
        elif b % 4 == 2 and a % 4 == 0:
            expect.add((b, a))
    assert got == expect
    assert expect, "degenerate fixture: no cross-split near-dup pairs at all"


def test_incremental_lsh_self_match(spark):
    """A new doc identical to an indexed doc always matches (all bands
    collide)."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet").where("doc_id < 20")
    clone = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    idx = D.lsh_bucket_table(docs, "doc_id", "text")
    got = {
        (r["new_id"], r["index_id"])
        for r in D.incremental_lsh_matches(clone, idx, "doc_id", "text").collect()
    }
    assert {(d + 100000, d) for d in range(20)} <= got
