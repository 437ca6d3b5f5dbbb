"""Streaming dedup gate: cross-batch chains collapse to the earliest kept
doc, the kept set is LSH-collision-free, redelivery is a no-op, and the
foreachBatch wiring runs end-to-end."""

from __future__ import annotations

import pyspark.sql.functions as F

from entity_extractor_spark.operators import dedupe as D
from entity_extractor_spark.streaming.dedup import (
    dedup_batch,
    dedup_stream,
    read_decisions,
    read_index,
)

SF = "/root/testdata/sf0.001"


def _base_docs(spark, lo, hi):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(f"doc_id >= {lo} and doc_id < {hi}")
        .select("doc_id", "text")
    )


def test_streaming_dedup_chains_and_invariants(spark, tmp_path):
    out = str(tmp_path / "dd")
    b0 = _base_docs(spark, 0, 20)
    # batch 1: fresh docs + a clone of doc 3 (id 1003)
    b1 = _base_docs(spark, 20, 40).unionByName(
        _base_docs(spark, 3, 4).select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    )
    # batch 2: fresh docs + a clone of the batch-1 CLONE (id 2003 ~ 1003 ~ 3)
    # and a within-batch duplicated pair (2050, 2051 share one text)
    seed = _base_docs(spark, 7, 8)
    b2 = (
        _base_docs(spark, 40, 60)
        .unionByName(_base_docs(spark, 3, 4).select((F.col("doc_id") + 2000).alias("doc_id"), "text"))
        .unionByName(seed.select(F.lit(2050).alias("doc_id"), "text"))
        .unionByName(seed.select(F.lit(2051).alias("doc_id"), "text"))
    )
    for i, b in enumerate((b0, b1, b2)):
        dedup_batch(spark, b, i, out)

    dec = {r["doc_id"]: (r["keeper"], r["is_dup"]) for r in read_decisions(spark, out).collect()}

    # cross-batch chain: both clones point at the ORIGINAL doc 3 (the
    # batch-1 dup never entered the index, so batch 2 matched doc 3 itself)
    assert dec[1003] == (3, True) and dec[2003] == (3, True)
    # the within-batch pair collapsed; its keeper points at doc 7 (same
    # text already kept in batch 0)
    assert dec[2050] == (7, True) and dec[2051] == (7, True)
    # every keeper is itself kept (a dup is never a keeper)
    kept = {d for d, (k, dup) in dec.items() if not dup}
    assert all(k in kept for k, _ in dec.values())
    # kept set is LSH-collision-free: the index joined with itself across
    # different docs yields nothing
    idx = read_index(spark, out)
    col = (
        idx.alias("x")
        .join(idx.alias("y"), ["band", "bucket"])
        .where("x.doc_id < y.doc_id")
        .count()
    )
    assert col == 0


def test_streaming_dedup_redelivery_idempotent(spark, tmp_path):
    out = str(tmp_path / "dd")
    b0 = _base_docs(spark, 0, 20)
    b1 = _base_docs(spark, 20, 40).unionByName(
        _base_docs(spark, 5, 6).select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    )
    dedup_batch(spark, b0, 0, out)
    first = sorted(map(tuple, dedup_batch(spark, b1, 1, out).collect()))
    # batch 2 commits, THEN batch 1 is redelivered: decisions must not
    # change (the index read is fenced to batches < 1)
    dedup_batch(spark, _base_docs(spark, 40, 50), 2, out)
    again = sorted(map(tuple, dedup_batch(spark, b1, 1, out).collect()))
    assert again == first


def test_dedup_stream_foreachbatch(spark, tmp_path):
    """foreachBatch wiring over corpus-shaped (doc_id, spans) files."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")

    def spansify(df, id_offset=0):
        return df.select(
            F.format_string("doc-%08d", (F.col("doc_id") + id_offset).cast("int")).alias("doc_id"),
            F.array(
                F.struct(
                    F.lit("text").alias("kind"),
                    F.col("text").alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            ).alias("spans"),
        )

    import glob
    import os
    import shutil

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    batches = [
        spansify(docs.where("doc_id < 30")),
        spansify(docs.where("doc_id >= 30 and doc_id < 60")).unionByName(
            spansify(docs.where("doc_id = 11"), id_offset=5000)  # clone of doc 11
        ),
    ]
    os.makedirs(src, exist_ok=True)
    for i, b in enumerate(batches):  # file-stream source wants plain FILES
        tmp = str(tmp_path / f"_tmp{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/f{i}.parquet")
        shutil.rmtree(tmp)
        os.utime(f"{src}/f{i}.parquet", (1_700_000_000 + i * 60,) * 2)

    # compact_every=2: the accumulators fold into one compact dir after the
    # second batch; every assertion below reads through the compacted state
    q = dedup_stream(spark, src, out, max_files_per_trigger=1, compact_every=2)
    q.awaitTermination(120)
    dec = {r["doc_id"]: (r["keeper"], r["is_dup"]) for r in read_decisions(spark, out).collect()}
    assert len(dec) == 61
    assert dec[5011] == (11, True)
    assert os.path.isdir(f"{out}/decisions/compact_000001")
    assert not glob.glob(f"{out}/decisions/batch_*")
    assert os.path.isdir(f"{out}/lsh_index/compact_000001")


def test_streaming_dedup_reingest_of_kept_doc_stays_kept(spark, tmp_path):
    """A doc_id legitimately re-ingested in a LATER batch after being kept
    collides with its own index rows; the self-match is excluded so it
    stays kept-as-itself and the is_dup == (keeper != doc_id) invariant
    holds for every decision row."""
    out = str(tmp_path / "dd")
    dedup_batch(spark, _base_docs(spark, 0, 20), 0, out)
    # batch 1 re-emits doc 4 verbatim plus fresh docs
    b1 = _base_docs(spark, 20, 30).unionByName(_base_docs(spark, 4, 5))
    dec1 = {r["doc_id"]: (r["keeper"], r["is_dup"]) for r in dedup_batch(spark, b1, 1, out).collect()}
    assert dec1[4] == (4, False)
    for d, (k, dup) in dec1.items():
        assert dup == (k != d)
