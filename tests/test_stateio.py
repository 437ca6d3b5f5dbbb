"""Streaming-state compaction: N batch_* subdirs rewritten into one
compact dir + manifest; readers see identical rows at every crash point,
and the dedup gate's cross-batch semantics survive a mid-stream compaction."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from entity_extractor_spark.streaming import dedup as SD
from entity_extractor_spark.streaming.stateio import (
    compact_batches,
    compacted_upto,
    read_state,
)

SCHEMA = "k bigint, v string"


def _write_batches(spark, acc, n, start=0):
    for b in range(start, start + n):
        spark.createDataFrame(
            [(b * 10 + i, f"v{b}:{i}") for i in range(3)], SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(acc, f"batch_{b:06d}")
        )


def _rows(df):
    return sorted((r["k"], r["v"], r["_batch"]) for r in df.collect())


def test_compaction_preserves_state_over_100_batches(spark, tmp_path):
    acc = str(tmp_path / "acc")
    _write_batches(spark, acc, 100)
    before = _rows(read_state(spark, SCHEMA, acc))
    assert len(before) == 300 and before[0][2] == 0 and before[-1][2] == 99

    assert compact_batches(spark, SCHEMA, acc) == 99
    assert compacted_upto(acc) == 99
    # every covered batch dir is gone; ONE compact dir holds the state
    dirs = sorted(d for d in os.listdir(acc) if not d.startswith("_"))
    assert dirs == ["compact_000099"]
    assert _rows(read_state(spark, SCHEMA, acc)) == before

    # new batches after the compaction merge with the compact head
    _write_batches(spark, acc, 2, start=100)
    after = _rows(read_state(spark, SCHEMA, acc))
    assert len(after) == 306 and after[-1][2] == 101

    # second compaction folds compact head + live tail into a new cutoff
    assert compact_batches(spark, SCHEMA, acc) == 101
    assert _rows(read_state(spark, SCHEMA, acc)) == after
    assert not os.path.isdir(os.path.join(acc, "compact_000099"))


def test_covered_dirs_ignored_after_crashy_cleanup(spark, tmp_path):
    """Crash between manifest commit and covered-dir deletion: a lingering
    (or redelivery-recreated) batch dir <= cutoff must not double-count."""
    acc = str(tmp_path / "acc")
    _write_batches(spark, acc, 5)
    base = _rows(read_state(spark, SCHEMA, acc))
    compact_batches(spark, SCHEMA, acc)
    # simulate the crash: re-create a covered batch dir with the SAME rows
    _write_batches(spark, acc, 1, start=2)
    assert _rows(read_state(spark, SCHEMA, acc)) == base
    # and a fresh compaction absorbs nothing twice
    compact_batches(spark, SCHEMA, acc)
    assert _rows(read_state(spark, SCHEMA, acc)) == base


def test_dedup_gate_equivalent_under_midstream_compaction(spark, tmp_path):
    """Three-batch dedup with a compaction after batch 1 produces the same
    decisions as the uncompacted run (fences move from path-derived batch
    ids to the materialized _batch column)."""
    texts = {
        0: [(1, "alpha beta gamma delta epsilon zeta"), (2, "unrelated words here now")],
        1: [(3, "alpha beta gamma delta epsilon zeta"), (4, "another different doc")],
        2: [(5, "alpha beta gamma delta epsilon zeta"), (6, "unrelated words here now")],
    }

    def run(out):
        for b, rows in texts.items():
            df = spark.createDataFrame(rows, "doc_id bigint, text string")
            SD.dedup_batch(spark, df, b, out)
            if out.endswith("compacted") and b == 1:
                SD.compact_state(spark, out)
        return sorted(
            (r["doc_id"], r["keeper"], r["is_dup"])
            for r in SD.read_decisions(spark, out).collect()
        )

    plain = run(str(tmp_path / "plain"))
    compacted = run(str(tmp_path / "compacted"))
    assert plain == compacted
    # the dup chain collapsed to the earliest kept doc in both runs
    assert (3, 1, True) in plain and (5, 1, True) in plain

    shutil.rmtree(tmp_path, ignore_errors=True)
