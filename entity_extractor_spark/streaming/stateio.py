"""Shared state-dir IO for the streaming accumulators (ingest + dedup).

All probes for "does accumulated state exist yet?" go through the Spark
reader, never driver-local os.path — the state dirs stay portable to any
Hadoop URI (hdfs://, s3a://), which is the deployment the streaming
modules pitch. Reference analog: the accumulating graph DB the queue
consumer merges into (processors/queue.py:157-201)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_glob(spark: SparkSession, schema, pattern: str) -> DataFrame | None:
    """Glob read that returns None when no matching dir/file exists yet
    (instead of raising PATH_NOT_FOUND)."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.schema(schema).parquet(pattern)
        df.schema  # force path resolution so a missing glob raises here
        return df
    except AnalysisException:
        return None


# ------------------------------------------------------------- compaction --
# A long-lived stream accumulates thousands of batch_NNNNNN subdirs; the
# glob read then pays per-dir listing and tiny-file overhead every batch.
# compact_batches() rewrites every committed batch dir up to a cutoff into
# ONE compact_NNNNNN dir that stores the batch id as a real _batch column
# (the path-derived id is materialized, so fence filters keep working),
# commits it via manifest update, then deletes the covered dirs. Crash
# anywhere is safe: read_state() ignores batch dirs <= the manifest cutoff,
# so a covered-but-not-yet-deleted dir is never double-counted, and a
# compact tmp dir that never reached the manifest is invisible.
# On a table format this whole section is RewriteDataFiles + one snapshot
# commit; the manifest JSON mirrors plans/lineage.py's _lineage.json
# (the documented parquet-dir fallback).

import json as _json
import os as _os
import re as _re
import shutil as _shutil

from pyspark.sql import functions as F

_BATCH_COL = "_batch"
_MANIFEST = "_compaction.json"


def _manifest_path(acc_dir: str) -> str:
    return _os.path.join(acc_dir, _MANIFEST)


def compacted_upto(acc_dir: str) -> int | None:
    """Newest committed compaction cutoff (inclusive), or None."""
    p = _manifest_path(acc_dir)
    if not _os.path.exists(p):
        return None
    with open(p) as f:
        return int(_json.load(f)["upto"])


def _with_batch_from_path(df):
    return df.withColumn(
        _BATCH_COL,
        F.regexp_extract(F.input_file_name(), r"/batch_(\d+)/", 1).cast("int"),
    )


def read_state(spark: SparkSession, schema, acc_dir: str) -> DataFrame | None:
    """Accumulated state as (data columns..., _batch int): the newest
    compaction plus every live batch dir AFTER its cutoff. None when no
    state has ever been committed."""
    upto = compacted_upto(acc_dir)
    parts = []
    if upto is not None:
        # the compact dir stores _batch as a real column
        compact = read_glob(
            spark,
            f"{schema}, {_BATCH_COL} int",
            _os.path.join(acc_dir, f"compact_{upto:06d}"),
        )
        if compact is not None:
            parts.append(compact)
    live = read_glob(spark, schema, _os.path.join(acc_dir, "batch_*"))
    if live is not None:
        live = _with_batch_from_path(live)
        if upto is not None:
            # covered dirs may linger after a crash between manifest commit
            # and deletion — never double-count them
            live = live.where(F.col(_BATCH_COL) > upto)
        parts.append(live)
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_batches(spark: SparkSession, schema, acc_dir: str) -> int | None:
    """Rewrite all currently-committed batch dirs (and any previous
    compaction) into one compact dir; returns the new cutoff, or None if
    there is nothing to compact. Single-writer maintenance op (run it from
    the stream's own foreachBatch cadence or a side job between batches)."""
    if not _os.path.isdir(acc_dir):
        return None
    batch_ids = sorted(
        int(m.group(1))
        for d in _os.listdir(acc_dir)
        if (m := _re.fullmatch(r"batch_(\d{6})", d))
    )
    prev = compacted_upto(acc_dir)
    live_ids = [b for b in batch_ids if prev is None or b > prev]
    if not live_ids:
        return prev
    upto = max(live_ids)
    state = read_state(spark, schema, acc_dir)  # compact head + live tail
    final = _os.path.join(acc_dir, f"compact_{upto:06d}")
    tmp = final + "._tmp"
    if _os.path.exists(tmp):
        _shutil.rmtree(tmp)
    state.write.mode("overwrite").parquet(tmp)
    if _os.path.exists(final):
        _shutil.rmtree(final)
    _os.replace(tmp, final)
    # manifest commit: from here on, reads use the new compact dir and
    # ignore everything it covers
    mtmp = _manifest_path(acc_dir) + ".tmp"
    with open(mtmp, "w") as f:
        _json.dump({"upto": upto}, f)
    _os.replace(mtmp, _manifest_path(acc_dir))
    # cleanup (safe to crash mid-way: covered dirs are ignored by readers)
    for b in live_ids:
        d = _os.path.join(acc_dir, f"batch_{b:06d}")
        if _os.path.isdir(d):
            _shutil.rmtree(d)
    if prev is not None and prev != upto:
        old = _os.path.join(acc_dir, f"compact_{prev:06d}")
        if _os.path.isdir(old):
            _shutil.rmtree(old)
    return upto
