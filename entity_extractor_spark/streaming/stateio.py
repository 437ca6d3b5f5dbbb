"""Shared state-dir IO for the streaming accumulators (ingest + dedup).

ALL filesystem access — reads, existence probes, listings, deletes,
manifest IO — goes through the Spark reader or the JVM's Hadoop
FileSystem for the dir's own scheme, never driver-local os.path: the
state dirs stay portable to any Hadoop URI (hdfs://, s3a://), which is
the deployment the streaming modules pitch. Reference analog: the
accumulating graph DB the queue consumer merges into
(processors/queue.py:157-201)."""

from __future__ import annotations

import json as _json
import os as _os
import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BATCH_COL = "_batch"
# versioned manifests: _compaction_NNNNNN.json, newest (max cutoff) wins.
# A new manifest is CREATED (atomically visible on close/PUT on HDFS/S3A)
# rather than renamed over the old one — rename-overwrite is not atomic on
# object stores, and a crash between delete(old) and rename(new) would
# leave NO manifest while covered batch dirs from the previous compaction
# are already gone. With versioned files every crash point leaves at least
# the previous manifest readable.
_MANIFEST_RE = _re.compile(r"_compaction_(\d+)\.json")


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


# ---------------------------------------------------------- hadoop fs ops --
def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm, jpath


def _exists(spark: SparkSession, path: str) -> bool:
    fs, _, p = _fs(spark, path)
    return bool(fs.exists(p))


def _list_names(spark: SparkSession, dir_path: str) -> list[str]:
    """Child names of dir_path ([] when it doesn't exist)."""
    fs, _, p = _fs(spark, dir_path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def _delete(spark: SparkSession, path: str) -> None:
    fs, _, p = _fs(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def _rename(spark: SparkSession, src: str, dst: str) -> None:
    fs, jvm, psrc = _fs(spark, src)
    fs.rename(psrc, jvm.org.apache.hadoop.fs.Path(dst))


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    # writeBytes(String) keeps the bytes JVM-side; passing a Python
    # bytearray to write() would cross py4j by VALUE and is easy to get
    # subtly wrong (as is readFully into a Python buffer — see _read_text)
    fs, _, p = _fs(spark, path)
    try:
        # the local ChecksumFileSystem otherwise drops a hidden .crc
        # sidecar next to every manifest (clutter the cleanup pass and
        # tests would have to special-case); real HDFS/S3A ignore this
        fs.setWriteChecksum(False)
    except Exception:
        pass
    out = fs.create(p, True)
    try:
        out.writeBytes(text)
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str:
    # IOUtils.toString drains the stream INSIDE the JVM: py4j copies a
    # Python bytearray into readFully by value, so Java-side mutations
    # never reach Python — the naive buffer approach reads back zeros
    fs, jvm, p = _fs(spark, path)
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, jvm.java.nio.charset.StandardCharsets.UTF_8
        )
    finally:
        stream.close()


# ------------------------------------------------------------- compaction --
# A long-lived stream accumulates thousands of batch_NNNNNN subdirs; the
# glob read then pays per-dir listing and tiny-file overhead every batch.
# compact_batches() rewrites every committed batch dir up to a cutoff into
# ONE compact_NNNNNN dir that stores the batch id as a real _batch column
# (the path-derived id is materialized, so fence filters keep working),
# commits it by CREATING the next versioned manifest, then deletes the
# covered dirs. Crash anywhere is safe: read_state() ignores batch dirs
# <= the newest manifest cutoff, so a covered-but-not-yet-deleted dir is
# never double-counted; a compact tmp dir that never reached a manifest is
# invisible; and deletions only ever run AFTER the manifest naming the
# replacement data is durable.
# On a table format this whole section is RewriteDataFiles + one snapshot
# commit; the manifest JSON mirrors plans/lineage.py's _lineage.json
# (the documented parquet-dir fallback).


def compacted_upto(spark: SparkSession, acc_dir: str) -> int | None:
    """Newest committed compaction cutoff (inclusive), or None."""
    cuts = [
        int(m.group(1))
        for n in _list_names(spark, acc_dir)
        if (m := _MANIFEST_RE.fullmatch(n))
    ]
    if not cuts:
        return None
    upto = max(cuts)
    # sanity: the manifest is written only after the compact dir commit,
    # so the dir must exist; a corrupt manifest body is a loud error
    body = _json.loads(_read_text(spark, _os.path.join(acc_dir, f"_compaction_{upto:06d}.json")))
    return int(body["upto"])


def _with_batch_from_path(df):
    # anchored to the parquet file's IMMEDIATE parent dir — an out_dir that
    # itself contains a /batch_NNN/ segment must not hijack the id
    return df.withColumn(
        _BATCH_COL,
        F.regexp_extract(F.input_file_name(), r"/batch_(\d+)/[^/]*$", 1).cast("int"),
    )


def read_state(spark: SparkSession, schema, acc_dir: str) -> DataFrame | None:
    """Accumulated state as (data columns..., _batch int): the newest
    compaction plus every live batch dir AFTER its cutoff. None when no
    state has ever been committed."""
    upto = compacted_upto(spark, acc_dir)
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
    names = _list_names(spark, acc_dir)
    if not names:
        return None
    batch_ids = sorted(
        int(m.group(1)) for d in names if (m := _re.fullmatch(r"batch_(\d+)", d))
    )
    prev = compacted_upto(spark, acc_dir)
    live_ids = [b for b in batch_ids if prev is None or b > prev]
    if not live_ids:
        return prev
    upto = max(live_ids)
    state = read_state(spark, schema, acc_dir)  # compact head + live tail
    final = _os.path.join(acc_dir, f"compact_{upto:06d}")
    tmp = final + "._tmp"
    _delete(spark, tmp)
    state.write.mode("overwrite").parquet(tmp)
    _delete(spark, final)
    _rename(spark, tmp, final)
    # manifest commit: CREATE the next versioned manifest (the previous one
    # stays until cleanup, so every crash point leaves a readable cutoff)
    _write_text(
        spark,
        _os.path.join(acc_dir, f"_compaction_{upto:06d}.json"),
        _json.dumps({"upto": upto}),
    )
    # cleanup (safe to crash mid-way: covered dirs are ignored by readers).
    # Delete EVERY covered batch dir <= upto — not just this round's live
    # set — so a boundary batch dir recreated by a redelivered micro-batch
    # after an earlier compaction is eventually removed too.
    for d in _list_names(spark, acc_dir):
        m = _re.fullmatch(r"batch_(\d+)", d)
        if m and int(m.group(1)) <= upto:
            _delete(spark, _os.path.join(acc_dir, d))
        mc = _re.fullmatch(r"compact_(\d+)", d)
        if mc and int(mc.group(1)) != upto:
            _delete(spark, _os.path.join(acc_dir, d))
        mm = _MANIFEST_RE.fullmatch(d)
        if mm and int(mm.group(1)) != upto:
            _delete(spark, _os.path.join(acc_dir, d))
        if d.endswith("._tmp") and d != _os.path.basename(tmp):
            # a compact tmp from a crashed earlier attempt never reached a
            # manifest — invisible to readers, but still disk to reclaim
            _delete(spark, _os.path.join(acc_dir, d))
    return upto
