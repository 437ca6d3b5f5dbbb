"""Watermarked stream-stream interval join — the event-correlation
operator (impression->click attribution, request->response pairing; the
reference's analog is the upload-queue message paired with its later
analysis completion, folder_reader_service.py:140-151 ->
file_analysis_service.py's per-document finish).

Semantics: inner-join two event streams on a key where the right event's
time falls in [left_ts, left_ts + max_lag]; both sides watermarked so the
join STATE is bounded — Spark retains a left row only until the right
watermark passes left_ts + max_lag (and vice versa), which is what makes
the operator runnable on an unbounded 10^12-event stream. Without the
time-range condition a stream-stream join would have to buffer both
streams forever.

The SAME function works on batch DataFrames (withWatermark is a no-op in
batch), which gives the correctness story: contract:w7_interval_join
value-checks the join predicate against a DuckDB range-join replay in
batch mode, and tests/test_stream_join.py proves the streamed result
(file-source micro-batches, append mode) equals the batch result on the
same data, plus that watermark state-cleanup drops a too-late right event.

Scale shape: one hash exchange per side on the key; the range predicate
is evaluated inside the keyed join (never a cartesian); state per key is
bounded by max_lag x event rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_lag_seconds: int,
    watermark_delay: str = "2 minutes",
    inclusive_lower: bool = True,
) -> DataFrame:
    """Pair each right event with the left events it follows within
    max_lag_seconds on the same key. Column names of the two inputs must
    be disjoint apart from `key` (rename upstream); output keeps the key,
    both timestamps, and both payloads."""
    dup = (set(left.columns) & set(right.columns)) - {key}
    if dup:
        raise ValueError(f"overlapping non-key columns: {sorted(dup)}")
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    lo = (
        rw[right_ts] >= lw[left_ts]
        if inclusive_lower
        else rw[right_ts] > lw[left_ts]
    )
    cond = (
        (lw[key] == rw[key])
        & lo
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_lag_seconds} SECONDS"))
    )
    out_cols = [lw[key].alias(key)] + [
        lw[c] for c in left.columns if c != key
    ] + [rw[c] for c in right.columns if c != key]
    return lw.join(rw, cond, "inner").select(*out_cols)
