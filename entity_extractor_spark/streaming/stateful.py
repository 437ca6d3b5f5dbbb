"""Custom stateful streaming operator: cross-batch first-delivery dedupe.

The reference's queue is at-least-once (visibility timeout, redelivery —
utils/azure_queue.py:18-21, T5); its dedupe is the lock-file + identity
probe. The streaming-native form is keyed state: every doc_id key remembers
that it has been seen, and redeliveries emit nothing. Implemented with
applyInPandasWithState (Arrow-batched per group; the state store checkpoints
with the query, so a crash resumes with the seen-set intact).

Keys are doc_id directly: state-store entries are per-key and tiny (one
boolean), so cardinality is bounded by the corpus, and RocksDB-backed state
(spark.sql.streaming.stateStore.providerClass) covers 10^12-scale keysets.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)
STATE_SCHEMA = "seen boolean"


def _dedupe_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # redelivery: consume and emit nothing
        for _ in pdfs:
            pass
        return
    emitted = False
    for pdf in pdfs:
        if not emitted and len(pdf) > 0:
            yield pdf.iloc[:1]
            emitted = True
    if emitted:
        state.update((True,))


def first_delivery_only(stream: DataFrame) -> DataFrame:
    """streaming documents -> first delivery per doc_id; duplicates (same
    batch or any later batch) are dropped via keyed state."""
    return stream.groupBy("doc_id").applyInPandasWithState(
        _dedupe_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
