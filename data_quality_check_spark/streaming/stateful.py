"""Custom stateful streaming operator (SURVEY.md §2 O-32 stretch;
"applyInPandasWithState for custom stateful operators"):
cross-micro-batch duplicate detection.

The plain foreachBatch pipeline ranks duplicates only WITHIN a
micro-batch (documented limitation in tests/test_streaming.py); this
operator keys the stream by phash and keeps (first_image_id, count)
in state, so a viral image arriving across many shards is kept once
and flagged duplicate ever after — the streaming analog of the batch
dup-rank window.

State is per-phash: at 10^12 rows the state store shards by the
grouping key across executors exactly like a shuffle; RocksDB state
store + watermark-based TTL (GroupStateTimeout) bound its size in
production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_DDL = "image_id string, phash long, is_dup boolean, seen_before int"
DEDUP_STATE_DDL = "first_id string, n long"


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (phash,) = key
    if state.exists:
        first_id, n = state.get
    else:
        first_id, n = None, 0
    rows = []
    for pdf in pdfs:
        for image_id in sorted(pdf["image_id"]):
            is_dup = first_id is not None
            if first_id is None:
                first_id = image_id
            rows.append((image_id, phash, is_dup, n))
            n += 1
    state.update((first_id, n))
    yield pd.DataFrame(rows, columns=["image_id", "phash", "is_dup",
                                      "seen_before"])


def streaming_dedup(stream: DataFrame) -> DataFrame:
    """image stream -> (image_id, phash, is_dup, seen_before); first
    arrival of each phash wins across all micro-batches."""
    return (
        stream.select("image_id", "phash")
        .groupBy("phash")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=DEDUP_OUTPUT_DDL,
            stateStructType=DEDUP_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
