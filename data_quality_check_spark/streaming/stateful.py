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


def _make_dedup_fn(ttl_ms: int | None):
    def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            # TTL fired with no new data: evict this key's state.  A
            # duplicate arriving later is treated as first-seen again
            # — the standard bounded-state trade-off, sized via ttl.
            state.remove()
            yield pd.DataFrame(columns=["image_id", "phash", "is_dup",
                                        "seen_before"])
            return
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
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(rows, columns=["image_id", "phash", "is_dup",
                                          "seen_before"])

    return _dedup_fn


def streaming_dedup(stream: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """image stream -> (image_id, phash, is_dup, seen_before); first
    arrival of each phash wins across all micro-batches.  `ttl_ms`
    bounds state size: keys idle longer than the TTL are evicted
    (processing-time timeout), so state holds only the active-window
    working set instead of every phash ever seen."""
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ttl_ms is not None else GroupStateTimeout.NoTimeout)
    return (
        stream.select("image_id", "phash")
        .groupBy("phash")
        .applyInPandasWithState(
            _make_dedup_fn(ttl_ms),
            outputStructType=DEDUP_OUTPUT_DDL,
            stateStructType=DEDUP_STATE_DDL,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


NEAR_DUP_OUTPUT_DDL = ("doc_id long, band int, band_hash long, "
                       "is_candidate_dup boolean, first_id long")
NEAR_DUP_STATE_DDL = "first_id long, n long"


def _near_dup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (_band, _band_hash) = key
    if state.exists:
        first_id, n = state.get
    else:
        first_id, n = None, 0
    rows = []
    for pdf in pdfs:
        for doc_id in sorted(pdf["doc_id"]):
            is_dup = first_id is not None
            if first_id is None:
                first_id = int(doc_id)
            rows.append((int(doc_id), int(_band), int(_band_hash),
                         is_dup, first_id))
            n += 1
    state.update((first_id, n))
    yield pd.DataFrame(rows, columns=[
        "doc_id", "band", "band_hash", "is_candidate_dup", "first_id"])


def streaming_near_dup_candidates(stream: DataFrame,
                                  text_col: str = "text",
                                  id_col: str = "doc_id") -> DataFrame:
    """Streaming analog of the MinHash-LSH candidate stage: each
    micro-batch's documents are banded with the SAME deterministic
    one-permutation-hash signatures as the batch operator
    (operators/dedup.py), and per-(band, band_hash) state remembers
    the first-ever arrival — a document matching any band seen in ANY
    earlier micro-batch is flagged a near-dup candidate.

    Emits one row per (doc, band).  Downstream either drops docs with
    any is_candidate_dup band (aggressive) or routes candidates to an
    exact-verification batch job (the text_near_dup_keepers flow).
    State is per-band-bucket: sharded by the grouping key like any
    shuffle; RocksDB + timeout TTL bound it in production."""
    from ..operators.dedup import minhash_signatures

    num_hashes, bands = 16, 4
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(stream, text_col, id_col)
    from pyspark.sql import functions as F
    banded = sigs.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col("sig")[b * rows_per_band + r]
                             for r in range(rows_per_band)]).alias("band_hash"),
            )
            for b in range(bands)
        ])).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"),
             F.col("bb.band_hash").alias("band_hash"))
    return (
        banded.groupBy("band", "band_hash")
        .applyInPandasWithState(
            _near_dup_fn,
            outputStructType=NEAR_DUP_OUTPUT_DDL,
            stateStructType=NEAR_DUP_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
