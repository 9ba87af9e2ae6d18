"""Streaming session windows + built-in watermark dedup (O-32
breadth): the two Structured Streaming primitives the stateful/join
modules don't cover.

- `session_activity`: gap-based session aggregation via
  F.session_window — the engine merges overlapping per-key windows in
  the state store; at 10^12 events state shards by (key, session) and
  the watermark closes (evicts) sessions `gap` past the newest event.
- `dedup_within_watermark`: dropDuplicatesWithinWatermark — the
  BUILT-IN cross-micro-batch dedup; unlike the applyInPandasWithState
  operator (stateful.py, which also reports first-id/count), state is
  engine-managed and bounded by the watermark horizon, which is the
  right default when you only need suppression, not lineage.

Both reuse batch semantics: session_window is the same expression
batch queries use (win_sessionize's streaming analog), so
stream/batch parity is by construction and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_activity(stream: DataFrame, ts_col: str = "ingest_ts",
                     key_col: str = "fmt", gap: str = "5 minutes",
                     watermark: str = "10 minutes") -> DataFrame:
    """Per-key gap sessions: (key, session start/end, events, ids).
    In append mode only watermark-closed sessions emit (late data
    within `watermark` still merges); complete mode emits the current
    consolidated sessions each trigger."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"),
                 F.col(key_col))
        .agg(F.count("*").alias("n_events"),
             F.min(ts_col).alias("first_ts"),
             F.max(ts_col).alias("last_ts"))
        .select(F.col("sess.start").alias("sess_start"),
                F.col("sess.end").alias("sess_end"),
                key_col, "n_events", "first_ts", "last_ts")
    )


def dedup_within_watermark(stream: DataFrame,
                           keys: tuple[str, ...] = ("phash",),
                           ts_col: str = "ingest_ts",
                           watermark: str = "10 minutes") -> DataFrame:
    """First row per key wins; replays/duplicates inside the
    watermark horizon are suppressed by engine-managed state."""
    return (stream.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(list(keys)))
