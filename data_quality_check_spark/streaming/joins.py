"""Streaming joins (O-32 family): the two join shapes a continuous
quality pipeline needs.

- stream-STATIC enrichment: every incoming shard joins a (small,
  slowly-changing) dimension — per-domain reputation, per-language
  thresholds, a blocklist.  Spark re-evaluates the static side per
  micro-batch, so a dimension refresh is picked up without restarting
  the query; broadcast keeps it off the shuffle path.

- stream-STREAM interval join: two unbounded sources matched within a
  time bound (purchase ⋈ click-within-10-minutes).  Both sides carry
  watermarks so the join state store is BOUNDED: a buffered row is
  dropped once the other side's watermark passes its join window —
  without the bounds the state grows without limit and a 10^12-row
  deployment dies by OOM, which is why `interval` is mandatory here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(stream: DataFrame, dim: DataFrame,
                         on: str, how: str = "left") -> DataFrame:
    """Join a stream against a static dimension (broadcast: the dim
    never shuffles and the stream's partitioning is untouched)."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_interval_join(
        left: DataFrame, right: DataFrame, key: str, ts: str,
        interval: str = "10 minutes",
        watermark: str = "10 minutes") -> DataFrame:
    """Watermarked stream-stream inner join: pairs (l, r) with the
    same `key` and r.`ts` in [l.`ts` - interval, l.`ts`].  Right-side
    columns come back suffixed `_r`.  State is bounded by
    watermark + interval on both sides."""
    l = left.withWatermark(ts, watermark)
    r = right.withWatermark(ts, watermark)
    for c in r.columns:
        r = r.withColumnRenamed(c, f"{c}_r")
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (F.col(f"{ts}_r") >= F.expr(f"{ts} - interval {interval}"))
        & (F.col(f"{ts}_r") <= F.col(ts))
    )
    return l.join(r, cond, "inner")
