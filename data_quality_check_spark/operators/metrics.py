"""Rule-hit metrics + F1 aggregations (SURVEY.md §2 O-15..O-18).

All built-in aggregates (partial aggregation / map-side combine stays
enabled — grouped-agg pandas UDFs would disable it)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import RULE_ORDER
from .keep import flag_col


def bucket_metrics(df: DataFrame) -> DataFrame:
    """O-15: per-bucket row/keep counts + per-rule hit sums, emitted
    as a map<rule,count> for the audit table.  HashAggregate with
    partial aggregation; combine with operators.salt.two_phase_agg
    when the frame is salted."""
    rule_sums = [
        F.sum(F.col(flag_col(r)).cast("long")).alias(f"hits_{r}")
        for r in RULE_ORDER
    ]
    agg = df.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        *rule_sums,
    )
    rule_map = F.map_from_arrays(
        F.array(*[F.lit(r) for r in RULE_ORDER]),
        F.array(*[F.col(f"hits_{r}") for r in RULE_ORDER]),
    )
    return agg.select(
        "bucket", "n_rows", "n_keep", rule_map.alias("rule_hits"))


def f1_vs_labels(pred: DataFrame, labels: DataFrame,
                 broadcast_labels: bool = True) -> DataFrame:
    """O-16 + O-19: confusion counts and precision/recall/F1 of the
    pipeline's keep column vs oracle labels, joined on image_id.
    Labels are broadcast when they fit (sandbox scale); at cluster
    scale flip broadcast_labels=False for a sort-merge join."""
    lab = labels.select("image_id", F.col("keep").alias("keep_true"))
    if broadcast_labels:
        lab = F.broadcast(lab)
    j = pred.select("image_id", "keep").join(lab, "image_id", "inner")
    c = j.agg(
        F.sum(((F.col("keep")) & (F.col("keep_true"))).cast("long")).alias("tp"),
        F.sum(((F.col("keep")) & (~F.col("keep_true"))).cast("long")).alias("fp"),
        F.sum(((~F.col("keep")) & (F.col("keep_true"))).cast("long")).alias("fn"),
        F.sum(((~F.col("keep")) & (~F.col("keep_true"))).cast("long")).alias("tn"),
    )
    return c.select(
        "tp", "fp", "fn", "tn",
        (F.col("tp") / (F.col("tp") + F.col("fp"))).alias("precision"),
        (F.col("tp") / (F.col("tp") + F.col("fn"))).alias("recall"),
        (2 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn"))).alias("f1"),
    )


def lang_fmt_rollup(df: DataFrame) -> DataFrame:
    """O-18: audit report by (lang, fmt) with subtotals."""
    return (
        df.rollup("lang", "fmt")
        .agg(F.count("*").alias("n_rows"),
             F.sum(F.col("keep").cast("long")).alias("n_keep"))
    )
