"""Two-phase top-k per group: exact equivalence with the one-shot
window under skew, nulls, and arbitrary partitioning."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F


def _window_topk(df, k=3):
    w = Window.partitionBy("g").orderBy(
        F.col("v").desc_nulls_last(), F.col("id").asc_nulls_last())
    return (df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def test_matches_window_exactly(spark):
    from data_quality_check_spark.operators.topk import topk_per_group

    # skewed groups, duplicate values (tiebreak matters), null values
    rows = []
    for i in range(2000):
        rows.append((i, "big", float(i % 97)))
    for i in range(2000, 2010):
        rows.append((i, "small", float(i)))
    rows += [(3000, "big", None), (3001, "nulls", None),
             (3002, "nulls", 1.0)]
    df = spark.createDataFrame(rows, "id long, g string, v double")

    for parts in (1, 7, 32):
        got = (topk_per_group(df.repartition(parts), "g", "v", k=3,
                              tiebreak_col="id")
               .toPandas().sort_values(["g", "rk"]).reset_index(drop=True))
        want = (_window_topk(df, 3)
                .toPandas().sort_values(["g", "rk"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)


def test_group_smaller_than_k(spark):
    from data_quality_check_spark.operators.topk import topk_per_group

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 3.0)], "id long, g string, v double")
    out = topk_per_group(df, "g", "v", k=10, tiebreak_col="id").toPandas()
    assert len(out) == 2 and sorted(out.rk) == [1, 2]


def test_null_group_key_is_its_own_partition(spark):
    """A NULL group key must survive the map-side prune: the stage-2
    window (and the SQL oracle's plain row_number plan) treats NULL as
    its own partition — pandas' groupby default dropna=True would
    silently drop those rows in stage 1 (ADVICE r2)."""
    from data_quality_check_spark.operators.topk import topk_per_group

    df = spark.createDataFrame(
        [(1, None, 5.0), (2, None, 9.0), (3, None, 7.0), (4, None, 1.0),
         (5, "a", 2.0)],
        "id long, g string, v double")
    for parts in (1, 3):
        out = (topk_per_group(df.repartition(parts), "g", "v", k=2,
                              tiebreak_col="id")
               .toPandas())
        nulls = out[out.g.isna()].sort_values("rk")
        assert list(nulls.id) == [2, 3] and list(nulls.rk) == [1, 2]
        assert list(out[out.g == "a"].id) == [5]
