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
