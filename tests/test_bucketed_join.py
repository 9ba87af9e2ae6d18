"""Bucketed co-located join (SURVEY §2 J / §4: 'bucketing for
co-located joins'): two tables bucketed by the join key join WITHOUT
a shuffle — the physical plan has no Exchange above either scan."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse(spark):
    d = tempfile.mkdtemp(prefix="dqc-wh-")
    yield d
    for t in ("li_bucketed", "ord_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, warehouse):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
       .sortBy("l_orderkey")
       .option("path", f"{warehouse}/li").saveAsTable("li_bucketed"))
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey")
       .sortBy("o_orderkey")
       .option("path", f"{warehouse}/ord").saveAsTable("ord_bucketed"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lb = spark.table("li_bucketed")
        ob = spark.table("ord_bucketed")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice")

        # sort-merge join on matching bucket spec: no shuffle exchange
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange" not in plan, plan[:2000]

        # and it is still correct
        expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
