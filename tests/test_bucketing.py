"""Bucketed-table co-located join (SURVEY §2.12: 'bucketing for
co-located joins'): writing both sides bucketed by the join key lets
the join run with zero Exchange — the 100 TB pattern for repeatedly
joined tables (e.g. extraction output joined to page metadata)."""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="testdata absent")


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet(SF + "/orders.parquet")
    li = spark.read.parquet(SF + "/lineitem.parquet")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))

    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: no shuffle exchange on either side of the join
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    n = joined.count()
    ref = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert n == ref
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
