"""AQE skew-join handling: a deliberately hot-keyed join splits the
skewed partition at runtime (the 100 TB hot-host scenario; manual
salting in spark/skew.py covers aggregations, AQE covers joins)."""

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/testdata"), reason="env")


def test_aqe_splits_skewed_join(spark):
    conf = spark.conf
    old = {k: conf.get(k) for k in (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold")}
    try:
        conf.set("spark.sql.adaptive.skewJoin."
                 "skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                 "16KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # 150k rows, 70% on one hot key — the crawl hot-host shape
        big = spark.range(150_000).select(
            F.when(F.col("id") % 10 < 7, 0)
             .otherwise(F.col("id") % 97).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("v"))
        dim = spark.range(100).select(
            F.col("id").alias("k"),
            F.concat(F.lit("dim-"), F.col("id")).alias("d"))
        j = big.join(dim, "k")
        rows = j.collect()         # execute THIS plan (AQE finalizes)
        assert len(rows) == 150_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in old.items():
            conf.set(k, v)
