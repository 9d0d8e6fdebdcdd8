"""Tests: custom Python DataSource (partition-parallel reader)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bi_etl_and_integration_spark.sources.custom import (
    register_custom_sources)


def test_custom_source_reads_and_partitions(spark):
    register_custom_sources(spark)
    df = (spark.read.format("synthetic_events")
          .option("rows", "1000").option("partitions", "4").load())
    assert df.count() == 1000
    assert df.columns == ["event_id", "user_id", "value"]
    # the source splits into independent partitions (executor-parallel)
    assert df.rdd.getNumPartitions() == 4
    # deterministic: same options -> identical data
    again = (spark.read.format("synthetic_events")
             .option("rows", "1000").option("partitions", "4").load())
    assert df.exceptAll(again).count() == 0
    # composes with the rest of the engine (plain DataFrame downstream)
    agg = df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    assert agg.count() == 100
