"""Tests: the explicit scale tools — bucketed co-located joins, salted
joins/aggregations (SURVEY.md §4; the 100-TB design levers)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from bi_etl_and_integration_spark import plans
from bi_etl_and_integration_spark.operators import (
    aggregate as agg_ops,
    relational as rel_ops,
)
from bi_etl_and_integration_spark.sources.writers import write_bucketed


def test_bucketed_join_has_no_shuffle(spark, rows):
    """Two tables bucketed by the join key into the same bucket count
    must SortMergeJoin without any Exchange — the shuffle was paid at
    write time (co-location)."""
    tag = uuid.uuid4().hex[:8]
    ta, tb = f"bk_a_{tag}", f"bk_b_{tag}"
    a = rows([(i, f"a{i}") for i in range(100)], "k int, va string")
    b = rows([(i, f"b{i}") for i in range(100)], "k int, vb string")
    try:
        write_bucketed(a, ta, buckets=4, by=["k"], sort_by=["k"])
        write_bucketed(b, tb, buckets=4, by=["k"], sort_by=["k"])
        joined = spark.table(ta).join(spark.table(tb), "k")
        assert plans.shuffle_count(joined) == 0, \
            plans.formatted_plan(joined)
        assert joined.count() == 100  # and it's still correct
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_salted_join_matches_plain_join(rows):
    # hot key 1 (90% of rows) + uniform tail
    big = rows([(1, i) for i in range(90)] + [(k, 0) for k in range(2, 12)],
               "k int, payload int")
    dim = rows([(k, f"d{k}") for k in range(1, 12)], "k int, attr string")
    plain = big.join(dim, "k").select("k", "payload", "attr")
    salted = rel_ops.salted_join(big, dim, ["k"]) \
        .select("k", "payload", "attr")
    assert sorted(map(tuple, salted.collect())) == \
        sorted(map(tuple, plain.collect()))


def test_salted_join_left_keeps_unmatched(rows):
    big = rows([(1, 10), (99, 20)], "k int, payload int")
    dim = rows([(1, "d1")], "k int, attr string")
    out = rel_ops.salted_join(big, dim, ["k"], how="left").collect()
    got = {r["k"]: r["attr"] for r in out}
    assert got == {1: "d1", 99: None}


def test_salted_aggregate_matches_direct(rows):
    big = rows([("hot", float(i)) for i in range(1000)]
               + [("cold", 1.0), ("cold", 3.0)],
               "k string, v double")
    direct = big.groupBy("k").agg(
        F.sum("v").alias("s"), F.count("v").alias("n"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
        F.avg("v").alias("m")).collect()
    salted = agg_ops.salted_aggregate(
        big, ["k"],
        {"s": ("sum", F.col("v")), "n": ("count", F.col("v")),
         "lo": ("min", F.col("v")), "hi": ("max", F.col("v")),
         "m": ("avg", F.col("v"))}).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, salted))


def test_salted_aggregate_rejects_unknown_kind(rows):
    big = rows([("a", 1.0)], "k string, v double")
    with pytest.raises(KeyError):
        agg_ops.salted_aggregate(big, ["k"],
                                 {"x": ("median", F.col("v"))}).collect()


def test_analyze_table_feeds_cbo_stats(spark, rows):
    """ANALYZE TABLE must land rowCount/size stats in the catalog (the
    CBO's input) and column NDV stats when columns are named."""
    from bi_etl_and_integration_spark.sources.writers import analyze_table
    t = "t_stats"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        rows([(i, i % 3) for i in range(90)], "k int, g int") \
            .write.saveAsTable(t)
        analyze_table(spark, t, columns=["k", "g"])
        detail = {r["col_name"]: r["data_type"]
                  for r in spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect()}
        assert "Statistics" in detail and "90 rows" in detail["Statistics"]
        kcol = {r["info_name"]: r["info_value"] for r in
                spark.sql(f"DESCRIBE TABLE EXTENDED {t} k").collect()}
        # NDV is HyperLogLog-estimated — exactness is not the contract
        assert abs(int(kcol["distinct_count"]) - 90) <= 5
        # the optimized plan must carry the exact row count (CBO input)
        plan_stats = (spark.table(t)._jdf.queryExecution()
                      .optimizedPlan().stats())
        assert plan_stats.rowCount().get() == 90
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_single_file_sort_free_join(spark, rows):
    """write_bucketed(single_file_buckets=True) must land exactly one
    data file per bucket — the condition under which the scan reports
    its sortBy ordering (session flag in session.py) and a co-located
    SortMergeJoin runs with zero Exchange AND zero Sort."""
    import os
    import re
    import uuid

    tag = uuid.uuid4().hex[:8]
    ta, tb = f"bk1_a_{tag}", f"bk1_b_{tag}"
    a = rows([(i, f"a{i}") for i in range(500)], "k int, va string")
    b = rows([(i, f"b{i}") for i in range(500)], "k int, vb string")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(a, ta, buckets=4, by=["k"], sort_by=["k"],
                       single_file_buckets=True)
        write_bucketed(b, tb, buckets=4, by=["k"], sort_by=["k"],
                       single_file_buckets=True)
        loc = (spark.sql(f"DESCRIBE TABLE EXTENDED {ta}")
               .where("col_name = 'Location'").collect()[0]["data_type"]
               .removeprefix("file:"))
        data_files = [f for f in os.listdir(loc)
                      if f.endswith(".parquet")]
        assert len(data_files) == 4, data_files
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(ta).join(spark.table(tb), "k")
        simple = plans.simple_plan(joined)
        assert plans.shuffle_count(joined) == 0, simple
        assert "SortMergeJoin" in simple, simple
        assert not re.search(r"\bSort \[", simple), simple
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_bucketed_staged_join_under_orderkey_skew(spark, rows):
    """Skew-stress for the bucketed-fact staging (VERDICT r10 item 6):
    q43/q45's plan hinges on bucket co-location, and the fixtures'
    orderkey is uniform — so pin what happens when it is NOT.  With
    one hot key holding half of the probe side, bucketing by the key
    lands the entire hot key in ONE bucket (one task), but the staged
    SMJ must still (a) return exactly the plain join's rows and (b)
    keep the zero-Exchange zero-Sort shape — degradation is a long
    task, never a wrong answer or a revived shuffle.  AQE's skew-join
    splitting CANNOT help here by construction (it re-splits shuffle
    blocks and this plan has no shuffle); the 100 TB mitigations are
    dialing the bucket count up so one bucket ~= one file-size target,
    or falling back to rel_ops.salted_join for pathological keys —
    recorded in SCALE.md."""
    import re
    import uuid

    from pyspark.sql import functions as F

    tag = uuid.uuid4().hex[:8]
    ta, tb = f"bk_skew_o_{tag}", f"bk_skew_l_{tag}"
    # build side: uniform keys; probe side: key 7 holds 50% of rows
    o = rows([(i, float(i)) for i in range(400)], "k int, p double")
    hot = [(7, i, 1.0) for i in range(2000)]
    cold = [(i % 400, i, 2.0) for i in range(2000)]
    li = rows(hot + cold, "k int, line int, v double")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(o, ta, buckets=4, by=["k"], sort_by=["k"],
                       single_file_buckets=True)
        write_bucketed(li, tb, buckets=4, by=["k"], sort_by=["k"],
                       single_file_buckets=True)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        staged = spark.table(ta).join(spark.table(tb), "k")
        simple = plans.simple_plan(staged)
        assert plans.shuffle_count(staged) == 0, simple
        assert "SortMergeJoin" in simple, simple
        assert not re.search(r"\bSort \[", simple), simple
        got = staged.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        want = o.join(li, "k").groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, want.collect()))
        # the hot key really is concentrated: its bucket carries >= 50%
        # of the probe rows (what a task-skew monitor would surface)
        per_bucket = (spark.table(tb)
                      .groupBy(F.spark_partition_id().alias("b"))
                      .count().collect())
        assert max(r["count"] for r in per_bucket) >= 2000, per_bucket
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")
