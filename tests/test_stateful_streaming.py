"""Tests: custom stateful streaming operators (applyInPandasWithState)
and the operator-plugin protocol."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bi_etl_and_integration_spark.operators.plugin import (
    ComponentValidationError, PipelineComponent, component, register)
from bi_etl_and_integration_spark.streaming.stateful import (
    stateful_running_agg, stateful_seen_filter, stateful_sessionize)

EV = "k int, v double"


def _run_two_batches(spark, rows, tmp_path, op, out_name):
    """One live query over a file source: snapshot the memory sink after
    batch 1, append batch 2 files, snapshot again — per-key state must
    carry across micro-batches."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    b1 = rows([(1, 10.0), (1, 11.0), (2, 20.0)], EV)
    b1.write.parquet(src)
    stream = spark.readStream.schema(b1.schema) \
        .option("maxFilesPerTrigger", "8").parquet(src)
    out = op(stream)
    writer = (out.writeStream.format("memory").queryName(out_name)
              .outputMode("append" if out_name == "dedup" else "update")
              .option("checkpointLocation", ckpt))
    q = writer.start()
    try:
        q.processAllAvailable()
        first = [r.asDict() for r in spark.table(out_name).collect()]
        b2 = rows([(1, 12.0), (3, 30.0)], EV)
        b2.write.mode("append").parquet(src)
        q.processAllAvailable()
        second = [r.asDict() for r in spark.table(out_name).collect()]
    finally:
        q.stop()
    return first, second


def test_stateful_seen_filter_dedups_across_batches(spark, rows, tmp_path):
    first, second = _run_two_batches(
        spark, rows, tmp_path,
        lambda s: stateful_seen_filter(s, ["k"], ["v"]), "dedup")
    # batch 1: first arrival of keys 1 and 2 pass (one row each)
    assert sorted(r["k"] for r in first) == [1, 2]
    # batch 2: key 1 already seen -> dropped; new key 3 passes
    new = [r for r in second if r not in first]
    assert [r["k"] for r in new] == [3]


def test_stateful_running_agg_accumulates(spark, rows, tmp_path):
    first, second = _run_two_batches(
        spark, rows, tmp_path,
        lambda s: stateful_running_agg(s, ["k"], "v"), "runagg")
    f = {r["k"]: (r["running_count"], r["running_sum"]) for r in first}
    assert f == {1: (2, 21.0), 2: (1, 20.0)}
    s = {r["k"]: (r["running_count"], r["running_sum"]) for r in second}
    # key 1 accumulated across batches; key 3 fresh
    assert s[1] == (3, 33.0)
    assert s[3] == (1, 30.0)


def test_stateful_sessionize_gap_and_watermark_close(spark, rows, tmp_path):
    """Key 1 has two bursts 2h apart (same batch): the first session
    closes on the gap.  Key 2's single burst closes via EventTimeTimeout
    in the no-data micro-batch that follows batch 1 (watermark 03:00 >
    timeout 01:30).  Key 1's open second burst closes only when batch 2
    pushes the watermark past ITS timeout."""
    import datetime as dt

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    schema = "k int, ts timestamp_ntz, v double"
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    b1 = rows([(1, t(1, 0), 1.0), (1, t(1, 10), 2.0),
               (1, t(3, 0), 5.0),          # >30min after 01:10 -> new sess
               (2, t(1, 0), 7.0)], schema)
    b1.write.parquet(src)
    stream = spark.readStream.schema(b1.schema) \
        .option("maxFilesPerTrigger", "8").parquet(src)
    out = stateful_sessionize(stream, ["k"], "ts", "v",
                              gap="30 minutes", watermark="0 seconds")
    q = (out.writeStream.format("memory").queryName("sess")
         .outputMode("append").option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
        first = {(r["k"], r["n_events"]): r["value_sum"]
                 for r in spark.table("sess").collect()}
        # key 1's first burst closed by the gap; key 2 by the timeout
        # fired in the trailing no-data batch; key 1's 03:00 burst open
        assert first == {(1, 2): pytest.approx(3.0),
                         (2, 1): pytest.approx(7.0)}
        # batch 2: event far in the future pushes the watermark past
        # every open session's timeout
        rows([(9, t(23, 0), 0.0)], schema).write.mode("append").parquet(src)
        q.processAllAvailable()
        q.processAllAvailable()  # one more cycle: timeouts fire on the
        # micro-batch AFTER the watermark advances
        second = {(r["k"], r["n_events"]): r["value_sum"]
                  for r in spark.table("sess").collect()}
    finally:
        q.stop()
    assert second[(1, 1)] == pytest.approx(5.0)   # 03:00 burst closed
    assert second[(2, 1)] == pytest.approx(7.0)
    assert (9, 1) not in second                   # 23:00 burst still open


# ------------------------------------------------------ plugin protocol

@register
class AddTax(PipelineComponent):
    name = "add_tax"
    required_columns = ("price",)

    def __init__(self, rate: float = 0.1):
        self.rate = rate

    def output_schema(self, schema):
        return T.StructType(
            list(schema.fields)
            + [T.StructField("with_tax", T.DoubleType(), True)])

    def apply(self, df):
        return df.withColumn("with_tax",
                             (F.col("price") * (1 + self.rate))
                             .cast("double"))


def test_component_validate_and_apply(rows):
    df = rows([(1, 100.0)], "id int, price double")
    comp = component("add_tax", rate=0.2)
    out = comp(df)
    assert out.collect()[0]["with_tax"] == pytest.approx(120.0)
    assert "with_tax" in comp.output_schema(df.schema).fieldNames()


def test_component_design_time_validation(rows):
    df = rows([(1,)], "id int")  # no 'price' column
    comp = component("add_tax")
    errors = comp.validate(df.schema)
    assert errors and "price" in errors[0]
    with pytest.raises(ComponentValidationError, match="price"):
        comp(df)


def test_component_registry_unknown():
    with pytest.raises(KeyError, match="unknown component"):
        component("nope")


def test_stateful_top_k_bounded_counters(spark, rows, tmp_path):
    """Heavy hitters across micro-batches: counts accumulate in the
    bounded space-saving state; with m smaller than the distinct count
    every stored count stays an upper bound and the true heavy hitter
    still ranks first."""
    from bi_etl_and_integration_spark.streaming.stateful import (
        stateful_top_k)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "k int, v string"
    b1 = rows([(1, "a"), (1, "a"), (1, "b"), (2, "z")], schema)
    b1.write.parquet(src)
    stream = spark.readStream.schema(b1.schema) \
        .option("maxFilesPerTrigger", "8").parquet(src)
    out = stateful_top_k(stream, ["k"], "v", k=2, m=2)
    q = (out.writeStream.format("memory").queryName("hh")
         .outputMode("update").option("checkpointLocation", ckpt)
         .start())
    try:
        q.processAllAvailable()
        first = {(r["k"], r["rank"]): (r["value"], r["est_count"])
                 for r in spark.table("hh").collect()}
        assert first[(1, 1)] == ("a", 2)
        assert first[(1, 2)] == ("b", 1)
        assert first[(2, 1)] == ("z", 1)
        # batch 2: 'a' keeps growing; 'c' evicts 'b' (m=2) entering at
        # floor+1 (upper bound)
        b2 = rows([(1, "a"), (1, "c"), (1, "c")], schema)
        b2.write.mode("append").parquet(src)
        q.processAllAvailable()
        rows2 = [r.asDict() for r in spark.table("hh").collect()]
        latest = {}
        for r in rows2:
            latest[(r["k"], r["rank"])] = (r["value"], r["est_count"])
        assert latest[(1, 1)] == ("a", 3)
        v, c = latest[(1, 2)]
        assert v == "c" and c >= 2          # space-saving upper bound
    finally:
        q.stop()
