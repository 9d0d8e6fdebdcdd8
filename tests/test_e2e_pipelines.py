"""End-to-end pipeline tests (SURVEY.md §5.3): the three lifecycle
traces of §3 as full pipelines over the fixture tables.

(a) flat-file ingest -> cleanse -> conform -> mart (the SSIS ch.8
    scenario): CSV with dirty rows, quarantine, domain validation,
    surrogate-key lookup, aggregate mart; row counts reconcile.
(b) CTE-cascade datamart with persisted fan-out.
(c) CDC initial load + incremental batches + crash-restart: no loss,
    no duplicates after idempotent re-apply.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bi_etl_and_integration_spark.operators import cdc
from bi_etl_and_integration_spark.operators.aggregate import (
    pre_aggregate_then_join)
from bi_etl_and_integration_spark.operators.cleanse import (
    audit, cast_with_quarantine, domain_cleanse, row_count)
from bi_etl_and_integration_spark.operators.relational import lookup_split
from bi_etl_and_integration_spark.pipeline import Pipeline, checkpointed_write
from bi_etl_and_integration_spark.sources.readers import read_csv_tolerant
from bi_etl_and_integration_spark.streaming.runner import incremental_cdc_run


def test_csv_ingest_cleanse_conform_mart(spark, tmp_path):
    """The SSIS ch.8 shape, with full row-count reconciliation:
    every input row lands in exactly one of {mart input, quarantine,
    domain-invalid, lookup-miss}."""
    raw = tmp_path / "sales.csv"
    raw.write_text(
        "sale_id,cust,region,amount\n"
        "1,10,EU,100.5\n"
        "2,11,NA,200.0\n"
        "3,12,EU,notanum\n"        # bad cast -> quarantine
        "4,13,XX,50.0\n"           # bad domain -> invalid stream
        "5,99,EU,75.0\n"           # unknown customer -> lookup miss
        "6,10,EU,was,too,many\n")  # malformed -> corrupt quarantine
    customers = spark.createDataFrame(
        [(10, "alice"), (11, "bob"), (12, "carol"), (13, "dave")],
        "cust int, cname string")
    regions = spark.createDataFrame([("EU",), ("NA",)], "r string")

    p = Pipeline("ingest_mart")

    @p.stage("extract")
    def extract(ctx):
        good, bad = read_csv_tolerant(
            ctx.spark, str(raw),
            "sale_id int, cust int, region string, amount string",
            max_errors=10, max_error_ratio=0.9)
        ctx["n_corrupt"] = bad.count()
        return good

    @p.stage("cleanse", depends_on=["extract"])
    def cleanse(ctx):
        typed, quarantined = cast_with_quarantine(
            ctx["extract"], "amount", "double", "amount_d")
        ctx["n_quarantined"] = quarantined.count()
        streams = domain_cleanse(typed, "region", regions, "r")
        ctx["n_bad_domain"] = streams["invalid"].count()
        return streams["valid"]

    @p.stage("conform", depends_on=["cleanse"])
    def conform(ctx):
        hit, miss = lookup_split(ctx["cleanse"], customers, ["cust"],
                                 "cname", broadcast=True)
        ctx["n_unknown_cust"] = miss.count()
        return audit(hit, "ingest_mart")

    @p.stage("mart", depends_on=["conform"])
    def mart(ctx):
        counted, obs = row_count(ctx["conform"], "n_mart_input")
        m = (counted.groupBy("region")
             .agg(F.count(F.lit(1)).alias("n_sales"),
                  F.round(F.sum("amount_d"), 2).alias("total")))
        out = str(tmp_path / "mart")
        checkpointed_write(m, out)
        ctx["n_mart_input"] = obs.get["n_mart_input"]
        return out

    ctx = p.run(spark)
    m = {r["region"]: (r["n_sales"], r["total"])
         for r in spark.read.parquet(ctx["mart"]).collect()}
    assert m == {"EU": (1, 100.5), "NA": (1, 200.0)}
    # reconciliation: 6 raw = 1 corrupt + 1 cast-quarantine + 1 domain
    # + 1 unknown-customer + 2 marted
    assert ctx["n_corrupt"] == 1
    assert ctx["n_quarantined"] == 1
    assert ctx["n_bad_domain"] == 1
    assert ctx["n_unknown_cust"] == 1
    assert ctx["n_mart_input"] == 2
    assert (ctx["n_corrupt"] + ctx["n_quarantined"] + ctx["n_bad_domain"]
            + ctx["n_unknown_cust"] + ctx["n_mart_input"]) == 6


def test_cte_cascade_mart_on_fixtures(spark):
    """Datamart build over the sf0.001 fixtures: base row count is
    preserved (agg-before-join can't fan out) and sums reconcile with
    direct aggregation."""
    from bi_etl_and_integration_spark.sources import Catalog
    cat = Catalog(spark, "/root/testdata/sf0.001", register_views=False)
    mart = pre_aggregate_then_join(
        cat.customer.select("c_custkey"), "c_custkey",
        [(cat.orders, "o_custkey",
          {"n_ord": F.count(F.lit(1)), "sum_p": F.sum("o_totalprice")}),
         (cat.events, "user_id", {"n_ev": F.count(F.lit(1))})])
    assert mart.count() == cat.customer.count()
    total_orders = mart.agg(F.sum("n_ord")).collect()[0][0]
    # every order belongs to an existing customer in the fixtures
    assert total_orders == cat.orders.count()


CH = "k int, v string, lsn int, op int"


def test_cdc_initial_plus_incremental_with_crash(spark, rows, tmp_path):
    """Initial snapshot -> two incremental ranges -> crash before state
    commit -> re-run: final target correct, no dupes, state advanced."""
    store = cdc.StateStore(str(tmp_path / "state"))
    target_path = str(tmp_path / "target")

    # initial load: snapshot at lsn=0
    snapshot = rows([(1, "a0"), (2, "b0")], "k int, v string")
    checkpointed_write(snapshot, target_path)
    store.commit("t", 0)

    log = rows([(1, "a1", 5, cdc.OP_UPDATE),
                (3, "c1", 7, cdc.OP_INSERT),
                (2, None, 12, cdc.OP_DELETE),
                (3, "c2", 14, cdc.OP_UPDATE)], CH)

    def run_once(changes, crash=False):
        target = spark.read.parquet(target_path)

        def apply_fn(df):
            if crash:
                raise RuntimeError("crash before publish")
            checkpointed_write(df, target_path)

        return incremental_cdc_run(
            spark, changes=changes, target=target, keys=["k"],
            offset_col="lsn", state_store=store, state_name="t",
            apply_fn=apply_fn)

    # range 1: (0, 10] — only first two changes visible
    run_once(log.where(F.col("lsn") <= 10))
    got = {r["k"]: r["v"] for r in spark.read.parquet(target_path).collect()}
    assert got == {1: "a1", 2: "b0", 3: "c1"}
    assert store.get("t") == 7

    # range 2 crashes mid-apply: target and state untouched
    with pytest.raises(RuntimeError):
        run_once(log, crash=True)
    assert store.get("t") == 7
    got = {r["k"]: r["v"] for r in spark.read.parquet(target_path).collect()}
    assert got == {1: "a1", 2: "b0", 3: "c1"}

    # re-run same range after the crash: idempotent, converges
    run_once(log)
    got = {r["k"]: r["v"] for r in spark.read.parquet(target_path).collect()}
    assert got == {1: "a1", 3: "c2"}
    assert store.get("t") == 14

    # nothing new: a third run is a no-op
    run_once(log)
    assert store.get("t") == 14
    assert {r["k"]: r["v"]
            for r in spark.read.parquet(target_path).collect()} == \
        {1: "a1", 3: "c2"}


def test_backfill_period_partitioned_writes(spark, tmp_path):
    """Airflow-catchup e2e: each period stage writes its own partition
    via the atomic publish protocol; a rerun touches nothing (markers)
    and the published data equals a one-shot batch of the range."""
    from pyspark.sql import functions as F
    from bi_etl_and_integration_spark.pipeline import (
        Pipeline, backfill, checkpointed_write)
    src = spark.range(0, 100).withColumn(
        "day", F.date_add(F.lit("2024-01-01").cast("date"),
                          (F.col("id") % 3).cast("int")))
    src.write.mode("overwrite").parquet(str(tmp_path / "events"))
    out_root = tmp_path / "out"
    p = Pipeline("daily")

    @p.stage("load")
    def load(ctx):
        d0 = ctx.params["period_start"][:10]
        day = (ctx.spark.read.parquet(str(tmp_path / "events"))
               .where(F.col("day") == F.lit(d0).cast("date")))
        checkpointed_write(day, str(out_root / f"day={d0}"))

    res = backfill(p, spark, start="2024-01-01", end="2024-01-04",
                   state_dir=str(tmp_path / "state"), grain="day")
    assert [r["status"] for r in res] == ["ran"] * 3
    got = spark.read.parquet(str(out_root / "day=*"))
    assert got.count() == 100
    # marker-driven idempotence: a second catch-up rewrites nothing
    import os
    mtimes = {f: os.path.getmtime(os.path.join(str(out_root), f))
              for f in os.listdir(out_root)}
    res2 = backfill(p, spark, start="2024-01-01", end="2024-01-04",
                    state_dir=str(tmp_path / "state"), grain="day")
    assert [r["status"] for r in res2] == ["skipped"] * 3
    assert mtimes == {f: os.path.getmtime(os.path.join(str(out_root), f))
                      for f in os.listdir(out_root)}
