"""Unit tests: CDC / incremental operators (SURVEY.md §2.10, §3.3).

Covers the reference's load-bearing CDC contracts: state advances only
on success, retention violations raise, re-applying a range is
idempotent (PRACT/004 CDC.md:231-241, 342-362)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bi_etl_and_integration_spark.operators import cdc
from bi_etl_and_integration_spark.streaming.runner import incremental_cdc_run

CH_SCHEMA = "k int, v string, lsn int, op int"


def _assert_same(df_a, df_b):
    assert sorted(map(tuple, df_a.collect())) == \
        sorted(map(tuple, df_b.collect()))


def test_state_store_roundtrip(tmp_path):
    st = cdc.StateStore(str(tmp_path))
    assert st.get("t1") is None
    assert st.get("t1", default=0) == 0
    st.commit("t1", 42)
    assert st.get("t1") == 42
    st.commit("t1", 43)  # overwrite
    assert st.get("t1") == 43


def test_read_range_half_open(rows):
    ch = rows([(1, "a", 5, 2), (2, "b", 10, 2), (3, "c", 15, 2)], CH_SCHEMA)
    out = cdc.read_range(ch, "lsn", 5, 15)
    assert sorted(r["k"] for r in out.collect()) == [2, 3]  # (5, 15]
    out0 = cdc.read_range(ch, "lsn", None, 10)  # initial load
    assert sorted(r["k"] for r in out0.collect()) == [1, 2]


def test_read_range_retention_violation_raises(rows):
    ch = rows([(1, "a", 5, 2)], CH_SCHEMA)
    with pytest.raises(cdc.RetentionError):
        cdc.read_range(ch, "lsn", 3, 10, min_available=4)
    # state >= min_available is fine
    cdc.read_range(ch, "lsn", 4, 10, min_available=4)


def test_retention_risk_monitor(rows):
    import datetime as dt
    now = dt.datetime.now()
    ch = rows([(1, now - dt.timedelta(hours=50)),
               (2, now - dt.timedelta(hours=2))],
              "k int, ts timestamp")
    # state has processed nothing: oldest unprocessed is 50h old,
    # retention 24h -> already lost (negative hours, at_risk)
    r = cdc.retention_risk(ch, "ts", None, retention_hours=24).collect()[0]
    assert r["at_risk"]
    assert r["hours_of_data_loss_risk"] < 0
    # state past the old change: only the 2h-old one counts -> safe
    r2 = cdc.retention_risk(ch, "ts", now - dt.timedelta(hours=3),
                            retention_hours=24).collect()[0]
    assert not r2["at_risk"]
    assert r2["hours_of_data_loss_risk"] > 20


def test_net_changes_last_wins(rows):
    ch = rows([(1, "v1", 1, 2), (1, "v2", 2, 4), (1, "v3", 3, 4),
               (2, "x", 1, 2)], CH_SCHEMA)
    out = cdc.net_changes(ch, ["k"], "lsn")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "v3", 2: "x"}


def test_split_ops(rows):
    ch = rows([(1, "a", 1, cdc.OP_INSERT), (2, "b", 2, cdc.OP_UPDATE),
               (3, "c", 3, cdc.OP_DELETE)], CH_SCHEMA)
    s = cdc.split_ops(ch, "op")
    assert [r["k"] for r in s["insert"].collect()] == [1]
    assert [r["k"] for r in s["update"].collect()] == [2]
    assert [r["k"] for r in s["delete"].collect()] == [3]


def test_apply_changes_insert_update_delete(rows):
    target = rows([(1, "old"), (2, "keep"), (3, "gone")], "k int, v string")
    ch = rows([(1, "new", 10, cdc.OP_UPDATE),
               (3, None, 11, cdc.OP_DELETE),
               (4, "ins", 12, cdc.OP_INSERT)], CH_SCHEMA)
    out = cdc.apply_changes(target, ch, ["k"], "lsn", "op")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "new", 2: "keep", 4: "ins"}


def test_apply_changes_is_idempotent(rows):
    """Re-running a crashed batch converges (PRACT/004:342-362)."""
    target = rows([(1, "old")], "k int, v string")
    ch = rows([(1, "new", 10, cdc.OP_UPDATE),
               (2, "ins", 11, cdc.OP_INSERT)], CH_SCHEMA)
    once = cdc.apply_changes(target, ch, ["k"], "lsn", "op")
    twice = cdc.apply_changes(once.select("k", "v"), ch, ["k"], "lsn", "op")
    _assert_same(once, twice)


def test_apply_changes_multiple_ops_net_collapse(rows):
    """insert then delete within one range = row absent (net mode)."""
    target = rows([], "k int, v string")
    ch = rows([(1, "a", 1, cdc.OP_INSERT), (1, None, 2, cdc.OP_DELETE)],
              CH_SCHEMA)
    out = cdc.apply_changes(target, ch, ["k"], "lsn", "op")
    assert out.count() == 0


def test_snapshot_plus_catchup(rows):
    """Changes during the copy apply exactly once (PRACT/004:36-95)."""
    snapshot = rows([(1, "s1"), (2, "s2")], "k int, v string")  # at lsn=10
    ch = rows([(1, "pre", 9, cdc.OP_UPDATE),     # before snapshot: ignored
               (2, "during", 11, cdc.OP_UPDATE),  # during copy: applied
               (3, "new", 12, cdc.OP_INSERT)], CH_SCHEMA)
    out = cdc.snapshot_plus_catchup(snapshot, ch, ["k"], "lsn", 10)
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "s1", 2: "during", 3: "new"}


def test_incremental_cdc_run_commits_only_on_success(rows, tmp_path):
    st = cdc.StateStore(str(tmp_path))
    target = rows([(1, "old")], "k int, v string")
    ch = rows([(1, "new", 10, cdc.OP_UPDATE)], CH_SCHEMA)

    def boom(df):
        raise RuntimeError("apply failed")

    with pytest.raises(RuntimeError):
        incremental_cdc_run(target.sparkSession, changes=ch, target=target,
                            keys=["k"], offset_col="lsn", state_store=st,
                            state_name="t", apply_fn=boom)
    assert st.get("t") is None  # crash before commit -> state unchanged

    applied = incremental_cdc_run(
        target.sparkSession, changes=ch, target=target, keys=["k"],
        offset_col="lsn", state_store=st, state_name="t",
        apply_fn=lambda df: df.collect())
    assert st.get("t") == 10
    assert {r["k"]: r["v"] for r in applied.collect()} == {1: "new"}

    # next run with no new changes is a no-op returning the target
    again = incremental_cdc_run(
        target.sparkSession, changes=ch, target=applied, keys=["k"],
        offset_col="lsn", state_store=st, state_name="t",
        apply_fn=lambda df: df.collect())
    _assert_same(again.select("k", "v"), applied.select("k", "v"))


def test_snapshot_diff_emits_change_feed(rows):
    from bi_etl_and_integration_spark.operators import cdc
    old = rows([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    new = rows([(1, "a"), (2, "b2"), (4, "d")], "k int, v string")
    feed = cdc.snapshot_diff(old, new, ["k"])
    got = {r["k"]: (r["op"], r["v"]) for r in feed.collect()}
    assert got == {2: (cdc.OP_UPDATE, "b2"),
                   3: (cdc.OP_DELETE, "c"),
                   4: (cdc.OP_INSERT, "d")}
    # the feed drives the standard apply path to reproduce `new`
    applied = cdc.apply_changes(old, feed.withColumn("lsn", F.lit(1)),
                                ["k"], offset_col="lsn")
    assert {(r["k"], r["v"]) for r in applied.collect()} == \
        {(1, "a"), (2, "b2"), (4, "d")}


def test_apply_changes_same_offset_tiebreak(rows):
    """UPDATE and DELETE sharing one offset (one transaction's commit
    LSN): delete must win deterministically, not by partition order."""
    from bi_etl_and_integration_spark.operators import cdc
    tgt = rows([(1, "a")], "k int, v string")
    ch = rows([(1, "a2", 7, cdc.OP_UPDATE), (1, None, 7, cdc.OP_DELETE)],
              "k int, v string, lsn int, op int").repartition(4)
    for _ in range(3):
        out = cdc.apply_changes(tgt, ch, ["k"], "lsn").collect()
        assert out == []        # delete is final every run
    # insert+update at one offset: the update image is final
    ch2 = rows([(5, "i", 9, cdc.OP_INSERT), (5, "u", 9, cdc.OP_UPDATE)],
               "k int, v string, lsn int, op int").repartition(4)
    got = {r["k"]: r["v"] for r in
           cdc.apply_changes(tgt.limit(0), ch2, ["k"], "lsn").collect()}
    assert got == {5: "u"}
