"""Tests for the dev-harness tools (no SparkSession needed)."""

import os
import subprocess
import sys

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_make_scale_preserves_shard_invariants(tmp_path):
    """Every key stride must match the stride of the table it
    references, so shard i's facts point at shard i's dims — no
    cross-shard key can exist (the user_id/customer collision this
    guards against concentrated 10 shards of events onto shard 0's
    customers)."""
    dst = str(tmp_path / "sf2x")
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "make_scale.py"),
         "2", "/root/testdata/sf0.001", dst],
        check=True, capture_output=True)
    con = duckdb.connect()

    def minmax(table, col):
        return con.execute(
            f"SELECT MIN({col}), MAX({col}) FROM '{dst}/{table}.parquet'"
        ).fetchone()

    # row counts doubled
    for t in ("customer", "orders", "lineitem", "events"):
        n0 = con.execute(
            f"SELECT COUNT(*) FROM '/root/testdata/sf0.001/{t}.parquet'"
        ).fetchone()[0]
        n1 = con.execute(
            f"SELECT COUNT(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        assert n1 == 2 * n0, t

    # referential closure: every FK value exists in its referenced PK
    # set (would fail if strides diverged)
    for fact, fk, dim, pk in [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("events", "user_id", "customer", "c_custkey"),
    ]:
        orphans = con.execute(
            f"SELECT COUNT(*) FROM '{dst}/{fact}.parquet' f "
            f"WHERE {fk} IS NOT NULL AND NOT EXISTS ("
            f"SELECT 1 FROM '{dst}/{dim}.parquet' d "
            f"WHERE d.{pk} = f.{fk})").fetchone()[0]
        # only valid if the SOURCE had referential closure too
        src_orphans = con.execute(
            f"SELECT COUNT(*) FROM '/root/testdata/sf0.001/{fact}.parquet' f "
            f"WHERE {fk} IS NOT NULL AND NOT EXISTS ("
            f"SELECT 1 FROM '/root/testdata/sf0.001/{dim}.parquet' d "
            f"WHERE d.{pk} = f.{fk})").fetchone()[0]
        assert orphans == 2 * src_orphans, (fact, fk, orphans, src_orphans)

    # shard separation: shard 1's keys start above shard 0's max
    for t, c in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                 ("events", "event_id")]:
        src_lo, src_hi = con.execute(
            f"SELECT MIN({c}), MAX({c}) "
            f"FROM '/root/testdata/sf0.001/{t}.parquet'").fetchone()
        lo, hi = minmax(t, c)
        assert lo == src_lo and hi == src_hi + (src_hi + 1), (t, lo, hi)
