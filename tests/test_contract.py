"""Driver-contract drift guards.

The driver compares each ``queries()`` result against ``oracle_sql()``
by sorting columns BY NAME before hashing values — an alias mismatch
fails the gate even when every value is identical.  These tests catch
that class of drift without running the full oracle diff.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as m
    return m


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def test_every_oracle_has_a_query(entry):
    qs, orc = entry.queries(), entry.oracle_sql()
    assert set(orc) <= set(qs), sorted(set(orc) - set(qs))


def test_oracle_columns_match_spark_columns(entry, duck, spark):
    """Plan-only on the Spark side (no job runs); oracles execute at
    sf0.001 (milliseconds) to expose their result column names."""
    qs, orc = entry.queries(), entry.oracle_sql()
    mismatches = {}
    for name, sql in orc.items():
        duck_cols = [c[0] for c in duck.execute(sql).description]
        spark_cols = qs[name](spark, SF).columns
        if sorted(duck_cols) != sorted(spark_cols):
            mismatches[name] = (sorted(spark_cols), sorted(duck_cols))
    assert not mismatches, mismatches


def test_entry_returns_lazy_dataframe(entry, spark):
    df = entry.entry(spark)
    assert df.columns, "entry() must return a DataFrame with a schema"
