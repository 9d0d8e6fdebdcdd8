"""Unit tests: array / nested operators (SURVEY.md §2.7, DM/arrayZip.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from bi_etl_and_integration_spark.operators import arrays as arr


def test_array_zip_pads_by_default(rows):
    df = rows([([1, 2], ["a"])], "xs array<int>, ys array<string>")
    out = df.select(arr.array_zip("xs", "ys").alias("z")).collect()[0]["z"]
    assert len(out) == 2
    assert out[1]["ys"] is None  # Spark null-pads


def test_array_zip_strict_raises_on_mismatch(rows):
    """check_lengths=True reproduces ClickHouse's error contract
    (DM/arrayZip.md:123)."""
    df = rows([([1, 2], ["a"])], "xs array<int>, ys array<string>")
    with pytest.raises(Exception, match="length mismatch"):
        df.select(arr.array_zip("xs", "ys", check_lengths=True)
                  .alias("z")).collect()


def test_array_zip_strict_ok_when_equal(rows):
    df = rows([([1, 2], ["a", "b"])], "xs array<int>, ys array<string>")
    out = df.select(arr.array_zip("xs", "ys", check_lengths=True)
                    .alias("z")).collect()[0]["z"]
    assert [(e["xs"], e["ys"]) for e in out] == [(1, "a"), (2, "b")]


def test_unnest(rows):
    df = rows([(1, [10, 20])], "id int, xs array<int>")
    out = arr.unnest(df, "xs", out="x", keep=["id"])
    assert sorted((r["id"], r["x"]) for r in out.collect()) == \
        [(1, 10), (1, 20)]


def test_unnest_with_pos(rows):
    df = rows([(1, ["a", "b"])], "id int, xs array<string>")
    out = arr.unnest(df, "xs", out="x", keep=["id"], with_pos=True)
    assert sorted((r["pos"], r["x"]) for r in out.collect()) == \
        [(0, "a"), (1, "b")]


def test_unnest_parallel(rows):
    df = rows([(1, [10, 20], ["a", "b"])],
              "id int, xs array<int>, ys array<string>")
    out = arr.unnest_parallel(df, ["xs", "ys"])
    assert sorted((r["id"], r["xs"], r["ys"]) for r in out.collect()) == \
        [(1, 10, "a"), (1, 20, "b")]


def test_array_element_is_one_based(rows):
    df = rows([([10, 20, 30],)], "xs array<int>")
    got = df.select(arr.array_element("xs", 1).alias("e")).collect()[0]["e"]
    assert got == 10  # ClickHouse arrayElement semantics


def test_array_map_filter_sum(rows):
    df = rows([([1.0, 2.0, 3.0],)], "xs array<double>")
    out = df.select(
        arr.array_map("xs", lambda x: x * 10).alias("m"),
        arr.array_filter("xs", lambda x: x > 1.5).alias("f"),
        arr.array_sum("xs").alias("s")).collect()[0]
    assert out["m"] == [10.0, 20.0, 30.0]
    assert out["f"] == [2.0, 3.0]
    assert out["s"] == 6.0


def test_array_sum_empty(rows):
    df = rows([([],)], "xs array<double>")
    assert df.select(arr.array_sum("xs").alias("s")).collect()[0]["s"] == 0.0
