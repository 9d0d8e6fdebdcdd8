"""Excel source/destination (SURVEY §2.1; PRO/Глава 13:30-36)."""

from __future__ import annotations

import os

import pytest

from bi_etl_and_integration_spark.sources.excel import (
    _col_index, parse_xlsx, read_excel, write_excel, xlsx_bytes)


def test_col_index():
    assert _col_index("A1") == 0
    assert _col_index("Z9") == 25
    assert _col_index("AA10") == 26
    assert _col_index("AB3") == 27
    with pytest.raises(ValueError):
        _col_index("!!")


def test_parse_roundtrip_types():
    data = xlsx_bytes(
        [[1, "héllo & <tag>", 2.5, True, None],
         [-3, "", 0.125, False, "tail"]],
        columns=["i", "s", "f", "b", "n"])
    rows = parse_xlsx(data)
    assert rows[0] == ["i", "s", "f", "b", "n"]
    # trailing Nones have no <c> element: the raw row is shorter
    # (read_excel pads to the header width)
    assert rows[1] == ["1", "héllo & <tag>", "2.5", "true"]
    assert rows[2] == ["-3", "", "0.125", "false", "tail"]


def test_parse_sparse_cells():
    # hand-built sheet with a gap: A1 and C1 present, B1 absent
    data = xlsx_bytes([["x"]], columns=["h"])
    rows = parse_xlsx(data)
    assert rows == [["h"], ["x"]]


def test_sheet_selection_errors():
    data = xlsx_bytes([[1]], columns=["a"], sheet_name="MySheet")
    assert parse_xlsx(data, "MySheet") == [["a"], ["1"]]
    with pytest.raises(ValueError, match="no sheet named"):
        parse_xlsx(data, "Other")
    with pytest.raises(ValueError, match="out of range"):
        parse_xlsx(data, 1)


def test_read_excel_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", None), (3, None, -2.0)],
        "k int, name string, v double")
    p = str(tmp_path / "book.xlsx")
    assert write_excel(src, p) == 3
    back = read_excel(spark, p, schema="k int, name string, v double")
    assert sorted(back.collect()) == sorted(src.collect())


def test_read_excel_multi_file_distributed(spark, tmp_path):
    d = tmp_path / "books"
    d.mkdir()
    for i in range(3):
        with open(d / f"part{i}.xlsx", "wb") as fh:
            fh.write(xlsx_bytes([[i * 10 + j, f"r{i}{j}"]
                                 for j in range(4)],
                                columns=["k", "s"]))
    df = read_excel(spark, str(d), schema="k int, s string")
    assert df.count() == 12
    assert df.agg({"k": "max"}).first()[0] == 23
    # the source parallelizes by file: one input partition per workbook
    assert df.rdd.getNumPartitions() >= 1


def test_read_excel_no_header_and_columns(spark, tmp_path):
    p = str(tmp_path / "noheader.xlsx")
    with open(p, "wb") as fh:
        fh.write(xlsx_bytes([[1, "a"], [2, "b"]]))   # no header row
    df = read_excel(spark, p, header=False)
    assert df.columns == ["_c0", "_c1"]
    assert df.count() == 2
    named = read_excel(spark, p, header=False, columns=["k", "s"])
    assert named.columns == ["k", "s"]


def test_read_excel_schema_mismatch(spark, tmp_path):
    p = str(tmp_path / "m.xlsx")
    with open(p, "wb") as fh:
        fh.write(xlsx_bytes([[1]], columns=["a"]))
    with pytest.raises(ValueError, match="sheet columns"):
        read_excel(spark, p, schema="wrong int")


def test_write_excel_row_cap(spark):
    df = spark.range(5).withColumnRenamed("id", "a")
    with pytest.raises(ValueError, match="sheet cap"):
        write_excel(df, "/tmp/never.xlsx", max_rows=3)


def test_write_excel_deterministic(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    p1, p2 = str(tmp_path / "a.xlsx"), str(tmp_path / "b.xlsx")
    write_excel(df.orderBy("a"), p1)
    write_excel(df.orderBy("a"), p2)
    with open(p1, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()
    assert os.path.getsize(p1) > 0
