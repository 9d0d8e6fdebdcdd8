"""Unit tests: the scalar function surface (SURVEY.md §2.9)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bi_etl_and_integration_spark import functions as fn


def one(df, col="x"):
    return df.collect()[0][col]


def test_findstring(rows):
    df = rows([("abcabc",)], "s string")
    assert one(df.select(fn.findstring("s", "b").alias("x"))) == 2
    assert one(df.select(fn.findstring("s", "b", 2).alias("x"))) == 5
    assert one(df.select(fn.findstring("s", "z").alias("x"))) == 0


def test_string_family(rows):
    df = rows([("  Hello World  ",)], "s string")
    assert one(df.select(fn.trim("s").alias("x"))) == "Hello World"
    assert one(df.select(fn.left(fn.trim("s"), 5).alias("x"))) == "Hello"
    assert one(df.select(fn.right(fn.trim("s"), 5).alias("x"))) == "World"
    assert one(df.select(fn.length(fn.trim("s")).alias("x"))) == 11
    assert one(df.select(
        fn.replace("s", "World", "Spark").alias("x"))).strip() == "Hello Spark"
    assert one(df.select(fn.reverse_str(fn.trim("s")).alias("x"))) == \
        "dlroW olleH"


def test_token(rows):
    df = rows([("a;b,,c",)], "s string")
    assert one(df.select(fn.token("s", ";,", 1).alias("x"))) == "a"
    assert one(df.select(fn.token("s", ";,", 3).alias("x"))) == "c"


def test_null_family(rows):
    df = rows([(None, "v")], "a string, b string")
    assert one(df.select(fn.replacenull("a", "dflt").alias("x"))) == "dflt"
    assert one(df.select(fn.isnull_ternary("a", 1, 0).alias("x"))) == 1
    assert one(df.select(fn.isnull_ternary("b", 1, 0).alias("x"))) == 0
    assert one(df.select(fn.null_if("b", "v").alias("x"))) is None
    assert one(df.select(fn.coalesce("a", "b").alias("x"))) == "v"


def test_date_family(rows):
    d0 = dt.datetime(2024, 3, 15, 10, 30, 0)
    df = rows([(d0,)], "d timestamp")
    assert one(df.select(fn.year("d").alias("x"))) == 2024
    assert one(df.select(fn.month("d").alias("x"))) == 3
    assert one(df.select(fn.day("d").alias("x"))) == 15
    assert one(df.select(fn.datepart("hh", "d").alias("x"))) == 10
    added = one(df.select(fn.dateadd("dd", 20, "d").alias("x")))
    assert added == dt.datetime(2024, 4, 4, 10, 30, 0)
    df2 = rows([(d0, d0 + dt.timedelta(hours=30))],
               "a timestamp, b timestamp")
    assert one(df2.select(fn.datediff("hour", "a", "b").alias("x"))) == 30


def test_math_family(rows):
    df = rows([(-2.5,)], "v double")
    assert one(df.select(fn.sign("v").alias("x"))) == -1.0
    assert one(df.select(fn.square("v").alias("x"))) == 6.25
    assert one(df.select(fn.abs_of("v").alias("x"))) == 2.5
    assert one(df.select(fn.ceiling("v").alias("x"))) == -2
    assert one(df.select(fn.floor_of("v").alias("x"))) == -3


def test_cast_family(rows):
    df = rows([("42", "bad")], "good string, bad string")
    assert one(df.select(fn.cast_dt("good", "int").alias("x"))) == 42
    assert one(df.select(fn.try_cast_dt("bad", "int").alias("x"))) is None


def test_json_family(rows):
    df = rows([('{"k": "v", "n": 7}',)], "j string")
    assert one(df.select(fn.json_value("j", "$.k").alias("x"))) == "v"
    parsed = one(df.select(fn.json_object("j", "k string, n int")
                           .alias("x")))
    assert parsed["n"] == 7


def test_similarity_family(rows):
    df = rows([("smith", "smyth")], "a string, b string")
    assert one(df.select(fn.levenshtein_similarity("a", "b")
                         .alias("x"))) == 0.8
    assert one(df.select(fn.soundex_of("a").alias("x"))) == \
        one(df.select(fn.soundex_of("b").alias("x")))
