"""Unit tests: type registry (SURVEY.md §1.2) — pure Python, no Spark."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from bi_etl_and_integration_spark import schema as sc


@pytest.mark.parametrize("name,expected", [
    ("integer", T.IntegerType()),
    ("bigint", T.LongType()),
    ("double precision", T.DoubleType()),
    ("timestamp with time zone", T.TimestampNTZType()),  # tz collapsed
    ("Int64", T.LongType()),
    ("UInt8", T.BooleanType()),
    ("UInt64", T.DecimalType(20, 0)),
    ("DateTime", T.TimestampNTZType()),
    ("jsonb", T.StringType()),
    ("bytea", T.BinaryType()),
    ("uuid", T.StringType()),
])
def test_resolve_scalars(name, expected):
    assert sc.resolve(name) == expected


def test_resolve_parameterized():
    assert sc.resolve("Decimal(12,2)") == T.DecimalType(12, 2)
    assert sc.resolve("numeric(5, 1)") == T.DecimalType(5, 1)
    assert sc.resolve("Array(Int32)") == T.ArrayType(T.IntegerType())
    assert sc.resolve("Array(Nullable(String))") == \
        T.ArrayType(T.StringType())
    assert sc.resolve("FixedString(16)") == T.StringType()
    assert sc.resolve("LowCardinality(String)") == T.StringType()
    assert sc.resolve("Nullable(Int64)") == T.LongType()


def test_resolve_unknown_raises():
    with pytest.raises(ValueError, match="unknown type"):
        sc.resolve("Geography")


def test_nullability_is_clickhouse_default_non_null():
    assert not sc.is_nullable("Int64")
    assert sc.is_nullable("Nullable(Int64)")
    f = sc.column("x", "Int64")
    assert f.nullable is False          # CH default, NOT Spark's
    f2 = sc.column("y", "Nullable(String)")
    assert f2.nullable is True
    f3 = sc.column("z", "Int64", nullable=True)  # explicit override wins
    assert f3.nullable is True


def test_schema_builder():
    s = sc.schema({"id": "Int64", "name": "Nullable(String)"})
    assert s.fieldNames() == ["id", "name"]
    assert s["id"].dataType == T.LongType() and not s["id"].nullable
    assert s["name"].nullable


def test_staging_schema_is_all_nullable_string():
    target = sc.schema({"id": "Int64", "v": "Float64"})
    stg = sc.staging_schema(target)
    assert all(f.dataType == T.StringType() and f.nullable
               for f in stg.fields)
    assert stg.fieldNames() == ["id", "v"]
