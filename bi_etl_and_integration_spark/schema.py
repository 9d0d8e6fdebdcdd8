"""Type registry: PostgreSQL / ClickHouse / SSIS type names -> Spark
types, with explicit nullability tracking (SURVEY.md §1.2).

The reference's migration scripts generate ClickHouse DDL from PG
``information_schema`` with a deterministic mapping (SCRIPTS/Скрипт для
миграции из PostgreSQL в ClickHouse.md:8-55); ClickHouse columns are
NON-nullable unless wrapped ``Nullable(T)`` while Spark defaults to
nullable — ``column()`` makes that choice explicit.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

#: PG type name -> Spark type (SCRIPTS/Перелив...md:173-196)
PG_TYPES: dict[str, T.DataType] = {
    "smallint": T.ShortType(), "int2": T.ShortType(),
    "integer": T.IntegerType(), "int4": T.IntegerType(),
    "bigint": T.LongType(), "int8": T.LongType(),
    "real": T.FloatType(), "float4": T.FloatType(),
    "double precision": T.DoubleType(), "float8": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),           # reference collapses tz
    "timestamp without time zone": T.TimestampNTZType(),
    "timestamp with time zone": T.TimestampNTZType(),
    "text": T.StringType(), "varchar": T.StringType(),
    "character varying": T.StringType(), "char": T.StringType(),
    "uuid": T.StringType(),                       # canonical 36-char form
    "json": T.StringType(), "jsonb": T.StringType(),  # parse on demand
    "bytea": T.BinaryType(),
}

#: ClickHouse type name -> Spark type
CH_TYPES: dict[str, T.DataType] = {
    "Int8": T.ByteType(), "Int16": T.ShortType(), "Int32": T.IntegerType(),
    "Int64": T.LongType(), "UInt8": T.BooleanType(),  # CH bool idiom
    "UInt16": T.IntegerType(), "UInt32": T.LongType(),
    "UInt64": T.DecimalType(20, 0),
    "Float32": T.FloatType(), "Float64": T.DoubleType(),
    "Date": T.DateType(), "DateTime": T.TimestampNTZType(),
    "String": T.StringType(), "UUID": T.StringType(),
}


def resolve(type_name: str) -> T.DataType:
    """Resolve a PG/CH type string, incl. parameterized forms:
    Decimal(p,s) / numeric(p,s), Nullable(T), Array(T), FixedString(n),
    LowCardinality(T)."""
    s = type_name.strip()
    m = re.fullmatch(r"(?:Nullable|LowCardinality)\((.*)\)", s)
    if m:
        return resolve(m.group(1))
    m = re.fullmatch(r"(?:Decimal|numeric|decimal)\((\d+)\s*,\s*(\d+)\)", s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"Array\((.*)\)", s)
    if m:
        return T.ArrayType(resolve(m.group(1)))
    m = re.fullmatch(r"FixedString\(\d+\)", s)
    if m:
        return T.StringType()
    if s in CH_TYPES:
        return CH_TYPES[s]
    low = s.lower()
    if low in PG_TYPES:
        return PG_TYPES[low]
    raise ValueError(f"unknown type name: {type_name!r}")


def is_nullable(type_name: str) -> bool:
    """ClickHouse semantics: nullable ONLY when wrapped Nullable(...)."""
    return type_name.strip().startswith("Nullable(")


def column(name: str, type_name: str,
           nullable: bool | None = None) -> T.StructField:
    """Build a field with reference nullability semantics: explicit
    ``nullable`` wins; else CH ``Nullable()`` wrapper decides (non-null
    default, unlike Spark's)."""
    return T.StructField(
        name, resolve(type_name),
        is_nullable(type_name) if nullable is None else nullable)


def schema(cols: dict[str, str] | list[tuple],
           ) -> T.StructType:
    """``schema({"id": "Int64", "name": "Nullable(String)"})``."""
    items = cols.items() if isinstance(cols, dict) else cols
    return T.StructType([column(n, t) for n, t in items])


def staging_schema(target: T.StructType) -> T.StructType:
    """Two-phase ingest phase 1 (SCRIPTS/Скрипт для миграции...:59-65):
    an all-nullable-String staging twin of the target schema; phase 2 is
    ``cast_with_quarantine`` per column into the typed table."""
    return T.StructType([T.StructField(f.name, T.StringType(), True)
                         for f in target.fields])
