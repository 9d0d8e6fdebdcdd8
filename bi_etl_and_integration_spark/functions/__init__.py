"""Scalar expression surface (SURVEY.md §2.9) — SSIS expression
language / ClickHouse / PG snippets mapped 1:1 onto Spark built-ins.

These are thin aliases so pipeline code written against the reference's
vocabulary (FINDSTRING, REPLACENULL, DATEADD, ...) reads naturally
while compiling to pure Catalyst expressions (whole-stage codegen, no
UDFs).  Cited sources: PRO/Глава 06 (expressions), Глава 11:14-23
(FINDSTRING/SUBSTRING/TRIM), SCRIPTS/Скрипт для миграции...:29-68
(string_agg/COALESCE/casts).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# ---- string family -----------------------------------------------------
def findstring(col, needle: str, occurrence: int = 1) -> Column:
    """SSIS FINDSTRING (1-based, 0 = not found)."""
    if occurrence != 1:
        raise NotImplementedError("occurrence > 1 not supported")
    return F.instr(_c(col), needle)


def substring(col, start: int, length: int) -> Column:
    return F.substring(_c(col), start, length)


def left(col, n: int) -> Column:
    return F.substring(_c(col), 1, n)


def right(col, n: int) -> Column:
    c = _c(col)
    return F.substring(c, -n, n)


def len_(col) -> Column:
    return F.length(_c(col))


def trim(col) -> Column:
    return F.trim(_c(col))


def upper(col) -> Column:
    return F.upper(_c(col))


def lower(col) -> Column:
    return F.lower(_c(col))


def concat_ws(sep: str, *cols) -> Column:
    return F.concat_ws(sep, *[_c(c) for c in cols])


def replace(col, find: str, repl: str) -> Column:
    return F.replace(_c(col), F.lit(find), F.lit(repl))


# ---- null handling -----------------------------------------------------
def replacenull(col, default) -> Column:
    """SSIS REPLACENULL(a, b)."""
    return F.coalesce(_c(col), F.lit(default) if not isinstance(default, Column)
                      else default)


def isnull_ternary(col, if_null, if_not) -> Column:
    """SSIS ``ISNULL(x) ? a : b``."""
    return F.when(_c(col).isNull(), if_null).otherwise(if_not)


# ---- date/time family --------------------------------------------------
def getdate() -> Column:
    return F.current_timestamp()


def dateadd(part: str, n, col) -> Column:
    """SSIS/T-SQL DATEADD."""
    return F.timestampadd(part.upper(), n if isinstance(n, Column) else F.lit(n),
                          _c(col))


def datediff(part: str, a, b) -> Column:
    """T-SQL DATEDIFF(part, start, end) (PRACT/004:292-298)."""
    return F.timestampdiff(part.upper(), _c(a), _c(b))


def datepart(part: str, col) -> Column:
    return F.date_part(F.lit(part.upper()), _c(col))


# ---- casts (SSIS DT_* syntax) ------------------------------------------
_DT_MAP = {
    "DT_STR": "string", "DT_WSTR": "string", "DT_I2": "smallint",
    "DT_I4": "int", "DT_I8": "bigint", "DT_R4": "float", "DT_R8": "double",
    "DT_DATE": "date", "DT_DBTIMESTAMP": "timestamp_ntz",
    "DT_BOOL": "boolean", "DT_NUMERIC": "decimal(38,9)", "DT_BYTES": "binary",
}


def dt_cast(col, dt_type: str) -> Column:
    """``(DT_STR, 50, 1252) x`` -> ``dt_cast(x, "DT_STR")``; Unicode
    codepage hazards disappear (Spark strings are always UTF-8)."""
    return _c(col).cast(_DT_MAP[dt_type.upper()])


# ---- similarity --------------------------------------------------------
def similarity(a, b) -> Column:
    from bi_etl_and_integration_spark.operators.fuzzy import (
        similarity as _sim)
    return _sim(_c(a), _c(b))
