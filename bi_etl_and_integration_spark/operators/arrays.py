"""Array / nested-structure operators (SURVEY.md §2.7 arrays, §2.5).

Reference parity (the ClickHouse-idiom layer, DM/arrayZip.md passim):
  - ``arrayZip``           -> ``array_zip`` (F.arrays_zip + length check)
  - ``ARRAY JOIN`` unnest  -> ``unnest`` (explode / posexplode)
  - parallel multi-array unnest -> ``unnest_parallel``
  - ``arrayElement`` (1-based), ``tupleElement`` -> element_at/getField
  - ``arrayMap/arrayFilter/arraySum`` lambdas -> transform/filter/aggregate
    (higher-order functions: JVM-side, codegen'd — no Python round trip)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def array_zip(*arrs: Column | str, check_lengths: bool = False) -> Column:
    """ClickHouse ``arrayZip``: zip k arrays into array<struct>.

    ClickHouse errors on length mismatch (DM/arrayZip.md:123) while
    Spark null-pads; ``check_lengths=True`` reproduces the strict
    behavior by raising at runtime via ``raise_error``.
    """
    cols = [F.col(a) if isinstance(a, str) else a for a in arrs]
    zipped = F.arrays_zip(*cols)
    if not check_lengths:
        return zipped
    same = cols[0].isNull()
    base = F.size(cols[0])
    cond = F.lit(True)
    for c in cols[1:]:
        cond = cond & (F.size(c) == base)
    return F.when(cond, zipped).otherwise(
        F.raise_error(F.lit("array_zip: length mismatch")))


def unnest(df: DataFrame, arr: str | Column, out: str = "elem",
           keep: Sequence[str] | None = None,
           with_pos: bool = False, pos_col: str = "pos") -> DataFrame:
    """ARRAY JOIN: expand an array column to rows."""
    keep_cols = [F.col(c) for c in (keep if keep is not None else df.columns)]
    a = F.col(arr) if isinstance(arr, str) else arr
    if with_pos:
        ex = F.posexplode(a).alias(pos_col, out)
        return df.select(*keep_cols, ex)
    return df.select(*keep_cols, F.explode(a).alias(out))


def unnest_parallel(df: DataFrame, arrs: Sequence[str],
                    outs: Sequence[str] | None = None,
                    keep: Sequence[str] | None = None) -> DataFrame:
    """Parallel ARRAY JOIN over k same-length arrays
    (DM/arrayZip.md:55-65): explode(arrays_zip(...)) then field access."""
    outs = list(outs or arrs)
    keep_cols = [c for c in (keep if keep is not None else df.columns)
                 if c not in arrs]
    z = F.explode(F.arrays_zip(*[F.col(a) for a in arrs])).alias("__z")
    ex = df.select(*keep_cols, z)
    return ex.select(*keep_cols,
                     *[F.col("__z").getField(a).alias(o)
                       for a, o in zip(arrs, outs)])


def array_element(arr: Column | str, index: int | Column) -> Column:
    """1-based element access (matches ClickHouse ``arrayElement``)."""
    a = F.col(arr) if isinstance(arr, str) else arr
    return F.element_at(a, index)


def array_map(arr: Column | str, fn) -> Column:
    return F.transform(F.col(arr) if isinstance(arr, str) else arr, fn)


def array_filter(arr: Column | str, pred) -> Column:
    return F.filter(F.col(arr) if isinstance(arr, str) else arr, pred)


def array_sum(arr: Column | str) -> Column:
    """``arraySum``: numeric sum inside an array (double result)."""
    a = F.col(arr) if isinstance(arr, str) else arr
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
