"""Event-time windowed aggregation (SURVEY.md §2.10).

The reference's incremental story is CDC-batch; event-time windows are
the beyond-reference streaming surface (Q41).  These helpers apply to
BOTH batch and streaming DataFrames — the same plan, which is exactly
how the batch-mode oracle checks the streaming semantics.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _windowed(df: DataFrame, ts_col: str, window_expr: Column,
              keys: Sequence[str], aggs: Mapping[str, Column],
              watermark: str | None) -> DataFrame:
    if watermark is not None:
        # Spark watermarks require TIMESTAMP (LTZ) event time; cast NTZ
        # through the session zone so batch fixtures and streams agree
        if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(window_expr, *keys)
            .agg(*[c.alias(n) for n, c in aggs.items()]))


def tumbling_windowed_agg(df: DataFrame, ts_col: str, size: str,
                          keys: Sequence[str], aggs: Mapping[str, Column],
                          watermark: str | None = None) -> DataFrame:
    """Tumbling window: non-overlapping fixed buckets.  With a watermark
    the state store evicts closed windows — bounded state at scale."""
    return _windowed(df, ts_col, F.window(ts_col, size), keys, aggs,
                     watermark)


def sliding_windowed_agg(df: DataFrame, ts_col: str, size: str, slide: str,
                         keys: Sequence[str], aggs: Mapping[str, Column],
                         watermark: str | None = None) -> DataFrame:
    return _windowed(df, ts_col, F.window(ts_col, size, slide), keys, aggs,
                     watermark)


def session_windowed_agg(df: DataFrame, ts_col: str, gap: str,
                         keys: Sequence[str], aggs: Mapping[str, Column],
                         watermark: str | None = None) -> DataFrame:
    """Session window: rows within ``gap`` of each other merge."""
    return _windowed(df, ts_col, F.session_window(ts_col, gap), keys, aggs,
                     watermark)
