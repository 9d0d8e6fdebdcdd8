"""Parse ``explain`` output into assertable facts.

These are STRING-level checks over the formatted physical plan — stable
across Spark 3.x/4.x for the node names used here (Exchange,
BroadcastHashJoin, PushedFilters, ReadSchema, WholeStageCodegen), and
deliberately simple so a failure message shows the full plan text.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (AQE initial plan included)."""
    return df._jdf.queryExecution().explainString(  # noqa: SLF001
        df._sc._jvm.org.apache.spark.sql.execution  # noqa: SLF001
        .ExplainMode.fromString("formatted"))


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(  # noqa: SLF001
        df._sc._jvm.org.apache.spark.sql.execution  # noqa: SLF001
        .ExplainMode.fromString("simple"))


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan.
    Every one is a full materialize-and-repartition of the flow — the
    scale-limiting step; operator APIs budget these explicitly.

    Uses the SIMPLE plan (one line per node; the formatted mode splits
    node names from their arguments and lists nodes twice)."""
    plan = simple_plan(df)
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|"
                          r"RoundRobinPartitioning|SinglePartition)", plan))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"\bBroadcastHashJoin\b|\bBroadcastNestedLoopJoin\b",
                          simple_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every file scan in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings of every file scan (column pruning)."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", formatted_plan(df))


def scan_columns(df: DataFrame) -> set[str]:
    """Union of column names actually read from file scans."""
    cols: set[str] = set()
    for schema in read_schemas(df):
        inner = schema[len("struct<"):-1]
        for fieldspec in inner.split(","):
            name = fieldspec.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = fewer interpreter
    boundaries; narrow transforms should fuse into few spans).  In the
    simple plan a span id shows as ``*(N)`` on each fused node."""
    return len(set(re.findall(r"\*\((\d+)\)", simple_plan(df))))
