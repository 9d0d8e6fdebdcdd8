"""Plan inspection & assertions.

The reference diagnoses pipelines via EXPLAIN PIPELINE / execution-tree
visualizers (DM/...:141, PRACT/007 Vizualizer.md).  On Spark the
physical plan is the artifact; these helpers let tests and the bench
ASSERT the plan shape we designed for — pushdown reached the scan,
the dimension join broadcast, no cartesian product appeared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def _plan(df: DataFrame) -> str:
    try:
        return formatted_plan(df)
    except Exception:
        import contextlib
        import io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    """True when at least one scan carries PushedFilters."""
    p = _plan(df)
    return "PushedFilters: [" in p and "PushedFilters: []" not in p.replace(
        "PushedFilters: [],", "PushedFilters: []")


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema lines of every scan — column-pruning check."""
    return [ln.strip() for ln in _plan(df).splitlines()
            if "ReadSchema" in ln]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in _plan(df)


def has_cartesian(df: DataFrame) -> bool:
    p = _plan(df)
    return "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges — the scale cost driver."""
    return _plan(df).count("Exchange ")


def assert_no_cartesian(df: DataFrame) -> None:
    if has_cartesian(df):
        raise AssertionError("plan contains a cartesian/nested-loop join:\n"
                             + _plan(df))
