"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.11 Script Component async mode, in its streaming form).

Two training-pipeline staples:

  stateful_seen_filter   cross-batch exact dedup: the first arrival of
                         each key passes, later arrivals drop — state is
                         one marker per key (optionally TTL'd so state
                         stays bounded at 100 TB/day ingest rates)
  stateful_running_agg   per-key running count/sum emitted every batch —
                         the SSIS 'row count into a variable' made
                         continuous

State lives in Spark's checkpointed state store (RocksDB-backed on a
real cluster): restart-safe, partitioned by key — the operator logic
sees one key group per call, Arrow-batched.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_seen_filter(stream_df: DataFrame, keys: Sequence[str],
                         payload_cols: Sequence[str],
                         ttl_minutes: int | None = None) -> DataFrame:
    """Emit only the FIRST row ever seen per key (cross-batch dedup).

    ``ttl_minutes`` bounds state: a key unseen for that long is evicted
    (and would pass again) — the retention/recall dial every at-scale
    dedup needs.  Output schema: keys + payload_cols.
    """
    keys = list(keys)
    payload_cols = list(payload_cols)
    out_schema = stream_df.select(*keys, *payload_cols).schema
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_minutes
               else GroupStateTimeout.NoTimeout)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        first = next(pdfs, None)
        if not state.exists and first is not None and len(first):
            state.update((True,))
            if ttl_minutes:
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)
            yield first[keys + payload_cols].head(1)
        elif ttl_minutes and state.exists:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    return (stream_df.groupBy(*keys)
            .applyInPandasWithState(fn, out_schema, "seen boolean",
                                    "append", timeout))


def stateful_running_agg(stream_df: DataFrame, keys: Sequence[str],
                         value_col: str) -> DataFrame:
    """Per-key running (count, sum) across the whole stream, one output
    row per key per micro-batch that touched the key."""
    keys = list(keys)
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in stream_df.select(*keys).schema.fields)
    out_ddl = f"{key_fields}, running_count long, running_sum double"

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        cnt, total = state.get if state.exists else (0, 0.0)
        new_cnt, new_sum = 0, 0.0
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            new_cnt += len(pdf)
            new_sum += float(vals.sum()) if len(vals) else 0.0
        cnt, total = cnt + new_cnt, total + new_sum
        state.update((cnt, total))
        yield pd.DataFrame([[*key, cnt, total]],
                           columns=keys + ["running_count", "running_sum"])

    return (stream_df.groupBy(*keys)
            .applyInPandasWithState(
                fn, out_ddl, "cnt long, total double",
                "update", GroupStateTimeout.NoTimeout))
