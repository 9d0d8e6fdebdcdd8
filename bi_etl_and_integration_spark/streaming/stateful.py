"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.11 Script Component async mode, in its streaming form).

Three training-pipeline staples:

  stateful_seen_filter   cross-batch exact dedup: the first arrival of
                         each key passes, later arrivals drop — state is
                         one marker per key (optionally TTL'd so state
                         stays bounded at 100 TB/day ingest rates)
  stateful_running_agg   per-key running count/sum emitted every batch —
                         the SSIS 'row count into a variable' made
                         continuous
  stateful_sessionize    gap-based sessionization with CUSTOM per-session
                         aggregates held in state — the hand-rolled
                         complement of ``session_window`` for semantics
                         the built-in can't express (event counts +
                         sums + first/last carried per open session,
                         closed sessions emitted exactly once)

State lives in Spark's checkpointed state store (RocksDB-backed on a
real cluster): restart-safe, partitioned by key — the operator logic
sees one key group per call, Arrow-batched.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


def stateful_sessionize(stream_df: DataFrame, keys: Sequence[str],
                        ts_col: str, value_col: str,
                        gap: str = "30 minutes",
                        watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessionization with state = the OPEN session's
    aggregates; a session closes (and is emitted, exactly once) when a
    later event of the same key arrives more than ``gap`` after it, or
    when the event-time watermark passes its timeout.

    Scale notes: state per key is one fixed-size tuple (start, last,
    n, sum) regardless of session length — no event buffering; the
    state store shards by key across executors; timeouts are how
    abandoned keys leave state (bounded memory at 100 TB/day).

    Requires event-time semantics: ``ts_col`` is cast to
    TIMESTAMP_LTZ (applyInPandasWithState's event-time timeout needs
    an instant, the session default here is NTZ) and a watermark is
    applied.  Output: keys + session_start, session_end, n_events,
    value_sum (timestamps as LTZ instants).
    """
    keys = list(keys)
    gap_ms = _duration_ms(gap)
    # explicit LTZ: the session default maps "timestamp" to NTZ, and
    # event-time watermarks accept only instants (TIMESTAMP_LTZ)
    df = stream_df.withColumn(
        ts_col, F.col(ts_col).cast("timestamp_ltz")).withWatermark(
        ts_col, watermark)
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields)
    out_ddl = (f"{key_fields}, session_start timestamp_ltz, "
               f"session_end timestamp_ltz, n_events long, value_sum double")
    state_ddl = ("start timestamp_ltz, last timestamp_ltz, "
                 "n long, total double")
    cols = keys + ["session_start", "session_end", "n_events", "value_sum"]

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame([[*key, start, last, n, total]], columns=cols)
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(ts_col)
        cur = list(state.get) if state.exists else None
        closed: list[list] = []
        for ts, val in zip(batch[ts_col], batch[value_col]):
            v = 0.0 if pd.isna(val) else float(val)
            if cur is None:
                cur = [ts, ts, 1, v]
            elif (ts - cur[1]).total_seconds() * 1000 > gap_ms:
                closed.append([*key, cur[0], cur[1], cur[2], cur[3]])
                cur = [ts, ts, 1, v]
            else:
                cur[1], cur[2], cur[3] = ts, cur[2] + 1, cur[3] + v
        state.update(tuple(cur))
        # close the open session once the watermark passes last + gap
        state.setTimeoutTimestamp(
            int(cur[1].timestamp() * 1000) + gap_ms)
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    return (df.groupBy(*keys)
            .applyInPandasWithState(fn, out_ddl, state_ddl, "append",
                                    GroupStateTimeout.EventTimeTimeout))


def _duration_ms(text: str) -> int:
    """Parse '30 minutes' / '2 hours' / '45 seconds' / '500 ms'."""
    qty, unit = text.split()
    per = {"ms": 1, "milliseconds": 1, "second": 1000, "seconds": 1000,
           "minute": 60_000, "minutes": 60_000,
           "hour": 3_600_000, "hours": 3_600_000,
           "day": 86_400_000, "days": 86_400_000}[unit.lower()]
    return int(float(qty) * per)


def stateful_top_k(stream_df: DataFrame, keys: Sequence[str],
                   value_col: str, *, k: int = 10,
                   m: int = 1000,
                   ttl_minutes: int | None = None) -> DataFrame:
    """Streaming heavy hitters: per key group, the running top-``k``
    values of ``value_col`` by frequency across the WHOLE stream —
    the continuous twin of ``aggregate.approx_top_k``, sharing its
    bounded space-saving sketch (Metwally et al. 2005).

    State per key is AT MOST ``m`` (value, count) counters plus the
    eviction floor, regardless of the column's cardinality; the OTHER
    axis — distinct KEY GROUPS — is bounded by ``ttl_minutes`` (a key
    idle that long drops its sketch; same dial as
    :func:`stateful_seen_filter`), so total state is
    m × active-keys-per-TTL-window, finite at 100 TB/day ingest on
    churning key spaces.  Without a TTL, keys accrete for the stream's
    lifetime — fine for small fixed key domains only.  Counts are exact while a key group has seen <= m
    distinct values; beyond that each count is the standard
    space-saving upper bound.  Emits one row per (key, rank) per
    micro-batch that touched the key, ranks 1..k by (count desc,
    value) — deterministic under replay of the same batch sequence.
    """
    from bi_etl_and_integration_spark.operators.aggregate import (
        _space_saving_update)
    keys = list(keys)
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in stream_df.select(*keys).schema.fields)
    out_ddl = (f"{key_fields}, rank int, value string, est_count long")

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_minutes
               else GroupStateTimeout.NoTimeout)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            vals, cnts, floor = state.get
            sketch = pd.Series(list(cnts), index=list(vals),
                               dtype="int64")
        else:
            sketch, floor = None, 0
        for pdf in pdfs:
            vc = pdf[value_col].dropna().astype(str).value_counts()
            if len(vc):
                sketch, floor = _space_saving_update(sketch, floor,
                                                     vc, m)
        if sketch is None:
            return
        state.update((list(sketch.index), [int(c) for c in sketch],
                      int(floor)))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        top = (sketch.rename("c").rename_axis("v").reset_index()
               .sort_values(["c", "v"], ascending=[False, True],
                            kind="mergesort")
               .head(k))
        out = pd.DataFrame({
            **{kc: [kv] * len(top) for kc, kv in zip(keys, key)},
            "rank": range(1, len(top) + 1),
            "value": top["v"].to_numpy(),
            "est_count": top["c"].to_numpy("int64")})
        yield out

    return (stream_df.groupBy(*keys)
            .applyInPandasWithState(
                fn, out_ddl,
                "vals array<string>, cnts array<long>, floor long",
                "update", timeout))
