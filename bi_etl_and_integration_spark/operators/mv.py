"""Incrementally-maintained aggregate materialized view (SURVEY.md §1.1:
ClickHouse MV carrying AggregateFunction partial states, DM/Правильное
построение витрины с множественными агрегациями.md:78-99).

The ClickHouse pattern: the MV stores per-key partial STATES
(``groupArrayState``), readers finalize with ``-Merge`` combinators.
Spark-native equivalent: each batch appends one partial-state parquet
delta (sum/count pairs per measure); reads merge all deltas; periodic
compaction rewrites them as one.  Appends never rewrite history — the
write cost of a refresh is O(batch), not O(view), which is the property
that makes nightly 100 TB fact loads maintainable.

Crash safety: a refresh is one atomic parquet append of a new delta
directory; compaction publishes via temp-dir swap (single-writer,
documented in ``pipeline.checkpointed_write``).

Exactness: pass DECIMAL measure columns for money-like data.  Double
partial sums re-associate across deltas (and across compactions), which
can flip a downstream rounding boundary; decimal states make
refresh-then-merge bit-identical to a direct aggregation.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bi_etl_and_integration_spark.operators.aggregate import (
    merge_states, partial_states)


class IncrementalAggMV:
    """``IncrementalAggMV(path, keys, measures, finals)``:

    - ``refresh(batch_df)``  aggregate the batch to partial states and
      append them as a new delta (one shuffle over the batch only)
    - ``read(spark)``        merged + finalized view
    - ``compact(spark)``     fold all deltas into one (read cost resets)

    measures: {name: Column}; finals: {name: sum|count|avg}.
    """

    def __init__(self, path: str, keys: Sequence[str],
                 measures: Mapping[str, Column],
                 finals: Mapping[str, str] | None = None):
        self.path = path
        self.keys = list(keys)
        self.measures = dict(measures)
        self.finals = dict(finals or {m: "sum" for m in measures})

    def refresh(self, batch: DataFrame) -> None:
        states = partial_states(batch, self.keys, self.measures)
        states.write.mode("append").parquet(self.path)

    def _states(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return merge_states(self._states(spark), self.keys,
                            list(self.measures), self.finals)

    def compact(self, spark: SparkSession) -> None:
        """Fold every delta into a single state set.  The merged result
        is itself a valid state table (sums of sums), so compaction and
        incremental appends compose indefinitely."""
        merged = self._states(spark).groupBy(*self.keys).agg(
            *[F.sum(f"{m}__sum").alias(f"{m}__sum")
              for m in self.measures],
            *[F.sum(f"{m}__cnt").alias(f"{m}__cnt")
              for m in self.measures])
        tmp = f"{self.path}__compact_{uuid.uuid4().hex[:8]}"
        merged.write.parquet(tmp)
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        os.replace(self.path, old)
        os.replace(tmp, self.path)
        import shutil
        shutil.rmtree(old, ignore_errors=True)

    def n_delta_files(self) -> int:
        return len([f for f in os.listdir(self.path)
                    if f.endswith(".parquet")])
