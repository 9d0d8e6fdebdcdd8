"""Custom Python data source (SURVEY.md §2.11: Script Component as a
Source, PRO/Глава 09:72; custom PipelineComponent sources,
PRO/Глава 18:33).  Built on PySpark 4's Python DataSource API — the
modern registration surface for 'roll your own reader'.

``SyntheticEventsDataSource`` generates a deterministic event stream
split into N partitions that read INDEPENDENTLY on executors — the
partition-parallel contract every custom source must honor at scale
(one reader per split, no driver funnel).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_SCHEMA_DDL = "event_id bigint, user_id bigint, value double"


class _Partition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "4"))
        self.n_users = int(options.get("users", "100"))

    def partitions(self):
        step = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [_Partition(s, e) for s, e in zip(bounds, bounds[1:])]

    def read(self, partition: _Partition):
        # runs on the executor owning this split; deterministic in
        # event_id so restarts re-produce identical rows
        for i in range(partition.start, partition.end):
            yield (i, i % self.n_users, float((i * 7919) % 1000) / 10.0)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str | StructType:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _Reader(self.options)


def register_custom_sources(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
