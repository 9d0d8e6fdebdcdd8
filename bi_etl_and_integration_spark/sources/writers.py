"""Sinks (SURVEY.md §2.2).

Reference parity:
  - OLE DB Destination Fast Load batch sizing (APRESS/004.md:15-23)
    -> jdbc ``batchsize`` option / parallel per-partition parquet write
  - Flat/Raw File destinations (PRO/Глава 05:47-49) -> csv / parquet
  - PG ``COPY ... TO`` custom-delimiter CSV export
    (SCRIPTS/Перелив...md:76-90) -> ``write_csv`` (Spark escapes natively)
  - Staging-table pattern (PRO/Глава 08:86-89) -> ``staged_roundtrip``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(df: DataFrame, path: str, *, mode: str = "overwrite",
                  partition_by: list[str] | None = None,
                  sort_by: list[str] | None = None) -> None:
    """Raw-File-style staging write.  ``partition_by`` gives partition
    pruning on re-read; ``sort_by`` gives within-file clustering (the
    MergeTree ORDER-BY analog) for min/max skipping at scale."""
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, *, sep: str = ",",
              header: bool = True, null_value: str = "",
              mode: str = "overwrite") -> None:
    (df.write.mode(mode).option("sep", sep).option("header", header)
     .option("nullValue", null_value).option("emptyValue", "")
     .csv(path))


def write_jdbc(df: DataFrame, url: str, table: str, *,
               batchsize: int = 50_000, mode: str = "append",
               **options) -> None:
    """Fast Load: 50k–100k row commit batches per APRESS/004.md:23."""
    w = (df.write.format("jdbc").option("url", url)
         .option("dbtable", table).option("batchsize", str(batchsize)))
    for k, v in options.items():
        w = w.option(k, v)
    w.mode(mode).save()


def write_bucketed(df: DataFrame, table: str, *, buckets: int,
                   by: list[str], sort_by: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed managed table (hash-partitioned files + catalog metadata).

    The 100-TB co-location tool: two tables bucketed by the same keys
    into the same bucket count join WITHOUT an Exchange — the shuffle is
    paid once at write time instead of per query (the MergeTree
    ORDER-BY/sharding analog; SURVEY.md §4 'bucketing for co-located
    joins').  ``sort_by`` additionally pre-sorts within buckets so a
    SortMergeJoin skips its sort."""
    w = df.write.mode(mode).bucketBy(buckets, *by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def analyze_table(spark: SparkSession, table: str,
                  columns: list[str] | None = None) -> None:
    """``ANALYZE TABLE … COMPUTE STATISTICS [FOR COLUMNS …]`` — feeds
    the cost-based optimizer.  Table-level stats (sizeInBytes/rowCount)
    drive broadcast-vs-shuffle decisions without AQE having to observe
    the exchange first; column stats (NDV, min/max, null count) drive
    CBO join reordering on multi-join marts.  Pair with
    :func:`write_bucketed`: bucketed managed tables are exactly the
    tables that live long enough to be worth statistics (the
    ClickHouse-MergeTree-analog publish path)."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS "
                  f"FOR COLUMNS {', '.join(columns)}")


def staged_roundtrip(spark: SparkSession, df: DataFrame, path: str,
                     **write_kwargs) -> DataFrame:
    """Stage to parquet, read back (Raw File inter-phase staging,
    PRO/Глава 14:85-88).  The read-back DataFrame cuts lineage, so a
    long pipeline restarts from the stage instead of recomputing."""
    write_parquet(df, path, **write_kwargs)
    return spark.read.parquet(path)
