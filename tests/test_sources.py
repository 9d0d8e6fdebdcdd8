"""Unit tests: sources / sinks (SURVEY.md §2.1, §2.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bi_etl_and_integration_spark.sources import readers, writers


def test_csv_roundtrip_custom_sep_and_null(spark, rows, tmp_path):
    """The PG COPY export convention: sep '^', NULL sentinel
    (SCRIPTS/Перелив данных...md:76-90)."""
    df = rows([(1, "a^b", None), (2, None, 3.5)],
              "id int, s string, v double")
    path = str(tmp_path / "csv")
    writers.write_csv(df, path, sep="^", null_value="NULL")
    back = readers.read_csv(spark, path, schema=df.schema, sep="^",
                            null_value="NULL")
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, df.collect()))


def test_read_csv_tolerant_quarantines_bad_rows(spark, tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text("id,v\n1,10\n2,notanint\n3,30\n")
    good, bad = readers.read_csv_tolerant(
        spark, str(p), "id int, v int", max_errors=10, max_error_ratio=0.9)
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    assert bad.count() == 1
    assert "notanint" in bad.collect()[0]["raw_record"]


def test_read_csv_tolerant_aborts_over_threshold(spark, tmp_path):
    p = tmp_path / "verydirty.csv"
    rows_txt = "\n".join(f"{i},bad" for i in range(10))
    p.write_text("id,v\n" + rows_txt + "\n")
    with pytest.raises(ValueError, match="aborted"):
        readers.read_csv_tolerant(spark, str(p), "id int, v int",
                                  max_errors=2, max_error_ratio=0.1)


def test_staged_roundtrip_preserves_data(spark, rows, tmp_path):
    df = rows([(2, "b"), (1, "a")], "id int, s string")
    back = writers.staged_roundtrip(spark, df, str(tmp_path / "stage"),
                                    sort_by=["id"])
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]


def test_write_parquet_partitioned(spark, rows, tmp_path):
    df = rows([(1, "x"), (2, "y"), (3, "x")], "id int, part string")
    path = str(tmp_path / "pq")
    writers.write_parquet(df, path, partition_by=["part"])
    back = spark.read.parquet(path)
    # partition pruning works: filter reads only one directory
    assert back.where(F.col("part") == "x").count() == 2
    assert (tmp_path / "pq" / "part=x").exists()


def test_read_parquet_merge_schema_evolution(spark, rows, tmp_path):
    """Schema evolution across files: a column added later reads as
    null for older files under merge_schema."""
    p = str(tmp_path / "evolving")
    rows([(1, "a")], "id int, v string").write.parquet(p)
    rows([(2, "b", 9.5)], "id int, v string, score double") \
        .write.mode("append").parquet(p)
    merged = readers.read_parquet(spark, p, merge_schema=True)
    assert set(merged.columns) == {"id", "v", "score"}
    got = {r["id"]: r["score"] for r in merged.collect()}
    assert got == {1: None, 2: 9.5}


def test_catalog_loads_fixture_tables(spark):
    cat = readers.Catalog(spark, "/root/testdata/sf0.001",
                          register_views=False)
    assert cat.customer.count() > 0
    assert "l_orderkey" in cat.lineitem.columns
    # events.ts normalized from parquet nanos to timestamp_ntz
    ts_type = dict(cat.events.dtypes)["ts"]
    assert "timestamp" in ts_type
    with pytest.raises(AttributeError):
        cat.not_a_table  # noqa: B018


def test_read_jdbc_param_binding_validation(spark):
    with pytest.raises(ValueError):
        readers.read_jdbc(spark, "jdbc:x", query="q", dbtable="t")
    with pytest.raises(ValueError):
        readers.read_jdbc(spark, "jdbc:x")


def test_orc_roundtrip(rows, tmp_path):
    df = rows([(1, "a", 1.5), (2, "b", 2.5)], "id int, v string, x double")
    p = str(tmp_path / "orc_stage")
    df.write.mode("overwrite").orc(p)
    back = readers.read_orc(df.sparkSession, p)
    assert back.schema == df.schema
    assert sorted(tuple(r) for r in back.collect()) == \
        sorted(tuple(r) for r in df.collect())


def test_jdbc_roundtrip_embedded_derby(spark, rows, tmp_path):
    """Executed JDBC round-trip against the Derby embedded database
    that ships on Spark's own classpath (no network, same JVM):
    write_jdbc batch insert -> read_jdbc dbtable / parameterized query
    / partitioned parallel read all agree with the source frame.
    Upgrades the reference's primary OLE DB source/Fast Load pair
    (PRO/Глава 05:30-37, APRESS/004.md:5-23) from argument-validation
    to an end-to-end test."""
    from bi_etl_and_integration_spark.sources.writers import write_jdbc
    url = f"jdbc:derby:{tmp_path}/testdb;create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    src = rows([(i, f"name{i}", float(i) * 1.5) for i in range(100)],
               "id int, name string, score double")
    write_jdbc(src, url, "people", driver=drv)

    back = readers.read_jdbc(spark, url, dbtable="people", driver=drv)
    assert sorted(tuple(r) for r in back.collect()) == \
        sorted(tuple(r) for r in src.collect())

    # Spark's JDBC writer creates quoted (case-exact) columns; Derby
    # folds unquoted identifiers to uppercase, so queries quote them
    q = readers.read_jdbc(
        spark, url,
        query='SELECT "id", "name" FROM people WHERE "id" < :hi',
        params={"hi": 10}, driver=drv)
    assert q.count() == 10 and set(q.columns) == {"id", "name"}

    par = readers.read_jdbc(spark, url, dbtable="people", driver=drv,
                            partition_column="id", num_partitions=4,
                            lower_bound=0, upper_bound=100)
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == 100

    # append mode accumulates (Fast Load batches are commit units)
    write_jdbc(src.limit(5), url, "people", driver=drv, mode="append")
    assert readers.read_jdbc(spark, url, dbtable="people",
                             driver=drv).count() == 105


def test_zorder_write_clusters_row_groups(spark, tmp_path):
    """Mechanical data-skipping assertion: after a Z-order write, a box
    predicate on EITHER dimension must be answerable from a small
    fraction of row groups (footer min/max), while the same data sorted
    by only x leaves y unclustered."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from bi_etl_and_integration_spark.sources.writers import (
        write_parquet, write_parquet_zordered)

    n = 200_000
    # x and y independent -> a plain x-sort cannot cluster y
    wide = (spark.range(n)
            .withColumn("x", (F.hash("id") % 1000 + 1000) % 1000)
            .withColumn("y", (F.hash("id", F.lit(7)) % 1000 + 1000) % 1000)
            .withColumn("__pad", F.lit("x" * 32)))  # widen -> more groups

    zpath = str(tmp_path / "zord")
    xpath = str(tmp_path / "xsort")
    # tiny row groups so footer stats have granularity to skip with
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(64 * 1024))
    try:
        write_parquet_zordered(wide, zpath, zorder_by=["x", "y"], bits=8)
        write_parquet(wide.repartition(1), xpath, sort_by=["x"])
    finally:
        if old is not None:
            hconf.set("parquet.block.size", old)
        else:
            hconf.unset("parquet.block.size")

    def matching_fraction(path, col, lo, hi):
        total = match = 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            ix = md.schema.names.index(col)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ix).statistics
                total += 1
                if st is None or (st.min <= hi and st.max >= lo):
                    match += 1
        assert total >= 8, f"need several row groups, got {total}"
        return match / total

    box = (450, 550)  # ~10% selectivity per dimension
    zx = matching_fraction(zpath, "x", *box)
    zy = matching_fraction(zpath, "y", *box)
    sy = matching_fraction(xpath, "y", *box)
    # z-order serves BOTH dimensions; x-sort leaves y unclustered
    assert zx < 0.7 and zy < 0.7, (zx, zy)
    assert sy > 0.9, sy
    # and the z write loses no rows
    assert spark.read.parquet(zpath).count() == n


def test_zorder_rejects_non_numeric(spark, rows):
    import pytest as _pytest

    from bi_etl_and_integration_spark.sources.writers import zorder_column
    df = rows([(1, "a")], "x int, s string")
    with _pytest.raises(ValueError, match="must be numeric"):
        zorder_column(df, ["s"])
