from bi_etl_and_integration_spark.sources.excel import (
    read_excel,
    write_excel,
)
from bi_etl_and_integration_spark.sources.snapshots import (
    SnapshotTable,
    snapshot_read,
    snapshot_write,
)
from bi_etl_and_integration_spark.sources.readers import (
    Catalog,
    read_csv,
    read_csv_tolerant,
    read_json,
    read_jdbc,
    read_orc,
    read_parquet,
)
from bi_etl_and_integration_spark.sources.writers import (
    write_csv,
    write_parquet,
    staged_roundtrip,
)

__all__ = [
    "Catalog",
    "read_parquet",
    "read_csv",
    "read_csv_tolerant",
    "read_json",
    "read_orc",
    "read_jdbc",
    "read_excel",
    "write_excel",
    "SnapshotTable",
    "snapshot_read",
    "snapshot_write",
    "write_csv",
    "write_parquet",
    "staged_roundtrip",
]
