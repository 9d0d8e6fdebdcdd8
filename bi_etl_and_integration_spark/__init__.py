"""PySpark-native analytics/ETL engine with the capabilities of the
reference knowledge base ``AV-ghub/BI-ETL-and-integration``.

The reference documents SSIS data-flow components, ClickHouse datamart
SQL idioms, PostgreSQL->ClickHouse migration, and CDC pipelines.  This
package re-expresses every one of those capabilities as a thin,
composable operator layer over PySpark DataFrames — declarative plans
that Catalyst/Tungsten optimize and execute (no custom engine).

Layout (see SURVEY.md §7):
  session     SparkSession factory tuned for the engine
  schema      PG/ClickHouse/SSIS type-name -> Spark type registry
  sources     readers/writers (parquet/csv/json/orc/jdbc, error-tolerant load)
  operators   relational / aggregate / window / array / cleanse / fuzzy /
              dimensional / cdc / dedup / similarity / text / multimodal
  functions   scalar expression surface (SSIS expression language parity)
  streaming   structured-streaming wrappers (windows, watermark, CDC apply)
  plans       plan inspection & assertions (pushdown / broadcast checks)
  pipeline    stage runner (control-flow analog: retries, metrics, resume)
"""

from bi_etl_and_integration_spark.session import get_session, stop_session

__all__ = ["get_session", "stop_session"]
__version__ = "0.1.0"
