"""Physical-plan inspection helpers (SURVEY.md §4).

The reference's optimization doctrine is manual ("WHERE is your friend",
"SELECT * is bad", PRO/Глава 12:22-31); on Spark those rewrites are
Catalyst's job — so our job is to PROVE they happened.  These helpers
parse ``df.explain`` output so tests and pipelines can assert that a
plan has the shape it must have at 100 TB:

  - filters reached the parquet scan (``PushedFilters``)
  - only the projected columns are read (``ReadSchema``)
  - the dimension side broadcast (``BroadcastHashJoin``)
  - the number of shuffles (``Exchange``) matches the design budget
  - narrow ops stayed inside whole-stage codegen
"""

from bi_etl_and_integration_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    read_schemas,
    scan_columns,
    shuffle_count,
    simple_plan,
    wholestage_codegen_count,
)
