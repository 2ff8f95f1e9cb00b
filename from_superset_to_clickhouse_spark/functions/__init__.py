"""Scalar-function surface of the engine.

Everything the reference's SQL uses (SURVEY.md §2.6) expressed as
PySpark built-ins — these run JVM-side inside whole-stage codegen; no
Python UDFs.
"""

from from_superset_to_clickhouse_spark.functions.scalar import (
    month_floor,
    months_ago,
    mod_shard,
    with_defaults,
    json_get,
)

__all__ = ["month_floor", "months_ago", "mod_shard", "with_defaults", "json_get"]
