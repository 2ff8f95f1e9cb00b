"""Pluggable sources/sinks (SURVEY.md §2.1 rows 1, 7-9)."""

from from_superset_to_clickhouse_spark.sources.readers import (
    read_parquet,
    read_csv,
    read_jdbc,
    read_json,
    from_pandas,
    to_pandas,
)

__all__ = [
    "read_parquet",
    "read_csv",
    "read_jdbc",
    "read_json",
    "from_pandas",
    "to_pandas",
]
