"""PySpark-native analytics/ELT engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (``xxxRichiexxx/from_superset_to_clickhouse`` — an
Airflow→Postgres→ClickHouse incremental ELT), re-expressed Spark-first:

- relational tables as partitioned Parquet + ``StructType`` schemas with
  per-field defaults (ClickHouse ``DEFAULT`` semantics),
- watermark-based incremental ingest (the reference's daily loads),
- last-write-wins dedup stores (``ReplacedMergeTree`` semantics),
- atomic partition publication (``ALTER TABLE … REPLACE PARTITION``),
- TTL-cached broadcast dictionaries (ClickHouse ``CREATE DICTIONARY``),
- plus large-scale training-data-pipeline operators: dedup (exact /
  MinHash-LSH / SimHash), similarity search, text analysis, multimodal
  column plumbing.

Everything is built on the public PySpark DataFrame/SQL API and designed
for multi-executor scale (broadcast joins for dims, partition pruning,
no Python row UDFs on hot paths).
"""

from from_superset_to_clickhouse_spark.session import get_spark
from from_superset_to_clickhouse_spark.schema import Schema, Field
from from_superset_to_clickhouse_spark.tablestore import TableStore

__all__ = ["get_spark", "Schema", "Field", "TableStore"]

__version__ = "0.1.0"
