"""Source readers / sinks.

Reference surface being re-expressed (SURVEY.md §2.1):
- ``ENGINE=PostgreSQL(...)`` federated scan → ``spark.read.jdbc`` with
  filter pushdown and optional disjoint ``predicates`` for parallel
  extract (the v1 ``id%2`` two-shard split, ``v1/dag.py:116-125``)
- ``import_csv`` (clickhouse-client, ``;`` delimiter, ``NULL`` literal,
  header) → ``spark.read.csv`` with the same dialect (``hook.py:92-112``)
- pandas export/import (``hook.py:61-69``) → Arrow-backed
  ``toPandas`` / ``createDataFrame``
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    sep: str = ";",
    null_value: str = "NULL",
    header: bool = True,
) -> DataFrame:
    """CSV ingest with the reference's clickhouse-client dialect
    (``--format_csv_delimiter=";"``, NULL literal, CSVWithNames —
    ``hook.py:98-102``)."""
    reader = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("nullValue", null_value)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """ORC scan — the columnar interchange format next to Parquet.
    Same pushdown/pruning properties (Catalyst plans PushedFilters and
    ReadSchema against ORC's stripe/row-group statistics); an explicit
    schema skips footer-merge inference across many files."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC write — type-exact columnar round-trip (no text-dialect
    lossiness like CSV/JSON), for pipelines whose downstream readers
    (Hive/Trino/Presto installs) standardize on ORC over Parquet."""
    df.write.mode(mode).orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    predicates: Sequence[str] | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Federated JDBC scan — the ``ENGINE=PostgreSQL`` external table.

    ``predicates`` gives the v1-style disjoint-predicate parallel extract
    (each predicate becomes one partition/connection, like the reference's
    two ``id%2`` shard tasks); ``partition_column`` bounds give the generic
    range-partitioned extract. Filters on the result push down to the
    remote WHERE clause via Catalyst's JDBC pushdown. Credentials come
    from ``properties`` — never spliced into SQL text (the reference
    splices passwords into DDL at ``v2/dag.py:92``; deliberately not
    reproduced).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if predicates:
        # Spark's public API for predicate-split reads is DataFrameReader.jdbc
        return spark.read.jdbc(
            url, table, predicates=list(predicates), properties=properties or {}
        )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """JDBC sink — the reference's INSERT-SELECT *into* the external
    store (``v2/sql/f_superset_logs_upload_data.sql:1-14``, executed by
    ``hook.execute`` / bulk-loaded by ``import_csv``, hook.py:92-132).

    Each input partition opens one connection and inserts with JDBC
    batching (``batchsize`` rows per round-trip). ``num_partitions``
    REPARTITIONS before the write to bound the remote connection count —
    a 1000-executor job must not open 32,000 connections against one
    database; 8-32 writers is the usual ceiling an OLTP/OLAP endpoint
    sustains. A repartition (one extra shuffle of only the written
    rows) rather than ``coalesce``: coalesce propagates upstream past
    the previous shuffle boundary and would throttle the whole
    computation (e.g. the dedup window feeding the publish) to the
    writer count, not just the writers. ``mode="append"`` creates the
    remote table on first use (Spark's JDBC provider issues CREATE
    TABLE when it doesn't exist), so the sink is bootstrap-safe like
    the watermark probe.
    """
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def from_pandas(spark: SparkSession, pdf: pd.DataFrame, schema=None) -> DataFrame:
    """pandas import (Arrow path; reference ``import_pandas_df``, hook.py:67-69)."""
    return spark.createDataFrame(pdf, schema=schema)


def to_pandas(df: DataFrame) -> pd.DataFrame:
    """pandas export (Arrow path; reference ``get_pandas_df``, hook.py:61-65)."""
    return df.toPandas()


def read_json(
    spark: SparkSession, path: str, schema=None, multiline: bool = False
) -> DataFrame:
    """JSON Lines ingest (one object per line — the layout big corpora
    ship in). An explicit schema skips the inference pre-scan, which
    reads the whole dataset twice at 100 TB; pass one whenever the
    layout is known."""
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Plain-text corpus ingest: one row per line (``value`` string), or
    one row per FILE with ``whole_file=True`` — the two layouts raw text
    corpora arrive in before any structure is imposed. Splittable and
    parallel per-line; whole-file mode keeps each document intact at the
    cost of one task per file."""
    return spark.read.option("wholetext", whole_file).text(path)


def read_binary(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file ingest for multimodal payloads: each file becomes a
    row (path, modificationTime, length, content) via Spark's
    ``binaryFile`` source — the entry point for image/audio drop zones.
    ``glob`` filters by filename pattern at LISTING time (no bytes read
    for excluded files). Partition parallelism is per-file; pair with
    the header decoders in ``operators/multimodal.py``."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str,
) -> list[dict]:
    """Training-data delivery: write ``df`` as ``n_shards`` deterministic
    hash shards (``shard=K/`` parquet dirs) plus a verification manifest
    — the contract a downstream trainer checks before consuming.

    Shard = ``id % n_shards`` (row placement independent of partitioning
    and run order); the manifest records per shard the row count and an
    ORDER-INDEPENDENT content fingerprint (``bit_xor`` of an
    odd-multiplier id mix — XOR commutes, so any write order yields the
    same fingerprint, and it is replayable in plain SQL). One pass
    computes all shard statistics (partial-aggregated); the write runs
    ``partitionBy(shard)``, so each shard is one directory a loader can
    claim independently. Returns the manifest rows; also writes
    ``_manifest.json`` next to the shards (underscore-prefixed so parquet readers skip it)."""
    import json as _json

    from from_superset_to_clickhouse_spark.fsio import Fs, join as fjoin

    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    out = df.withColumn("shard", shard)
    out.write.mode("overwrite").partitionBy("shard").parquet(path)
    stats = (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(
                # pmod-first keeps the mix inside bigint under ANSI mode
                # for any id magnitude (max ~2.7e18 < 2^63-1)
                f"bit_xor((CAST({id_col} AS BIGINT) % 1000000007)"
                f" * 2654435761 + 40503)"
            ).alias("xor_fp"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = [
        {"shard": r["shard"], "n_rows": r["n_rows"], "xor_fp": r["xor_fp"]}
        for r in stats
    ]
    fs = Fs(df.sparkSession, path)
    fs.write_text(fjoin(path, "_manifest.json"), _json.dumps(manifest))
    return manifest


def verify_shards(spark: SparkSession, path: str, id_col: str) -> DataFrame:
    """Re-derive each shard's count/fingerprint FROM DISK and join
    against the manifest → (shard, n_rows, xor_fp, manifest_n,
    manifest_fp, ok) — the loader-side integrity check: a lost file,
    a duplicated task output, or a corrupted shard flips ``ok``."""
    import json as _json

    from from_superset_to_clickhouse_spark.fsio import Fs, join as fjoin

    fs = Fs(spark, path)
    manifest = _json.loads(fs.read_text(fjoin(path, "_manifest.json")))
    mdf = spark.createDataFrame(
        [(m["shard"], m["n_rows"], m["xor_fp"]) for m in manifest],
        "shard int, manifest_n bigint, manifest_fp bigint",
    )
    disk = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(
                # pmod-first keeps the mix inside bigint under ANSI mode
                # for any id magnitude (max ~2.7e18 < 2^63-1)
                f"bit_xor((CAST({id_col} AS BIGINT) % 1000000007)"
                f" * 2654435761 + 40503)"
            ).alias("xor_fp"),
        )
    )
    return (
        disk.join(mdf, "shard", "full")
        .select(
            "shard",
            "n_rows",
            "xor_fp",
            "manifest_n",
            "manifest_fp",
            (
                (F.col("n_rows") == F.col("manifest_n"))
                & (F.col("xor_fp") == F.col("manifest_fp"))
            )
            .cast("int")
            .alias("ok"),
        )
    )
