"""Row-fetch / interchange facade — the ClickHouseHook surface on Spark.

Thin, explicit analogs of the reference hook's client APIs
(``v2/plugins/hooks/clickhouse_hook.py``), so a user of the reference
can find every call they use today:

- ``get_records(sql)``    → hook.py:48-51  (list of row tuples)
- ``get_first(sql)``      → hook.py:53-59  (server-side iterator → we
  push a LIMIT 1 so only one row is ever materialized)
- ``get_pandas_df(sql)``  → hook.py:61-65
- ``import_pandas_df``    → hook.py:67-69
- ``run(sql | [sql])``    → hook.py:114-132 (sequential, returns last)

Driver-side materialization is the POINT of these APIs (they exist to
hand small results to Python), so they are the sanctioned ``collect``
surface; anything data-sized should stay in DataFrames.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def get_records(spark: SparkSession, sql: str) -> list[tuple]:
    """All result rows as Python tuples (reference hook.py:48-51)."""
    return [tuple(r) for r in spark.sql(sql).collect()]


def get_first(spark: SparkSession, sql: str) -> tuple | None:
    """First row or None. The reference streams via ``execute_iter``
    (hook.py:53-59); the Spark analog is a LIMIT-1 pushdown — Catalyst
    plans a CollectLimit, so executors stop after one row."""
    rows = spark.sql(sql).limit(1).collect()
    return tuple(rows[0]) if rows else None


def get_pandas_df(spark: SparkSession, sql: str) -> pd.DataFrame:
    """Arrow-accelerated toPandas (reference hook.py:61-65)."""
    return spark.sql(sql).toPandas()


def import_pandas_df(
    spark: SparkSession, pdf: pd.DataFrame, view: str | None = None
) -> DataFrame:
    """pandas → DataFrame (reference hook.py:67-69); optionally register
    as a temp view so follow-up SQL can reference it."""
    df = spark.createDataFrame(pdf)
    if view:
        df.createOrReplaceTempView(view)
    return df


def run(spark: SparkSession, sql: str | Iterable[str]) -> DataFrame:
    """Execute one statement or a sequence, return the LAST result
    (reference hook.py:114-132 runs statements on one connection and
    returns the last)."""
    stmts = [sql] if isinstance(sql, str) else list(sql)
    if not stmts:
        raise ValueError("run() needs at least one statement")
    out = None
    for s in stmts:
        out = spark.sql(s)
    return out


def capped(df: DataFrame, n: int = 1000) -> DataFrame:
    """The v1 per-batch LIMIT cap (``v1/sql/upload_to_processed_table.sql:15``).

    Faithfully UNORDERED — a nondeterministic n-row subset, exactly the
    reference quirk (SURVEY §2.5 row 23: silently truncates backfills).
    Provided for parity; incremental loads should rely on watermarks,
    not caps.
    """
    return df.limit(n)
