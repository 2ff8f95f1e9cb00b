"""JDBC federated scan (SURVEY.md §2 rows 1, 22) against embedded Derby.

The reference's ``ENGINE=PostgreSQL`` external tables are a live JDBC
federation (``v2/sql/create_external_tables.sql:14-24``); the v1 DAG adds
shard-parallel extraction with disjoint ``id%2`` predicates
(``v1/dag.py:114-126``). No Postgres exists in the sandbox, but Spark
ships Apache Derby (for the Hive metastore), so the same ``read_jdbc``
code path is exercised end-to-end against a real JDBC database —
embedded, in-memory, same JVM. On a cluster the URL changes; the plan
(JDBCRelation scan, predicate partitions, remote filter pushdown) does
not.

Derby folds unquoted identifiers to upper case while Spark's JDBC writer
creates quoted lower-case columns, so shard predicates quote ``"id"``.
"""

import pytest
from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.sources.readers import read_jdbc

URL = "jdbc:derby:memory:jdbc_test;create=true"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def jdbc_table(spark):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    (
        df.write.format("jdbc")
        .option("url", URL)
        .option("dbtable", "t_events")
        .option("driver", PROPS["driver"])
        .mode("overwrite")
        .save()
    )
    return "t_events"


def test_jdbc_roundtrip(spark, jdbc_table):
    back = read_jdbc(spark, URL, jdbc_table, properties=PROPS)
    assert back.count() == 100
    assert set(back.columns) == {"id", "v"}
    assert back.agg(F.sum("v")).first()[0] == sum(2 * i for i in range(100))


def test_jdbc_shard_parallel_extract(spark, jdbc_table):
    """v1's two disjoint id%2 shard scans = one predicates=[...] read:
    one JDBC partition per predicate, union == full table, no overlap."""
    sharded = read_jdbc(
        spark,
        URL,
        jdbc_table,
        properties=PROPS,
        predicates=['MOD("id",2)=0', 'MOD("id",2)<>0'],
    )
    assert sharded.rdd.getNumPartitions() == 2
    assert sharded.count() == 100
    assert sharded.select("id").distinct().count() == 100


def test_jdbc_filter_pushdown(spark, jdbc_table):
    """Catalyst pushes the filter into the remote WHERE clause — the
    JDBC scan node carries the predicate, not a post-scan Filter."""
    filt = read_jdbc(spark, URL, jdbc_table, properties=PROPS).filter(
        F.col("id") < 10
    )
    assert filt.count() == 10
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan" in plan
