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


def test_jdbc_write_roundtrip(spark):
    """write_jdbc (the reference's INSERT-SELECT into the external store,
    hook.py:114-132) → read_jdbc: same rows, append accumulates."""
    from from_superset_to_clickhouse_spark.sources.readers import write_jdbc

    url = "jdbc:derby:memory:jdbc_write_test;create=true"
    df = spark.range(0, 50).select(F.col("id"), (F.col("id") * 3).alias("v"))
    write_jdbc(df, url, "t_sink", mode="overwrite", properties=PROPS)
    back = read_jdbc(spark, url, "t_sink", properties=PROPS)
    assert back.count() == 50
    assert back.agg(F.sum("v")).first()[0] == sum(3 * i for i in range(50))

    write_jdbc(df.filter(F.col("id") < 10), url, "t_sink", properties=PROPS)
    assert read_jdbc(spark, url, "t_sink", properties=PROPS).count() == 60


def test_jdbc_write_bounds_connection_count(spark):
    """num_partitions coalesces before the write: a wide DataFrame must
    not open one remote connection per shuffle partition."""
    from from_superset_to_clickhouse_spark.sources.readers import write_jdbc

    url = "jdbc:derby:memory:jdbc_conn_test;create=true"
    wide = spark.range(0, 100).repartition(16)
    write_jdbc(wide, url, "t_narrow", mode="overwrite", properties=PROPS,
               num_partitions=2)
    assert read_jdbc(spark, url, "t_narrow", properties=PROPS).count() == 100


def test_v2_external_publish_incremental(spark, tmp_path):
    """v2_daily_load with a JDBC sink mirrors the fact table's deduped
    view into Derby incrementally: run 1 bootstraps (creates the remote
    table), run 2 ships only the delta, a no-delta rerun SKIPs —
    the reference's daily INSERT-SELECT semantics, duplicate-free."""
    from conftest import logs_schema, ts
    from from_superset_to_clickhouse_spark.plans.reference_pipelines import (
        v2_daily_load,
    )
    from from_superset_to_clickhouse_spark.tablestore import TableStore

    url = "jdbc:derby:memory:jdbc_publish_test;create=true"
    rows = [(i, ts(1 + i % 3, 1 + i % 27, i % 24), f"v{i}") for i in range(40)]
    src = spark.createDataFrame(rows, "id int, dttm timestamp, v string")
    early = src.filter(F.col("dttm") <= ts(2, 15))

    store = TableStore(spark, str(tmp_path))
    sch = logs_schema("logs")
    sink = dict(sink_url=url, sink_table="ext_logs", sink_properties=PROPS)

    r1 = v2_daily_load(store, early, sch, "dttm", **sink)
    assert r1["external_publish"] == "published"
    remote1 = read_jdbc(spark, url, "ext_logs", properties=PROPS)
    n1 = remote1.count()
    assert n1 == store.latest_view("logs").count()

    r2 = v2_daily_load(store, src, sch, "dttm", **sink)
    assert r2["external_publish"] == "published"
    remote2 = read_jdbc(spark, url, "ext_logs", properties=PROPS)
    assert remote2.count() == store.latest_view("logs").count() > n1
    # duplicate-free: the remote table has one row per id
    assert remote2.select("id").distinct().count() == remote2.count()

    r3 = v2_daily_load(store, src, sch, "dttm", **sink)
    assert r3["external_publish"] == "SKIPPED"


def test_v2_external_publish_explicit_first_run(spark, tmp_path):
    """sink_first_run=True publishes without probing the remote at all —
    the explicit operator-declared bootstrap that replaces error-message
    sniffing for drivers whose missing-table error isn't recognized."""
    from conftest import logs_schema, ts
    from from_superset_to_clickhouse_spark.plans.reference_pipelines import (
        v2_daily_load,
    )
    from from_superset_to_clickhouse_spark.tablestore import TableStore

    url = "jdbc:derby:memory:jdbc_firstrun_test;create=true"
    rows = [(i, ts(1, 1 + i % 27), f"v{i}") for i in range(10)]
    src = spark.createDataFrame(rows, "id int, dttm timestamp, v string")
    store = TableStore(spark, str(tmp_path))
    sch = logs_schema("logs")

    r = v2_daily_load(
        store, src, sch, "dttm",
        sink_url=url, sink_table="ext_logs_fr", sink_properties=PROPS,
        sink_first_run=True,
    )
    assert r["external_publish"] == "published"
    remote = read_jdbc(spark, url, "ext_logs_fr", properties=PROPS)
    assert remote.count() == store.latest_view("logs").count() > 0


def test_dictionary_backed_by_jdbc(spark, jdbc_table):
    """The reference's dictionaries are live lookups into an external
    database (PostgreSQL dictionary sources); here the registry's
    loader IS a JDBC read — TTL caching + broadcast enrich over a
    federated table."""
    from from_superset_to_clickhouse_spark.dictionary import DictionaryRegistry

    reg = DictionaryRegistry()
    reg.register(
        "ext_dim",
        loader=lambda: read_jdbc(spark, URL, jdbc_table, properties=PROPS),
        key="id",
    )
    fact = spark.range(0, 10).select(F.col("id").alias("k"), F.col("id").alias("fk"))
    out = reg.enrich(fact, "ext_dim", fk="fk")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {i: 2 * i for i in range(10)}
