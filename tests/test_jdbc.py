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


# -- ClickHouse dialect adapter (VERDICT r6 item 3) ---------------------
# Pure dialect logic (types, quoting, DDL) needs no server; the
# Replacing publisher is exercised end-to-end against Derby with the
# CH-specific createTableOptions suppressed.

from pyspark.sql import types as T

from from_superset_to_clickhouse_spark.schema import Field, Schema
from from_superset_to_clickhouse_spark.sources import clickhouse as ch


def test_ch_type_mapping_spark_to_ch():
    assert ch.spark_to_ch_type(T.IntegerType()) == "Int32"
    assert ch.spark_to_ch_type(T.LongType(), nullable=True) == "Nullable(Int64)"
    assert ch.spark_to_ch_type(T.TimestampType()) == "DateTime64(6)"
    assert ch.spark_to_ch_type(T.StringType(), nullable=True) == "Nullable(String)"
    assert ch.spark_to_ch_type(T.BooleanType()) == "Bool"
    assert ch.spark_to_ch_type(T.DecimalType(20, 4)) == "Decimal(20, 4)"
    # Arrays are never Nullable-wrapped (ClickHouse forbids it); inner
    # nullability still propagates
    assert (
        ch.spark_to_ch_type(T.ArrayType(T.FloatType(), False), nullable=True)
        == "Array(Float32)"
    )
    assert (
        ch.spark_to_ch_type(T.ArrayType(T.StringType(), True))
        == "Array(Nullable(String))"
    )


def test_ch_type_mapping_ch_to_spark():
    # the reference's external-table DDL types, verbatim
    # (v2/sql/create_external_tables.sql:5-12)
    assert ch.ch_to_spark_type("INT") == (T.IntegerType(), False)
    assert ch.ch_to_spark_type("Nullable(VARCHAR)") == (T.StringType(), True)
    assert ch.ch_to_spark_type("Nullable(text)".replace("text", "TEXT")) == (
        T.StringType(),
        True,
    )
    assert ch.ch_to_spark_type("Nullable(DATETIME)") == (T.TimestampType(), True)
    # production-grade wrappers
    assert ch.ch_to_spark_type("DateTime64(6)") == (T.TimestampType(), False)
    assert ch.ch_to_spark_type("DateTime64(3, 'UTC')") == (T.TimestampType(), False)
    assert ch.ch_to_spark_type("UUID") == (T.StringType(), False)
    assert ch.ch_to_spark_type("LowCardinality(Nullable(String))") == (
        T.StringType(),
        True,
    )
    assert ch.ch_to_spark_type("Decimal(38, 10)") == (T.DecimalType(38, 10), False)
    assert ch.ch_to_spark_type("FixedString(16)") == (T.StringType(), False)
    assert ch.ch_to_spark_type("Enum8('a' = 1, 'b' = 2)") == (T.StringType(), False)
    assert ch.ch_to_spark_type("UInt64") == (T.DecimalType(20, 0), False)
    assert ch.ch_to_spark_type("Array(Nullable(Int32))") == (
        T.ArrayType(T.IntegerType(), True),
        False,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported"):
        ch.ch_to_spark_type("AggregateFunction(uniq, UInt64)")


def test_ch_struct_from_describe():
    st = ch.struct_type_from_ch(
        [("id", "INT"), ("action", "Nullable(VARCHAR)"), ("dttm", "DateTime64(6)")]
    )
    assert st == T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("action", T.StringType(), True),
            T.StructField("dttm", T.TimestampType(), False),
        ]
    )


def test_ch_quoting():
    assert ch.quote_ident("action") == "`action`"
    assert ch.quote_ident("we`ird") == "`we\\`ird`"


def _logs_schema():
    # mirror of the reference logs table (v2/sql/create_tables.sql:2-17)
    return Schema(
        name="f_superset_logs",
        fields=(
            Field("id", "int", nullable=False),
            Field("action", "string", default="undefined"),
            Field("user_id", "int", default=-1),
            Field("json", "string", default="undefined"),
            Field("dttm", "timestamp", nullable=False),
            Field("source", "string", nullable=False),
        ),
        dedup_key=("user_id",),
        version_col=None,
        partition_by=("dttm_month",),
        shard_by="id",
    )


def test_ch_create_table_ddl_mirrors_reference():
    ddl = ch.create_table_ddl(_logs_schema(), database="bi", cluster="main", replicated=True)
    assert "CREATE TABLE IF NOT EXISTS `bi`.`f_superset_logs` ON CLUSTER 'main'" in ddl
    assert "`action` String DEFAULT 'undefined'" in ddl
    assert "`user_id` Int32 DEFAULT -1" in ddl
    assert "`dttm` DateTime64(6)" in ddl and "Nullable(DateTime64(6))" not in ddl
    assert "ENGINE = ReplicatedReplacingMergeTree" in ddl
    assert "PARTITION BY date_trunc('month', `dttm`)" in ddl
    assert "ORDER BY (`user_id`)" in ddl

    dist = ch.distributed_table_ddl(_logs_schema(), cluster="main", database="bi")
    assert "AS `bi`.`f_superset_logs`" in dist
    assert "ENGINE = Distributed('main', 'bi', 'f_superset_logs', `id`)" in dist


def test_ch_jdbc_options_and_create_table_options():
    url, props = ch.jdbc_options("ch1.internal", "bi", user="ingest", password="s3cret")
    assert url == "jdbc:clickhouse:http://ch1.internal:8123/bi"
    assert props["driver"] == ch.JDBC_DRIVER
    assert props["user"] == "ingest" and props["password"] == "s3cret"
    opts = ch.create_table_options(_logs_schema())
    assert opts.startswith("ENGINE = ReplacingMergeTree")
    assert "PARTITION BY date_trunc('month', `dttm`)" in opts
    assert opts.endswith("ORDER BY (`user_id`)")
    # version column becomes the ReplacingMergeTree version argument
    s2 = Schema(
        "t",
        (Field("id", "int", nullable=False), Field("v", "timestamp")),
        dedup_key=("id",),
        version_col="v",
    )
    assert "ReplacingMergeTree(`v`)" in ch.create_table_options(s2)


def test_ch_publish_replacing_dedups_before_insert(spark):
    """End-to-end against Derby: a batch with duplicate keys collapses
    to the latest row per key (version desc) before the INSERT, and
    NULLs land as schema defaults — the remote is latest-correct
    without any merge-time collapse."""
    import datetime as dt

    schema = Schema(
        "pub_logs",
        (
            Field("id", "int", nullable=False),
            Field("v", "timestamp", nullable=False),
            Field("note", "string", default="undefined"),
        ),
        dedup_key=("id",),
        version_col="v",
    )
    rows = [
        (1, dt.datetime(2024, 1, 1), "old"),
        (1, dt.datetime(2024, 3, 1), None),  # latest for id=1, NULL note
        (2, dt.datetime(2024, 2, 1), "only"),
    ]
    df = spark.createDataFrame(rows, "id int, v timestamp, note string")
    url = "jdbc:derby:memory:ch_pub_test;create=true"
    # Derby can't parse the ClickHouse engine clause — override the
    # default createTableOptions for the harness
    ch.publish_replacing(
        df, schema, url,
        properties={**PROPS, "createTableOptions": ""},
        num_partitions=2,
    )
    back = read_jdbc(spark, url, "pub_logs", properties=PROPS)
    got = {r["id"]: (r["v"], r["note"]) for r in back.collect()}
    assert got == {
        1: (dt.datetime(2024, 3, 1), "undefined"),
        2: (dt.datetime(2024, 2, 1), "only"),
    }


def test_ch_composite_partition_key_single_clause():
    """ADVICE r7: a schema with two partition columns must emit ONE
    `PARTITION BY (a, b)` clause — ClickHouse rejects a second
    PARTITION BY outright."""
    s = Schema(
        "t2",
        (Field("d", "date", nullable=False), Field("k", "int", nullable=False)),
        partition_by=("d", "k"),
        sort_by=("k",),
    )
    ddl = ch.create_table_ddl(s)
    assert ddl.count("PARTITION BY") == 1
    assert "PARTITION BY (`d`, `k`)" in ddl
    opts = ch.create_table_options(s)
    assert opts.count("PARTITION BY") == 1
    assert "PARTITION BY (`d`, `k`)" in opts
