"""Structured Streaming tier: AvailableNow ingest == batch load,
windowed aggs == batch equivalent, streaming dedup."""

import pytest
from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.streaming import ingest as si
from from_superset_to_clickhouse_spark.tablestore import TableStore

from conftest import logs_schema, ts

SRC_SCHEMA = "id int, dttm timestamp, v string"


def _write_source(spark, path, rows):
    spark.createDataFrame(rows, SRC_SCHEMA).write.mode("append").parquet(path)


def test_ingest_stream_available_now_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_source(spark, src, [(1, ts(1, 5), "a"), (2, ts(2, 5), "b")])
    store = TableStore(spark, str(tmp_path / "store"))
    sch = logs_schema("logs")
    stream = si.stream_source(spark, src, SRC_SCHEMA)
    q = si.ingest_stream(stream, store, sch, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert store.read("logs").count() == 2
    got = {r["id"]: r["v"] for r in store.latest_view("logs").collect()}
    assert got == {1: "a", 2: "b"}


def test_ingest_stream_restart_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = TableStore(spark, str(tmp_path / "store"))
    sch = logs_schema("logs")
    _write_source(spark, src, [(1, ts(1, 5), "a")])
    si.ingest_stream(
        si.stream_source(spark, src, SRC_SCHEMA), store, sch, ckpt
    ).awaitTermination(120)
    # New file lands; restart with the same checkpoint ingests ONLY it.
    _write_source(spark, src, [(2, ts(1, 6), "b")])
    si.ingest_stream(
        si.stream_source(spark, src, SRC_SCHEMA), store, sch, ckpt
    ).awaitTermination(120)
    assert store.read("logs").count() == 2  # no re-ingest of file 1


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    rows = [
        (i, ts(1, 1, hour=i % 5), "e" + str(i % 2), float(i))
        for i in range(30)
    ]
    schema = "event_id int, ts timestamp, event_type string, value double"
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).write.parquet(src)

    batch = si.windowed_counts(spark.read.parquet(src))
    stream = si.windowed_counts(si.stream_source(spark, src, schema))
    q = (
        stream.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def norm(df):
        return sorted(
            (r["win"]["start"], r["event_type"], r["n"], r["sum_value"])
            for r in df.collect()
        )

    assert norm(spark.table("win_out")) == norm(batch)


def test_sessionized_batch_gap_splits(spark):
    rows = [
        (1, ts(1, 1, 0)), (1, ts(1, 1, 0)), (1, ts(1, 1, 5)),  # two sessions
        (2, ts(1, 1, 1)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = si.sessionized(df, gap="30 minutes")
    per_user = {}
    for r in out.collect():
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_stream_dedup_drops_duplicate_keys(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(1, ts(1, 1, 0), "a"), (1, ts(1, 1, 0), "a-dup"), (2, ts(1, 1, 1), "b")]
    spark.createDataFrame(rows, SRC_SCHEMA).write.parquet(src)
    stream = si.stream_dedup(
        si.stream_source(spark, src, SRC_SCHEMA), keys=("id",), ts_col="dttm"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("dedup_out").select("id").distinct().count() == 2
    assert spark.table("dedup_out").count() == 2
