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


def test_running_latest_stateful_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key max-ts state across
    micro-batches: a restart with the same checkpoint sees earlier
    state, so an OLDER late row must not displace the stored latest."""
    schema = "user_id long, ts timestamp, value double"
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            si.running_latest(si.stream_source(spark, src, schema))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, ts(1, 1, hour=5), 10.0), (2, ts(1, 1, hour=3), 20.0)], schema
    ).write.mode("append").parquet(src)
    run_once()
    # batch 2: key 1 gets an OLDER row (stays 10.0), key 2 a newer one.
    spark.createDataFrame(
        [(1, ts(1, 1, hour=2), 99.0), (2, ts(1, 1, hour=9), 25.0)], schema
    ).write.mode("append").parquet(src)
    run_once()
    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:  # last emission per key = max latest_ts emitted
        cur = latest.get(r["user_id"])
        if cur is None or r["latest_ts"] >= cur[0]:
            latest[r["user_id"]] = (r["latest_ts"], r["latest_value"])
    assert latest[1] == (ts(1, 1, hour=5), 10.0)
    assert latest[2] == (ts(1, 1, hour=9), 25.0)


def test_stream_to_jdbc_publishes_and_restart_ships_only_new(spark, tmp_path):
    """stream_to_jdbc: AvailableNow backlog lands in Derby; a restart
    with the same checkpoint publishes only files added since — the
    streaming INSERT-SELECT twin, no duplicates on restart."""
    from from_superset_to_clickhouse_spark.sources.readers import read_jdbc

    url = "jdbc:derby:memory:stream_jdbc_test;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write_source(spark, src, [(1, ts(1, 5), "a"), (2, ts(2, 5), "b")])

    q = si.stream_to_jdbc(
        si.stream_source(spark, src, SRC_SCHEMA), url, "ext_stream", ckpt,
        properties=props,
    )
    q.awaitTermination(120)
    assert read_jdbc(spark, url, "ext_stream", properties=props).count() == 2

    _write_source(spark, src, [(3, ts(3, 5), "c")])
    q2 = si.stream_to_jdbc(
        si.stream_source(spark, src, SRC_SCHEMA), url, "ext_stream", ckpt,
        properties=props,
    )
    q2.awaitTermination(120)
    back = read_jdbc(spark, url, "ext_stream", properties=props)
    assert back.count() == 3
    assert {r["id"] for r in back.collect()} == {1, 2, 3}


def test_curate_stream_equals_batch_curation(spark, tmp_path):
    """The curation admission path over an AvailableNow stream produces
    exactly the batch result on the same files — row-local codegen has
    no stream/batch semantic gap."""
    src = str(tmp_path / "docs")
    rows = [
        (0, "<p>the cat and the dog is was with</p>"),
        (1, "el los las una es el los las una es"),
        (2, "tiny"),
        (3, "&lt;b&gt; the " + "word " * 10),
        (4, "x y z"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    schema = "doc_id long, text string"
    out_dir = str(tmp_path / "out")
    q = (
        si.curate_stream(si.stream_source(spark, src, schema))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["doc_id"], r["text"], r["pred_lang"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r["doc_id"], r["text"], r["pred_lang"])
        for r in si.curate_stream(spark.read.parquet(src)).collect()
    }
    assert streamed == batch
    ids = {d for d, _, _ in batch}
    assert 0 in ids and 1 in ids and 2 not in ids  # gate dropped the tiny doc
    langs = {d: l for d, _, l in batch}
    assert langs[0] == "en" and langs[1] == "es"


def test_stream_quantile_partials_feed_batch_sketch(spark, tmp_path):
    """The streaming histogram partials, drained with AvailableNow, are
    EXACTLY the batch partials of the same data — and merging them
    answers the same quantiles as a batch one-pass sketch. Late events
    within the watermark still land in their window's bucket."""
    from from_superset_to_clickhouse_spark.operators import sketch as sk

    src = str(tmp_path / "src")
    rows_schema = "id int, ts timestamp, value double"
    rows = [(i, ts(1, 5, hour=i % 24), float((i * 37) % 500)) for i in range(500)]
    spark.createDataFrame(rows, rows_schema).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(rows_schema).parquet(src)
    )
    q = (
        si.stream_quantile_partials(
            stream, window="6 hours", lo=0.0, hi=500.0, buckets=50
        )
        .writeStream.format("memory")
        .queryName("qsketch")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.table("qsketch").select(
        F.col("win.start").alias("ws"), "bucket", "cnt"
    )

    batch = si.stream_quantile_partials(
        spark.read.parquet(src), window="6 hours", lo=0.0, hi=500.0, buckets=50
    ).select(F.col("win.start").alias("ws"), "bucket", "cnt")
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )

    # merged streaming partials answer the same quantiles as a one-pass
    # batch histogram over the raw data
    merged = sk.hist_merge(streamed)
    got = {
        r["q"]: r["est"]
        for r in sk.hist_quantiles(merged, [0.5, 0.9], 0.0, 500.0, 50).collect()
    }
    one_pass = (
        spark.read.parquet(src)
        .groupBy(sk.bucket_index(F.col("value"), 0.0, 500.0, 50).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    want = {
        r["q"]: r["est"]
        for r in sk.hist_quantiles(one_pass, [0.5, 0.9], 0.0, 500.0, 50).collect()
    }
    assert got == want


def test_running_stats_decomposable_across_batches(spark, tmp_path):
    """Per-key moment state accumulates across micro-batches and across
    a checkpointed restart; the drained state equals the one-shot batch
    aggregate exactly in n/sum and to FP noise in mean/var (decomposable
    state — batch boundaries cannot change the answer)."""
    import math

    schema = "user_id long, ts timestamp, value double"
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    acc = {}

    def run_once():
        def sink(batch_df, batch_id):
            for r in batch_df.collect():
                acc[r["user_id"]] = (r["n"], r["sum"], r["mean"], r["var_samp"])

        q = (
            si.running_stats(si.stream_source(spark, src, schema))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, ts(1, 1, hour=1), 2.0), (1, ts(1, 1, hour=2), 4.0),
         (2, ts(1, 1, hour=1), 7.0)], schema
    ).write.mode("append").parquet(src)
    run_once()
    spark.createDataFrame(
        [(1, ts(1, 1, hour=3), 6.0), (2, ts(1, 1, hour=2), None)], schema
    ).write.mode("append").parquet(src)
    run_once()
    # key 1: values {2,4,6} -> n=3, sum=12, mean=4, var_samp=4
    assert acc[1][0] == 3 and acc[1][1] == 12.0
    assert math.isclose(acc[1][2], 4.0) and math.isclose(acc[1][3], 4.0)
    # key 2: one value + one NULL -> n=1, var undefined
    assert acc[2][0] == 1 and acc[2][1] == 7.0 and acc[2][3] is None


def test_streaming_ohlc_equals_batch_across_file_batches(spark, tmp_path):
    """Order-sensitive batch-stream parity: open/close depend on
    (ts, tiebreak) ordering, and the stream delivers files in two
    separate micro-batches with the LATER file containing the EARLIER
    ticks — min_by/max_by state must still merge to the batch answer."""
    import datetime as dt

    from from_superset_to_clickhouse_spark.operators.temporal import ohlc_bars

    src = str(tmp_path / "src")
    schema = "event_id long, ts timestamp, event_type string, value double"
    rows_late_file = [  # arrives FIRST but holds the LATER ticks
        (3, dt.datetime(2024, 1, 1, 5, 0), "x", 20.0),
        (4, dt.datetime(2024, 1, 1, 5, 0), "x", 7.0),
    ]
    rows_early_file = [
        (1, dt.datetime(2024, 1, 1, 0, 30), "x", 10.0),
        (2, dt.datetime(2024, 1, 1, 3, 0), "x", 50.0),
    ]
    spark.createDataFrame(rows_late_file, schema).write.mode("append").parquet(src)
    stream = si.stream_source(spark, src, schema)
    name = "t_sohlc"
    q = (
        si.streaming_ohlc(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    spark.createDataFrame(rows_early_file, schema).write.mode("append").parquet(src)
    q2 = (
        si.streaming_ohlc(si.stream_source(spark, src, schema))
        .writeStream.format("memory")
        .queryName(name + "2")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    streamed = {
        (r["event_type"], r["bar_start"]): (
            r["open"], r["high"], r["low"], r["close"], r["volume"]
        )
        for r in spark.table(name + "2").collect()
    }
    batch = spark.createDataFrame(rows_late_file + rows_early_file, schema)
    expected = {
        (r["event_type"], r["bar_start"]): (
            r["open"], r["high"], r["low"], r["close"], r["volume"]
        )
        for r in ohlc_bars(
            batch, "event_type", "ts", "value", "event_id"
        ).collect()
    }
    assert streamed == expected
    b0 = streamed[("x", dt.datetime(2024, 1, 1, 0, 0))]
    assert b0 == (10.0, 50.0, 7.0, 7.0, 4)  # open from the LATE-arriving file


def test_stream_index_append_restart_no_double_indexing(spark, tmp_path):
    """Streaming -> incremental-index composition under RESTART: a
    first run indexes the initial files, the query dies, more files
    arrive, a second run on the SAME checkpoint indexes ONLY the new
    files — the final index equals a one-shot batch build over the
    whole corpus (postings, doc lengths AND served BM25), and no
    document is indexed twice."""
    from from_superset_to_clickhouse_spark.operators import text as txt

    docs = [
        (1, "spark merge stream spark"),
        (2, "vector scan filter join"),
        (3, "merge merge window sort"),
        (4, "spark vector table query"),
        (5, "stream stream stream batch"),
        (6, "join hash row group"),
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(docs[:3], schema).write.parquet(src)
    q = si.stream_index_append(
        si.stream_source(spark, src, spark.createDataFrame(docs, schema).schema),
        spark, idx, ckpt,
    )
    q.awaitTermination(120)
    n_after_first = spark.read.parquet(f"{idx}/doc_lengths").count()
    assert n_after_first == 3

    # "restart": new files land, a fresh query resumes from the ckpt
    spark.createDataFrame(docs[3:], schema).write.mode("append").parquet(src)
    q2 = si.stream_index_append(
        si.stream_source(spark, src, spark.createDataFrame(docs, schema).schema),
        spark, idx, ckpt,
    )
    q2.awaitTermination(120)

    dl = spark.read.parquet(f"{idx}/doc_lengths")
    assert dl.count() == 6  # every doc exactly once, none re-indexed
    assert dl.select("doc_id").distinct().count() == 6

    full = spark.createDataFrame(docs, schema)
    served = {
        (r["doc_id"], r["score"])
        for r in txt.bm25_topk_indexed(
            spark, idx, ["spark", "merge"], k=6
        ).collect()
    }
    direct = {
        (r["doc_id"], r["score"])
        for r in txt.bm25_topk(full, ["spark", "merge"], k=6).collect()
    }
    assert served == direct and len(served) > 0


def test_stream_cdc_apply_restart_resumes_at_committed_batch(spark, tmp_path):
    """Streaming CDC-apply under RESTART: batch 1 (full load) commits,
    the query dies, batches 2 (re-upsert) and 3 (delete) land, a fresh
    query on the SAME checkpoint applies only them — final table equals
    the last-write-wins fold of the full log."""
    import os

    from from_superset_to_clickhouse_spark.schema import Field, Schema
    from from_superset_to_clickhouse_spark.streaming.ingest import (
        stream_cdc_apply,
    )
    from from_superset_to_clickhouse_spark.tablestore import TableStore

    schema = (
        "id long, grp string, v double, seq long, op string"
    )
    b1 = [(i, "g" + str(i % 2), float(i), 1, "U") for i in range(10)]
    b2 = [(i, "g" + str(i % 2), float(i) * 10, 2, "U")
          for i in range(0, 10, 2)]
    b3 = [(3, "g1", None, 3, "D"), (4, "g0", None, 3, "D")]
    src = str(tmp_path / "cdc")
    os.makedirs(src)

    def land(name, rows, mtime):
        import glob
        import shutil

        tmp = str(tmp_path / ("w_" + name))
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(tmp)
        part = glob.glob(tmp + "/part-*.parquet")[0]
        dst = src + "/" + name + ".parquet"
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))

    store = TableStore(spark, str(tmp_path / "store"))
    store.create(Schema(
        name="t",
        fields=(
            Field("id", "bigint", nullable=False),
            Field("grp", "string"),
            Field("v", "double"),
            Field("seq", "bigint"),
        ),
        partition_by=("grp",),
        sort_by=("id",),
    ))
    sdf = spark.createDataFrame(b1, schema)
    land("00", b1, 1_700_000_000)
    stream = (
        spark.readStream.format("parquet").schema(sdf.schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    q = stream_cdc_apply(
        stream, store, "t", ["id"], str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    assert store.read("t").count() == 10

    land("01", b2, 1_700_000_060)
    land("02", b3, 1_700_000_120)
    stream2 = (
        spark.readStream.format("parquet").schema(sdf.schema)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    q2 = stream_cdc_apply(
        stream2, store, "t", ["id"], str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)

    got = {r.id: (r.v, r.seq) for r in store.read("t").collect()}
    want = {i: (float(i), 1) for i in range(10)}
    for i in range(0, 10, 2):
        want[i] = (float(i) * 10, 2)
    del want[3], want[4]
    assert got == want


def test_stream_sessions_merge_across_batches(spark, tmp_path):
    """A second micro-batch whose event bridges the gap between two
    existing sessions must MERGE them in the state store: one session
    (start of A, end of B, summed count) replaces both."""
    import datetime

    from from_superset_to_clickhouse_spark.streaming.ingest import (
        session_counts,
        stream_source,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp"

    # batch 1: two sessions 40 min apart (gap 30 min keeps them split)
    b1 = spark.createDataFrame(
        [(1, t0), (1, t0 + datetime.timedelta(minutes=5)),
         (1, t0 + datetime.timedelta(minutes=45))],
        schema,
    )
    b1.coalesce(1).write.parquet(src)
    holder = {}

    def run():
        stream = stream_source(spark, src, b1.schema)
        q = (
            session_counts(stream, gap="30 minutes")
            .writeStream.foreachBatch(
                lambda bdf, bid: holder.__setitem__("rows", bdf.collect())
            )
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    first = {(r.user_id, r.session_start): r for r in holder["rows"]}
    assert len(first) == 2  # split sessions before the bridge

    # batch 2 (restart on the same checkpoint): an event at +25 min
    # sits within 30 min of BOTH sessions -> they must coalesce
    b2 = spark.createDataFrame(
        [(1, t0 + datetime.timedelta(minutes=25))], schema
    )
    b2.coalesce(1).write.mode("append").parquet(src)
    run()
    rows = holder["rows"]
    assert len(rows) == 1
    r = rows[0]
    assert r.session_start == t0
    assert r.session_end == t0 + datetime.timedelta(minutes=75)
    assert r.n_events == 4
