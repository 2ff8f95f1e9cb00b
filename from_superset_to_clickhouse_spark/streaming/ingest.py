"""Structured Streaming tier: the reference's hand-rolled incremental
model, expressed natively (SURVEY.md §2.9, §7.2 item 12).

The reference polls daily and re-derives a watermark from the target
(``v2/dag.py:106-114``) — which is exactly Structured Streaming's
incremental execution done manually. This module provides:

- ``stream_source``: file-stream reader over a parquet directory
  (``Trigger.AvailableNow`` turns it into the reference's batched daily
  run: process everything available, then stop — restart-safe via the
  checkpoint instead of a probed watermark).
- ``ingest_stream``: foreachBatch append into a TableStore — each
  micro-batch flows through the same dedup-store write path as batch
  ingest (at-least-once delivery + latest_view dedup-on-read =
  effectively-once results, the ReplacingMergeTree property).
- ``windowed_counts`` / ``sessionized``: tumbling/sliding and
  session-window aggregates with late-data watermarks over `events`.
- ``stream_dedup``: ``dropDuplicatesWithinWatermark`` — the streaming
  Replacing analog (state bounded by the watermark horizon).

Scale: state stores are keyed by (window/key) and pruned by the event-
time watermark, so long-running streams hold state proportional to the
lateness horizon, not the history. All aggregations are Catalyst plans —
identical physical operators to the batch tier plus StateStoreSave.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.schema import Schema
from from_superset_to_clickhouse_spark.tablestore import TableStore


def stream_source(
    spark: SparkSession, path: str, schema, fmt: str = "parquet"
) -> DataFrame:
    """File-stream over a directory (schema required — streaming readers
    do not infer). New files are discovered per micro-batch."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def ingest_stream(
    stream: DataFrame,
    store: TableStore,
    schema: Schema,
    checkpoint: str,
    source_tag: str = "stream",
    available_now: bool = True,
):
    """Continuous ingest into a dedup TableStore via foreachBatch.

    ``available_now=True`` processes the backlog and stops — the
    streaming twin of one reference DAG run; with it off the query keeps
    following the directory. Returns the StreamingQuery (caller awaits).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        staged = schema.coerce(batch_df.withColumn("source", F.lit(source_tag)))
        store.append(schema.name, staged)

    store.create(schema, if_not_exists=True)
    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_to_jdbc(
    stream: DataFrame,
    url: str,
    table: str,
    checkpoint: str,
    properties: dict[str, str] | None = None,
    num_partitions: int = 8,
    available_now: bool = True,
):
    """Continuous external publish: stream → JDBC sink via foreachBatch —
    the streaming twin of the reference's INSERT-SELECT into ClickHouse
    (``v2/sql/f_superset_logs_upload_data.sql:1-14``).

    Exactly-once on the Spark side comes from the checkpoint (a replayed
    micro-batch re-runs ``write_batch`` — the append is at-least-once
    into the remote table, the standard JDBC-sink contract; dedup on the
    remote side with a Replacing-style key if required). Each batch
    coalesces to ``num_partitions`` writers so a wide stream can't open
    one remote connection per shuffle partition.
    """
    from from_superset_to_clickhouse_spark.sources.readers import write_jdbc

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_jdbc(
            batch_df, url, table, mode="append",
            properties=properties, num_partitions=num_partitions,
        )

    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_index_append(
    stream: DataFrame,
    spark: SparkSession,
    path: str,
    checkpoint: str,
    n_buckets: int = 64,
    available_now: bool = True,
):
    """Streaming -> incremental inverted-index maintenance: each
    micro-batch of documents flows through ``inverted_index_append``
    (tokenize ONLY the batch, append its postings into the existing
    term-bucket partitions, refresh the 1-row stats from the
    doc-length table — O(batch) text work, never a corpus re-scan).

    The checkpoint makes the composition restartable: a killed query
    resumes at the last committed offset and re-indexes nothing
    already committed, so append-only sources never double-index
    (proven under restart in tests/test_streaming.py). Serving stays
    ``bm25_topk_indexed`` over the same directory — the index a live
    crawl feed maintains is byte-compatible with the batch-built one.
    Returns the StreamingQuery (caller awaits)."""
    from ..operators.text import inverted_index_append

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        inverted_index_append(spark, path, batch_df, n_buckets=n_buckets)

    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def curate_stream(
    stream: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    min_chars: int = 20,
    keep_langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """Streaming text curation: markup strip → token/length quality gate
    → language-ID (+ optional allow-list), entirely row-local codegen —
    so the SAME transformation graph runs over a stream or a batch
    DataFrame with identical results (the test replays a stream vs the
    batch twin). Cross-document stages (dedup, near-dup) stay batch
    jobs over the curated landing table; this is the per-document
    admission path a live crawl feed runs through.
    """
    from from_superset_to_clickhouse_spark.operators.text import (
        lang_id,
        strip_markup,
        word_tokens,
    )

    cleaned = stream.withColumn(text_col, strip_markup(F.col(text_col)))
    gated = cleaned.filter(
        (F.size(word_tokens(F.col(text_col))) >= min_tokens)
        & (F.length(F.col(text_col)) >= min_chars)
    )
    tagged = lang_id(gated, text_col=text_col)
    if keep_langs is not None:
        tagged = tagged.filter(F.col("pred_lang").isin(list(keep_langs)))
    return tagged


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregate with a late-data
    watermark. Works on both streaming and batch DataFrames (batch just
    ignores the watermark) so tests can compare the two directly."""
    df = stream
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return df.groupBy(win.alias("win"), *group_cols).agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sum_value"),
    )


def sessionized(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Session windows (gap-based) per key — the custom-stateful-operator
    case expressed with the built-in ``session_window`` instead of
    hand-rolled applyInPandasWithState."""
    df = stream
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("session"), *group_cols
    ).agg(F.count("*").alias("n_events"))


def stream_dedup(
    stream: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop duplicate keys arriving within the
    watermark horizon — the streaming ReplacingMergeTree analog with
    bounded state."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def running_latest(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
):
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    LATEST (ts, value), maintained across micro-batches and re-emitted
    whenever the key sees data — a continuously-updated ``latest_view``
    (the ReplacingMergeTree contract as live state instead of a window
    over history).

    This is the escape hatch the built-ins can't express: the state
    update rule (max by (ts, value), lexicographic) is arbitrary Python
    over Arrow batches, while state size stays one row per key. Ties on
    ts are broken by the larger value — a DETERMINISTIC rule independent
    of arrival order and batch boundaries, so the drained state always
    equals the batch argmax ordered by (ts DESC, value DESC) and the
    DuckDB oracle comparison cannot flake on duplicate (key, ts) rows.

    Emits in UPDATE output mode — pair with ``foreachBatch`` (or an
    update-capable sink); file sinks are append-only and will reject it.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} long, latest_ts timestamp, latest_value double"
    )
    state_schema = "ts timestamp, v double"

    def update(key, pdfs, state: GroupState):
        best_ts, best_v = state.get if state.exists else (None, None)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            top = pdf[pdf[ts_col] == pdf[ts_col].max()]
            i = top[value_col].idxmax()
            ts, v = top[ts_col][i], float(top[value_col][i])
            if best_ts is None or (ts, v) > (best_ts, best_v):
                best_ts, best_v = ts, v
        state.update((best_ts, best_v))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "latest_ts": [best_ts],
                "latest_value": [best_v],
            }
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_quantile_partials(
    stream: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    lo: float = 0.0,
    hi: float = 500.0,
    buckets: int = 256,
) -> DataFrame:
    """Streaming producer of the mergeable quantile sketch
    (``operators/sketch.py``): per event-time window, (win, bucket, cnt)
    histogram rows. State is bounded at open-windows × buckets
    regardless of event rate (the watermark closes windows), and the
    emitted partials feed ``hist_merge``/``hist_quantiles`` downstream —
    p50/p99 over any window range without rescanning the stream, the
    same never-rescan-history contract as the batch rollup. Works on
    both streaming and batch frames (batch ignores the watermark) so
    tests and backfills share one definition."""
    from from_superset_to_clickhouse_spark.operators.sketch import bucket_index

    df = stream
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.window(F.col(ts_col), window).alias("win"),
            bucket_index(F.col(value_col), lo, hi, buckets).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def running_stats(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
):
    """Custom stateful operator: per-key RUNNING (n, sum, sum_sq) moment
    state maintained across micro-batches, emitting count/mean/variance
    whenever the key sees data — continuously-updated per-entity metric
    baselines (the stream twin of the batch rolling-z-score path, with
    an all-history baseline instead of a trailing window).

    State is the DECOMPOSABLE moment triple, not Welford: merging a
    batch is pure addition, so the result is independent of batch
    boundaries and arrival order, and the drained state provably equals
    the one-shot batch aggregate a SQL twin computes. State size: three
    floats per key, forever — bounded regardless of stream length.
    Emits in UPDATE mode; pair with ``foreachBatch``."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} long, n long, sum double, sum_sq double, "
        "mean double, var_samp double"
    )
    state_schema = "n long, s double, ss double"

    def update(key, pdfs, state: GroupState):
        n, s, ss = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            if len(vals) == 0:
                continue
            n += int(len(vals))
            s += float(vals.sum())
            ss += float((vals * vals).sum())
        state.update((n, s, ss))
        mean = s / n if n else None
        var = (ss - s * s / n) / (n - 1) if n > 1 else None
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [n],
                "sum": [s],
                "sum_sq": [ss],
                "mean": [mean],
                "var_samp": [var],
            }
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_ohlc(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    bar: str = "6 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming OHLC bars: the same decomposable min_by/max_by
    formulation as the batch ``temporal.ohlc_bars`` — open/close ride
    the (ts, tiebreak) struct ordering, so the aggregate is an ordinary
    windowed streaming agg with watermark-bounded state and the drained
    result is batch-equal by construction (no per-batch ordering
    dependence: min_by/max_by merge associatively). Works on batch
    DataFrames too (watermark skipped) so tests compare directly."""
    df = stream
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    tie = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return (
        df.groupBy(
            F.window(F.col(ts_col), bar).alias("_bar"), F.col(key_col)
        )
        .agg(
            F.min_by(F.col(value_col), tie).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(F.col(value_col), tie).alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
        .select(
            F.col(key_col),
            F.col("_bar.start").alias("bar_start"),
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )


def stream_cdc_apply(
    stream: DataFrame,
    store: TableStore,
    table: str,
    key_cols: "list[str]",
    checkpoint: str,
    seq_col: str = "seq",
    op_col: str = "op",
    available_now: bool = True,
):
    """Streaming CDC-apply COMPOSITION: a change-data-capture feed
    (rows tagged ``op`` = 'U' upsert / 'D' delete plus a monotone
    ``seq``) applied micro-batch by micro-batch onto a TableStore
    through ``merge_into`` — the "replicate an OLTP table into the
    lakehouse" loop. Per batch: reduce to the LAST event per key in
    ``seq`` order (merge requires key-unique sources, and last-write-
    wins is the CDC contract), then matched-update/insert the
    upserts and matched-delete the deletes. Only partitions holding
    touched keys rewrite (merge_into's affected-partition machinery);
    the checkpoint makes the apply restartable at the last committed
    batch.

    Ordering contract: batches must arrive in ``seq`` order (a file
    stream orders by modification time — stamp the files, as the
    tests do). Within a batch any order works; across batches a
    stale upsert arriving after the delete of the same key would
    resurrect it, exactly as in any log-ordered CDC consumer.
    Returns the StreamingQuery (caller awaits)."""
    from pyspark.sql import Window

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        w = Window.partitionBy(
            *[F.col(c) for c in key_cols]
        ).orderBy(F.col(seq_col).desc())
        last = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint(eager=True)
        )
        ups = last.filter(F.col(op_col) == "U").drop(op_col)
        if not ups.isEmpty():
            store.merge_into(table, ups, on=key_cols, insert=True)
        dels = last.filter(F.col(op_col) == "D").select(*key_cols)
        if not dels.isEmpty():
            store.merge_into(
                table, dels, on=key_cols, insert=False,
                delete_matched=True,
            )

    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming gap-sessionization via the BUILT-IN ``session_window``
    aggregation → (user, session_start, session_end, n_events): the
    state store merges sessions across micro-batches (an event landing
    inside an open session's gap extends it, two sessions bridged by a
    late event coalesce), and the event-time watermark bounds state —
    sessions idle past the watermark finalize and evict. This is the
    exact streaming twin of the batch ``session_window`` entry; pytest
    proves the cross-batch merge by restarting the query on a second
    file that bridges two previously-separate sessions.

    Emit in UPDATE mode (sessions re-emit as they grow); at 100 TB the
    state is one (start, end, count) triple per OPEN session per key —
    the watermark is the knob that keeps it bounded."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("_s"),
            F.col(user_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("_s.start").alias("session_start"),
            F.col("_s.end").alias("session_end"),
            "n_events",
        )
    )
