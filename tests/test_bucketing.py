"""Bucketed-layout plan gates: co-located joins must not shuffle, point
lookups must prune buckets, results must equal the unbucketed twins."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark import bucketing as bk


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = spark.range(0, 2000).select(
        F.col("id").alias("okey"), (F.col("id") % 7).alias("status")
    )
    items = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("okey"), (F.col("id") * 2).alias("qty")
    )
    bk.write_bucketed(orders, "b_orders", "okey", 4, path=str(base / "o"))
    bk.write_bucketed(items, "b_items", "okey", 4, path=str(base / "i"))
    yield orders, items
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_cojoin_has_no_exchange(spark, bucketed_pair):
    """Same bucket spec on both sides: the join must be bucket-local —
    no Exchange node anywhere in the plan. (Broadcast is disabled for
    the gate: at fixture size the planner would broadcast instead,
    which hides exactly the big-big join case bucketing exists for.)"""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bk.cojoin(spark, "b_orders", "b_items", "okey")
        plan = _plan(j)
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cojoin_matches_unbucketed_result(spark, bucketed_pair):
    orders, items = bucketed_pair
    want = orders.join(items, "okey").agg(
        F.count("*").alias("n"), F.sum("qty").alias("s")
    ).first()
    got = bk.cojoin(spark, "b_orders", "b_items", "okey").agg(
        F.count("*").alias("n"), F.sum("qty").alias("s")
    ).first()
    assert (got["n"], got["s"]) == (want["n"], want["s"])


def test_point_lookup_prunes_buckets(spark, bucketed_pair):
    """Equality on the bucket key scans 1 of 4 buckets. (autoBucketedScan
    drops the bucketed layout when it sees no join/agg benefit, which
    also drops filter pruning — force it on for the gate.)"""
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = bk.read_bucketed(spark, "b_orders").filter(F.col("okey") == 42)
        plan = _plan(q)
        assert "SelectedBucketsCount: 1 out of 4" in plan
        assert q.count() == 1
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )
