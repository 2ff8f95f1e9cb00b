"""CDC: snapshot diff classification and partial-aggregate merge."""

from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.operators.cdc import (
    merge_partial_aggregates,
    snapshot_diff,
)


def test_snapshot_diff_classifies_and_drops_unchanged(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, 40.0)],
        "id int, v double",
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (4, 41.0), (5, 50.0)],
        "id int, v double",
    )
    got = {r["id"]: r["change_type"] for r in snapshot_diff(old, new, ["id"]).collect()}
    # 1 unchanged (absent), 2 NULL->20 changed, 3 removed, 4 changed, 5 added
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}


def test_snapshot_diff_null_to_null_is_unchanged(spark):
    old = spark.createDataFrame([(1, None)], "id int, v double")
    new = spark.createDataFrame([(1, None)], "id int, v double")
    assert snapshot_diff(old, new, ["id"]).count() == 0


def test_merge_partial_aggregates_equals_full_recompute(spark):
    from from_superset_to_clickhouse_spark.sources.testdata import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_type", F.floor(F.col("value") * 1024).alias("v")
    )
    full = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    h1 = ev.filter(F.col("v") % 2 == 0)
    h2 = ev.filter(F.col("v") % 2 != 0)

    def agg(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"), F.sum("v").alias("s")
        )

    merged = merge_partial_aggregates(
        agg(h1), agg(h2), keys=["event_type"], sum_cols=["n", "s"]
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_profile_counts_nulls_and_distincts(spark):
    from from_superset_to_clickhouse_spark.operators.cdc import profile

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b")],
        "id int, tag string",
    )
    got = {r["col_name"]: r for r in profile(df).collect()}
    assert got["id"]["n_rows"] == 4
    assert got["id"]["n_nulls"] == 1
    assert got["id"]["n_distinct"] == 3
    assert got["id"]["min_value"] == "1" and got["id"]["max_value"] == "3"
    assert got["tag"]["n_nulls"] == 1
    assert got["tag"]["n_distinct"] == 2


def test_scd2_apply_versions(spark):
    import datetime as dt

    from from_superset_to_clickhouse_spark.operators.cdc import scd2_apply

    dim = spark.createDataFrame(
        [
            # key 1: open row that will change
            (1, 10.0, dt.date(2020, 1, 1), None),
            # key 1 also has closed history that must pass through
            (1, 5.0, dt.date(2010, 1, 1), dt.date(2020, 1, 1)),
            # key 2: open row, no incoming change
            (2, 20.0, dt.date(2020, 1, 1), None),
            # key 3: open row, identical change arrives (no-op)
            (3, 30.0, dt.date(2020, 1, 1), None),
        ],
        "k int, v double, valid_from date, valid_to date",
    )
    changes = spark.createDataFrame(
        [(1, 11.0), (3, 30.0), (9, 90.0)], "k int, v double"
    )
    out = scd2_apply(
        dim, changes, key_col="k", attr_cols=["v"],
        effective_ts=F.lit(dt.date(2024, 1, 1)),
    ).collect()
    rows = {(r["k"], r["v"], str(r["valid_from"]), str(r["valid_to"])) for r in out}
    assert rows == {
        (1, 5.0, "2010-01-01", "2020-01-01"),   # closed history untouched
        (1, 10.0, "2020-01-01", "2024-01-01"),  # closed at effective ts
        (1, 11.0, "2024-01-01", "None"),        # new open version
        (2, 20.0, "2020-01-01", "None"),        # untouched open
        (3, 30.0, "2020-01-01", "None"),        # identical change = no-op
        (9, 90.0, "2024-01-01", "None"),        # brand-new key
    }
