"""Cross-engine parity for the list_reduce fold twins (supertrend,
psar, kama) on ADVERSARIAL data, plus a pinned regression for the
DuckDB field-order hazard that motivated the readers-first rule."""

import datetime as dt
import random

import duckdb
import pandas as pd
import pytest


def test_duckdb_list_reduce_field_order_hazard_documented():
    """DuckDB 1.0 regression pin: inside list_reduce, a struct field
    whose expression reads an acc slot that an EARLIER sibling field
    overwrites can see the NEW value (here: the af ratchet freezes
    when 'af' follows 'ep'). The twins therefore order fields
    readers-first. If this test ever FAILS (both variants agree),
    the upstream bug is fixed and the comment can be relaxed."""
    def el(h, l):
        return (f"{{'h': {h}, 'l': {l}, 'up': NULL::BOOLEAN, "
                f"'ep': NULL::DOUBLE, 'af': NULL::DOUBLE}}")

    els = ",".join(el(h, l) for h, l in
                   [(10, 9), (9, 8), (8, 7), (7, 6), (6, 5), (5, 4)])
    bad = duckdb.sql(f"""
      WITH e AS (SELECT [{els}] AS l2)
      SELECT list_reduce(l2, (acc, x) -> CASE WHEN acc.up IS NULL THEN
        {{'h': x.h, 'l': x.l, 'up': false, 'ep': x.l, 'af': 0.02}}
       ELSE
        {{'h': x.h, 'l': x.l, 'up': false,
         'ep': least(acc.ep, x.l),
         'af': acc.af + 0.02 * CAST(x.l < acc.ep AS INTEGER)}}
       END) AS r FROM e""").fetchall()[0][0]

    def el2(h, l):
        return (f"{{'af': NULL::DOUBLE, 'ep': NULL::DOUBLE, "
                f"'up': NULL::BOOLEAN, 'h': {h}, 'l': {l}}}")

    els2 = ",".join(el2(h, l) for h, l in
                    [(10, 9), (9, 8), (8, 7), (7, 6), (6, 5), (5, 4)])
    good = duckdb.sql(f"""
      WITH e AS (SELECT [{els2}] AS l2)
      SELECT list_reduce(l2, (acc, x) -> CASE WHEN acc.up IS NULL THEN
        {{'af': 0.02, 'ep': x.l, 'up': false, 'h': x.h, 'l': x.l}}
       ELSE
        {{'af': acc.af + 0.02 * CAST(x.l < acc.ep AS INTEGER),
         'ep': least(acc.ep, x.l),
         'up': false, 'h': x.h, 'l': x.l}}
       END) AS r FROM e""").fetchall()[0][0]
    # readers-first gives the correct 4 bumps
    assert abs(good["af"] - 0.1) < 1e-9
    # the hazard ordering historically froze at 0.04; accept either
    # broken or (future-fixed) correct, but never silently other values
    assert bad["af"] in (pytest.approx(0.04), pytest.approx(0.1))


def _adversarial_events(seed, n_days=120, vol=0.05):
    rng = random.Random(seed)
    rows, t0, eid = [], dt.datetime(2024, 1, 1), 0
    for typ in ["click", "view"]:
        price = 100.0
        for d in range(n_days):
            for i in range(3):
                price *= 1 + rng.gauss(0, vol)
                price = max(price, 1.0)
                rows.append((eid, t0 + dt.timedelta(days=d, hours=8 * i),
                             1, typ, price, ""))
                eid += 1
    return pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    )


@pytest.mark.parametrize("name", ["supertrend", "psar", "kama"])
def test_fold_twins_adversarial_parity(spark, tmp_path, name):
    """The three sequential-fold twins must agree with Spark bar for
    bar on high-volatility random walks — flips, ratchets and af
    resets exercised far beyond the fixture's calm daily series."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "entry_for_fold_test",
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    for seed in (7, 23):
        pdf = _adversarial_events(seed)
        pq = str(tmp_path / f"events_{name}_{seed}.parquet")
        pdf.to_parquet(pq)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{pq}'")
        sql = entry.oracle_sql()[name]
        duck = {tuple(r[:2]): tuple(r[2:]) for r in con.sql(sql).fetchall()}
        con.close()

        import from_superset_to_clickhouse_spark.operators.temporal as tmpo
        from pyspark.sql import functions as F

        sdf = spark.createDataFrame(pdf)
        if name == "supertrend":
            out = tmpo.supertrend(sdf, "event_type", "ts", "value",
                                  "event_id", bar="1 day", period=5,
                                  mult=2.0)
        elif name == "psar":
            out = tmpo.parabolic_sar(sdf, "event_type", "ts", "value",
                                     "event_id", bar="1 day")
        else:
            daily = sdf.groupBy(
                F.col("event_type").alias("g"),
                F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
            ).agg(F.avg("value").alias("v"))
            out = tmpo.kama(daily, "g", "d", "v", er_period=5)
        sp = {tuple(r[:2]): tuple(r[2:]) for r in out.collect()}
        # normalize timestamp/date keys to strings for comparison
        spn = {(k[0], str(k[1])): v for k, v in sp.items()}
        dkn = {(k[0], str(k[1])): v for k, v in duck.items()}
        assert set(spn) == set(dkn), (name, seed, "key sets differ")
        bad = [k for k in spn if spn[k] != dkn[k]]
        assert not bad, (name, seed, bad[:3],
                         [(spn[k], dkn[k]) for k in bad[:3]])
