"""Offline changepoint location, DiD, and dispersion diagnostics."""

import datetime

from pyspark.sql import functions as F  # noqa: F401


def _series(spark, vals, key="g"):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (key, t0 + datetime.timedelta(days=i), float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "g string, ts timestamp, v double")


def test_binary_segment_finds_level_shift(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import (
        binary_segment,
    )

    vals = [10.0] * 12 + [30.0] * 8
    r = binary_segment(_series(spark, vals), "g", "ts", "v").collect()[0]
    assert r.n == 20
    assert r.split_idx == 12  # left block = first 12 days
    assert r.mean_left == 10.0 and r.mean_right == 30.0
    assert r.split_ts.day == 12  # last bucket of the left block


def test_binary_segment_tie_breaks_earliest(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import (
        binary_segment,
    )

    # flat series: every split has stat 0 -> earliest split wins
    r = binary_segment(_series(spark, [5.0] * 6), "g", "ts", "v").collect()[0]
    assert r.stat == 0.0 and r.split_idx == 1


def test_diff_in_diff_recovers_effect(spark):
    from from_superset_to_clickhouse_spark.operators.stats import (
        diff_in_diff,
    )

    rows = []
    # common trend +5 post; treatment adds +7 on top
    for t in (0, 1):
        for p in (0, 1):
            base = 10.0 + 5.0 * p + 7.0 * (t * p) + 2.0 * t
            rows += [(t, p, base + dv) for dv in (-1.0, 0.0, 1.0)]
    df = spark.createDataFrame(rows, "t int, p int, v double")
    r = diff_in_diff(df, "t", "p", "v").collect()[0]
    assert abs(r.did - 7.0) < 1e-5
    assert abs(r.mean_c_post - r.mean_c_pre - 5.0) < 1e-5


def test_dispersion_fit_poisson_vs_bursty(spark):
    from from_superset_to_clickhouse_spark.operators.stats import (
        dispersion_fit,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # 'flat': exactly 4 events every day -> var 0, fano 0
    for d in range(10):
        rows += [("flat", t0 + datetime.timedelta(days=d, hours=h))
                 for h in range(4)]
    # 'bursty': alternating 1 and 9 events -> mean 5, var > mean
    for d in range(10):
        k = 1 if d % 2 == 0 else 9
        rows += [("bursty", t0 + datetime.timedelta(days=d, hours=h))
                 for h in range(k)]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    got = {r.key: r for r in dispersion_fit(df, "g", "ts").collect()}
    assert got["flat"].fano == 0.0 and got["flat"].nb_alpha == 0.0
    assert got["bursty"].mean_cnt == 5.0
    assert got["bursty"].fano > 1.5
    assert got["bursty"].nb_alpha > 0


def test_proportions_test_reference(spark):
    import math

    from from_superset_to_clickhouse_spark.operators.stats import (
        proportions_test,
    )

    # control 40/400, treated 60/400
    rows = [(0, 1)] * 40 + [(0, 0)] * 360 + [(1, 1)] * 60 + [(1, 0)] * 340
    df = spark.createDataFrame(rows, "arm int, conv int")
    r = proportions_test(df, "arm", "conv").collect()[0]
    pc, pt, pp = 0.1, 0.15, 0.125
    sep = math.sqrt(pp * (1 - pp) * (2 / 400))
    assert abs(r.z - round((pt - pc) / sep, 6)) < 1e-9
    assert r.risk_ratio == 1.5
    assert abs(r.odds_ratio - round((60 * 360) / (40 * 340), 6)) < 1e-9
    sew = math.sqrt(pc * 0.9 / 400 + pt * 0.85 / 400)
    assert abs(r.ci_lo - round(0.05 - 1.959964 * sew, 6)) < 1e-9
    want_n = math.ceil(
        (1.959964 + 0.841621) ** 2 * (pc * 0.9 + pt * 0.85) / 0.05**2
    )
    assert r.min_n_per_arm == want_n


def test_circadian_stats_reference(spark):
    import math

    from from_superset_to_clickhouse_spark.operators.stats import (
        circadian_stats,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # 'sharp': all events at exactly 09:00 -> R = 1, peak 9.0
    for d in range(5):
        rows.append(("sharp", t0 + datetime.timedelta(days=d, hours=9)))
    # 'wrap': events at 23:00 and 01:00 -> circular mean = midnight
    for d in range(5):
        rows.append(("wrap", t0 + datetime.timedelta(days=d, hours=23)))
        rows.append(("wrap", t0 + datetime.timedelta(days=d, hours=1)))
    # 'flat': every 6 hours -> perfectly uniform, R = 0
    for d in range(3):
        for h in (0, 6, 12, 18):
            rows.append(("flat", t0 + datetime.timedelta(days=d, hours=h)))
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    got = {r.key: r for r in circadian_stats(df, "g", "ts").collect()}
    assert got["sharp"].resultant_r == 1.0
    assert abs(got["sharp"].peak_hour - 9.0) < 1e-3
    assert got["wrap"].peak_hour < 0.001 or got["wrap"].peak_hour > 23.999
    assert abs(got["wrap"].resultant_r - math.cos(math.pi / 12)) < 1e-6
    assert got["flat"].resultant_r < 1e-9


def test_logrank_detects_divergent_hazard(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from from_superset_to_clickhouse_spark.operators.stats import (
        logrank_test,
    )

    d0 = dt.date(2024, 1, 1)
    rows = []
    # group 0: lifetimes 100 days; group 1: lifetimes 10 days — all
    # well before the horizon so every subject is an event
    for s in range(30):
        rows.append((s, 0, d0))
        rows.append((s, 0, d0 + dt.timedelta(days=100)))
    for s in range(30, 60):
        rows.append((s, 1, d0))
        rows.append((s, 1, d0 + dt.timedelta(days=10)))
    # anchor subject active at the very end (censored) so the horizon
    # is measured against a late corpus max
    rows.append((99, 0, d0 + dt.timedelta(days=300)))
    df = spark.createDataFrame(rows, "s int, g int, dt date")
    r = logrank_test(
        df, "s", "dt", F.col("g"), censor_horizon_days=60
    ).collect()[0]
    assert r.n1 == 30 and r.n2 == 31
    assert r.o1 == 30  # all of group 1 churned
    # group 1 dies far earlier than chance -> huge positive z
    assert r.z > 3
    assert r.p_value < 0.01
