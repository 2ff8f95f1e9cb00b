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
