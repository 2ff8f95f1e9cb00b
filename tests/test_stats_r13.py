"""Hand-oracle tests for the round-13 stats operators."""

import math

import pytest

from from_superset_to_clickhouse_spark.operators import stats as st


def test_hodges_lehmann_known(spark):
    # values 1..4: walsh averages i<=j: 1,1.5,2,2.5,2,2.5,3,3.5,3,3.5,4
    # sorted: [1,1.5,2,2,2.5,2.5,3,3,3.5,3.5,4] -> 10 pairs? n(n+1)/2=10
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "v double")
    r = st.hodges_lehmann(df, "v").collect()[0]
    assert r["n"] == 4 and r["n_pairs"] == 10
    assert r["hl"] == 2.5
    # odd count: median of 6 walsh avgs of [1,2,10]:
    # 1,1.5,5.5,2,6,10 sorted -> 1,1.5,2,5.5,6,10 -> (2+5.5)/2
    df2 = spark.createDataFrame([(1.0,), (2.0,), (10.0,)], "v double")
    r2 = st.hodges_lehmann(df2, "v").collect()[0]
    assert r2["n_pairs"] == 6 and r2["hl"] == 3.75


def test_bland_altman_known(spark):
    # diffs: 0, 2, -2, 4, -4 -> bias 0, sd sqrt(40/4)=sqrt(10)
    rows = [(10.0, 10.0), (12.0, 10.0), (8.0, 10.0), (14.0, 10.0), (6.0, 10.0)]
    r = st.bland_altman(
        spark.createDataFrame(rows, "a double, b double"), "a", "b"
    ).collect()[0]
    assert r["n"] == 5 and r["bias"] == 0.0
    assert abs(r["sd_diff"] - math.sqrt(10)) < 1e-5
    assert abs(r["loa_high"] - 1.96 * math.sqrt(10)) < 1e-4
    assert r["pct_within"] == 1.0


def test_nelson_aalen_hand_curve(spark):
    import datetime as dt

    # 4 subjects, lifetimes 0,1,1,2 days; censor horizon 0 with last
    # activity staggered so subjects 1-3 are dead, subject 4 censored
    base = dt.date(2024, 1, 1)
    rows = []
    # subj, first, last  (corpus max = jan 10)
    spans = [(1, 0, 0), (2, 0, 1), (3, 1, 2), (4, 8, 10)]
    for s, f, l in spans:
        rows.append((s, base + dt.timedelta(days=f)))
        rows.append((s, base + dt.timedelta(days=l)))
    df = spark.createDataFrame(rows, "s int, d date")
    out = {
        r["t_days"]: r
        for r in st.nelson_aalen(df, "s", "d", censor_horizon_days=0).collect()
    }
    # lifetimes: 0 (dead), 1 (dead), 1 (dead), 2 (censored, last=max)
    # t=0: n_risk 4, d 1 -> H=0.25 ; t=1: n_risk 3, d 2 -> H=0.25+2/3
    assert out[0]["n_risk"] == 4 and out[0]["d_events"] == 1
    assert out[0]["cum_hazard"] == 0.25
    assert out[1]["n_risk"] == 3 and out[1]["d_events"] == 2
    assert abs(out[1]["cum_hazard"] - (0.25 + 2 / 3)) < 1e-6
    assert abs(out[1]["var_hazard"] - (1 / 16 + 2 / 9)) < 1e-6
    assert 2 not in out  # censored-only time emits no curve row


def test_c_index_hand(spark):
    # subjects: (score, dur, event)
    rows = [
        (3.0, 1.0, 1),  # a: event at 1
        (2.0, 2.0, 1),  # b: event at 2
        (1.0, 3.0, 0),  # c: censored at 3
        (3.0, 2.5, 0),  # d: censored at 2.5
    ]
    df = spark.createDataFrame(rows, "s double, t double, e int")
    r = st.c_index(df, "s", "t", "e").collect()[0]
    # comparable: a-b (3>2 conc), a-c (3>1 conc), a-d (3=3 tie),
    #             b-c (2>1 conc), b-d (2<3 disc)
    assert r["n_comparable"] == 5
    assert r["n_concordant"] == 3 and r["n_tied"] == 1
    assert r["c_index"] == 0.7


def test_process_capability_centered(spark):
    # mean 10, sd 2, limits 4..16 -> cp = cpk = 1
    vals = [8.0, 12.0, 8.0, 12.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = st.process_capability(df, "v", lsl=4.0, usl=16.0).collect()[0]
    sd = math.sqrt(16 / 3)
    assert r["mean"] == 10.0
    assert abs(r["sd"] - sd) < 1e-5
    assert abs(r["cp"] - 12 / (6 * sd)) < 1e-5
    assert r["cp"] == r["cpk"]  # centered
    assert r["pct_out"] == 0.0


def test_icc_separated_vs_mixed(spark):
    # strongly separated groups -> icc near 1
    sep = [("a", 1.0), ("a", 1.1), ("b", 100.0), ("b", 100.1)] * 5
    r = st.icc_oneway(
        spark.createDataFrame(sep, "g string, v double"), "g", "v"
    ).collect()[0]
    assert r["icc"] > 0.99
    # identical distributions -> icc near 0 (can be slightly negative)
    same = [("a", float(i % 7)) for i in range(50)] + [
        ("b", float(i % 7)) for i in range(50)
    ]
    r2 = st.icc_oneway(
        spark.createDataFrame(same, "g string, v double"), "g", "v"
    ).collect()[0]
    assert abs(r2["icc"]) < 0.1


def test_breusch_pagan_hetero_vs_homo(spark):
    # variance grows with x -> LM large; constant variance -> small
    rows_het = []
    rows_hom = []
    for i in range(400):
        x = float(i % 40)
        noise = (1 if i % 2 == 0 else -1) * (0.1 + x / 10.0)
        rows_het.append((x, 2.0 * x + noise))
        # homoskedastic but NOT constant-magnitude noise (a constant
        # e-squared has zero aux variance and surfaces NULL by the
        # degenerate-input discipline)
        hom_noise = (1 if i % 2 == 0 else -1) * (0.4 + ((i * 13) % 5) / 10.0)
        rows_hom.append((x, 2.0 * x + hom_noise))
    het = st.breusch_pagan(
        spark.createDataFrame(rows_het, "x double, y double"), "y", "x"
    ).collect()[0]
    hom = st.breusch_pagan(
        spark.createDataFrame(rows_hom, "x double, y double"), "y", "x"
    ).collect()[0]
    assert het["lm_stat"] > 50 and het["p_value"] < 1e-6
    # under the null LM ~ chi-square(1): anything O(1) is a pass
    assert hom["lm_stat"] < 5 and hom["p_value"] > 0.02
    assert abs(het["slope"] - 2.0) < 0.05


def test_chow_break_vs_stable(spark):
    # slope 1 pre, slope 5 post -> huge F; same slope -> F ~ 0
    rows_b, rows_s = [], []
    for i in range(200):
        x = float(i % 20)
        g = i >= 100
        rows_b.append(
            (x, (5.0 if g else 1.0) * x + (0.2 if i % 2 else -0.2), g)
        )
        rows_s.append((x, 2.0 * x + (0.1 if i % 2 else -0.1), g))
    br = st.chow_test(
        spark.createDataFrame(rows_b, "x double, y double, g boolean"),
        "y", "x", "g",
    ).collect()[0]
    stv = st.chow_test(
        spark.createDataFrame(rows_s, "x double, y double, g boolean"),
        "y", "x", "g",
    ).collect()[0]
    assert br["f_stat"] > 1000
    assert br["df1"] == 2 and br["df2"] == 196
    assert stv["f_stat"] < 1


def test_granger_causal_vs_independent(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # y_t ~ x_{t-1} + small noise -> x Granger-causes y (huge F); a
    # NOISELESS relation gives rss_u = 0 and surfaces NULL by the
    # degenerate guard
    xs = [float((i * 7) % 13) for i in range(40)]
    rows = []
    for i in range(1, 40):
        noise = (0.05 if i % 2 else -0.05)
        rows.append((base + dt.timedelta(days=i), xs[i], xs[i - 1] + noise))
    caus = st.granger_lag1(
        spark.createDataFrame(rows, "d timestamp, x double, y double"),
        "d", "x", "y",
    ).collect()[0]
    assert caus["f_stat"] > 100
    assert caus["df2"] == caus["n"] - 3
    # y pure AR(1)-ish independent of x -> small F
    rows2 = [
        (base + dt.timedelta(days=i), xs[i], float((i * 5) % 11))
        for i in range(1, 40)
    ]
    ind = st.granger_lag1(
        spark.createDataFrame(rows2, "d timestamp, x double, y double"),
        "d", "x", "y",
    ).collect()[0]
    assert ind["f_stat"] is None or ind["f_stat"] < 5


def test_pot_gpd_exponential_tail(spark):
    # exponential-ish excesses (mean ~= sd) -> xi near 0
    vals = []
    for i in range(500):
        # threshold 10; excesses follow a geometric-like ladder
        vals.append(10.0 + ((i * 37) % 97) / 10.0)
    vals += [5.0] * 200  # below threshold
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = st.pot_gpd(df, "v", threshold=10.0).collect()[0]
    assert r["n"] == 700
    # excesses of exactly 0 (i*37%97==0) are excluded by e > 0
    assert 480 <= r["n_excess"] <= 500
    # uniform excesses on (0, 9.7): mean ~4.85, sd ~2.8 -> r ~3 ->
    # xi = (1-3)/2 = -1 (bounded tail, correct for uniform); the
    # largest excess sits AT the fitted upper bound, so the
    # exceed-the-seen probability degenerates to NULL-or-tiny
    assert r["xi"] < -0.5
    assert r["p_exceed_seen"] is None or r["p_exceed_seen"] < 0.05


def test_atkinson_equal_vs_skewed(spark):
    eq = spark.createDataFrame([(10.0,)] * 50, "v double")
    r = st.atkinson_index(eq, "v").collect()[0]
    # floored ln terms bias the geometric mean down by ~1e-6
    assert abs(r["atkinson"]) < 1e-5 and abs(r["geo_mean"] - 10.0) < 1e-4
    sk = spark.createDataFrame(
        [(1.0,)] * 49 + [(1000.0,)], "v double"
    )
    r2 = st.atkinson_index(sk, "v").collect()[0]
    # arithmetic mean ~21, geometric mean ~1.15 -> A near 1
    assert r2["atkinson"] > 0.9
    # zero/negative values are excluded, not logged
    mixed = spark.createDataFrame(
        [(0.0,), (-5.0,), (10.0,), (10.0,)], "v double"
    )
    r3 = st.atkinson_index(mixed, "v").collect()[0]
    assert r3["n"] == 2 and abs(r3["atkinson"]) < 1e-5
