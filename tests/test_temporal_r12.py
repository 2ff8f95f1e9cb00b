"""Round-12 temporal/financial additions: hand-computed references."""

import math

from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.operators import temporal as tmp


def _series(spark, vals, g="s"):
    return spark.createDataFrame(
        [(g, i, float(v)) for i, v in enumerate(vals)],
        "g string, d int, v double",
    )


def test_max_drawdown_hand(spark):
    # curve 10 -> 15 -> 9 -> 12 -> 6: peak 15, max dd 9 (15->6),
    # frac = 1 - 6/15 = 0.6
    df = _series(spark, [10, 15, 9, 12, 6])
    r = tmp.max_drawdown(df, "g", "d", "v").collect()[0]
    assert r["peak"] == 15.0 and r["max_dd"] == 9.0
    assert abs(r["max_dd_frac"] - 0.6) < 1e-9


def test_rsi_monotone_extremes(spark):
    up = tmp.rsi(_series(spark, range(20)), "g", "d", "v", period=5)
    vals = [r["rsi"] for r in up.orderBy("d").collect()]
    assert vals[:5] == [None] * 5  # warm-up: first row + 4 deltas
    assert all(v == 100.0 for v in vals[5:])
    down = tmp.rsi(_series(spark, range(20, 0, -1)), "g", "d", "v", period=5)
    dvals = [r["rsi"] for r in down.orderBy("d").collect()]
    assert all(v == 0.0 for v in dvals[5:])


def test_bollinger_constant_and_known_sd(spark):
    # constant series: sd 0 -> bands collapse, pct_b NULL
    r = tmp.bollinger(_series(spark, [5] * 25), "g", "d", "v", period=20)
    last = r.orderBy("d").collect()[-1]
    assert last["ma"] == 5.0 and last["upper"] == 5.0
    assert last["pct_b"] is None
    # alternating 0/10 over 20 rows: mean 5, sample sd sqrt(25*20/19)
    alt = tmp.bollinger(
        _series(spark, [0, 10] * 12), "g", "d", "v", period=20
    ).orderBy("d").collect()[-1]
    sd = math.sqrt(500.0 / 19.0)
    assert abs(alt["ma"] - 5.0) < 1e-6
    assert abs(alt["upper"] - (5 + 2 * sd)) < 1e-4


def test_var_cvar_hand(spark):
    # 1..100 at q=.95: VaR = 95th order stat = 95, tail mean
    # (95+...+100)/6 = 97.5
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1, 101)], "g string, v double"
    )
    r = tmp.var_cvar(df, "v", "g", q=0.95).collect()[0]
    assert r["var_q"] == 95.0 and r["n_tail"] == 6
    assert abs(r["cvar_q"] - 97.5) < 1e-9


def test_pettitt_detects_level_shift(spark):
    shifted = [1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 11, 12, 11, 12, 11, 12, 11,
               12, 11, 12]
    r = tmp.pettitt_test(_series(spark, shifted), "g", "d", "v").collect()[0]
    # max|U| at the break (index 9), K = 2*sum(first-10 ranks) - 10*21
    # first 10 ranks are midranks of {1,2}: 3 and 8 -> S_10 = 55
    assert r["change_at"] == 9
    assert r["k_stat"] == abs(2 * 55.0 - 10 * 21.0)
    assert r["p_approx"] < 0.01
    flat = tmp.pettitt_test(
        _series(spark, [1, 2] * 10), "g", "d", "v"
    ).collect()[0]
    assert flat["p_approx"] > 0.5


def test_adf_and_halflife_on_ar1(spark):
    # strongly mean-reverting AR(1) with phi=0.5 planted exactly:
    # y_{t+1} = 0.5*y_t with injected resets to keep variance
    vals, y = [], 64.0
    for i in range(60):
        vals.append(y)
        y = y * 0.5 if y > 0.125 else 64.0
    df = _series(spark, vals)
    r = tmp.ar1_halflife(df, "g", "d", "v").collect()[0]
    # dominated by the 0.5 decay steps -> phi near 0.5, hl near 1
    assert 0.3 < r["phi"] < 0.7
    assert r["half_life"] is not None
    adf = tmp.adf_test(df, "g", "d", "v").collect()[0]
    assert adf["t_stat"] < -2.86 and adf["stationary_5pct"]
    # deterministic +1 trend: zero residuals -> se 0 -> NULL t; the
    # gate must NOT claim stationarity
    walk = _series(spark, [float(i) for i in range(40)])
    aw = tmp.adf_test(walk, "g", "d", "v").collect()[0]
    assert aw["stationary_5pct"] is not True
    assert aw["beta"] == 0.0


def test_vwap_hand(spark):
    df = spark.createDataFrame(
        [("m1", 10.0, 2.0), ("m1", 20.0, 6.0), ("m2", 5.0, 1.0)],
        "b string, p double, q double",
    )
    got = {r["bucket"]: r for r in tmp.vwap(df, "b", "p", "q").collect()}
    assert got["m1"]["volume"] == 8.0
    assert abs(got["m1"]["vwap"] - (10 * 2 + 20 * 6) / 8.0) < 1e-9
    assert got["m2"]["vwap"] == 5.0


def _ts_series(spark, vals, g="s"):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(g, base + dt.timedelta(days=i), float(v)) for i, v in enumerate(vals)],
        "g string, ts timestamp, v double",
    )


def test_sax_symbols_ramp_and_flat(spark):
    ramp = tmp.sax_symbols(
        _ts_series(spark, range(32)), "g", "ts", "v", w=8
    ).collect()[0]
    # monotone ramp: letters non-decreasing a..d
    assert ramp["sax"] == "".join(sorted(ramp["sax"]))
    assert ramp["sax"][0] == "a" and ramp["sax"][-1] == "d"
    flat = tmp.sax_symbols(
        _ts_series(spark, [7] * 32), "g", "ts", "v", w=8
    ).collect()[0]
    # zero sd -> z = 0 everywhere -> all segments 'c' (0 < z <= .6745)
    assert flat["sax"] == "cccccccc"


def test_spectral_entropy_pure_tone_vs_flatish(spark):
    import math

    tone = [10 + 5 * math.sin(2 * math.pi * 2 * t / 32) for t in range(32)]
    r = tmp.spectral_entropy(
        _ts_series(spark, tone), "g", "ts", "v"
    ).collect()[0]
    assert r["peak_k"] == 2
    assert r["peak_frac"] > 0.99 and r["h_norm"] < 0.05
    # single-harmonic periodogram: k_used = 1 -> h/ln(1) is 0/0; must
    # surface NULL, not NaN (ADVICE r12)
    r1 = tmp.spectral_entropy(
        _ts_series(spark, [1.0, 2.0, 3.0]), "g", "ts", "v", max_k=1
    ).collect()[0]
    assert r1["k_used"] == 1 and r1["h_norm"] is None


def test_croston_profile_patterns(spark):
    # dense steady demand: ADI 1, tiny cv2 -> smooth
    dense = tmp.croston_profile(
        _ts_series(spark, [5, 5, 5, 6, 5, 5, 6, 5] * 4), "g", "ts", "v"
    ).collect()[0]
    assert dense["pattern"] == "smooth" and dense["adi"] == 1.0
    # sparse constant demand: many zero buckets -> intermittent
    sparse_vals = [0, 0, 0, 4, 0, 0, 0, 4] * 4
    sp = tmp.croston_profile(
        _ts_series(spark, sparse_vals), "g", "ts", "v"
    ).collect()[0]
    assert sp["pattern"] == "intermittent" and sp["adi"] == 4.0
    assert abs(sp["forecast"] - 1.0) < 1e-6  # 4 units every 4 buckets


def test_ts_features_known_shape(spark):
    # strict alternation 0,10,0,10...: every interior point a turning
    # point, acf1 ~ -1, slope ~ 0, longest flat 1
    r = tmp.ts_features(
        _ts_series(spark, [0, 10] * 16), "g", "ts", "v"
    ).collect()[0]
    assert r["turning_rate"] == 1.0
    assert r["acf1"] < -0.99
    # exact slope of the planted alternation: 80/2728 ~ 0.0293
    assert abs(r["trend_slope"] - 80.0 / 2728.0) < 1e-4
    assert r["longest_flat"] == 1
    # constant series: sd 0, flat run = n
    c = tmp.ts_features(
        _ts_series(spark, [3] * 20), "g", "ts", "v"
    ).collect()[0]
    assert c["sd"] == 0.0 and c["longest_flat"] == 20


def test_rsi_flat_series_is_neutral(spark):
    flat = tmp.rsi(_series(spark, [7] * 12), "g", "d", "v", period=5)
    vals = [r["rsi"] for r in flat.orderBy("d").collect()]
    assert all(v == 50.0 for v in vals[5:])


# ---------------------------------------------------------------------------
# round-14 finance tier


def _series_r14(spark, vals, vols=None):
    rows = [
        ("k", i, float(v), int(vols[i]) if vols else 1)
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "g string, o int, v double, vol int"
    )


def test_sortino_all_up_vs_mixed(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import (
        sortino_ratio,
    )

    # strictly rising curve: zero downside -> NULL sortino (dd = 0)
    up = sortino_ratio(
        _series_r14(spark, [100, 110, 121, 133.1]), "g", "o", "v"
    ).collect()[0]
    assert up["n_returns"] == 3 and up["downside_dev"] == 0.0
    assert up["sortino"] is None
    # returns +10%, -10%: mean ~0, dd = sqrt(0.01/2)
    mixed = sortino_ratio(
        _series_r14(spark, [100, 110, 99]), "g", "o", "v"
    ).collect()[0]
    assert abs(mixed["downside_dev"] - (0.01 / 2) ** 0.5) < 1e-4
    assert mixed["sortino"] < 0.1


def test_macd_constant_series_is_zero(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import macd

    rows = macd(_series_r14(spark, [50.0] * 30), "g", "o", "v").collect()
    assert len(rows) == 30
    assert all(r["macd"] == 0.0 and r["signal"] == 0.0 for r in rows)
    # a step up makes the fast EMA lead: macd > 0 right after the step
    stepped = macd(
        _series_r14(spark, [50.0] * 15 + [80.0] * 15), "g", "o", "v"
    ).collect()
    after = [r for r in stepped if r["o"] == 16][0]
    assert after["macd"] > 0 and after["histogram"] > 0


def test_macd_matches_pandas_ewm_recursion(spark):
    import numpy as np

    from from_superset_to_clickhouse_spark.operators.temporal import macd

    vals = [float(50 + ((i * 17) % 23) - 11) for i in range(40)]
    got = {
        r["o"]: (r["macd"], r["signal"])
        for r in macd(_series_r14(spark, vals), "g", "o", "v").collect()
    }

    def ema(xs, alpha):
        out = [xs[0]]
        for x in xs[1:]:
            out.append(alpha * x + (1 - alpha) * out[-1])
        return out

    f = ema(vals, 2.0 / 13.0)
    s = ema(vals, 2.0 / 27.0)
    m = [a - b for a, b in zip(f, s)]
    sig = ema(m, 2.0 / 10.0)
    for i in range(40):
        assert abs(got[i][0] - m[i]) < 1e-4, i
        assert abs(got[i][1] - sig[i]) < 1e-4, i
    assert np is not None


def test_stochastic_oscillator_extremes_and_warmup(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import (
        stochastic_oscillator,
    )

    vals = [float(i) for i in range(1, 31)]  # strictly rising
    rows = {
        r["o"]: r
        for r in stochastic_oscillator(
            _series_r14(spark, vals), "g", "o", "v"
        ).collect()
    }
    # warm-up: first 13 rows NULL %K
    assert all(rows[i]["pct_k"] is None for i in range(13))
    # rising series: current value IS the window max -> %K = 100
    assert all(rows[i]["pct_k"] == 100.0 for i in range(13, 30))
    assert rows[13]["pct_d"] is None and rows[15]["pct_d"] == 100.0
    # falling series pins %K at 0
    fall = {
        r["o"]: r["pct_k"]
        for r in stochastic_oscillator(
            _series_r14(spark, list(reversed(vals))), "g", "o", "v"
        ).collect()
    }
    assert all(fall[i] == 0.0 for i in range(13, 30))


def test_obv_hand_sequence(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import obv

    # values 10, 12, 12, 9, 15 with volumes 5, 3, 7, 2, 4
    # signed: 0, +3, 0, -2, +4 -> obv: 0, 3, 3, 1, 5
    got = [
        r["obv"]
        for r in obv(
            _series_r14(spark, [10, 12, 12, 9, 15], [5, 3, 7, 2, 4]),
            "g", "o", "v", "vol",
        ).orderBy("o").collect()
    ]
    assert got == [0, 3, 3, 1, 5]


def test_ulcer_flat_vs_underwater(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import (
        ulcer_index,
    )

    flat = ulcer_index(
        _series_r14(spark, [100.0] * 10), "g", "o", "v"
    ).collect()[0]
    assert flat["ulcer"] == 0.0 and flat["max_dd_pct"] == 0.0
    # peak 100 then five points at 80: dd = 0,20,20,20,20,20
    # ulcer = sqrt(5*400/6)
    uw = ulcer_index(
        _series_r14(spark, [100.0] + [80.0] * 5), "g", "o", "v"
    ).collect()[0]
    assert uw["max_dd_pct"] == 20.0
    assert abs(uw["ulcer"] - (2000.0 / 6.0) ** 0.5) < 1e-4


def test_garman_klass_hand_bar(spark):
    import datetime as dt
    import math as m

    from from_superset_to_clickhouse_spark.operators.temporal import (
        garman_klass,
    )

    t0 = dt.datetime(2024, 1, 1)
    # one bar: open 10 (first), high 20, low 8, close 16 (last)
    rows = [
        ("k", t0 + dt.timedelta(minutes=i), float(v), i)
        for i, v in enumerate([10, 20, 8, 16])
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, v double, e int"
    )
    r = garman_klass(df, "k", "ts", "v", "e").collect()[0]
    want = 0.5 * m.log(20 / 8) ** 2 - (2 * m.log(2) - 1) * m.log(
        16 / 10
    ) ** 2
    assert r["n_bars"] == 1
    assert abs(r["gk_var"] - want) < 1e-6


def test_permutation_entropy_monotone_vs_alternating(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import (
        permutation_entropy,
    )

    # strictly rising: a single ordinal pattern -> H = 0
    mono = permutation_entropy(
        _series_r14(spark, [float(i) for i in range(20)]), "g", "o", "v"
    ).collect()[0]
    assert mono["n_patterns"] == 1 and mono["h_norm"] == 0.0
    assert mono["n_windows"] == 18
    # up-down alternation: two patterns, each half the windows ->
    # H = ln2/ln6
    import math as m

    alt = permutation_entropy(
        _series_r14(spark, [float(i % 2) for i in range(20)]), "g", "o", "v"
    ).collect()[0]
    assert alt["n_patterns"] == 2
    assert abs(alt["h_norm"] - m.log(2) / m.log(6)) < 1e-6


def test_kpss_stationary_vs_trending(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import (
        kpss_test,
    )

    # noise-like mean-reverting series -> small eta, stationary on
    # (a short-period deterministic cycle would be adversarial: its
    # negative autocovariances collapse the Bartlett long-run var)
    osc = kpss_test(
        _series_r14(spark, [100.0 + ((i * 37) % 11 - 5.0) for i in range(40)]),
        "g", "o", "v",
    ).collect()[0]
    assert osc["stationary"] == 1 and osc["kpss_stat"] < 0.463
    # strong linear trend -> eta blows past the 5% cut
    tr = kpss_test(
        _series_r14(spark, [float(10 * i) for i in range(40)]),
        "g", "o", "v",
    ).collect()[0]
    assert tr["stationary"] == 0 and tr["kpss_stat"] > 0.463


def test_amihud_liquid_vs_illiquid(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import (
        amihud_illiquidity,
    )

    # same 1% moves, 100x the volume -> 100x smaller impact
    vals = [100.0, 101.0, 100.0, 101.0, 100.0]
    thin = amihud_illiquidity(
        _series_r14(spark, vals, [10] * 5), "g", "o", "v", "vol"
    ).collect()[0]
    deep = amihud_illiquidity(
        _series_r14(spark, vals, [1000] * 5), "g", "o", "v", "vol"
    ).collect()[0]
    assert thin["n"] == 4
    assert abs(thin["amihud_x1m"] / deep["amihud_x1m"] - 100.0) < 0.1


def test_cci_flat_and_breakout(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import cci

    # flat series: md = 0 -> NULL everywhere after warm-up too
    rows = cci(_series_r14(spark, [50.0] * 25), "g", "o", "v").collect()
    assert all(r["cci"] is None for r in rows)
    # constant then a jump: the jump row sits far above its window SMA
    jump = cci(
        _series_r14(spark, [50.0] * 24 + [60.0]), "g", "o", "v"
    ).orderBy("o").collect()
    assert jump[-1]["cci"] is not None and jump[-1]["cci"] > 100


def test_mfi_updays_vs_downdays(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import mfi

    up = [float(100 + i) for i in range(16)]
    r = mfi(
        _series_r14(spark, up, [10] * 16), "g", "o", "v", "vol"
    ).orderBy("o").collect()
    assert r[13]["mfi"] is None  # warm-up needs 14 deltas
    assert r[-1]["mfi"] == 100.0
    down = [float(100 - i) for i in range(16)]
    r2 = mfi(
        _series_r14(spark, down, [10] * 16), "g", "o", "v", "vol"
    ).orderBy("o").collect()
    assert r2[-1]["mfi"] == 0.0


def test_tracking_signal_biased_vs_oscillating(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import (
        tracking_signal,
    )

    # steady +2 drift: every naive error +2 -> TS = n (maximal bias)
    drift = tracking_signal(
        _series_r14(spark, [float(2 * i) for i in range(11)]),
        "g", "o", "v",
    ).collect()[0]
    assert drift["n"] == 10 and drift["cum_error"] == 20.0
    assert drift["tracking_signal"] == 10.0
    # alternation: errors cancel -> |TS| stays at/near the single
    # unpaired error (15 deltas: 8 up, 7 down -> TS exactly 1)
    osc = tracking_signal(
        _series_r14(spark, [100.0, 102.0] * 8), "g", "o", "v"
    ).collect()[0]
    assert abs(osc["tracking_signal"]) <= 1.0


def test_u_chart_stable_vs_spiked_rate(spark):
    import datetime as dt

    from from_superset_to_clickhouse_spark.operators.temporal import u_chart

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 10 days, 20 users each, 2 defects/day -> u = .1 everywhere
    for day in range(10):
        for u in range(20):
            rows.append(
                ("k", t0 + dt.timedelta(days=day, minutes=u), u < 2, u)
            )
    # spiked day: same 20 users, 15 defects
    for u in range(20):
        rows.append(
            ("k", t0 + dt.timedelta(days=10, minutes=u), u < 15, u)
        )
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, defect boolean, user_id int"
    )
    r = u_chart(df, "k", "ts", "defect", "user_id").collect()[0]
    assert r["n_buckets"] == 11 and r["n_out"] >= 1


def test_np_chart_counts_and_partial_chunk_drop(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import (
        np_chart,
    )

    # 2.5 subgroups of 4: the trailing pair is dropped; defect
    # pattern 1/4 in each full subgroup -> np_bar 1, no alarms
    rows = [("k", i, i % 4 == 0) for i in range(10)]
    r = np_chart(
        spark.createDataFrame(rows, "k string, o int, f boolean"),
        "k", "o", "f", subgroup_size=4,
    ).collect()[0]
    assert r["n_subgroups"] == 2 and r["np_bar"] == 1.0
    assert r["n_out"] == 0


def test_ewma_chart_shift_detection(spark):
    from from_superset_to_clickhouse_spark.operators.temporal import (
        ewma_chart,
    )

    # stable noise then a persistent +3sigma-ish level shift the
    # EWMA accumulates into an alarm
    base = [100.0 + ((i * 37) % 7 - 3.0) / 10.0 for i in range(30)]
    shifted = base + [102.0 + ((i * 37) % 7 - 3.0) / 10.0
                      for i in range(10)]
    stable = ewma_chart(
        _series_r14(spark, base), "g", "o", "v"
    ).collect()[0]
    alarm = ewma_chart(
        _series_r14(spark, shifted), "g", "o", "v"
    ).collect()[0]
    assert stable["n_out"] == 0
    assert alarm["n_out"] >= 5


def test_pivot_points_hand_bar(spark):
    import datetime as dt

    from from_superset_to_clickhouse_spark.operators.temporal import (
        pivot_points,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("k", t0 + dt.timedelta(minutes=i), float(v), i)
        for i, v in enumerate([10, 20, 8, 16])
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, v double, e int"
    )
    r = pivot_points(df, "k", "ts", "v", "e").collect()[0]
    p = (20 + 8 + 16) / 3.0
    assert abs(r["pivot"] - p) < 1e-6
    assert abs(r["r1"] - (2 * p - 8)) < 1e-6
    assert abs(r["s1"] - (2 * p - 20)) < 1e-6
    assert abs(r["r2"] - (p + 12)) < 1e-6
    assert abs(r["s2"] - (p - 12)) < 1e-6


def test_entropy_rate_deterministic_vs_uniform(spark):
    import datetime as dt
    import math as m

    from from_superset_to_clickhouse_spark.operators.temporal import (
        entropy_rate,
    )

    t0 = dt.datetime(2024, 1, 1)
    # deterministic a->b->a->b chain: H = 0, predictability 1
    det = [
        (1, t0 + dt.timedelta(minutes=i), "ab"[i % 2], i)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        det, "user_id int, ts timestamp, event_type string, event_id int"
    )
    r = entropy_rate(df, "user_id", "ts", "event_type").collect()[0]
    assert r["h_rate"] == 0.0 and r["predictability"] == 1.0
    # 2-state uniform alternation pattern abba... gives mixed rows
    uni = [
        (1, t0 + dt.timedelta(minutes=i), "abba"[i % 4], i)
        for i in range(41)
    ]
    df2 = spark.createDataFrame(
        uni, "user_id int, ts timestamp, event_type string, event_id int"
    )
    r2 = entropy_rate(df2, "user_id", "ts", "event_type").collect()[0]
    assert abs(r2["h_rate"] - m.log(2.0)) < 0.01
    assert r2["predictability"] < 0.05


def test_heikin_ashi_recursion_hand(spark):
    import datetime as dt

    from from_superset_to_clickhouse_spark.operators.temporal import (
        heikin_ashi,
    )

    t0 = dt.datetime(2024, 1, 1)
    # two bars: day1 values 10 (single tick), day2 values 20
    rows = [
        ("k", t0, 10.0, 0),
        ("k", t0 + dt.timedelta(days=1), 20.0, 1),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, v double, e int"
    )
    out = heikin_ashi(df, "k", "ts", "v", "e").orderBy("bar_start").collect()
    # bar1: O=H=L=C=10 -> hac 10, hao seed (10+10)/2 = 10
    assert out[0]["ha_open"] == 10.0 and out[0]["ha_close"] == 10.0
    # bar2: hac 20; hao = (hao1 + hac1)/2 = 10
    assert out[1]["ha_close"] == 20.0 and out[1]["ha_open"] == 10.0
    assert out[1]["ha_high"] == 20.0 and out[1]["ha_low"] == 10.0
