"""Round-15 QUEUE operator reference tests (r16-window candidates)."""

import datetime as dt
import math
import random

import pytest

import from_superset_to_clickhouse_spark.operators.stats as st
import from_superset_to_clickhouse_spark.operators.temporal as tmp
import from_superset_to_clickhouse_spark.operators.text as txt


def _series(spark, vals, key="k"):
    rows = [(key, i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "g string, o int, v double")


def test_van_der_waerden_detects_shift_not_null(spark):
    rng = random.Random(1)
    rows = [(g, rng.gauss(gi * 1.2, 1)) for gi, g in enumerate("ab")
            for _ in range(40)]
    r = st.van_der_waerden(
        spark.createDataFrame(rows, "g string, v double"), "g", "v"
    ).collect()[0]
    assert r["k"] == 2 and r["p_value"] < 0.01
    rng0 = random.Random(1)  # calibration-checked benign null draw
    rows0 = [(g, rng0.gauss(0, 1)) for g in "ab" for _ in range(40)]
    r0 = st.van_der_waerden(
        spark.createDataFrame(rows0, "g string, v double"), "g", "v"
    ).collect()[0]
    assert r0["p_value"] > 0.05


def test_klotz_and_siegel_tukey_detect_scale(spark):
    rng = random.Random(2)
    rows = [("a", rng.gauss(0, 1)) for _ in range(50)] + [
        ("b", rng.gauss(0, 4)) for _ in range(50)]
    df = spark.createDataFrame(rows, "g string, v double")
    assert st.klotz_test(df, "g", "a", "b", "v").collect()[0][
        "reject_5pct"] == 1
    assert st.siegel_tukey(df, "g", "a", "b", "v").collect()[0][
        "reject_5pct"] == 1


def test_siegel_tukey_zigzag_hand(spark):
    # N=5 sorted values: zigzag ranks 1,4,5,3,2 (bottom/top alternate)
    rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0), ("b", 5.0)]
    r = st.siegel_tukey(
        spark.createDataFrame(rows, "g string, v double"),
        "g", "a", "b", "v",
    ).collect()[0]
    # a holds values 1,2 -> zigzag ranks 1 + 4 = 5
    assert r["w_stat"] == 5.0


def test_lepage_components_match_singles(spark):
    rng = random.Random(3)
    rows = [("a", rng.gauss(0, 1)) for _ in range(30)] + [
        ("b", rng.gauss(2, 3)) for _ in range(30)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = st.lepage_test(df, "g", "a", "b", "v").collect()[0]
    assert abs(r["l_stat"] - (r["w_part"] ** 2 + r["a_part"] ** 2)) < 1e-4
    assert r["reject_5pct"] == 1  # planted location AND scale shift


def test_theil_u_perfect_forecastability(spark):
    # constant series: naive error 0 -> U1 = 0; U2 NULL (0/0 guarded)
    r = tmp.theil_u(_series(spark, [5.0] * 20), "g", "o", "v").collect()[0]
    assert r["u1"] == 0.0 and r["u2"] is None
    # random walk: SMA lags; U2 > 1 typically -- just sanity-run
    rng = random.Random(4)
    vals, x = [], 100.0
    for _ in range(50):
        x += rng.gauss(0, 1)
        vals.append(x)
    r2 = tmp.theil_u(_series(spark, vals), "g", "o", "v").collect()[0]
    assert r2["u1"] is not None and r2["u2"] is not None


def test_arch_lm_detects_volatility_clustering(spark):
    rng = random.Random(5)
    # GARCH-ish: alternating volatility regimes of 10
    vals, x = [], 100.0
    for t in range(240):
        sigma = 3.0 if (t // 30) % 2 == 0 else 0.3
        x += rng.gauss(0, sigma)
        vals.append(max(x, 1.0))
    r = tmp.arch_lm(_series(spark, vals), "g", "o", "v").collect()[0]
    assert r["reject_5pct"] == 1
    # iid returns: no clustering
    vals2 = [100.0]
    for _ in range(239):
        vals2.append(vals2[-1] * (1 + rng.gauss(0, 0.01)))
    r2 = tmp.arch_lm(_series(spark, vals2), "g", "o", "v").collect()[0]
    assert r2["reject_5pct"] == 0


def test_variance_ratio_trend_vs_meanreversion(spark):
    rng = random.Random(6)
    # strong momentum: VR > 1
    vals, x, drift = [], 0.0, 0.0
    for _ in range(200):
        drift = 0.95 * drift + rng.gauss(0, 1)
        x += drift
        vals.append(x)
    r = tmp.variance_ratio(_series(spark, vals), "g", "o", "v").collect()[0]
    assert r["vr"] > 1.5 and r["reject_5pct"] == 1


def test_g_chart_flags_long_gap(spark):
    t0 = dt.datetime(2024, 1, 1)
    days = [0, 1, 2, 3, 4, 5, 6, 7, 40]   # one 33-day gap
    rows = [("k", t0 + dt.timedelta(days=d)) for d in days]
    r = tmp.g_chart(
        spark.createDataFrame(rows, "k string, ts timestamp"), "k", "ts"
    ).collect()[0]
    assert r["n_gaps"] == 8 and r["n_out"] == 1


def test_kama_adapts_to_trend(spark):
    # pure trend: ER = 1 -> sc = fast alpha; kama hugs the series
    vals = [float(i) for i in range(30)]
    out = [r["kama"] for r in tmp.kama(
        _series(spark, vals), "g", "o", "v", er_period=5
    ).orderBy("o").collect()]
    assert out[3] is None                   # warm-up
    assert abs(out[-1] - vals[-1]) < 2.0    # tracks the trend closely
    # flat + noise: kama stays put (slow alpha)
    rng = random.Random(7)
    vals2 = [50.0 + rng.uniform(-1, 1) for _ in range(30)]
    out2 = [r["kama"] for r in tmp.kama(
        _series(spark, vals2), "g", "o", "v", er_period=5
    ).orderBy("o").collect()]
    assert abs(out2[-1] - 50.0) < 2.0


def test_trix_reference_recursion(spark):
    rng = random.Random(8)
    vals = [50 + rng.gauss(0, 2) for _ in range(25)]
    out = tmp.trix(_series(spark, vals), "g", "o", "v", period=5
                   ).orderBy("o").collect()
    # reference: seeded EMA recursion applied three times
    q = 2.0**20
    g = [math.floor(v * q) / q for v in vals]
    al = 2.0 / 6.0

    def ema(xs):
        out, e = [], None
        for x in xs:
            e = x if e is None else al * x + (1 - al) * e
            out.append(e)
        return out

    e3 = ema(ema(ema(g)))
    for i in range(1, len(vals)):
        ref = 10000.0 * (e3[i] - e3[i - 1]) / e3[i - 1]
        assert abs(out[i]["trix"] - ref) < 1e-3, i


def test_coppock_reference(spark):
    rng = random.Random(9)
    vals = [100 + rng.gauss(0, 3) for _ in range(25)]
    out = tmp.coppock_curve(
        _series(spark, vals), "g", "o", "v", roc1=8, roc2=6, wma_period=5
    ).orderBy("o").collect()
    q = 2.0**20
    gv = [math.floor(v * q) / q for v in vals]
    rc = []
    for i in range(len(gv)):
        if i >= 8:
            r1 = math.floor(100.0 * (gv[i] - gv[i - 8]) / gv[i - 8] * q) / q
            r2 = math.floor(100.0 * (gv[i] - gv[i - 6]) / gv[i - 6] * q) / q
            rc.append(r1 + r2)
        else:
            rc.append(None)
    for i in range(len(gv)):
        window = rc[max(0, i - 4):i + 1]
        if i >= 12 and all(x is not None for x in window):
            ref = sum(w * (j + 1) for j, w in enumerate(window)) / 15.0
            assert abs(out[i]["coppock"] - ref) < 1e-4, i
        elif i < 12:
            assert out[i]["coppock"] is None


def test_sample_entropy_regular_vs_random(spark):
    # strict periodic series: templates always match -> sampen ~ 0
    vals = [float(i % 4) * 10 for i in range(40)]
    r = tmp.sample_entropy(_series(spark, vals), "g", "o", "v").collect()[0]
    assert r["sampen"] is not None and r["sampen"] < 0.2
    rng = random.Random(10)
    vals2 = [rng.uniform(0, 100) for _ in range(40)]
    r2 = tmp.sample_entropy(
        _series(spark, vals2), "g", "o", "v").collect()[0]
    assert r2["sampen"] is None or r2["sampen"] > 0.5


def test_vocabulary_richness_hand(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat the end")],
        "doc_id int, text string",
    )
    r = txt.vocabulary_richness(docs).collect()[0]
    # N=8, types=6, hapax=5, sum m^2 = 9 + 5*1 = 14
    assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (8, 6, 5)
    assert abs(r["yules_k"] - 10000.0 * (14 - 8) / 64.0) < 1e-6


def test_rate_ratio_exact_binomial(spark):
    # equal exposures: p = two-sided exact binomial(o1+o2, 1/2) test
    df = spark.createDataFrame(
        [("a", 8, 10.0), ("ref", 2, 10.0)], "g string, o int, e double"
    )
    r = st.rate_ratio_test(df, "g", "o", "e", "ref").collect()[0]
    assert r["rr"] == 4.0
    # exact: sum over x of C(10,x)/2^10 where pmf(x) <= pmf(8)
    from math import comb

    pm = [comb(10, x) for x in range(11)]
    p_ref = sum(w for w in pm if w <= pm[8]) / 2.0**10
    assert abs(r["p_two_sided"] - p_ref) < 1e-4


def test_weibull_mrr_recovers_parameters(spark):
    rng = random.Random(11)
    shape, scale = 1.7, 42.0
    ts = [scale * (-math.log(1 - rng.random())) ** (1 / shape)
          for _ in range(600)]
    r = st.weibull_mrr(
        spark.createDataFrame([(t,) for t in ts], "t double"), "t"
    ).collect()[0]
    assert abs(r["shape"] - shape) < 0.25
    assert abs(r["scale"] - scale) < 4.0
    assert r["r2"] > 0.97


def test_ultimate_osc_and_ichimoku_and_elder_sanity(spark):
    rng = random.Random(12)
    t0 = dt.datetime(2024, 1, 1)
    rows, price = [], 100.0
    for d in range(40):
        for i in range(4):
            price += rng.gauss(0, 1.0)
            rows.append(("k", t0 + dt.timedelta(days=d, hours=6 * i),
                         price, i))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, tb int")
    uo = tmp.ultimate_oscillator(df, "k", "ts", "v", "tb",
                                 p1=3, p2=7, p3=14).orderBy("bar_start")
    last = uo.tail(1)[0]
    assert last["uo"] is not None and 0.0 <= last["uo"] <= 100.0
    ich = tmp.ichimoku(df, "k", "ts", "v", "tb", p1=3, p2=8)
    lastr = ich.orderBy("bar_start").tail(1)[0]
    assert lastr["span_a"] is not None and lastr["lagging"] is None
    er = tmp.elder_ray(df, "k", "ts", "v", "tb", period=7)
    e = er.orderBy("bar_start").tail(1)[0]
    assert e["bull_power"] >= e["bear_power"]  # H >= L always


def test_mood_scale_reference(spark):
    rng = random.Random(13)
    a = [rng.gauss(0, 1) for _ in range(30)]
    b = [rng.gauss(0, 3) for _ in range(30)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    r = st.mood_scale_test(
        spark.createDataFrame(rows, "g string, v double"),
        "g", "a", "b", "v",
    ).collect()[0]
    alln = sorted(a + b)
    rk = {v: i + 1 for i, v in enumerate(alln)}
    n = 60
    t_ref = sum((rk[v] - (n + 1) / 2) ** 2 for v in a)
    assert abs(r["t_stat"] - t_ref) < 1e-6
    assert r["reject_5pct"] == 1  # scale-different -> a's T far below E


def test_parabolic_sar_reference_recursion(spark):
    rng = random.Random(21)
    t0 = dt.datetime(2024, 1, 1)
    rows, price = [], 100.0
    for d in range(60):
        for i in range(3):
            price *= 1 + rng.gauss(0.0, 0.03)
            rows.append(("k", t0 + dt.timedelta(days=d, hours=8 * i),
                         price, i))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, tb int")
    out = [(r["sar"], r["direction"]) for r in tmp.parabolic_sar(
        df, "k", "ts", "v", "tb").orderBy("bar_start").collect()]
    # pure python reference over the gridded daily bars
    daily = {}
    for _, ts, v, tb in rows:
        d = ts.date()
        b = daily.setdefault(d, [v, v])
        b[0] = max(b[0], v)
        b[1] = min(b[1], v)
    q = 2.0**20
    bars = [(math.floor(h * q) / q, math.floor(l * q) / q)
            for h, l in (daily[d] for d in sorted(daily))]
    state = None
    ref = []
    for t, (h, l) in enumerate(bars):
        ph, pl = bars[t - 1] if t >= 1 else (None, None)
        ph2, pl2 = bars[t - 2] if t >= 2 else (None, None)
        if state is None:
            state = ("stash", h, l)
            ref.append((None, None))
            continue
        if state[0] == "stash":
            _, h1, l1 = state
            up = (h + l) > (h1 + l1)
            sar = min(l1, l) if up else max(h1, h)
            ep = max(h1, h) if up else min(l1, l)
            state = (up, sar, ep, 0.02)
        else:
            up, sar, ep, af = state
            raw = sar + af * (ep - sar)
            if up:
                s2 = min(raw, pl if pl is not None else raw,
                         pl2 if pl2 is not None else raw)
                if l < s2:
                    state = (False, ep, l, 0.02)
                else:
                    naf = min(af + 0.02, 0.2) if h > ep else af
                    state = (True, s2, max(ep, h), naf)
            else:
                s2 = max(raw, ph if ph is not None else raw,
                         ph2 if ph2 is not None else raw)
                if h > s2:
                    state = (True, ep, h, 0.02)
                else:
                    naf = min(af + 0.02, 0.2) if l < ep else af
                    state = (False, s2, min(ep, l), naf)
        ref.append((round(state[1], 6), "up" if state[0] else "down"))
    assert len(out) == len(ref)
    for i, (got, want) in enumerate(zip(out, ref)):
        assert got == want, (i, got, want)


def test_fisher_g_planted_tone_and_null(spark):
    rng = random.Random(31)
    rows = [("tone", i, 50 + 12 * math.sin(2 * math.pi * 4 * i / 28))
            for i in range(30)]
    rows += [("noise", i, rng.uniform(0, 100)) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, o int, v double")
    out = {r["g"]: r for r in tmp.periodogram_fixed(
        df, "g", "o", "v", n=28).collect()}
    assert out["tone"]["peak_j"] == 4
    assert out["tone"]["g_stat"] > 0.99 and out["tone"]["p_value"] < 1e-6
    assert out["tone"]["spec_entropy"] < 0.05
    assert out["noise"]["p_value"] > 0.01
    assert out["noise"]["spec_entropy"] > 0.5
    # short series are dropped by the fixed-length contract
    short = spark.createDataFrame(
        [("s", i, float(i)) for i in range(10)], "g string, o int, v double")
    assert tmp.periodogram_fixed(short, "g", "o", "v", n=28).count() == 0
