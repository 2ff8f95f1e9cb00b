"""Hand-oracle tests for the round-13 mleval/temporal/text operators."""

import datetime as dt
import math

from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.operators import mleval as ml
from from_superset_to_clickhouse_spark.operators import temporal as tmp
from from_superset_to_clickhouse_spark.operators import text as txt


def test_mcfadden_r2_separable_vs_null(spark):
    # strongly separable -> r2 well above 0; label independent of x
    # -> r2 near 0
    sep = [(1.0 if i % 2 else 0.0, 3.0 if i % 2 else -3.0) for i in range(200)]
    r = ml.mcfadden_r2(
        spark.createDataFrame(sep, "y double, x double"), "y", ["x"]
    ).collect()[0]
    assert r["mcfadden_r2"] > 0.5
    assert abs(r["log_loss_null"] - math.log(2)) < 1e-4
    ind = [(1.0 if i % 2 else 0.0, float((i * 7) % 5)) for i in range(200)]
    r2 = ml.mcfadden_r2(
        spark.createDataFrame(ind, "y double, x double"), "y", ["x"]
    ).collect()[0]
    assert abs(r2["mcfadden_r2"]) < 0.05


def test_feature_gain_informative_vs_noise(spark):
    # f1 fully determines y; f2 is constant (no information)
    rows = [
        (i % 2, "a" if i % 2 else "b", "k", str(i % 3))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "y int, f1 string, f2 string, f3 string")
    out = {r["feature"]: r for r in ml.feature_gain(df, "y", ["f1", "f2", "f3"]).collect()}
    assert out["f1"]["gini_gain"] > 0.49  # parent 0.5 -> children pure
    assert abs(out["f2"]["gini_gain"]) < 1e-6
    assert abs(out["f1"]["info_gain"] - math.log(2)) < 1e-3
    # y is independent of i%3 here only when balanced; allow small gain
    assert out["f3"]["gini_gain"] < 0.1


def _bar_series(spark, vals):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for day, (lo, hi) in enumerate(vals):
        # two ticks per day: first = open = lo, last = close = hi
        rows.append(("g", base + dt.timedelta(days=day, hours=1), 1000 + day * 10, lo))
        rows.append(("g", base + dt.timedelta(days=day, hours=20), 1001 + day * 10, hi))
    return spark.createDataFrame(rows, "k string, ts timestamp, eid long, v double")


def test_keltner_known_window(spark):
    # constant bars: high=12, low=8, close=12 -> typ = 32/3, tr = 4
    df = _bar_series(spark, [(8.0, 12.0)] * 12)
    out = sorted(
        tmp.keltner_channel(df, "k", "ts", "v", "eid", period=10, mult=2.0).collect(),
        key=lambda r: r["bucket_ts"],
    )
    assert out[8]["center"] is None  # frame not full yet
    typ = round((8.0 + 12.0 + 12.0) / 3.0, 6)
    for r in out[9:]:
        assert abs(r["center"] - typ) < 2e-6
        assert abs(r["atr"] - 4.0) < 1e-6
        assert abs(r["upper"] - (typ + 8.0)) < 1e-5


def test_donchian_breakout(spark):
    # flat 10 bars then a surge day -> breakout +1 on the surge
    vals = [(9.0, 11.0)] * 10 + [(11.0, 30.0)]
    df = _bar_series(spark, vals)
    out = sorted(
        tmp.donchian_channel(df, "k", "ts", "v", "eid", period=10).collect(),
        key=lambda r: r["bucket_ts"],
    )
    assert out[9]["upper"] == 11.0 and out[9]["lower"] == 9.0
    assert out[9]["breakout"] == 0
    assert out[10]["breakout"] == 1  # close 30 > prev upper 11
    assert out[10]["upper"] == 30.0


def test_rolling_beta_exact_relation(spark):
    # v = 2*m exactly -> beta 2, corr 1 once the frame fills
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("g", base + dt.timedelta(days=i), 2.0 * (10 + i % 5), float(10 + i % 5))
        for i in range(15)
    ]
    df = spark.createDataFrame(rows, "g string, d timestamp, v double, m double")
    out = sorted(
        tmp.rolling_beta(df, "g", "d", "v", "m", period=10).collect(),
        key=lambda r: r["d"],
    )
    assert out[8]["beta"] is None
    for r in out[9:]:
        assert abs(r["beta"] - 2.0) < 1e-5 and abs(r["corr"] - 1.0) < 1e-6


def test_seasonal_strength_pure_season_vs_noise(spark):
    base = dt.datetime(2024, 1, 1)
    # pure period-7 sawtooth -> f_seasonal ~ 1
    saw = [
        ("s", base + dt.timedelta(days=i), float(i % 7) * 10)
        for i in range(28)
    ]
    r = {
        x["key"]: x
        for x in tmp.seasonal_strength(
            spark.createDataFrame(saw, "k string, ts timestamp, v double"),
            "k", "ts", "v", period=7,
        ).collect()
    }
    assert r["s"]["f_seasonal"] > 0.95
    # aperiodic alternation at period 2 mismatched to 7 -> weak season
    alt = [
        ("a", base + dt.timedelta(days=i), float((i * 13) % 11))
        for i in range(28)
    ]
    r2 = {
        x["key"]: x
        for x in tmp.seasonal_strength(
            spark.createDataFrame(alt, "k string, ts timestamp, v double"),
            "k", "ts", "v", period=7,
        ).collect()
    }
    assert r2["a"]["f_seasonal"] < r["s"]["f_seasonal"]


def test_wer_corpus_known_edits(spark):
    rows = [
        (1, "the cat sat", "the cat sat"),      # 0 edits / 3
        (2, "the dog sat", "the cat sat"),      # 1 sub / 3
        (3, "cat sat", "the cat sat"),          # 1 del / 3
        (4, "the big cat sat", "the cat sat"),  # 1 ins / 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, cand string, ref string")
    r = txt.wer_corpus(df, "cand", "ref").collect()[0]
    assert r["n_pairs"] == 4
    assert r["total_edits"] == 3 and r["ref_tokens"] == 12
    assert r["wer"] == 0.25


def test_wer_word_not_char_distance(spark):
    # 'kitten'->'sitting' is char distance 3 but WORD distance 1
    df = spark.createDataFrame(
        [(1, "kitten", "sitting")], "doc_id long, cand string, ref string"
    )
    r = txt.wer_corpus(df, "cand", "ref").collect()[0]
    assert r["total_edits"] == 1 and r["wer"] == 1.0
    # empty candidate: all ref tokens deleted
    df2 = spark.createDataFrame(
        [(1, "", "a b c")], "doc_id long, cand string, ref string"
    )
    r2 = txt.wer_corpus(df2, "cand", "ref").collect()[0]
    assert r2["total_edits"] == 3 and r2["wer"] == 1.0


def test_ngram_compression_ratio_repetitive_vs_diverse(spark):
    rows = [
        (1, "abcd" * 25),       # 4-grams repeat heavily
        (2, "abcdefghijklmnopqrstuvwxyz"),  # all distinct
        (3, "ab"),              # shorter than n
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in txt.ngram_compression_ratio(df).collect()}
    assert out[1]["n_grams"] == 97 and out[1]["n_distinct"] == 4
    assert out[2]["ratio"] == 1.0
    assert out[3]["n_grams"] == 0 and out[3]["ratio"] is None


def test_bpe_pair_stats_known(spark):
    rows = [
        (1, "new york new york new york"),
        (2, "york city new york"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = txt.bpe_pair_stats(df, top_k=3).collect()
    by_rank = {r["rank"]: r for r in out}
    # 'new york' x4 beats 'york new' x2; singletons fall to cnt>=2 cut
    assert (by_rank[1]["left"], by_rank[1]["right"]) == ("new", "york")
    assert by_rank[1]["cnt"] == 4
    assert (by_rank[2]["left"], by_rank[2]["right"]) == ("york", "new")
    assert by_rank[2]["cnt"] == 2
    assert len(out) == 2


def test_yuen_trimmed_outlier_immunity(spark):
    from from_superset_to_clickhouse_spark.operators import stats as st

    # arm a centered 10, arm b centered 12 with two monster outliers
    # in a: the trimmed test still sees the location difference
    rows = []
    for i in range(50):
        rows.append(("a", 10.0 + (i % 5) / 10.0))
        rows.append(("b", 12.0 + (i % 5) / 10.0))
    rows += [("a", 1e6), ("a", -1e6)]
    df = spark.createDataFrame(rows, "arm string, v double")
    r = st.yuen_t(df, "v", "arm", trim=0.2).collect()[0]
    assert r["n_a"] == 52 and r["n_b"] == 50
    assert r["h_a"] == 52 - 2 * 10 and r["h_b"] == 30
    assert abs(r["tmean_a"] - r["tmean_b"] + 2.0) < 0.1
    assert r["t_stat"] < -20  # decisive despite the outliers
    assert r["df_approx"] is not None and r["df_approx"] > 10


def test_imr_chart_flags_spike(spark):
    import datetime as dt

    from from_superset_to_clickhouse_spark.operators import temporal as tp

    base = dt.datetime(2024, 1, 1)
    vals = [10.0, 10.2, 9.8, 10.1, 9.9] * 8 + [50.0]
    rows = [
        ("g", base + dt.timedelta(hours=i), i, v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, v double")
    r = tp.imr_chart(df, "k", "ts", "v", "eid").collect()[0]
    assert r["n"] == 41
    assert r["n_out"] == 1  # only the spike escapes the 2.66 MR band
    assert r["ucl"] > 10.0 > r["lcl"]


def test_ccf_known_lag(spark):
    import datetime as dt

    from from_superset_to_clickhouse_spark.operators import temporal as tp

    base = dt.datetime(2024, 1, 1)
    xs = [float((i * 7) % 13) for i in range(40)]
    # y_t = x_{t-2} + tiny noise -> ccf peaks at lag 2
    rows = []
    for i in range(2, 40):
        rows.append(
            (
                base + dt.timedelta(days=i),
                xs[i],
                xs[i - 2] + (0.01 if i % 2 else -0.01),
            )
        )
    df = spark.createDataFrame(rows, "d timestamp, x double, y double")
    out = {r["lag"]: r for r in tp.ccf(df, "d", "x", "y", max_lag=3).collect()}
    assert out[2]["ccf"] > 0.99
    assert abs(out[0]["ccf"]) < 0.6 and abs(out[1]["ccf"]) < 0.6
    assert out[3]["n"] == out[0]["n"] - 3


def test_script_profile_mixed_scripts(spark):
    rows = [
        (1, "hello world 123"),
        (2, "привет мир"),
        (3, "你好世界"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in txt.script_profile(df).collect()}
    # doc1: 10 latin, 3 digit, 2 space of 15
    assert out[1]["n_chars"] == 15
    assert abs(out[1]["latin_frac"] - 10 / 15) < 1e-6
    assert abs(out[1]["digit_frac"] - 3 / 15) < 1e-6
    assert out[1]["cjk_frac"] == 0.0 and out[1]["other_frac"] == 0.0
    assert abs(out[2]["cyrillic_frac"] - 9 / 10) < 1e-6
    assert out[3]["cjk_frac"] == 1.0
    assert out[4]["latin_frac"] is None  # empty doc -> NULLs


def test_capture_recapture_known(spark):
    # 100 rows; A flags 40, B flags 30, both flag 20
    rows = [
        (i < 40, 10 <= i < 40 or i >= 90) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "fa boolean, fb boolean")
    r = txt.capture_recapture(df, "fa", "fb").collect()[0]
    assert (r["n_a"], r["n_b"], r["n_both"]) == (40, 40, 30)
    chap = 41 * 41 / 31 - 1
    assert abs(r["chapman"] - chap) < 1e-4
    assert abs(r["coverage_a"] - 40 / chap) < 1e-4


def test_p_chart_shifted_bucket(spark):
    import datetime as dt

    from from_superset_to_clickhouse_spark.operators.temporal import (
        p_chart,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    for day in range(10):
        for i in range(200):
            # baseline 10% defects; day 7 surges to 50%
            bad = (i % 10 == 0) if day != 7 else (i % 2 == 0)
            rows.append(
                ("g", base + dt.timedelta(days=day, minutes=i), bad)
            )
    df = spark.createDataFrame(rows, "k string, ts timestamp, f boolean")
    r = p_chart(df, "k", "ts", "f", bucket="1 day").collect()[0]
    assert r["n_buckets"] == 10 and r["n_total"] == 2000
    assert abs(r["p_bar"] - (9 * 20 + 100) / 2000.0) < 1e-6
    assert r["n_out"] == 1  # only the surge day escapes the limits


def test_hampel_local_vs_global(spark):
    import datetime as dt

    from from_superset_to_clickhouse_spark.operators.temporal import (
        hampel_outliers,
    )

    base = dt.datetime(2024, 1, 1)
    # rising staircase with one local spike: a GLOBAL MAD gate would
    # flag the whole top of the ramp; Hampel flags only the spike
    vals = [float(i) + (i % 3) * 0.1 for i in range(40)]
    vals[20] = 200.0
    rows = [
        ("g", base + dt.timedelta(hours=i), i, v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, v double")
    r = hampel_outliers(df, "k", "ts", "v", "eid", window=7, k=3.0).collect()[0]
    assert r["n"] == 40
    assert r["n_flagged"] == 1
