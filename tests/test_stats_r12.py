"""Round-12 stats additions: hand-computed references."""

import math

from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.operators import stats as st


def test_ordinal_assoc_hand_counts(spark):
    # x = [1,2,2,3], y = [1,2,3,3] ordered by o:
    # 6 pairs -> 4 concordant, 1 tied-x, 1 tied-y, 0 discordant
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 2.0, 2.0), (3, 2.0, 3.0), (4, 3.0, 3.0)],
        "o int, x double, y double",
    )
    r = st.ordinal_assoc(df, "o", "x", "y").collect()[0]
    assert (r["n"], r["n_pairs"], r["s"]) == (4, 6, 4)
    assert (r["tied_x"], r["tied_y"], r["pairs_xy"]) == (1, 1, 4)
    assert r["gamma"] == 1.0
    assert r["d_yx"] == 0.8 and r["d_xy"] == 0.8


def test_ordinal_assoc_reversal(spark):
    df = spark.createDataFrame(
        [(i, float(i), float(-i)) for i in range(5)],
        "o int, x double, y double",
    )
    r = st.ordinal_assoc(df, "o", "x", "y").collect()[0]
    assert r["gamma"] == -1.0 and r["d_yx"] == -1.0


def test_mantel_haenszel_hand_or(spark):
    # stratum 1: a=4 b=1 c=2 d=3 ; stratum 2: a=2 b=3 c=1 d=4
    # OR_MH = (4*3/10 + 2*4/10) / (1*2/10 + 3*1/10) = 2.0/0.5 = 4
    rows = []
    for s, (a, b, c, d) in [(1, (4, 1, 2, 3)), (2, (2, 3, 1, 4))]:
        rows += [(s, "a", 1)] * a + [(s, "a", 0)] * b
        rows += [(s, "b", 1)] * c + [(s, "b", 0)] * d
    df = spark.createDataFrame(rows, "st int, g string, y int")
    r = st.mantel_haenszel(df, "st", "g", "y").collect()[0]
    assert r["k"] == 2 and r["n"] == 20
    assert abs(r["or_mh"] - 4.0) < 1e-5
    assert r["p_value"] is not None


def test_cochran_armitage_trend_vs_flat(spark):
    rows = []
    for dose, rate in [(0, 0.2), (1, 0.5), (2, 0.8)]:
        pos = int(rate * 100)
        rows += [(float(dose), 1)] * pos + [(float(dose), 0)] * (100 - pos)
    df = spark.createDataFrame(rows, "dose double, y int")
    r = st.cochran_armitage(df, "dose", "y").collect()[0]
    assert r["k"] == 3 and r["n"] == 300 and r["n_pos"] == 150
    assert r["z"] > 8 and r["p_value"] < 1e-6
    flat = spark.createDataFrame(
        [(float(d), y) for d in range(3) for y in ([1] * 30 + [0] * 70)],
        "dose double, y int",
    )
    rf = st.cochran_armitage(flat, "dose", "y").collect()[0]
    assert abs(rf["t"]) < 1e-6 and rf["p_value"] > 0.99


def test_partial_corr_additive_confounder(spark):
    # y = x + z with x independent of z: controlling z recovers r ~ 1
    rows = [
        (float(i % 10), float(i % 10) + float(i // 10), float(i // 10))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    r = st.partial_corr(df, "x", "y", "z").collect()[0]
    assert r["n"] == 100
    assert abs(r["r_partial"] - 1.0) < 1e-6
    assert abs(r["r_xz"]) < 1e-6


def test_brunner_munzel_published_example(spark):
    # Brunner & Munzel (2000) worked example (also lawstat's):
    # p_hat = 0.788961, W = 3.1375, df ~ 17.68
    x = [1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 4, 1, 1]
    y = [3, 3, 4, 3, 1, 2, 3, 1, 1, 5, 4]
    rows = [("a", float(v)) for v in x] + [("b", float(v)) for v in y]
    df = spark.createDataFrame(rows, "g string, v double")
    r = st.brunner_munzel(df, "v", "g").collect()[0]
    assert (r["n_a"], r["n_b"]) == (14, 11)
    assert abs(r["p_hat"] - 0.788961) < 1e-6
    assert abs(r["w_stat"] - 3.137467) < 1e-4
    assert abs(r["df_approx"] - 17.6828) < 1e-3


def test_anderson_darling_rejects_uniform_accepts_normal(spark):
    import random

    uni = spark.createDataFrame(
        [(float(i % 97) / 97.0,) for i in range(2000)], "v double"
    )
    ru = st.anderson_darling(uni, "v").collect()[0]
    assert ru["a2_star"] > 10 and ru["p_value"] < 1e-4
    rng = random.Random(7)
    norm = spark.createDataFrame(
        [(rng.gauss(10.0, 2.0),) for _ in range(2000)], "v double"
    )
    rn = st.anderson_darling(norm, "v").collect()[0]
    assert rn["a2_star"] < 2 and rn["p_value"] > 0.01


def test_fligner_killeen_equal_vs_unequal_spread(spark):
    eq = [("g1", float(i % 10)) for i in range(200)] + [
        ("g2", float(i % 10) + 5) for i in range(200)
    ]
    req = st.fligner_killeen(
        spark.createDataFrame(eq, "g string, v double"), "v", "g"
    ).collect()[0]
    # identical shapes, shifted location: FK is location-free -> chi2 0
    assert req["chi2"] == 0.0 and req["p_value"] > 0.9
    uneq = [("g1", float(i % 5)) for i in range(200)] + [
        ("g2", float((i * 7) % 40)) for i in range(200)
    ]
    run = st.fligner_killeen(
        spark.createDataFrame(uneq, "g string, v double"), "v", "g"
    ).collect()[0]
    assert run["chi2"] > 50 and run["p_value"] < 1e-6


def test_degenerate_inputs_surface_null_not_nan(spark):
    """NaN poisons cross-engine parity (DuckDB errors on CAST(NaN AS
    BIGINT)); degenerate inputs must surface NULL instead: singleton
    strata (MH variance), n=1 sample (AD sd), one-row arm (BM
    variance), single group (FK dof 0)."""
    import math

    mh = st.mantel_haenszel(
        spark.createDataFrame([(1, "a", 1), (2, "b", 0)], "st int, g string, y int"),
        "st", "g", "y",
    ).collect()[0]
    assert mh["chi2"] is None or not math.isnan(mh["chi2"])
    ad = st.anderson_darling(
        spark.createDataFrame([(5.0,)], "v double"), "v"
    ).collect()[0]
    assert ad["a2"] is None
    # constant column, n >= 2: sd = 0 makes z = 0/0 = NaN; the clamp
    # must not resurrect it as a finite phi (ADVICE r12)
    adc = st.anderson_darling(
        spark.createDataFrame([(5.0,), (5.0,), (5.0,)], "v double"), "v"
    ).collect()[0]
    assert adc["a2"] is None and adc["a2_star"] is None
    bm = st.brunner_munzel(
        spark.createDataFrame(
            [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double"
        ),
        "v", "g",
    ).collect()[0]
    assert bm["w_stat"] is None or not math.isnan(bm["w_stat"])
    fk = st.fligner_killeen(
        spark.createDataFrame(
            [("g1", float(v)) for v in range(10)], "g string, v double"
        ),
        "v", "g",
    ).collect()[0]
    assert fk["k"] == 1 and fk["p_value"] is None
