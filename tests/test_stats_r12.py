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
