"""Round-12 ML-eval additions: hand-computed references for the
multi-class scorecard, HL calibration test, weighted kappa,
Krippendorff's alpha, signal-detection d', and Cohen's h."""

import math

import pytest
from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.operators import mleval as ml
from from_superset_to_clickhouse_spark.operators import stats as st


def test_probit_approx_known_quantiles(spark):
    df = spark.range(1).select(
        st.probit_approx(F.lit(0.975)).alias("a"),
        st.probit_approx(F.lit(0.5)).alias("b"),
        st.probit_approx(F.lit(0.01)).alias("c"),
        st.probit_approx(F.lit(1.5)).alias("d"),
    ).collect()[0]
    assert abs(df["a"] - 1.959964) < 1e-6
    assert abs(df["b"]) < 1e-9
    assert abs(df["c"] - (-2.326348)) < 1e-6
    assert df["d"] is None


def test_multiclass_prf_hand_confusion(spark):
    # true: a a a b b c ; pred: a a b b c c
    df = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "c"),
         ("c", "c")],
        "t string, p string",
    )
    got = {r["label"]: r for r in ml.multiclass_prf(df, "t", "p").collect()}
    assert (got["a"]["n_true"], got["a"]["n_pred"], got["a"]["tp"]) == (3, 2, 2)
    assert got["a"]["precision"] == 1.0
    assert got["a"]["recall"] == round(2 / 3, 6)
    assert got["b"]["precision"] == 0.5 and got["b"]["recall"] == 0.5
    assert got["b"]["f1"] == 0.5
    assert got["c"]["recall"] == 1.0 and got["c"]["precision"] == 0.5


def test_multiclass_prf_never_predicted_class_null_precision(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "b")], "t string, p string"
    )
    got = {r["label"]: r for r in ml.multiclass_prf(df, "t", "p").collect()}
    assert got["a"]["n_pred"] == 0 and got["a"]["precision"] is None
    assert got["a"]["recall"] == 0.0


def test_hosmer_lemeshow_calibrated_vs_biased(spark):
    # perfectly calibrated synthetic: at each score s (k/20), exactly
    # s fraction positives out of 100 -> chi2 == 0 (every cell O == E
    # up to the fxp floor), p ~ 1
    rows = []
    for k in range(1, 20):
        s = k / 20.0
        pos = int(round(s * 100))
        rows += [(s, 1)] * pos + [(s, 0)] * (100 - pos)
    df = spark.createDataFrame(rows, "score double, y int")
    r = ml.hosmer_lemeshow(df, "score", "y", g=10).collect()[0]
    assert r["n"] == 1900
    assert r["chi2"] < 1e-3
    assert r["dof"] == r["g_used"] - 2
    # flip labels at high scores -> big chi2
    df2 = df.select("score", (1 - F.col("y")).alias("y"))
    r2 = ml.hosmer_lemeshow(df2, "score", "y", g=10).collect()[0]
    assert r2["chi2"] > 100


def test_weighted_kappa_perfect_and_known(spark):
    perfect = spark.createDataFrame(
        [(i % 5, i % 5) for i in range(50)], "a int, b int"
    )
    assert ml.weighted_kappa(perfect, "a", "b").collect()[0]["kappa_w"] == 1.0
    # hand case on scale 0..2, n=4: pairs (0,0),(2,2),(0,2),(2,0)
    # w = ((i-j)/2)^2 -> O-disagreement = (0+0+1+1)/4 = .5
    # marginals a: {0:2,2:2}, b: {0:2,2:2}; E = sum w*ca*cb/n^2
    #   = (1*2*2 + 1*2*2)/16 = .5 -> kappa = 1 - .5/.5 = 0
    df = spark.createDataFrame(
        [(0, 0), (2, 2), (0, 2), (2, 0)], "a int, b int"
    )
    assert ml.weighted_kappa(df, "a", "b").collect()[0]["kappa_w"] == 0.0


def test_krippendorff_alpha_perfect_and_half(spark):
    # 10 units, 3 raters each, full agreement -> alpha == 1
    rows = [(u, r, "x" if u % 2 else "y") for u in range(10) for r in range(3)]
    df = spark.createDataFrame(rows, "u int, r int, c string")
    got = ml.krippendorff_alpha(df, "u", "r", "c").collect()[0]
    assert got["alpha"] == 1.0 and got["n_units"] == 10
    # single-rating units drop: add units rated once, alpha unchanged
    rows2 = rows + [(100 + i, 0, "z") for i in range(5)]
    df2 = spark.createDataFrame(rows2, "u int, r int, c string")
    got2 = ml.krippendorff_alpha(df2, "u", "r", "c").collect()[0]
    assert got2["alpha"] == 1.0 and got2["n_units"] == 10


def test_krippendorff_alpha_published_example(spark):
    # Krippendorff's canonical nominal example (2 observers, 10 units,
    # values a/b with one disagreement pattern): alpha = 1 - D_o/D_e
    # computed by hand below.
    labels = [("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"), ("b", "b"),
              ("b", "b"), ("b", "b"), ("b", "b"), ("b", "b"), ("a", "b")]
    rows = [(u, r, lab[r]) for u, lab in enumerate(labels) for r in range(2)]
    df = spark.createDataFrame(rows, "u int, r int, c string")
    got = ml.krippendorff_alpha(df, "u", "r", "c").collect()[0]
    # by hand: n=20, mismatched unit contributes o(m-o)/(m-1)=1 per
    # label -> D_o = 2/20 = .1 ; n_a=5, n_b=15 ->
    # D_e = (5*15 + 15*5)/(20*19) = 150/380
    expected = 1 - 0.1 / (150 / 380)
    assert abs(got["alpha"] - expected) < 1e-6


def test_dprime_symmetric_unit_case(spark):
    # hr = phi(0.5) and fa = phi(-0.5) -> d' = 1, c = 0
    import math

    def phi(x):
        return 0.5 * (1 + math.erf(x / math.sqrt(2)))

    npos = 200000
    tp = int(round(phi(0.5) * npos))
    fp = int(round(phi(-0.5) * npos))
    rows = (
        [(1.0, 1)] * tp + [(0.0, 1)] * (npos - tp)
        + [(1.0, 0)] * fp + [(0.0, 0)] * (npos - fp)
    )
    df = spark.createDataFrame(rows, "score double, y int")
    got = ml.dprime(df, "score", "y").collect()[0]
    assert abs(got["d_prime"] - 1.0) < 1e-3
    assert abs(got["criterion"]) < 1e-3


def test_dprime_extreme_rate_correction(spark):
    df = spark.createDataFrame(
        [(1.0, 1)] * 10 + [(0.0, 0)] * 10, "score double, y int"
    )
    got = ml.dprime(df, "score", "y").collect()[0]
    # perfect separation: corrected rates 1 - 1/20 and 1/20
    assert got["hit_rate"] == 0.95 and got["fa_rate"] == 0.05
    assert got["d_prime"] is not None and got["d_prime"] > 3


def test_cohens_h_known_values(spark):
    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("a", 0)] * 5 + [("b", 1)] * 5 + [("b", 0)] * 15,
        "g string, y int",
    )
    got = st.cohens_h(df, "y", "g").collect()[0]
    assert (got["n_a"], got["n_b"]) == (10, 20)
    expected = math.pi / 2 - math.pi / 3
    assert abs(got["h"] - expected) < 1e-6
