"""Round-11 statistics operators vs independently-computed references.

Every test recomputes the statistic in plain Python (or against a
published worked example) on a small planted dataset — the same
verify-against-a-second-implementation discipline as test_properties.
"""

import math

import pytest
from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.operators.stats import (
    bartlett_var,
    cliffs_delta,
    cohens_d,
    cronbach_alpha,
    durbin_watson,
    fleiss_kappa,
    grubbs_test,
    hhi_concentration,
    jarque_bera,
    kruskal_wallis,
    ljung_box,
    mood_median_test,
    odds_ratio_2x2,
    poisson_rate_test,
    sign_test,
    trimmed_stats,
)


def test_cohens_d_reference(spark):
    a = [2.0, 4.0, 6.0, 8.0]
    b = [1.0, 3.0, 5.0]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "v double, s string")
    r = cohens_d(df, "v", F.col("s")).first()
    ma, mb = sum(a) / 4, sum(b) / 3
    ssw = sum((x - ma) ** 2 for x in a) + sum((x - mb) ** 2 for x in b)
    sp = math.sqrt(ssw / (7 - 2))
    assert (r["n_a"], r["n_b"]) == (4, 3)
    assert abs(r["d"] - (ma - mb) / sp) < 1e-5


def test_cohens_d_ignores_other_arm_labels(spark):
    """ADVICE r11: a third side_col label must not inflate sd_pooled —
    rows outside arms 'a'/'b' are excluded everywhere (the
    cliffs_delta/energy_distance discipline), so adding a wild 'c' arm
    leaves every output identical."""
    a = [2.0, 4.0, 6.0, 8.0]
    b = [1.0, 3.0, 5.0]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    clean = cohens_d(
        spark.createDataFrame(rows, "v double, s string"), "v", F.col("s")
    ).first()
    noisy = cohens_d(
        spark.createDataFrame(
            rows + [(1e6, "c"), (-1e6, "c")], "v double, s string"
        ),
        "v",
        F.col("s"),
    ).first()
    assert clean == noisy


def test_cliffs_delta_brute_force(spark):
    a = [1.0, 3.0, 3.0, 5.0, 9.0]
    b = [2.0, 3.0, 4.0]
    gt = sum(1 for x in a for y in b if x > y)
    lt = sum(1 for x in a for y in b if x < y)
    want = (gt - lt) / (len(a) * len(b))
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "v double, s string")
    r = cliffs_delta(df, "v", F.col("s")).first()
    assert abs(r["delta"] - want) < 1e-9
    assert r["magnitude"] in (
        "negligible", "small", "medium", "large"
    )


def test_mood_median_balanced_vs_shifted(spark):
    # group g1 sits entirely below the grand median, g2 above
    rows = [(float(i), "g1") for i in range(10)] + [
        (float(i + 100), "g2") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    r = mood_median_test(df, "v", "g").first()
    assert r["k"] == 2
    # one value equals the median (rank 10 -> v=9.0? grand median is
    # the ceil(20/2)=10th value = 9.0) and drops
    assert r["n_used"] == 19
    assert r["chi2"] > 10
    assert r["p_value"] < 0.01


def test_bartlett_known_unequal_variances(spark):
    import statistics

    g1 = [1.0, 2.0, 3.0, 4.0, 5.0]
    g2 = [10.0, 30.0, 50.0, 70.0, 90.0]
    rows = [(v, "a") for v in g1] + [(v, "b") for v in g2]
    df = spark.createDataFrame(rows, "v double, g string")
    r = bartlett_var(df, "v", "g").first()
    s1, s2 = statistics.variance(g1), statistics.variance(g2)
    sp2 = (4 * s1 + 4 * s2) / 8
    t = 8 * math.log(sp2) - 4 * math.log(s1) - 4 * math.log(s2)
    c = 1 + (1 / 4 + 1 / 4 - 1 / 8) / 3
    assert (r["k"], r["n"]) == (2, 10)
    assert abs(r["t_stat"] - t / c) < 1e-3
    assert r["p_value"] < 0.05


def test_poisson_rate_reference(spark):
    rows = [("a",)] * 40 + [("b",)] * 10
    df = spark.createDataFrame(rows, "s string")
    r = poisson_rate_test(df, F.col("s"), 10.0, 5.0).first()
    ra, rb = 4.0, 2.0
    se = math.sqrt(40 / 100 + 10 / 25)
    assert (r["c_a"], r["c_b"]) == (40, 10)
    assert abs(r["z"] - (ra - rb) / se) < 1e-6


def test_jarque_bera_symmetric_vs_skewed(spark):
    sym = spark.createDataFrame(
        [(float(v),) for v in (-2, -1, -1, 0, 0, 0, 1, 1, 2)], "v double"
    )
    r = jarque_bera(sym, "v").first()
    assert abs(r["skewness"]) < 1e-5
    skew = spark.createDataFrame(
        [(float(v),) for v in [0] * 20 + [100]], "v double"
    )
    r2 = jarque_bera(skew, "v").first()
    assert r2["skewness"] > 3
    assert r2["jb"] > r["jb"]


def test_grubbs_flags_the_planted_outlier(spark):
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 50.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = grubbs_test(df, "v").first()
    assert r["outlier"] == 50.0
    m = sum(vals) / len(vals)
    sd = math.sqrt(sum((v - m) ** 2 for v in vals) / len(vals))
    assert abs(r["g_stat"] - abs(50.0 - m) / sd) < 1e-4


def test_sign_test_reference(spark):
    # 8 ups, 2 downs, 1 tie
    rows = [(1.0, 2.0)] * 8 + [(2.0, 1.0)] * 2 + [(1.0, 1.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = sign_test(df, "x", "y").first()
    assert (r["n_pos"], r["n_neg"], r["n_tie"]) == (8, 2, 1)
    want = (abs(8 - 5.0) - 0.5) / math.sqrt(10 / 4.0)
    assert abs(r["z"] - want) < 1e-6


def test_trimmed_stats_reference(spark):
    vals = [float(v) for v in range(1, 11)] + [1000.0]  # n=11, g=1
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = trimmed_stats(df, "v", alpha=0.1).first()
    kept = sorted(vals)[1:-1]
    assert r["n"] == 11 and r["n_trimmed"] == 9
    assert abs(r["trimmed_mean"] - sum(kept) / len(kept)) < 1e-5
    wins = [max(min(v, 10.0), 2.0) for v in vals]
    assert (r["winsor_lo"], r["winsor_hi"]) == (2.0, 10.0)
    assert abs(r["winsor_mean"] - sum(wins) / len(wins)) < 1e-5


def test_durbin_watson_alternating_vs_trending(spark):
    alt = [(i, float(100 if i % 2 else -100)) for i in range(20)]
    trend = [(i, float(i)) for i in range(20)]
    df = spark.createDataFrame(
        [("alt", i, v) for i, v in alt] + [("tr", i, v) for i, v in trend],
        "g string, o int, v double",
    )
    out = {r["grp"]: r for r in durbin_watson(df, "v", "o", "g").collect()}
    assert out["alt"]["dw"] > 3.5  # negative lag-1 autocorr -> ~4
    assert out["tr"]["dw"] < 0.5  # strong positive autocorr -> ~0


def test_ljung_box_white_vs_autocorrelated(spark):
    import random

    rng = random.Random(7)
    white = [(i, rng.gauss(0, 1)) for i in range(200)]
    trend = [(i, math.sin(i / 5.0) * 10) for i in range(200)]
    df = spark.createDataFrame(
        [("w", i, v) for i, v in white] + [("t", i, v) for i, v in trend],
        "g string, o int, v double",
    )
    out = {r["grp"]: r for r in ljung_box(df, "v", "o", "g", h=3).collect()}
    assert out["t"]["q_stat"] > 100
    assert out["t"]["p_value"] < 0.001
    assert out["w"]["q_stat"] < out["t"]["q_stat"]


def test_cronbach_alpha_parallel_items(spark):
    # items = same signal + small perturbations -> alpha near 1;
    # uncorrelated noise -> alpha near 0
    rows = [(float(i), float(i) + 0.1, float(i) - 0.1) for i in range(30)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    r = cronbach_alpha(df, ["a", "b", "c"]).first()
    assert r["alpha"] > 0.99
    import random

    rng = random.Random(3)
    noise = [
        (rng.random(), rng.random(), rng.random()) for _ in range(200)
    ]
    df2 = spark.createDataFrame(noise, "a double, b double, c double")
    r2 = cronbach_alpha(df2, ["a", "b", "c"]).first()
    assert abs(r2["alpha"]) < 0.5


def test_cronbach_alpha_rejects_single_item(spark):
    df = spark.createDataFrame([(1.0,)], "a double")
    with pytest.raises(ValueError, match="items"):
        cronbach_alpha(df, ["a"])


def test_odds_ratio_worked_example(spark):
    # classic 2x2: (10, 20, 5, 40) -> OR = 10*40 / (20*5) = 4
    rows = (
        [(1, 1)] * 10 + [(1, 0)] * 20 + [(0, 1)] * 5 + [(0, 0)] * 40
    )
    df = spark.createDataFrame(rows, "a int, b int")
    r = odds_ratio_2x2(df, "a", "b").first()
    assert r["odds_ratio"] == 4.0
    se = math.sqrt(1 / 10 + 1 / 20 + 1 / 5 + 1 / 40)
    assert abs(r["ci_lo"] - math.exp(math.log(4) - 1.96 * se)) < 1e-4
    assert abs(r["ci_hi"] - math.exp(math.log(4) + 1.96 * se)) < 1e-4


def test_odds_ratio_zero_cell_is_null(spark):
    df = spark.createDataFrame([(1, 1), (0, 0)], "a int, b int")
    r = odds_ratio_2x2(df, "a", "b").first()
    assert r["odds_ratio"] is None


def test_kruskal_wallis_against_scipy_formula(spark):
    g1 = [2.9, 3.0, 2.5, 2.6, 3.2]
    g2 = [3.8, 2.7, 4.0, 2.4]
    g3 = [2.8, 3.4, 3.7, 2.2, 2.0]
    rows = (
        [(v, "a") for v in g1]
        + [(v, "b") for v in g2]
        + [(v, "c") for v in g3]
    )
    df = spark.createDataFrame(rows, "v double, g string")
    r = kruskal_wallis(df, "v", "g").first()
    # hand-computed H (no ties in this classic airquality example)
    allv = sorted(g1 + g2 + g3)
    rank = {v: i + 1 for i, v in enumerate(allv)}
    n = len(allv)
    h = 12.0 / (n * (n + 1)) * sum(
        len(g) * (sum(rank[v] for v in g) / len(g) - (n + 1) / 2) ** 2
        for g in (g1, g2, g3)
    )
    assert (r["k"], r["n"]) == (3, 14)
    assert abs(r["h_stat"] - h) < 1e-4


def test_hhi_monopoly_and_even_split(spark):
    mono = spark.createDataFrame([("x",)] * 10, "k string")
    assert hhi_concentration(mono, "k").first()["hhi"] == 1.0
    even = spark.createDataFrame(
        [(c,) for c in "abcd" * 25], "k string"
    )
    r = even.transform(lambda d: hhi_concentration(d, "k")).first()
    assert abs(r["hhi"] - 0.25) < 1e-5
    assert abs(r["hhi_norm"]) < 1e-5


def test_hhi_weighted(spark):
    df = spark.createDataFrame(
        [("a", 3.0), ("b", 1.0)], "k string, w double"
    )
    r = hhi_concentration(df, "k", "w").first()
    assert abs(r["hhi"] - (0.75**2 + 0.25**2)) < 1e-5


def test_fleiss_kappa_perfect_and_chance(spark):
    # 3 raters, 10 subjects, all agree -> kappa = 1
    rows = [
        (s, r, "cat%d" % (s % 2)) for s in range(10) for r in range(3)
    ]
    df = spark.createDataFrame(rows, "s int, r int, c string")
    out = fleiss_kappa(df, "s", "r", "c", k_raters=3).first()
    assert out["n_subjects"] == 10
    assert out["kappa"] == 1.0
    # incomplete subjects are excluded
    df2 = df.union(spark.createDataFrame([(99, 0, "cat0")], "s int, r int, c string"))
    out2 = fleiss_kappa(df2, "s", "r", "c", k_raters=3).first()
    assert out2["n_subjects"] == 10


def test_fleiss_kappa_worked_example(spark):
    # Fleiss 1971-style: 2 subjects x 4 raters over 2 categories
    # subject 1: 3 A / 1 B, subject 2: 2 A / 2 B
    rows = (
        [(1, r, "A") for r in range(3)]
        + [(1, 3, "B")]
        + [(2, r, "A") for r in range(2)]
        + [(2, r, "B") for r in (2, 3)]
    )
    df = spark.createDataFrame(rows, "s int, r int, c string")
    out = fleiss_kappa(df, "s", "r", "c", k_raters=4).first()
    # P_i: s1 = (9+1-4)/12 = 0.5, s2 = (4+4-4)/12 = 1/3; Pbar = 5/12
    # p_A = 5/8, p_B = 3/8; Pe = 25/64 + 9/64 = 34/64
    pbar = 5 / 12
    pe = 34 / 64
    assert abs(out["p_bar"] - pbar) < 1e-6
    assert abs(out["p_e"] - pe) < 1e-6
    assert abs(out["kappa"] - (pbar - pe) / (1 - pe)) < 1e-5


def test_welch_anova_reference(spark):
    """Against the hand-computed Welch F* for three small unequal-
    variance samples (scipy.stats reference design): groups with a
    real location shift score F >> 1; identical groups score ~0."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        welch_anova,
    )

    rows = (
        [("a", float(v)) for v in (1, 2, 3, 4, 5)]
        + [("b", float(v)) for v in (1.1, 2.1, 3.1, 4.1, 5.1)]
        + [("c", float(v)) for v in (20, 22, 24, 26, 28)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    r = welch_anova(df, "v", "g").first()
    assert r["k"] == 3 and r["n"] == 15 and r["df1"] == 2
    assert r["f_stat"] > 50          # c is far away
    assert 5.0 < r["df2"] < 12.0
    same = spark.createDataFrame(
        [("a", float(v)) for v in range(10)]
        + [("b", float(v)) for v in range(10)],
        "g string, v double",
    )
    r2 = welch_anova(same, "v", "g").first()
    assert abs(r2["f_stat"]) < 1e-9


def test_chisq_gof_uniform_and_custom(spark):
    """Uniform default: perfectly even counts give chi2 = 0; a skewed
    split is detected. Custom probs matching the skew give ~0."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        chisq_gof,
    )

    even = spark.createDataFrame(
        [(c,) for c in "abcd" * 25], "k string"
    )
    r = chisq_gof(even, "k").first()
    # Wilson-Hilferty at chi2=0 approaches 1 from below (~0.9997)
    assert r["chi2"] == 0.0 and r["p_value"] > 0.99
    skew = spark.createDataFrame(
        [("a",)] * 60 + [("b",)] * 40, "k string"
    )
    r2 = chisq_gof(skew, "k").first()
    assert r2["chi2"] == 4.0  # (60-50)^2/50 + (40-50)^2/50
    r3 = chisq_gof(skew, "k", probs={"a": 0.6, "b": 0.4}).first()
    assert r3["chi2"] == 0.0


def test_chisq_gof_unobserved_expected_category(spark):
    """ADVICE r11: a probs category with p > 0 but ZERO observed count
    must contribute a zero-count cell (E = n*p, k from the probs
    domain) — the vanished-category drift case. 100 obs of 'a' against
    probs {a:0.5, b:0.5}: cells (100-50)^2/50 + (0-50)^2/50 = 100,
    k = 2 (dof 1), not a k=1 / chi2=50 understatement."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        chisq_gof,
    )

    df = spark.createDataFrame([("a",)] * 100, "k string")
    r = chisq_gof(df, "k", probs={"a": 0.5, "b": 0.5}).first()
    assert r["k"] == 2
    assert r["n"] == 100
    assert r["chi2"] == 100.0


def test_chisq_gof_missing_prob_is_null(spark):
    """A level absent from probs must yield NULL chi2, not a silent
    partial statistic."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        chisq_gof,
    )

    df = spark.createDataFrame([("a",), ("b",)], "k string")
    r = chisq_gof(df, "k", probs={"a": 1.0}).first()
    assert r["chi2"] is None


def test_kendall_w_perfect_and_reversed(spark):
    """Three raters ranking four subjects identically -> W = 1;
    a rater panel split between a ranking and its exact reverse
    scores low."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        kendall_w,
    )

    perfect = [
        (s, r, float(s)) for s in range(1, 5) for r in ("r1", "r2", "r3")
    ]
    df = spark.createDataFrame(perfect, "s int, r string, v double")
    out = kendall_w(df, "s", "r", "v").first()
    assert out["n_subjects"] == 4 and out["m_raters"] == 3
    assert out["w"] == 1.0
    mixed = [(s, "r1", float(s)) for s in range(1, 5)] + [
        (s, "r2", float(5 - s)) for s in range(1, 5)
    ]
    df2 = spark.createDataFrame(mixed, "s int, r string, v double")
    assert kendall_w(df2, "s", "r", "v").first()["w"] == 0.0


def test_page_trend_monotone_blocks(spark):
    """Every block ranks treatments 1<2<3 -> L at its maximum
    m*sum(j*j) and a strongly positive z; shuffled blocks -> z ~ 0."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        page_trend,
    )

    mono = [
        (b, j, float(j) + 0.01 * b)
        for b in range(1, 11)
        for j in (1, 2, 3)
    ]
    df = spark.createDataFrame(mono, "s int, j int, v double")
    r = page_trend(df, "s", "j", "v").first()
    assert r["n_blocks"] == 10 and r["k"] == 3
    assert r["l_stat"] == 10 * (1 * 1 + 2 * 2 + 3 * 3)
    assert r["z"] > 3.0 and r["p_value"] < 0.01
    anti = [
        (b, j, float(4 - j)) for b in range(1, 11) for j in (1, 2, 3)
    ]
    r2 = page_trend(
        spark.createDataFrame(anti, "s int, j int, v double"),
        "s", "j", "v",
    ).first()
    assert r2["z"] < -3.0


def test_energy_distance_brute_force(spark):
    """Closed-form prefix computation == brute-force pairwise sums on
    a small mixed sample; identical samples score 0."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        energy_distance,
    )
    import pyspark.sql.functions as F

    xs = [1.0, 2.0, 2.0, 5.5, 7.25]
    ys = [2.0, 3.5, 6.0, 6.0]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    r = energy_distance(df, "v", F.col("g")).first()

    def mean_abs(a, b):
        return sum(abs(x - y) for x in a for y in b) / (len(a) * len(b))

    exy, exx, eyy = mean_abs(xs, ys), mean_abs(xs, xs), mean_abs(ys, ys)
    assert abs(r["e_xy"] - round(exy, 6)) < 1e-9
    assert abs(r["e_xx"] - round(exx, 6)) < 1e-9
    assert abs(r["e_yy"] - round(eyy, 6)) < 1e-9
    assert abs(r["energy"] - round(2 * exy - exx - eyy, 6)) < 1e-9
    same = spark.createDataFrame(
        [("a", v) for v in xs] + [("b", v) for v in xs],
        "g string, v double",
    )
    assert energy_distance(same, "v", F.col("g")).first()["energy"] == 0.0


def test_tukey_hsd_pairs_and_reference(spark):
    """k=3 groups -> 3 ordered pairs; the far group's q dwarfs the
    near pair's; diff signs follow g1 - g2."""
    from from_superset_to_clickhouse_spark.operators.stats import tukey_hsd

    rows = (
        [("a", float(v)) for v in (1, 2, 3, 4, 5)]
        + [("b", float(v)) for v in (1.5, 2.5, 3.5, 4.5, 5.5)]
        + [("c", float(v)) for v in (20, 21, 22, 23, 24)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = {(r["g1"], r["g2"]): r for r in tukey_hsd(df, "v", "g").collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "c")]["q_stat"] > 10 * out[("a", "b")]["q_stat"]
    assert out[("a", "b")]["diff"] == -0.5


def test_ransac_line_survives_outliers(spark):
    """A clean line y=2x+1 with 30% wild outliers: the winning
    hypothesis recovers the true line exactly (2-point fit through
    inliers) with all inliers counted; plain least squares would be
    dragged far off."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        ransac_line,
    )

    pts = [(float(i), 2.0 * i + 1.0) for i in range(20)]
    pts += [(float(i), 500.0 + 7 * i) for i in range(20, 29)]
    df = spark.createDataFrame(pts, "x double, y double")
    r = ransac_line(df, "x", "y", n_hypotheses=24, tol=0.5).first()
    assert r["n"] == 29
    assert r["n_inliers"] == 20
    assert r["slope"] == 2.0 and r["intercept"] == 1.0


def test_ransac_line_tied_x_deterministic(spark):
    """ADVICE r11: duplicate x values must still index deterministically
    (rank window totally ordered by (x, y)) — same result across
    shuffled row orders and partitionings."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        ransac_line,
    )

    pts = [(float(i % 7), 2.0 * (i % 7) + 1.0 + 0.01 * i) for i in range(28)]
    df1 = spark.createDataFrame(pts, "x double, y double")
    df2 = spark.createDataFrame(
        list(reversed(pts)), "x double, y double"
    ).repartition(7)
    r1 = ransac_line(df1, "x", "y", n_hypotheses=12, tol=0.5).first()
    r2 = ransac_line(df2, "x", "y", n_hypotheses=12, tol=0.5).first()
    assert r1 == r2


def test_corr_matrix_reference(spark):
    """Pairwise r against plain-Python Pearson; a perfectly linear
    pair scores 1, an anti-linear pair -1."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        corr_matrix,
    )

    rows = [
        (float(i), 2.0 * i + 1.0, float(-i), float((i * 7) % 5))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    out = {(r["x"], r["y"]): r["r"]
           for r in corr_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert len(out) == 6
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] == -1.0

    def pearson(xs, ys):
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        den = (sum((x - mx) ** 2 for x in xs)
               * sum((y - my) ** 2 for y in ys)) ** 0.5
        return num / den

    a = [float(i) for i in range(40)]
    d = [float((i * 7) % 5) for i in range(40)]
    assert abs(out[("a", "d")] - pearson(a, d)) < 1e-5


def test_anova_effect_sizes_reference(spark):
    """Textbook identity check: eta^2 = SSB/SST; total separation
    gives eta^2 ~ 1, identical groups ~ 0."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        anova_effect_sizes,
    )

    rows = (
        [("a", float(v)) for v in (1, 2, 3)]
        + [("b", float(v)) for v in (101, 102, 103)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_effect_sizes(df, "v", "g").first()
    assert r["eta_sq"] > 0.99
    assert r["omega_sq"] > 0.99
    same = spark.createDataFrame(
        [("a", float(v)) for v in range(6)]
        + [("b", float(v)) for v in range(6)],
        "g string, v double",
    )
    r2 = anova_effect_sizes(same, "v", "g").first()
    assert abs(r2["eta_sq"]) < 1e-6


def test_proportions_power_formula(spark):
    """Against the hand-computed classical n for p=(0.5, 0.6) at
    alpha=.05 two-sided / power .80 (~388 per arm)."""
    import math

    from from_superset_to_clickhouse_spark.operators.stats import (
        proportions_power,
    )
    import pyspark.sql.functions as F

    rows = [("a", 1)] * 50 + [("a", 0)] * 50 + \
           [("b", 1)] * 60 + [("b", 0)] * 40
    df = spark.createDataFrame(rows, "s string, y int")
    r = proportions_power(df, F.col("s"), F.col("y")).first()
    assert (r["p_a"], r["p_b"]) == (0.5, 0.6)
    pbar = 0.55
    num = (1.959964 * math.sqrt(2 * pbar * (1 - pbar))
           + 0.841621 * math.sqrt(0.25 + 0.24))
    want = math.ceil(num * num / 0.01)
    assert r["n_required"] == want
    assert r["powered"] is False   # 100 per arm < ~388


def test_risk_ratio_worked_example(spark):
    """Cohort 2x2 (20/80 exposed, 10/90 unexposed): RR = 2, NNT = 10;
    a zero outcome cell yields NULL rr."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        risk_ratio,
    )

    rows = ([(1, 1)] * 20 + [(1, 0)] * 80
            + [(0, 1)] * 10 + [(0, 0)] * 90)
    df = spark.createDataFrame(rows, "e int, y int")
    r = risk_ratio(df, "e", "y").first()
    assert r["rr"] == 2.0
    assert r["nnt"] == 10.0
    assert r["ci_lo"] < 2.0 < r["ci_hi"]
    degenerate = spark.createDataFrame(
        [(1, 0)] * 5 + [(0, 1)] * 5, "e int, y int"
    )
    assert risk_ratio(degenerate, "e", "y").first()["rr"] is None


def test_sprt_binomial_crosses_correct_boundary(spark):
    """A stream at the alternative rate crosses the reject-H0 bound;
    a stream at the null rate crosses accept-H0; decisions are per
    checkpoint with cumulative exact counts."""
    import pyspark.sql.functions as F

    from from_superset_to_clickhouse_spark.operators.stats import (
        sprt_binomial,
    )

    hot = [(t, "b", 1 if i < 7 else 0)
           for t in range(1, 21) for i in range(10)]
    df = spark.createDataFrame(hot, "t int, s string, y int")
    out = sprt_binomial(df, "t", F.col("s"), F.col("y"),
                        p0=0.5, p1=0.7).collect()
    assert [r["step"] for r in out] == list(range(1, 21))
    assert out[-1]["decision"] == "reject_h0"
    cold = [(t, "b", 1 if i < 5 else 0)
            for t in range(1, 21) for i in range(10)]
    out2 = sprt_binomial(
        spark.createDataFrame(cold, "t int, s string, y int"),
        "t", F.col("s"), F.col("y"), p0=0.5, p1=0.7,
    ).collect()
    assert out2[-1]["decision"] == "accept_h0"


def test_energy_distance_empty_arm_is_null(spark):
    """A one-sided sample has no cross-arm expectation: NULL energy,
    not a divide-by-zero artifact."""
    import pyspark.sql.functions as F

    from from_superset_to_clickhouse_spark.operators.stats import (
        energy_distance,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g string, v double"
    )
    r = energy_distance(df, "v", F.col("g")).first()
    assert r["n_b"] == 0
    assert r["e_xy"] is None and r["energy"] is None
