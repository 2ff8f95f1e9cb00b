"""Hand-oracle tests for the round-14 stats operators."""

import math

from from_superset_to_clickhouse_spark.operators import stats as st


def test_gwet_ac1_perfect_and_known(spark):
    # perfect agreement: Pa = 1 -> AC1 = 1 regardless of Pe
    rows = [("a", "a")] * 6 + [("b", "b")] * 4
    r = st.gwet_ac1(
        spark.createDataFrame(rows, "x string, y string"), "x", "y"
    ).collect()[0]
    assert r["n"] == 10 and r["n_categories"] == 2
    assert r["p_o"] == 1.0 and r["ac1"] == 1.0
    # hand case: 2x2 cells a/a=4, a/b=1, b/a=1, b/b=4
    # Pa = 0.8; pi_a = (5+5)/20 = .5, pi_b = .5
    # Pe = (.5*.5 + .5*.5)/(2-1) = 0.5 -> AC1 = (.8-.5)/.5 = 0.6
    rows2 = (
        [("a", "a")] * 4 + [("a", "b")] + [("b", "a")] + [("b", "b")] * 4
    )
    r2 = st.gwet_ac1(
        spark.createDataFrame(rows2, "x string, y string"), "x", "y"
    ).collect()[0]
    assert r2["p_o"] == 0.8 and r2["p_e"] == 0.5 and r2["ac1"] == 0.6


def test_gwet_ac1_survives_skewed_marginals(spark):
    # the kappa paradox case: 98% raw agreement on a rare class ->
    # kappa collapses toward 0, AC1 stays high (Gwet 2008, table 2)
    rows = [("y", "y")] * 98 + [("y", "n")] + [("n", "y")]
    r = st.gwet_ac1(
        spark.createDataFrame(rows, "x string, y string"), "x", "y"
    ).collect()[0]
    k = st.cohens_kappa(
        spark.createDataFrame(rows, "x string, y string"), "x", "y"
    ).collect()[0]
    assert r["ac1"] > 0.9 and k["kappa"] < 0.1


def test_dixon_q_planted_outlier(spark):
    # 1..9 plus 100: q_high = (100-9)/(100-1) ~ 0.919 -> flagged;
    # q_low = (2-1)/99 ~ 0.0101 -> clean
    rows = [("g", float(i)) for i in range(1, 10)] + [("g", 100.0)]
    r = st.dixon_q(
        spark.createDataFrame(rows, "g string, v double"), "g", "v"
    ).collect()[0]
    assert r["n"] == 10
    assert abs(r["q_high"] - 91.0 / 99.0) < 1e-6
    assert abs(r["q_low"] - 1.0 / 99.0) < 1e-6
    assert r["high_outlier"] == 1 and r["low_outlier"] == 0


def test_g_test_independent_vs_associated(spark):
    # perfectly independent 2x2 -> G = 0, p ~ 1
    ind = (
        [("a", 0)] * 25 + [("a", 1)] * 25 + [("b", 0)] * 25 + [("b", 1)] * 25
    )
    r = st.g_test(
        spark.createDataFrame(ind, "x string, y int"), "x", "y"
    ).collect()[0]
    assert r["dof"] == 1 and r["g_stat"] == 0.0 and r["p_value"] > 0.9
    # perfectly associated -> G = 2*N*ln(2), tiny p
    dep = [("a", 0)] * 50 + [("b", 1)] * 50
    r2 = st.g_test(
        spark.createDataFrame(dep, "x string, y int"), "x", "y"
    ).collect()[0]
    assert abs(r2["g_stat"] - 2.0 * 100.0 * math.log(2.0)) < 1e-4
    assert r2["p_value"] < 1e-6


def test_fisher_exact_matches_closed_form(spark):
    # the classic tea-tasting table: a=3, r1=4, c1=4, n=8
    # two-sided p = 2*C(4,3)C(4,1)/C(8,4) + 2*C(4,4)C(4,0)/C(8,4)
    #             = (16+16+1+1)/70 ... support pmfs:
    # a=0:1, a=1:16, a=2:36, a=3:16, a=4:1 (x1/70)
    # obs a=3 (pmf 16/70): include pmf<=16 -> 1+16+16+1 = 34/70
    rows = (
        [(True, True)] * 3 + [(True, False)] * 1
        + [(False, True)] * 1 + [(False, False)] * 3
    )
    r = st.fisher_exact(
        spark.createDataFrame(rows, "a boolean, b boolean"), "a", "b"
    ).collect()[0]
    assert r["n"] == 8 and r["n_a"] == 4 and r["n_b"] == 4
    assert r["n_both"] == 3
    assert abs(r["p_two_sided"] - 34.0 / 70.0) < 1e-5
    assert abs(r["odds_ratio"] - 9.0) < 1e-6


def test_fisher_exact_extreme_table(spark):
    # fully separated 2x2: obs is the most extreme table; only the
    # two tails' extreme cells are <= obs pmf
    rows = [(True, True)] * 5 + [(False, False)] * 5
    r = st.fisher_exact(
        spark.createDataFrame(rows, "a boolean, b boolean"), "a", "b"
    ).collect()[0]
    # support a in [0..5]; pmf(5) = 1/C(10,5) = 1/252; pmf(0) same
    assert abs(r["p_two_sided"] - 2.0 / 252.0) < 1e-5


def test_white_test_hetero_vs_homo(spark):
    # variance proportional to x^2 -> LM fires; constant noise -> not
    het = [
        (float(x), float(x) + ((i * 37) % 11 - 5.0) * x / 10.0)
        for i, x in enumerate(range(1, 201))
    ]
    r = st.white_test(
        spark.createDataFrame(het, "x double, y double"), "y", "x"
    ).collect()[0]
    assert r["p_value"] < 0.01
    hom = [
        (float(x), float(x) + ((i * 37) % 11 - 5.0) / 10.0)
        for i, x in enumerate(range(1, 201))
    ]
    r2 = st.white_test(
        spark.createDataFrame(hom, "x double, y double"), "y", "x"
    ).collect()[0]
    assert r2["p_value"] > 0.05


def test_cooks_distance_flags_planted_influencer(spark):
    # a tight (slightly noisy) line plus one far-off high-leverage
    # point; a PERFECT line would have s2 = 0 and NULL distances
    rows = [
        (float(x), 2.0 * x + 1.0 + ((x * 7) % 5 - 2.0) / 10.0)
        for x in range(1, 31)
    ]
    clean = st.cooks_distance(
        spark.createDataFrame(rows, "x double, y double"), "y", "x"
    ).collect()[0]
    rows_bad = rows + [(100.0, 0.0)]
    bad = st.cooks_distance(
        spark.createDataFrame(rows_bad, "x double, y double"), "y", "x"
    ).collect()[0]
    assert clean["max_d"] < 0.2 and clean["n_above_4n"] == 0
    assert bad["max_d"] > 10.0 and bad["n_above_4n"] >= 1


def test_deming_recovers_slope_under_x_noise(spark):
    # y = 2x exactly but x observed with symmetric noise: OLS slope
    # biases below 2; Deming (delta = noise ratio 1 after scaling)
    # recovers more of it. Planted deterministic +/- noise.
    import itertools

    noise = itertools.cycle([-1.0, 1.0])
    rows = []
    for x in range(1, 101):
        e = next(noise)
        rows.append((float(x) + e, 2.0 * float(x)))
    df = spark.createDataFrame(rows, "x double, y double")
    dem = st.deming_regression(df, "x", "y", delta=4.0).collect()[0]
    ols = st.linear_regression(df, "x", "y")
    b_ols = ols.collect()[0]["slope"]
    assert b_ols < 2.0
    assert abs(dem["slope"] - 2.0) < abs(b_ols - 2.0)


def test_lin_ccc_identity_vs_shifted(spark):
    rows = [(float(x), float(x)) for x in range(1, 51)]
    r = st.lin_ccc(
        spark.createDataFrame(rows, "x double, y double"), "x", "y"
    ).collect()[0]
    assert r["ccc"] == 1.0 and r["r"] == 1.0 and r["c_b"] == 1.0
    # constant shift keeps r = 1 but drops ccc below 1
    rows2 = [(float(x), float(x) + 10.0) for x in range(1, 51)]
    r2 = st.lin_ccc(
        spark.createDataFrame(rows2, "x double, y double"), "x", "y"
    ).collect()[0]
    assert r2["r"] == 1.0 and r2["ccc"] < 0.9 and r2["c_b"] < 0.9


def test_hellinger_identical_vs_disjoint(spark):
    same = [("a", 1)] * 10 + [("b", 1)] * 10 + [("a", 2)] * 10 + [("b", 2)] * 10
    r = st.hellinger_distance(
        spark.createDataFrame(same, "g string, k int"), "g", "a", "b", "k"
    ).collect()[0]
    assert r["bc"] == 1.0 and r["hellinger"] == 0.0 and r["bhattacharyya"] == 0.0
    disj = [("a", 1)] * 10 + [("b", 2)] * 10
    r2 = st.hellinger_distance(
        spark.createDataFrame(disj, "g string, k int"), "g", "a", "b", "k"
    ).collect()[0]
    assert r2["bc"] == 0.0 and r2["hellinger"] == 1.0
    assert r2["bhattacharyya"] is None  # -ln(0) guarded to NULL


def test_ansari_bradley_scale_difference(spark):
    # same center, group b 10x wider spread -> b gets the extreme
    # ranks, a's scores concentrate high -> significant
    a = [("a", 100.0 + d) for d in range(-10, 11)]
    b = [("b", 100.0 + 10.0 * d) for d in range(-10, 11)]
    r = st.ansari_bradley(
        spark.createDataFrame(a + b, "g string, v double"), "g", "a", "b", "v"
    ).collect()[0]
    assert r["n_a"] == 21 and r["n_b"] == 21
    assert r["p_value"] < 0.01 and r["z"] > 0
    # identical distributions -> z ~ 0
    r2 = st.ansari_bradley(
        spark.createDataFrame(
            a + [("b", v) for _, v in a], "g string, v double"
        ), "g", "a", "b", "v",
    ).collect()[0]
    assert r2["p_value"] > 0.5


def test_meta_fixed_agreeing_vs_heterogeneous(spark):
    # three studies all estimating 2.0 -> pooled 2.0, Q ~ 0, I2 = 0
    agree = [("s1", 2.0, 0.1), ("s2", 2.0, 0.2), ("s3", 2.0, 0.15)]
    r = st.meta_fixed(
        spark.createDataFrame(agree, "s string, e double, se double"),
        "s", "e", "se",
    ).collect()[0]
    assert r["k"] == 3 and r["pooled"] == 2.0
    assert r["q_stat"] == 0.0 and r["i2"] == 0.0
    # hand check pooled: w = 100, 25 -> pooled = (100*1 + 25*5)/125 = 1.8
    two = [("s1", 1.0, 0.1), ("s2", 5.0, 0.2)]
    r2 = st.meta_fixed(
        spark.createDataFrame(two, "s string, e double, se double"),
        "s", "e", "se",
    ).collect()[0]
    assert abs(r2["pooled"] - 1.8) < 1e-9
    assert r2["i2"] > 0.9  # wildly heterogeneous


def test_c_chart_stable_vs_spiked(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 10 days x 16 events -> c_bar 16, limits 16 +/- 12 -> stable
    for d in range(10):
        for i in range(16):
            rows.append(("k", t0 + dt.timedelta(days=d, minutes=i)))
    # one spiked day with 40 events -> above UCL
    for i in range(40):
        rows.append(("k", t0 + dt.timedelta(days=10, minutes=i)))
    from from_superset_to_clickhouse_spark.operators.temporal import c_chart

    r = c_chart(
        spark.createDataFrame(rows, "key string, ts timestamp"),
        "key", "ts",
    ).collect()[0]
    assert r["n_buckets"] == 11
    assert r["n_out"] >= 1


# ---------------------------------------------------------------------------
# round-14 QUEUE (r15-window candidates)


def test_vargha_delaney_hand(spark):
    # a = {3,4,5}, b = {1,2}: every a beats every b -> A = 1
    rows = [("a", 3.0), ("a", 4.0), ("a", 5.0), ("b", 1.0), ("b", 2.0)]
    r = st.vargha_delaney_a(
        spark.createDataFrame(rows, "g string, v double"), "g", "a", "b", "v"
    ).collect()[0]
    assert r["a12"] == 1.0
    # identical singletons: tie counts half -> A = .5
    rows2 = [("a", 2.0), ("b", 2.0)]
    r2 = st.vargha_delaney_a(
        spark.createDataFrame(rows2, "g string, v double"), "g", "a", "b", "v"
    ).collect()[0]
    assert r2["a12"] == 0.5


def test_cvm_identical_vs_shifted(spark):
    same = [("a", float(i)) for i in range(30)] + [
        ("b", float(i)) for i in range(30)
    ]
    r = st.cvm_two_sample(
        spark.createDataFrame(same, "g string, v double"), "g", "a", "b", "v"
    ).collect()[0]
    assert r["t_stat"] < 0.1 and r["reject_5pct"] == 0
    shift = [("a", float(i)) for i in range(30)] + [
        ("b", float(i) + 25.0) for i in range(30)
    ]
    r2 = st.cvm_two_sample(
        spark.createDataFrame(shift, "g string, v double"), "g", "a", "b", "v"
    ).collect()[0]
    assert r2["t_stat"] > 0.461 and r2["reject_5pct"] == 1


def test_dagostino_k2_normalish_vs_skewed(spark):
    import math as m

    # a symmetric bell-ish sample via the probit of a uniform grid
    # (inverse-transform: near-normal by construction)
    def probit(p):
        # Acklam-lite via bisection on the erf for test purposes
        lo, hi = -6.0, 6.0
        for _ in range(60):
            mid = (lo + hi) / 2
            if 0.5 * (1 + m.erf(mid / m.sqrt(2))) < p:
                lo = mid
            else:
                hi = mid
        return (lo + hi) / 2

    norm = [(probit((i + 0.5) / 200.0),) for i in range(200)]
    r = st.dagostino_k2(
        spark.createDataFrame(norm, "v double"), "v"
    ).collect()[0]
    assert abs(r["skew"]) < 0.05
    assert r["p_value"] > 0.05
    # exponential-ish heavy right skew -> fires hard
    skewed = [(m.exp(i / 20.0),) for i in range(200)]
    r2 = st.dagostino_k2(
        spark.createDataFrame(skewed, "v double"), "v"
    ).collect()[0]
    assert r2["skew"] > 1.0 and r2["p_value"] < 0.001


def test_fisher_combine_null_vs_signal(spark):
    # five neutral p-values: X2 ~ -2*5*ln(.5) ~ 6.93, p large
    null = [(0.5,)] * 5
    r = st.fisher_combine(
        spark.createDataFrame(null, "p double"), "p"
    ).collect()[0]
    assert r["k"] == 5 and r["dof"] == 10
    assert abs(r["x2"] - (-2.0 * 5 * __import__("math").log(0.5))) < 1e-6
    assert r["p_value"] > 0.5
    # one overwhelming study drags the global null down
    sig = [(0.5,)] * 4 + [(1e-8,)]
    r2 = st.fisher_combine(
        spark.createDataFrame(sig, "p double"), "p"
    ).collect()[0]
    assert r2["p_value"] < 0.01


def test_rmst_and_quartiles_hand_curve(spark):
    # step curve: S=0.8 from t=2, 0.4 from t=5, 0.1 from t=8
    curve = spark.createDataFrame(
        [(2, 0.8), (5, 0.4), (8, 0.1)], "t_days int, survival double"
    )
    # tau=10: 1*2 + 0.8*3 + 0.4*3 + 0.1*2 = 2+2.4+1.2+0.2 = 5.8
    r = st.rmst_from_curve(curve, tau=10.0).collect()[0]
    assert abs(r["rmst"] - 5.8) < 1e-9
    # tau=4 caps inside the first step: 1*2 + 0.8*2 = 3.6
    r2 = st.rmst_from_curve(curve, tau=4.0).collect()[0]
    assert abs(r2["rmst"] - 3.6) < 1e-9
    q = st.survival_quartiles(curve).collect()[0]
    assert q["q25_t"] == 5 and q["median_t"] == 5 and q["q75_t"] == 8
    # curve that never drops below .5: median NULL
    shallow = spark.createDataFrame(
        [(3, 0.7)], "t_days int, survival double"
    )
    q2 = st.survival_quartiles(shallow).collect()[0]
    assert q2["q25_t"] == 3 and q2["median_t"] is None


def test_palma_and_hoover_hand(spark):
    # 10 values: nine 1s and one 91 -> total 100
    rows = [(1.0,)] * 9 + [(91.0,)]
    df = spark.createDataFrame(rows, "v double")
    p = st.palma_ratio(df, "v").collect()[0]
    # bottom 40% = 4 ones = 4; top 10% = the 91 -> palma = 91/4
    assert p["bottom40_share"] == 0.04 and p["top10_share"] == 0.91
    assert abs(p["palma"] - 91.0 / 4.0) < 1e-6
    h = st.hoover_index(df, "v").collect()[0]
    # mean 10; sum|x-10| = 9*9 + 81 = 162 -> hoover = 81/100
    assert abs(h["hoover"] - 0.81) < 1e-6
    # perfectly equal -> hoover 0, palma = (0.1)/(0.4)
    eq = spark.createDataFrame([(5.0,)] * 10, "v double")
    assert st.hoover_index(eq, "v").collect()[0]["hoover"] == 0.0
    pe = st.palma_ratio(eq, "v").collect()[0]
    assert abs(pe["palma"] - 0.25) < 1e-6


def test_kl_divergence_direction(spark):
    # P concentrated where Q is thin: D(P||Q) > D(Q||P) would depend
    # on shape; check identical -> both ~0, disjoint -> both large
    same = [("p", 1)] * 20 + [("q", 1)] * 20
    r = st.kl_divergence(
        spark.createDataFrame(same, "g string, k int"), "g", "p", "q", "k"
    ).collect()[0]
    assert r["kl_pq"] == 0.0 and r["kl_qp"] == 0.0
    disj = [("p", 1)] * 20 + [("q", 2)] * 20
    r2 = st.kl_divergence(
        spark.createDataFrame(disj, "g string, k int"), "g", "p", "q", "k"
    ).collect()[0]
    assert r2["kl_pq"] > 2.0 and r2["kl_qp"] > 2.0


def test_spearman_footrule_identity_and_reverse(spark):
    rows = [(i, float(100 - i), float(100 - i)) for i in range(10)]
    r = st.spearman_footrule(
        spark.createDataFrame(rows, "id int, a double, b double"),
        "id", "a", "b",
    ).collect()[0]
    assert r["footrule"] == 0 and r["f_norm"] == 0.0
    rev = [(i, float(100 - i), float(i)) for i in range(10)]
    r2 = st.spearman_footrule(
        spark.createDataFrame(rev, "id int, a double, b double"),
        "id", "a", "b",
    ).collect()[0]
    # reversed permutation of n=10: sum|i-(11-i)| = 50 = floor(100/2)
    assert r2["footrule"] == 50 and r2["f_norm"] == 1.0


def test_qte_location_vs_tail_shift(spark):
    # b = a + 10 uniformly: every quantile gap = 10
    a = [("a", float(v)) for v in range(1, 101)]
    b = [("b", float(v) + 10.0) for v in range(1, 101)]
    rows = a + b
    out = {
        r["q"]: r
        for r in st.quantile_treatment_effect(
            spark.createDataFrame(rows, "g string, v double"),
            "g", "a", "b", "v",
        ).collect()
    }
    assert all(abs(out[q]["qte"] + 10.0) < 1e-6 for q in out)
    # tail-only shift: top decile of b inflated
    b2 = [("b", float(v) + (500.0 if v > 90 else 0.0)) for v in range(1, 101)]
    out2 = {
        r["q"]: r["qte"]
        for r in st.quantile_treatment_effect(
            spark.createDataFrame(a + b2, "g string, v double"),
            "g", "a", "b", "v",
        ).collect()
    }
    assert abs(out2[0.5]) < 1e-6 and out2[0.9] == 0.0
    # the .9 order stat (rank 90) sits just below the inflated tail;
    # the shift only shows above it — re-check at .95 via param
    out3 = {
        r["q"]: r["qte"]
        for r in st.quantile_treatment_effect(
            spark.createDataFrame(a + b2, "g string, v double"),
            "g", "a", "b", "v", quantiles=(0.95,),
        ).collect()
    }
    assert out3[0.95] < -400.0


def test_horvitz_thompson_recovers_total(spark):
    from from_superset_to_clickhouse_spark.operators.sampling import (
        horvitz_thompson,
    )

    # a fully-enumerated "sample" with pi=1 returns the exact total
    rows = [(float(v), 1.0) for v in range(1, 11)]
    r = horvitz_thompson(
        spark.createDataFrame(rows, "y double, pi double"), "y", "pi"
    ).collect()[0]
    assert r["ht_total"] == 55.0 and r["ht_se"] == 0.0
    # half-probability sample doubles each kept value
    rows2 = [(10.0, 0.5), (20.0, 0.5)]
    r2 = horvitz_thompson(
        spark.createDataFrame(rows2, "y double, pi double"), "y", "pi"
    ).collect()[0]
    assert r2["ht_total"] == 60.0
    # var = .5*400 + .5*1600 = 1000 -> se = sqrt(1000)
    assert abs(r2["ht_se"] - 1000.0 ** 0.5) < 1e-3


def test_c_chart_counts_empty_buckets_as_zero_subgroups(spark):
    import datetime as dt

    from from_superset_to_clickhouse_spark.operators.temporal import c_chart

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 6 busy days of 30, then a 3-day GAP, then one busy day: the gap
    # days are zero-count subgroups -> n_buckets 10, c_bar pulled down,
    # and each zero day sits below LCL (c_bar > 9 => LCL > 0)
    for d in (0, 1, 2, 3, 4, 5, 9):
        for i in range(30):
            rows.append(("k", t0 + dt.timedelta(days=d, minutes=i)))
    r = c_chart(
        spark.createDataFrame(rows, "key string, ts timestamp"),
        "key", "ts",
    ).collect()[0]
    assert r["n_buckets"] == 10
    assert r["c_bar"] == 21.0          # 210 events / 10 dense days
    assert r["n_out"] == 3             # the three zero days < LCL

