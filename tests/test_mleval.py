"""Offline classifier/ranking evaluation metrics (operators/mleval)."""

import math

import pytest

from from_superset_to_clickhouse_spark.operators.mleval import (
    classifier_eval,
    roc_auc,
    woe_iv,
)


def test_roc_auc_matches_pair_counting(spark):
    # scores with ties across classes; reference = brute-force pairs
    pos = [3.0, 5.0, 5.0, 8.0]
    neg = [1.0, 3.0, 5.0, 6.0, 7.0]
    wins = sum(
        1.0 if p > q else (0.5 if p == q else 0.0)
        for p in pos
        for q in neg
    )
    want = round(wins / (len(pos) * len(neg)), 6)
    df = spark.createDataFrame(
        [(s, 1) for s in pos] + [(s, 0) for s in neg], "s double, y int"
    )
    r = roc_auc(df, "s", "y").collect()[0]
    assert (r.n_pos, r.n_neg) == (4, 5)
    assert abs(r.auc - want) < 1e-9
    assert abs(r.gini_idx - round(2 * want - 1, 6)) < 1e-9


def test_roc_auc_perfect_and_random(spark):
    perfect = spark.createDataFrame(
        [(float(i), 1 if i >= 5 else 0) for i in range(10)],
        "s double, y int",
    )
    assert roc_auc(perfect, "s", "y").collect()[0].auc == 1.0
    # constant score -> all ties -> 0.5
    const = spark.createDataFrame(
        [(1.0, i % 2) for i in range(10)], "s double, y int"
    )
    assert roc_auc(const, "s", "y").collect()[0].auc == 0.5


def test_roc_auc_grouped(spark):
    rows = [("a", float(i), 1 if i >= 5 else 0) for i in range(10)] + [
        ("b", float(i), 1 if i < 5 else 0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, s double, y int")
    got = {
        r.g: r.auc for r in roc_auc(df, "s", "y", ["g"]).collect()
    }
    assert got == {"a": 1.0, "b": 0.0}


def test_classifier_eval_reference(spark):
    # 8 rows, hand-computed scorecard at threshold 0.5
    data = [
        (0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1),
        (0.4, 0), (0.3, 1), (0.2, 0), (0.1, 0),
    ]
    df = spark.createDataFrame(data, "p double, y int")
    r = classifier_eval(df, "p", "y", threshold=0.5, bins=10).collect()[0]
    assert (r.tp, r.fp, r.tn, r.fn) == (3, 1, 3, 1)
    assert r.accuracy == 0.75
    assert r.precision_ == 0.75 and r.recall == 0.75 and r.f1 == 0.75
    brier = sum((p - y) ** 2 for p, y in data) / 8
    assert abs(r.brier - brier) < 1e-5
    # every bin has one sample -> ece = mean |p - y|
    ece = sum(abs(p - y) for p, y in data) / 8
    assert abs(r.ece - round(ece, 6)) < 1e-9


def test_woe_iv_reference(spark):
    # bucket 0: 30 pos / 10 neg; bucket 1: 10 pos / 50 neg
    rows = (
        [(0, 1)] * 30 + [(0, 0)] * 10 + [(1, 1)] * 10 + [(1, 0)] * 50
    )
    df = spark.createDataFrame(rows, "b int, y int")
    got = {r.bucket: r for r in woe_iv(df, "b", "y").collect()}
    tp, tn = 40.0, 60.0
    for b, (np_, nn_) in {0: (30, 10), 1: (10, 50)}.items():
        ps, ns = (np_ + 0.5) / tp, (nn_ + 0.5) / tn
        assert abs(got[b].woe - round(math.log(ps / ns), 6)) < 1e-9
        assert abs(got[b].iv_term - round((ps - ns) * math.log(ps / ns), 6)) < 1e-9
    assert got[0].n_pos == 30 and got[1].n_neg == 50


def test_bradley_terry_recovers_planted_strengths(spark):
    """With wins sampled from known strengths 1:2:4:8, the MM fit
    recovers the ordering and approximate ratios, and a symmetric
    matchup (everyone beats everyone equally) fits all-equal."""
    import random

    from from_superset_to_clickhouse_spark.operators.mleval import (
        bradley_terry,
    )

    rng = random.Random(5)
    s = {0: 1.0, 1: 2.0, 2: 4.0, 3: 8.0}
    rows = []
    for _ in range(2000):
        i, j = rng.sample(range(4), 2)
        w = i if rng.random() < s[i] / (s[i] + s[j]) else j
        rows.append((str(w), str(i if w != i else j)))
    df = spark.createDataFrame(rows, "w string, l string")
    out = bradley_terry(df, "w", "l", iters=8).orderBy("rank").collect()
    assert [r["item"] for r in out] == ["3", "2", "1", "0"]
    # consecutive strength ratios near the planted 2x
    for hi, lo in zip(out, out[1:]):
        assert 1.4 < hi["strength"] / lo["strength"] < 2.9
    even = spark.createDataFrame(
        [(str(i), str(j)) for i in range(3) for j in range(3) if i != j] * 10,
        "w string, l string",
    )
    flat = bradley_terry(even, "w", "l", iters=6).collect()
    for r in flat:
        assert abs(r["strength"] - 1.0) < 1e-6


def test_rank_biased_overlap_bounds_and_truncation(spark):
    """Identical lists hit the truncated maximum 1-p^D exactly;
    disjoint lists score 0; swapping ranks 1 and 2 costs more than
    swapping ranks D-1 and D (top-weightedness)."""
    from from_superset_to_clickhouse_spark.operators.mleval import (
        rank_biased_overlap,
    )

    D, p = 20, 0.9
    ra = spark.createDataFrame(
        [(i, i) for i in range(1, D + 1)], "id int, rank int"
    )
    same = rank_biased_overlap(ra, ra, "id", depth=D, p=p).first()
    assert abs(same["rbo"] - (1 - p ** D)) < 1e-5
    disj = spark.createDataFrame(
        [(100 + i, i) for i in range(1, D + 1)], "id int, rank int"
    )
    assert rank_biased_overlap(ra, disj, "id", depth=D, p=p).first()[
        "rbo"] == 0.0

    def swapped(a, b):
        ranks = {i: i for i in range(1, D + 1)}
        ranks[a], ranks[b] = b, a
        return spark.createDataFrame(
            [(i, r) for i, r in ranks.items()], "id int, rank int"
        )

    top = rank_biased_overlap(ra, swapped(1, 2), "id", depth=D, p=p).first()
    bot = rank_biased_overlap(
        ra, swapped(D - 1, D), "id", depth=D, p=p
    ).first()
    assert top["rbo"] < bot["rbo"] < same["rbo"]


def test_bradley_terry_relabel_equivariance(spark):
    """Renaming the contestants permutes the output rows but leaves
    every (wins, n_matches, strength) triple attached to the same
    underlying item — the fit depends only on match structure."""
    import random

    from from_superset_to_clickhouse_spark.operators.mleval import (
        bradley_terry,
    )

    rng = random.Random(11)
    rows = []
    for _ in range(600):
        i, j = rng.sample(range(4), 2)
        w = i if rng.random() < (i + 1) / (i + j + 2) else j
        rows.append((str(w), str(i if w != i else j)))
    df = spark.createDataFrame(rows, "w string, l string")
    base = {
        r["item"]: (r["wins"], r["n_matches"], r["strength"])
        for r in bradley_terry(df, "w", "l", iters=4).collect()
    }
    ren = {"0": "delta", "1": "alpha", "2": "gamma", "3": "beta"}
    df2 = spark.createDataFrame(
        [(ren[w], ren[l]) for w, l in rows], "w string, l string"
    )
    got = {
        r["item"]: (r["wins"], r["n_matches"], r["strength"])
        for r in bradley_terry(df2, "w", "l", iters=4).collect()
    }
    assert got == {ren[k]: v for k, v in base.items()}


def test_bradley_terry_zero_win_item_kept_at_strength_zero(spark):
    """An item that never wins must stay in the fit with strength 0 —
    dropping it would delete its matches from opponents' denominators
    (and in the 2-item case empty the whole output). A beats B 10-0:
    Hunter MM with mean-1 normalization gives exactly (2, 0)."""
    from from_superset_to_clickhouse_spark.operators.mleval import (
        bradley_terry,
    )

    df = spark.createDataFrame([("a", "b")] * 10, "w string, l string")
    out = {r["item"]: r for r in bradley_terry(df, "w", "l", iters=5).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["wins"] == 10 and out["b"]["wins"] == 0
    assert abs(out["a"]["strength"] - 2.0) < 1e-6
    assert out["b"]["strength"] == 0.0
    assert (out["a"]["rank"], out["b"]["rank"]) == (1, 2)


@pytest.mark.parametrize(
    "seed,k",
    [(23, 7), (7, 3), (101, 29)],
)
def test_bradley_terry_driver_path_matches_distributed(spark, seed, k):
    """The r15 ≤128-item driver fast path must match the distributed MM
    loop value-for-value (same 1e-9 grid trajectory, same rounding, same
    tie-broken ranks) — forced by driver_max_items=0 on one side. The
    equality rests on the grid-noise doctrine (ADVICE r15), so it is
    pinned over several seeds and item-set sizes, not one lucky draw."""
    import random

    from from_superset_to_clickhouse_spark.operators.mleval import (
        bradley_terry,
    )

    rng = random.Random(seed)
    rows = []
    for _ in range(1500):
        i, j = rng.sample(range(k), 2)
        w = i if rng.random() < (i + 1) / (i + j + 2) else j
        rows.append((str(w), str(i if w != i else j)))
    # include a zero-win item so the coalesce(wins, 0) branch is hit
    rows += [("0", "zz")] * 5
    df = spark.createDataFrame(rows, "w string, l string")
    fast = sorted(
        tuple(r) for r in bradley_terry(df, "w", "l", iters=8).collect()
    )
    dist = sorted(
        tuple(r)
        for r in bradley_terry(
            df, "w", "l", iters=8, driver_max_items=0
        ).collect()
    )
    assert fast == dist


def test_logistic_gd_learns_separable(spark):
    """A linearly separable 1-feature problem: the fitted weight is
    positive, accuracy -> 1.0, and reruns are bit-identical (grid
    trajectory, not RNG)."""
    from from_superset_to_clickhouse_spark.operators.mleval import (
        logistic_gd,
    )

    rows = [(1.0 if x > 0 else 0.0, float(x)) for x in range(-50, 51)
            if x != 0]
    df = spark.createDataFrame(rows, "y double, x double")
    r1 = logistic_gd(df, "y", ["x"], iters=8, lr=2.0).first()
    r2 = logistic_gd(df, "y", ["x"], iters=8, lr=2.0).first()
    assert r1 == r2
    assert r1["w1"] > 0
    assert r1["accuracy"] == 1.0
    assert r1["log_loss"] < 0.4


def test_calibration_bins_reference(spark):
    """Hand case: bin 0 holds (.05, y=0)x2 -> conf .05 acc 0; bin 9
    holds (.95, y=1)x2 -> gap .05; wgap = weight x gap."""
    from from_superset_to_clickhouse_spark.operators.mleval import (
        calibration_bins,
    )

    rows = [(0.05, 0), (0.05, 0), (0.95, 1), (0.95, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = {r["bin"]: r for r in calibration_bins(df, "s", "y").collect()}
    assert set(out) == {0, 9}
    assert abs(out[0]["conf"] - 0.05) < 1e-9
    assert out[0]["acc"] == 0.0
    assert abs(out[0]["abs_gap"] - 0.05) < 1e-9
    assert abs(out[0]["wgap"] - 0.5 * 0.05) < 1e-9
    assert abs(out[9]["abs_gap"] - 0.05) < 1e-9
    # score = 1.0 must clamp into the top bin, not bin B
    df2 = spark.createDataFrame([(1.0, 1)], "s double, y int")
    assert calibration_bins(df2, "s", "y").first()["bin"] == 9


def test_cluster_agreement_bounds(spark):
    """Identical partitions -> purity = nmi = 1; a constant clustering
    -> nmi = 0 (zero cluster entropy -> guarded denominator)."""
    from from_superset_to_clickhouse_spark.operators.mleval import (
        cluster_agreement,
    )

    rows = [(i % 3, i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "c int, k int")
    r = cluster_agreement(df, "c", "k").first()
    assert r["purity"] == 1.0 and abs(r["nmi"] - 1.0) < 1e-6
    const = spark.createDataFrame(
        [(0, i % 3) for i in range(30)], "c int, k int"
    )
    r0 = cluster_agreement(const, "c", "k").first()
    assert r0["k_clusters"] == 1
    assert r0["nmi"] == 0.0
    assert abs(r0["purity"] - 1 / 3) < 1e-6


def test_rouge_l_degenerate_inputs(spark):
    """Empty candidate/reference arrays must score 0, not crash the DP
    (sequence(1, 0) is descending) or leak NULL ratios (ADVICE r10)."""
    from from_superset_to_clickhouse_spark.operators.mleval import rouge_l

    df = spark.createDataFrame(
        [
            (1, ["a", "b"], []),       # empty reference: m = 0
            (2, [], ["a", "b"]),       # empty candidate: n_x = 0
            (3, [], []),               # both empty
            (4, ["a", "x", "b"], ["a", "b"]),  # sanity: lcs = 2
        ],
        "id int, xs array<string>, ys array<string>",
    )
    out = {r["id"]: r for r in rouge_l(df, "id", "xs", "ys").collect()}
    for i in (1, 2, 3):
        r = out[i]
        assert r["lcs"] == 0
        assert r["rouge_p"] == 0.0
        assert r["rouge_r"] == 0.0
        assert r["rouge_f"] == 0.0
    assert out[4]["lcs"] == 2 and out[4]["rouge_r"] == 1.0


def test_calibration_bins_clamps_out_of_domain(spark):
    """Scores < 0 clamp to bin 0 and scores >= 1 to bin B-1 — no
    phantom bins outside [0, B-1] (ADVICE r10)."""
    from from_superset_to_clickhouse_spark.operators.mleval import (
        calibration_bins,
    )

    df = spark.createDataFrame(
        [(-0.3, 0), (-0.01, 1), (0.05, 0), (1.0, 1), (1.7, 1)],
        "s double, y int",
    )
    bins = {r["bin"] for r in calibration_bins(df, "s", "y").collect()}
    assert bins == {0, 9}


def test_ipw_ate_n_matches_used_rows(spark):
    """NULL x/t/y rows are excluded from the fit AND from n — the
    reported sample size must describe the rows the estimate used
    (ADVICE r10)."""
    from from_superset_to_clickhouse_spark.operators.mleval import ipw_ate

    rows = [
        (float(i % 7), i % 2, float(i % 3) + 5.0 * (i % 2))
        for i in range(40)
    ]
    clean = spark.createDataFrame(rows, "x double, t int, y double")
    noisy = clean.unionByName(
        spark.createDataFrame(
            [(None, 1, 1.0), (1.0, None, 1.0), (1.0, 0, None)],
            "x double, t int, y double",
        )
    )
    a = ipw_ate(clean, "x", "t", "y").first()
    b = ipw_ate(noisy, "x", "t", "y").first()
    assert a["n"] == 40 and b["n"] == 40
    assert a["ate"] == b["ate"]


def test_mrr_reference(spark):
    from from_superset_to_clickhouse_spark.operators.mleval import mrr

    rows = [
        # q1: first relevant at rank 2 -> 1/2
        ("q1", 9.0, 0, 1), ("q1", 8.0, 1, 2), ("q1", 7.0, 1, 3),
        # q2: first relevant at rank 1 -> 1
        ("q2", 5.0, 1, 1), ("q2", 4.0, 0, 2),
        # q3: no relevant -> 0
        ("q3", 3.0, 0, 1),
    ]
    df = spark.createDataFrame(rows, "q string, s double, r int, id int")
    out = mrr(df, "q", "s", "r", "id").first()
    assert (out["n_queries"], out["n_hit"]) == (3, 2)
    assert abs(out["mrr"] - (0.5 + 1.0 + 0.0) / 3) < 1e-5


def test_mrr_tie_break_is_deterministic(spark):
    from from_superset_to_clickhouse_spark.operators.mleval import mrr

    # tied scores: id ASC breaks the tie, so the relevant doc (id=2)
    # ranks second
    rows = [("q", 5.0, 0, 1), ("q", 5.0, 1, 2)]
    df = spark.createDataFrame(rows, "q string, s double, r int, id int")
    assert abs(mrr(df, "q", "s", "r", "id").first()["mrr"] - 0.5) < 1e-5


def test_map_at_k_reference(spark):
    from from_superset_to_clickhouse_spark.operators.mleval import map_at_k

    # one query, ranking r=[1,0,1,0,1], AP@5 with R=3:
    # hits at ranks 1,3,5 -> (1/1 + 2/3 + 3/5)/3
    rows = [("q", float(10 - i), rel, i) for i, rel in
            [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1)]]
    df = spark.createDataFrame(rows, "q string, s double, r int, id int")
    out = map_at_k(df, "q", "s", "r", "id", k=5).first()
    want = (1 + 2 / 3 + 3 / 5) / 3
    assert abs(out["map"] - want) < 1e-5
    # k=1: only the first hit counts, denominator min(R,k)=1
    out1 = map_at_k(df, "q", "s", "r", "id", k=1).first()
    assert abs(out1["map"] - 1.0) < 1e-5


def test_avg_precision_perfect_and_tied(spark):
    from from_superset_to_clickhouse_spark.operators.mleval import (
        avg_precision,
    )

    perfect = spark.createDataFrame(
        [(1.0, 1), (0.9, 1), (0.1, 0), (0.0, 0)], "s double, y int"
    )
    assert avg_precision(perfect, "s", "y").first()["pr_auc"] == 1.0
    # all-tied scores: single PR point (recall 1, precision = base);
    # trapezoid from (0, 1) -> area = (1+base)/2
    tied = spark.createDataFrame(
        [(0.5, 1)] * 2 + [(0.5, 0)] * 2, "s double, y int"
    )
    r = avg_precision(tied, "s", "y").first()
    assert abs(r["pr_auc"] - (1.0 + 0.5) / 2) < 1e-6


def test_lift_table_top_bucket_lifts(spark):
    from from_superset_to_clickhouse_spark.operators.mleval import (
        lift_table,
    )

    # scores 99..0, positives exactly the top 20 scores -> top two
    # deciles lift 5x, rest 0
    rows = [(float(100 - i), 1 if i <= 20 else 0, i) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "s double, y int, id int")
    out = {r["bucket"]: r for r in lift_table(df, "s", "y", 10).collect()}
    assert len(out) == 10
    assert out[0]["n_bucket"] == 10
    assert abs(out[0]["lift"] - 5.0) < 1e-6
    assert abs(out[1]["lift"] - 5.0) < 1e-6
    assert out[5]["lift"] == 0.0


def test_silhouette_separated_vs_merged(spark):
    from from_superset_to_clickhouse_spark.operators.mleval import (
        silhouette_centroid,
    )

    rows = [([0.0, float(i) / 10], 0) for i in range(5)] + [
        ([100.0, float(i) / 10], 1) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "v array<double>, l int")
    cents = {0: [0.0, 0.2], 1: [100.0, 0.2]}
    out = {r["label"]: r for r in
           silhouette_centroid(df, "v", "l", cents).collect()}
    assert out[0]["silhouette"] > 0.99
    assert out[1]["silhouette"] > 0.99
    # same centroid twice -> b == a -> s == 0
    bad = {0: [0.0, 0.2], 1: [0.0, 0.2]}
    out2 = silhouette_centroid(df, "v", "l", bad).collect()
    assert any(abs(r["silhouette"]) < 1.0 for r in out2)


def test_brier_decomposition_identity(spark):
    """BS == REL - RES + UNC (Murphy identity holds exactly when
    forecasts are constant within bins); a perfect forecaster has
    BS ~ 0, an uninformative one has RES ~ 0."""
    from from_superset_to_clickhouse_spark.operators.mleval import (
        brier_decomposition,
    )

    rows = [(0.05, 0)] * 18 + [(0.05, 1)] * 2 + \
           [(0.95, 1)] * 18 + [(0.95, 0)] * 2
    df = spark.createDataFrame(rows, "s double, y int")
    r = brier_decomposition(df, "s", "y").first()
    assert r["n"] == 40
    assert abs(r["brier"] - (r["reliability"] - r["resolution"]
                             + r["uncertainty"])) < 1e-6
    assert r["uncertainty"] == 0.25
    assert r["brier"] < 0.1


def test_token_f1_reference(spark):
    """Worked multiset overlap: repeated tokens cap at min count;
    disjoint pairs score 0; empty sides degrade to 0 not NULL f1."""
    from from_superset_to_clickhouse_spark.operators.mleval import token_f1

    df = spark.createDataFrame(
        [
            (1, ["a", "b", "b", "c"], ["b", "b", "d"]),
            (2, ["x"], ["y"]),
            (3, [], ["y"]),
            (4, ["same", "same"], ["same", "same"]),
        ],
        "id int, xs array<string>, ys array<string>",
    )
    out = {r["id"]: r for r in token_f1(df, "id", "xs", "ys").collect()}
    r1 = out[1]
    assert r1["overlap"] == 2
    assert r1["precision"] == 0.5 and abs(r1["recall"] - 2 / 3) < 1e-6
    assert out[2]["f1"] == 0.0
    assert out[3]["f1"] == 0.0 and out[3]["precision"] is None
    assert out[4]["f1"] == 1.0


def test_mcc_reference_and_degenerate(spark):
    """Worked confusion (tp=6, fp=1, tn=2, fn=1) against the closed
    form; a single-class predictor (zero marginal) is NULL, and a
    perfect predictor scores 1."""
    import math

    from from_superset_to_clickhouse_spark.operators.mleval import mcc

    rows = ([(0.9, 1)] * 6 + [(0.9, 0)] * 1
            + [(0.1, 0)] * 2 + [(0.1, 1)] * 1)
    df = spark.createDataFrame(rows, "s double, y int")
    r = mcc(df, "s", "y").first()
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (6, 1, 2, 1)
    want = (6 * 2 - 1 * 1) / math.sqrt(7 * 7 * 3 * 3)
    assert abs(r["mcc"] - round(want, 6)) < 1e-9
    allpos = spark.createDataFrame(
        [(0.9, 1)] * 5 + [(0.9, 0)] * 5, "s double, y int"
    )
    assert mcc(allpos, "s", "y").first()["mcc"] is None
    perfect = spark.createDataFrame(
        [(0.9, 1)] * 5 + [(0.1, 0)] * 5, "s double, y int"
    )
    assert mcc(perfect, "s", "y").first()["mcc"] == 1.0
