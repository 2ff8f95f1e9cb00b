"""Round-12 graph/relational/geo/stats additions: hand references."""

from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.operators.graph import (
    link_prediction_scores,
    reciprocity,
)
from from_superset_to_clickhouse_spark.operators.geo import (
    point_in_polygons,
)
from from_superset_to_clickhouse_spark.operators.relational import (
    skyline_2d,
)
from from_superset_to_clickhouse_spark.operators.stats import (
    lorenz_curve,
    newey_west_se,
)


def test_reciprocity_hand(spark):
    # edges: 1->2, 2->1 (mutual), 1->3, 3->3 (self loop, dropped),
    # duplicate 1->2 (dedup)
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 3), (1, 2)], "u int, v int"
    )
    r = reciprocity(df, "u", "v").collect()[0]
    assert (r["n_edges"], r["n_mutual"]) == (3, 2)
    assert r["reciprocity"] == round(2 / 3, 6)


def test_link_prediction_scores_hand(spark):
    # bipartite: nodes 1,2 share keys a,b; node 3 only key a
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a")],
        "n int, k string",
    )
    got = {
        (r["a"], r["b"]): r
        for r in link_prediction_scores(df, "n", "k", min_common=1).collect()
    }
    assert got[(1, 2)]["common"] == 2
    assert got[(1, 2)]["pref_attachment"] == 4
    assert got[(1, 2)]["cosine"] == 1.0
    assert got[(1, 3)]["common"] == 1 and got[(1, 3)]["pref_attachment"] == 2


def test_skyline_2d_hand(spark):
    # minimize both: frontier = (1,9), (5,5), (9,1); (6,6) dominated
    # by (5,5); (1,9) duplicate survives twice; same-x (5,7) dominated
    df = spark.createDataFrame(
        [(1, 1.0, 9.0), (2, 5.0, 5.0), (3, 9.0, 1.0), (4, 6.0, 6.0),
         (5, 1.0, 9.0), (6, 5.0, 7.0)],
        "id int, x double, y double",
    )
    got = sorted(r["id"] for r in skyline_2d(df, "x", "y").collect())
    assert got == [1, 2, 3, 5]


def test_point_in_polygons_hand(spark):
    pts = spark.createDataFrame(
        [(1, 3.0, 3.0),   # inside square + triangle + chevron
         (2, 0.5, 0.5),   # inside triangle only (outside square/chevron)
         (3, 5.0, 7.5),   # inside square; chevron notch excludes it
         (4, 20.0, 20.0)],  # outside everything
        "point_id int, x double, y double",
    )
    polys = spark.createDataFrame(
        [(1, 0, 0.0, 0.0), (1, 1, 9.0, 0.0), (1, 2, 0.0, 9.0),
         (2, 0, 2.0, 2.0), (2, 1, 8.0, 2.0), (2, 2, 8.0, 8.0),
         (2, 3, 2.0, 8.0),
         (3, 0, 1.0, 1.0), (3, 1, 9.0, 1.0), (3, 2, 9.0, 9.0),
         (3, 3, 5.0, 5.0), (3, 4, 1.0, 9.0)],
        "poly_id int, vidx int, x double, y double",
    )
    got = {
        (r["point_id"], r["poly_id"])
        for r in point_in_polygons(pts, polys).collect()
    }
    assert (1, 1) in got and (1, 2) in got and (1, 3) in got
    assert (2, 1) in got and (2, 2) not in got and (2, 3) not in got
    # chevron notch: (5, 7.5) is inside the square but above the notch
    assert (3, 2) in got and (3, 3) not in got
    assert not any(p == 4 for p, _ in got)


def test_newey_west_autocorrelated_inflates(spark):
    # slow square wave (8-run blocks): strong positive autocorrelation
    vals = ([10.0] * 8 + [0.0] * 8) * 8
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "o int, v double"
    )
    r = newey_west_se(df, "o", "v", lags=5).collect()[0]
    assert r["inflation"] > 1.5
    # alternating series: negative lag-1 autocorr -> deflation
    alt = spark.createDataFrame(
        [(i, float(10 * (i % 2))) for i in range(128)], "o int, v double"
    )
    ra = newey_west_se(alt, "o", "v", lags=5).collect()[0]
    assert ra["inflation"] < 0.7


def test_lorenz_curve_uniform_vs_concentrated(spark):
    uni = spark.createDataFrame([(1.0,)] * 100, "v double")
    r = {x["decile"]: x for x in lorenz_curve(uni, "v").collect()}
    # all mass in one distinct value -> single block in decile 0
    assert r[0]["cum_val_frac"] == 1.0
    skew = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "v double"
    )
    rows = sorted(
        lorenz_curve(skew, "v").collect(), key=lambda x: x["decile"]
    )
    # Lorenz curve is below the diagonal for unequal values
    for row in rows[:-1]:
        assert row["cum_val_frac"] < row["cum_pop_frac"]
    assert rows[-1]["cum_val_frac"] == 1.0
    # bottom decile (values 1..10): 55/5050
    assert abs(rows[0]["cum_val_frac"] - 55.0 / 5050.0) < 1e-6


# -- round-14: Moran's I ----------------------------------------------------


def test_morans_i_gradient_vs_checkerboard(spark):
    from from_superset_to_clickhouse_spark.operators.geo import (
        morans_i_grid,
    )

    grad = [
        (i, j, float(i + j)) for i in range(6) for j in range(6)
    ]
    r = morans_i_grid(
        spark.createDataFrame(grad, "i int, j int, v double"),
        "i", "j", "v",
    ).collect()[0]
    assert r["n_cells"] == 36 and r["w_sum"] == 2 * 60
    assert r["morans_i"] > 0.5  # smooth field: strong positive
    # checkerboard: perfect negative autocorrelation, I -> -1
    cb = [
        (i, j, 1.0 if (i + j) % 2 == 0 else -1.0)
        for i in range(6)
        for j in range(6)
    ]
    r2 = morans_i_grid(
        spark.createDataFrame(cb, "i int, j int, v double"),
        "i", "j", "v",
    ).collect()[0]
    assert r2["morans_i"] < -0.9
    assert abs(r2["expected_i"] - (-1.0 / 35.0)) < 1e-6


def test_geary_c_gradient_vs_checkerboard(spark):
    from from_superset_to_clickhouse_spark.operators.geo import (
        geary_c_grid,
    )

    grad = [(i, j, float(i + j)) for i in range(6) for j in range(6)]
    r = geary_c_grid(
        spark.createDataFrame(grad, "i int, j int, v double"),
        "i", "j", "v",
    ).collect()[0]
    assert r["geary_c"] < 0.5  # smooth field: C well below 1
    cb = [
        (i, j, 1.0 if (i + j) % 2 == 0 else -1.0)
        for i in range(6) for j in range(6)
    ]
    r2 = geary_c_grid(
        spark.createDataFrame(cb, "i int, j int, v double"),
        "i", "j", "v",
    ).collect()[0]
    assert r2["geary_c"] > 1.5  # dispersed: C well above 1


def test_getis_ord_hotspot_vs_scattered(spark):
    from from_superset_to_clickhouse_spark.operators.geo import (
        getis_ord_g,
    )

    # high values clustered in one corner -> G above expectation
    hot = [
        (i, j, 10.0 if i < 2 and j < 2 else 1.0)
        for i in range(6) for j in range(6)
    ]
    r = getis_ord_g(
        spark.createDataFrame(hot, "i int, j int, v double"),
        "i", "j", "v",
    ).collect()[0]
    assert r["g_stat"] > r["expected_g"]
    # constant field: G equals its expectation exactly
    flat = [(i, j, 5.0) for i in range(6) for j in range(6)]
    r2 = getis_ord_g(
        spark.createDataFrame(flat, "i int, j int, v double"),
        "i", "j", "v",
    ).collect()[0]
    assert abs(r2["g_stat"] - r2["expected_g"]) < 1e-9
