"""Round-15 temporal / graph / text / multimodal operator reference
tests — pure-Python reference recursions and hand graphs."""

import datetime as dt
import math
import random
import struct

import pytest

import from_superset_to_clickhouse_spark.operators.multimodal as mm
import from_superset_to_clickhouse_spark.operators.temporal as tmp


def _series(spark, vals, key="k"):
    rows = [(key, i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "g string, o int, v double")


def test_theta_forecast_linear_series_is_exact(spark):
    # pure linear series: theta2 line == the series, SES converges on
    # recent values, forecast must track the line's next point closely
    vals = [10.0 + 2.0 * i for i in range(20)]
    r = tmp.theta_forecast(_series(spark, vals), "g", "o", "v").collect()[0]
    assert abs(r["slope"] - 2.0) < 1e-6
    assert abs(r["intercept"] - 8.0) < 1e-5
    assert abs(r["forecast"] - 50.0) < 2.1  # SES flat part lags the trend


def test_aroon_hand(spark):
    # peak at index 2, trough at index 5 (period 3 -> window of 4)
    vals = [1.0, 2.0, 9.0, 5.0, 4.0, 0.5, 3.0]
    out = {r["o"]: (r["aroon_up"], r["aroon_down"]) for r in
           tmp.aroon(_series(spark, vals), "g", "o", "v", period=3).collect()}
    assert out[0] == (None, None) and out[2] == (None, None)
    # at i=3 (window 0..3): high at 2 -> up = 100*(3-1)/3; low at 0
    assert abs(out[3][0] - 200.0 / 3.0) < 1e-4
    assert abs(out[3][1] - 0.0) < 1e-9
    # at i=5: low IS current -> down = 100
    assert abs(out[5][1] - 100.0) < 1e-9


def _bars_df(spark, n_days=30, seed=7):
    rng = random.Random(seed)
    t0 = dt.datetime(2024, 1, 1)
    rows, price = [], 50.0
    for d in range(n_days):
        for i in range(5):
            price += rng.gauss(0, 1.0)
            rows.append(("k", t0 + dt.timedelta(days=d, hours=4 * i),
                         price, i))
    return spark.createDataFrame(rows, "k string, ts timestamp, v double, tb int")


def _ohlc_ref(df):
    rows = sorted(df.collect(), key=lambda r: (r["ts"], r["tb"]))
    bars = {}
    for r in rows:
        day = r["ts"].date()
        b = bars.setdefault(day, {"o": r["v"], "h": r["v"], "l": r["v"],
                                  "c": r["v"], "vol": 0})
        b["h"] = max(b["h"], r["v"]); b["l"] = min(b["l"], r["v"])
        b["c"] = r["v"]; b["vol"] += 1
    return [bars[d] for d in sorted(bars)]


def test_chaikin_money_flow_reference(spark):
    df = _bars_df(spark)
    out = [r["cmf"] for r in tmp.chaikin_money_flow(
        df, "k", "ts", "v", "tb", period=5).orderBy("bar_start").collect()]
    bars = _ohlc_ref(df)
    q = 2.0**20
    mfv = [math.floor((0.0 if b["h"] == b["l"] else
                       ((b["c"] - b["l"]) - (b["h"] - b["c"]))
                       / (b["h"] - b["l"])) * b["vol"] * q) / q
           for b in bars]
    for i in range(len(bars)):
        if i < 4:
            assert out[i] is None
        else:
            ref = sum(mfv[i - 4:i + 1]) / sum(b["vol"] for b in bars[i - 4:i + 1])
            assert abs(out[i] - ref) < 1e-5


def test_vortex_reference(spark):
    df = _bars_df(spark, seed=13)
    out = [(r["vi_plus"], r["vi_minus"]) for r in tmp.vortex_indicator(
        df, "k", "ts", "v", "tb", period=5).orderBy("bar_start").collect()]
    bars = _ohlc_ref(df)
    q = 2.0**20
    g = lambda x: math.floor(x * q) / q  # noqa: E731
    vmp = [None] + [g(abs(bars[i]["h"] - bars[i - 1]["l"]))
                    for i in range(1, len(bars))]
    vmm = [None] + [g(abs(bars[i]["l"] - bars[i - 1]["h"]))
                    for i in range(1, len(bars))]
    tr = [None] + [g(max(bars[i]["h"] - bars[i]["l"],
                         abs(bars[i]["h"] - bars[i - 1]["c"]),
                         abs(bars[i]["l"] - bars[i - 1]["c"])))
                   for i in range(1, len(bars))]
    for i in range(len(bars)):
        if i < 5:
            assert out[i][0] is None
        else:
            st = sum(tr[i - 4:i + 1])
            assert abs(out[i][0] - sum(vmp[i - 4:i + 1]) / st) < 1e-5
            assert abs(out[i][1] - sum(vmm[i - 4:i + 1]) / st) < 1e-5


def test_supertrend_reference_recursion(spark):
    df = _bars_df(spark, seed=21, n_days=40)
    out = [(r["supertrend"], r["direction"]) for r in tmp.supertrend(
        df, "k", "ts", "v", "tb", period=5, mult=2.0
    ).orderBy("bar_start").collect()]
    bars = _ohlc_ref(df)
    q = 2.0**20
    g = lambda x: math.floor(x * q) / q  # noqa: E731
    tr = []
    for i, b in enumerate(bars):
        base = b["h"] - b["l"]
        if i == 0:
            tr.append(g(base))
        else:
            pc = bars[i - 1]["c"]
            tr.append(g(max(base, abs(b["h"] - pc), abs(b["l"] - pc))))
    ub = lb = stv = cq = None
    for i, b in enumerate(bars):
        if i < 4:
            assert out[i] == (None, None)
            continue
        atr = g(sum(tr[i - 4:i + 1]) / 5.0)
        bu = g((b["h"] + b["l"]) / 2.0 + 2.0 * atr)
        bl = g((b["h"] + b["l"]) / 2.0 - 2.0 * atr)
        c = g(b["c"])
        if ub is None:
            ub, lb = bu, bl
            stv = ub if c <= bu else bl
        else:
            nub = bu if (bu < ub or cq > ub) else ub
            nlb = bl if (bl > lb or cq < lb) else lb
            if stv == ub:
                stv = nub if c <= nub else nlb
            else:
                stv = nlb if c >= nlb else nub
            ub, lb = nub, nlb
        cq = c
        assert abs(out[i][0] - round(stv, 6)) < 1e-9, i
        assert out[i][1] == ("down" if stv == ub else "up"), i


def test_seasonal_esd_finds_planted_spikes(spark):
    rng = random.Random(8)
    t0 = dt.date(2024, 1, 1)
    rows = []
    for d in range(35):
        day = t0 + dt.timedelta(days=d)
        v = 50.0 + 5.0 * (day.weekday() == 5) + rng.gauss(0, 1)
        if d == 12:
            v += 60.0
        if d == 25:
            v -= 55.0
        rows.append(("g", day, v))
    out = tmp.seasonal_esd(
        spark.createDataFrame(rows, "g string, d date, v double"),
        "g", "d", "v", lambdas=(2.5, 2.5, 2.5),
    ).collect()
    got = {r["d"] for r in out}
    assert t0 + dt.timedelta(days=12) in got
    assert t0 + dt.timedelta(days=25) in got


def test_louvain_move_hand_gains(spark):
    # two triangles + bridge; m=7: node 2 ties between 0 and 1 at
    # gain 8 -> smallest id 0; bridge gain 14-9=5 loses
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    from from_superset_to_clickhouse_spark.operators.graph import (
        louvain_move,
        modularity,
    )

    df = spark.createDataFrame(edges, "src int, dst int")
    asg = {r["node"]: r["community"] for r in louvain_move(df).collect()}
    assert asg == {0: 1, 1: 0, 2: 0, 3: 4, 4: 5, 5: 4}
    roll = {r["community"]: r for r in modularity(df, asg_df).collect()} \
        if False else None
    rolls = {r["community"]: (r["n_nodes"], r["e_in"], r["d_tot"])
             for r in modularity(df, louvain_move(df)).collect()}
    # community 0 = {1, 2}: 1 internal edge, degree sum 2+3
    assert rolls[0] == (2, 1, 5)
    # Q sums the terms: e_in/m - (d/2m)^2 exactly
    q = sum(r["q_term"] for r in modularity(df, louvain_move(df)).collect())
    ref = (1 / 7 - (5 / 14) ** 2) * 2 + (0 / 7 - (2 / 14) ** 2) * 2
    assert abs(q - ref) < 1e-5


def test_betweenness_matches_reference_brandes(spark):
    from collections import deque

    from from_superset_to_clickhouse_spark.operators.graph import (
        betweenness_from_pivots,
    )

    def brandes(nodes, adj, pivots):
        bc = {v: 0.0 for v in nodes}
        for s in pivots:
            S = []
            P = {v: [] for v in nodes}
            sigma = {v: 0 for v in nodes}
            d = {v: -1 for v in nodes}
            sigma[s] = 1
            d[s] = 0
            Q = deque([s])
            while Q:
                v = Q.popleft()
                S.append(v)
                for w in adj.get(v, []):
                    if d[w] < 0:
                        d[w] = d[v] + 1
                        Q.append(w)
                    if d[w] == d[v] + 1:
                        sigma[w] += sigma[v]
                        P[w].append(v)
            delta = {v: 0.0 for v in nodes}
            while S:
                w = S.pop()
                for v in P[w]:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
                if w != s:
                    bc[w] += delta[w]
        return {v: b / 2.0 for v, b in bc.items()}

    rng = random.Random(17)
    arcs = {(rng.randrange(14), rng.randrange(14)) for _ in range(25)}
    arcs = {(a, b) for a, b in arcs if a != b}
    adj = {}
    for a, b in arcs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    nodes = sorted(adj)
    pivots = nodes  # all pivots -> exact betweenness
    ref = brandes(nodes, adj, pivots)
    df = spark.createDataFrame(sorted(arcs), "src int, dst int")
    got = {r["node"]: r["betweenness"]
           for r in betweenness_from_pivots(df, pivots, max_hops=14).collect()}
    for v in nodes:
        assert abs(got[v] - ref[v]) < 1e-3, (v, got[v], ref[v])


def test_betweenness_raises_on_insufficient_hops(spark):
    from from_superset_to_clickhouse_spark.operators.graph import (
        betweenness_from_pivots,
    )

    chain = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(chain, "src int, dst int")
    with pytest.raises(ValueError, match="BFS not exhausted"):
        betweenness_from_pivots(df, [0], max_hops=2).collect()


def test_adpcm_roundtrip_and_reference_step():
    # reference: first step from (pred 0, index 0), nibble 5:
    # step 7, diff = 0 + 7>>2 + 0 + 7>>3 -> 0.. compute explicitly
    p, i = mm.ima_adpcm_step(0, 0, 5)
    # step=7: diff = 7>>3=0, +1&5 ->7>>2=1, +4&5 ->7 => diff=0+1+7=8
    assert p == 8 and i == 4  # index_table[5] = 4
    rng = random.Random(1)
    pcm = [int(3000 * math.sin(t / 15.0)) + rng.randrange(-40, 40)
           for t in range(400)]
    import numpy as np

    enc = mm.ima_adpcm_encode(np.asarray(pcm, dtype=np.int16))
    dec = mm.ima_adpcm_decode_raw(enc, 0, 0, 400)
    # encoder feeds back through the exact decoder step, so decode
    # must land on the encoder's own predictor trajectory EXACTLY
    pred, idx = 0, 0
    for t, s in enumerate(pcm):
        step = mm.IMA_STEP_TABLE[idx]
        delta = s - pred
        code = 0
        if delta < 0:
            code, delta = 8, -delta
        if delta >= step:
            code |= 4
            delta -= step
        if delta >= step >> 1:
            code |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            code |= 1
        pred, idx = mm.ima_adpcm_step(pred, idx, code)
        assert int(dec[t]) == pred, t
    # and once the step has warmed past the transient, the
    # reconstruction tracks the gentle signal within the step scale
    err = max(abs(int(d) - int(x)) for d, x in zip(dec[50:], pcm[50:]))
    assert err < 1200


def test_adpcm_wav_block_decode_and_quarantine(spark):
    import numpy as np

    pcm = np.asarray([int(3000 * math.sin(t / 5.0)) for t in range(100)],
                     dtype=np.int16)
    body = struct.pack("<hBB", int(pcm[0]), 10, 0) + mm.ima_adpcm_encode(
        pcm, int(pcm[0]), 10
    )
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 17, 1, 8000, 4000, len(body), 4)
           + b"data" + struct.pack("<I", len(body)) + body)
    rate, ch, s = mm.decode_wav_samples_any(hdr)
    assert rate == 8000 and ch == 1 and s[0, 0] == pcm[0]
    with pytest.raises(ValueError):
        mm.decode_wav_adpcm(hdr[:30])  # truncated
    # operator-level quarantine: bad index dropped, good row decoded
    df = spark.createDataFrame(
        [(1, bytes([0x21, 0x43]), 5), (2, bytes([0x21]), 99)],
        "media_id long, payload binary, idx0 int",
    )
    out = mm.adpcm_decode(df, "media_id", "payload", "idx0").collect()
    assert [r["media_id"] for r in out] == [1]
    assert out[0]["n_samples"] == 4


def test_aho_corasick_overlapping_and_null(spark):
    from from_superset_to_clickhouse_spark.operators.text import (
        multi_needle_match,
    )

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, None), (3, "xyz")],
        "doc_id int, text string",
    )
    out = {(r["doc_id"], r["needle"]): (r["n_matches"], r["first_pos"])
           for r in multi_needle_match(df, ["aa", "aaa"]).collect()}
    # overlapping counts: "aa" x3, "aaa" x2 in "aaaa"
    assert out[(1, "aa")] == (3, 1)
    assert out[(1, "aaa")] == (2, 1)
    assert (2, "aa") not in out and (3, "aa") not in out
