"""Property-based tests (SURVEY §5: property tier).

Small example counts — each example spins real Spark jobs; the point is
randomized structure (orderings, duplicates, split points), not volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from from_superset_to_clickhouse_spark.tablestore import TableStore
from tests.conftest import logs_schema

BASE = dt.datetime(2024, 1, 1)

# (id, version-offset-minutes) event stream with duplicate ids.
EVENTS = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 500)),
    min_size=1,
    max_size=12,
)


def _rows(events):
    return [
        (i, BASE + dt.timedelta(minutes=m), f"v{i}.{m}") for i, m in events
    ]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=EVENTS, split=st.integers(0, 12))
def test_latest_view_is_last_write_wins(spark, tmp_path_factory, events, split):
    """For ANY append order and batch split, latest_view keeps exactly
    the (version, ingest-order)-max row per key — the deterministic
    ReplacingMergeTree contract."""
    store = TableStore(spark, str(tmp_path_factory.mktemp("prop")))
    schema = logs_schema("t")
    store.create(schema)
    rows = _rows(events)
    cut = min(split, len(rows))
    for batch in (rows[:cut], rows[cut:]):
        if batch:
            store.append(
                "t", spark.createDataFrame(batch, "id int, dttm timestamp, v string")
            )

    expected = {}
    for seq, batch in enumerate((rows[:cut], rows[cut:])):
        for i, ts, v in batch:
            prev = expected.get(i)
            # version (dttm) desc, then ingest seq desc, then within a
            # batch the later row of equal version wins nothing extra —
            # row_number tie-break inside one batch is by ingest seq
            # (equal), so any same-(version, seq) duplicate is a valid
            # winner; construct values so that never happens.
            if prev is None or (ts, seq) >= (prev[0], prev[1]):
                expected[i] = (ts, seq, v)

    got = {r["id"]: (r["dttm"], r["v"]) for r in store.latest_view("t").collect()}
    assert got.keys() == expected.keys()
    for k, (ts, _seq, v) in expected.items():
        assert got[k][0] == ts, (k, got[k], expected[k])


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_delete_where_partition_pruned_complement(spark, tmp_path_factory, data):
    """delete_where(cond) + remaining rows == original rows minus the
    cond-matching set, for random month distributions and cutoffs —
    and NULL-predicate rows are always kept (SQL DELETE semantics)."""
    from pyspark.sql import functions as F

    months = data.draw(
        st.lists(st.integers(1, 6), min_size=1, max_size=10), label="months"
    )
    cutoff_month = data.draw(st.integers(1, 7), label="cutoff")
    store = TableStore(spark, str(tmp_path_factory.mktemp("propdel")))
    store.create(logs_schema("t"))
    rows = [
        (i, dt.datetime(2024, m, 15), f"r{i}") for i, m in enumerate(months)
    ]
    store.append(
        "t", spark.createDataFrame(rows, "id int, dttm timestamp, v string")
    )
    cutoff = dt.datetime(2024, cutoff_month, 1)
    n = store.delete_where("t", F.col("dttm") < F.lit(cutoff))
    expected_kept = sorted(i for i, m in enumerate(months) if dt.datetime(2024, m, 15) >= cutoff)
    kept = sorted(r["id"] for r in store.read("t").collect())
    assert kept == expected_kept
    assert n == len(rows) - len(expected_kept)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    frags=st.lists(
        st.sampled_from(
            list("ab <>/\"'9;#") + ["&amp;", "<b>", "</b>", "&lt;", "&nbsp;"]
        ),
        max_size=15,
    )
)
def test_strip_markup_normalizes_whitespace_and_is_stable_sans_entities(
    spark, frags
):
    """For ANY tag/entity soup: the output has collapsed, trimmed
    whitespace. For ENTITY-FREE input, stripping is idempotent.
    (With entities it deliberately is not: decode runs AFTER tag
    removal, so '&lt;b&gt;' decodes to a literal '<b>' in the text —
    corpus cleaning keeps what the document *displayed*.)"""
    from pyspark.sql import functions as F

    from from_superset_to_clickhouse_spark.operators.text import strip_markup

    text = "".join(frags)
    df = spark.createDataFrame([(text,)], "t string")
    once, twice = df.select(
        strip_markup(F.col("t")).alias("a"),
        strip_markup(strip_markup(F.col("t"))).alias("b"),
    ).first()
    assert "  " not in once and once == once.strip()
    if "&" not in text:
        assert once == twice


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-100, 100, allow_nan=False, width=32),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_quantize_codes_always_bounded_and_exact_for_extremes(spark, vecs):
    """For ANY float vectors: codes in [-127, 127]; the max-|v| element
    of each vector quantizes to exactly ±127 (scale anchor)."""
    from pyspark.sql import functions as F

    from from_superset_to_clickhouse_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    rows = quantize_embeddings(df).collect()
    for r in rows:
        assert all(-127 <= c <= 127 for c in r["qvec"])
        if r["scale"] > 0:
            assert 127 in [abs(c) for c in r["qvec"]]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=EVENTS)
def test_sessionize_seq_is_contiguous_from_one(spark, events):
    """For ANY event stream: per key, session_seq starts at 1, never
    decreases along (ts, id) order, and increments by at most 1."""
    from pyspark.sql import functions as F

    from from_superset_to_clickhouse_spark.operators.temporal import sessionize

    rows = _rows(events)
    df = spark.createDataFrame(rows, "id int, dttm timestamp, v string")
    out = sessionize(
        df, key_col="id", ts_col="dttm", gap_minutes=60, tiebreak_col="v"
    ).collect()
    by_key: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["id"], r["dttm"], r["v"])):
        by_key.setdefault(r["id"], []).append(r["session_seq"])
    for seqs in by_key.values():
        assert seqs[0] == 1
        for a, b in zip(seqs, seqs[1:]):
            assert b in (a, a + 1)


@given(
    duration_ms=st.integers(min_value=1, max_value=5000),
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    channels=st.integers(min_value=1, max_value=2),
    bits=st.sampled_from([8, 16, 32]),
)
@settings(max_examples=60, deadline=None)
def test_wav_codec_roundtrip_for_any_parameters(duration_ms, rate, channels, bits):
    """For ANY PCM parameters: decode(encode(x)) recovers rate and
    channels exactly, and duration within the one-frame truncation the
    integer frame count implies (encode floors to whole frames)."""
    from from_superset_to_clickhouse_spark.operators import multimodal as mm

    payload = mm.encode_wav(
        duration_ms, sample_rate=rate, channels=channels, bits=bits
    )
    fmt, got_rate, got_channels, got_ms = mm.decode_wav_header(payload)
    assert (fmt, got_rate, got_channels) == ("wav", rate, channels)
    n_frames = rate * duration_ms // 1000
    assert got_ms == n_frames * 1000 // rate
    assert 0 <= duration_ms - got_ms <= 1000 // min(rate, 1000) + 1


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=400,
    ),
    rate=st.sampled_from([8000, 44100]),
    channels=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=60, deadline=None)
def test_pcm_sample_codec_is_identity(samples, rate, channels):
    """For ANY int16 sample block: decode_wav_samples(encode_wav_pcm(x))
    returns exactly x (whole frames), proving the sample decode is a
    true byte-level inverse — endianness, interleave and data offset
    all on the hook."""
    import numpy as np

    from from_superset_to_clickhouse_spark.operators import multimodal as mm

    n_frames = len(samples) // channels
    if n_frames == 0:
        return
    a = np.array(
        samples[: n_frames * channels], dtype=np.int16
    ).reshape(n_frames, channels)
    got_rate, got_ch, frames = mm.decode_wav_samples(
        mm.encode_wav_pcm(a, rate)
    )
    assert (got_rate, got_ch) == (rate, channels)
    assert np.array_equal(frames, a)


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(1, 24),
    height=st.integers(1, 16),
    filter_type=st.integers(0, 4),
    color=st.one_of(
        st.none(),
        st.tuples(
            st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
        ),
    ),
)
def test_png_codec_roundtrip_for_any_parameters(
    width, height, filter_type, color
):
    """Pure-codec property (no Spark): for ANY dimensions, filter type
    and color mode, decode(encode(...)) recovers exactly the planted
    samples, and encode_png_raw is the exact inverse of
    decode_png_pixels."""
    from from_superset_to_clickhouse_spark.operators import multimodal as mm

    p = mm.encode_png(width, height, color=color, filter_type=filter_type)
    w, h, ch, px = mm.decode_png_pixels(p)
    assert (w, h) == (width, height)
    if color is None:
        assert ch == 1
        assert px == bytes(
            (x + y) % 256 for y in range(height) for x in range(width)
        )
    else:
        assert ch == 3
        assert px == bytes(c & 0xFF for c in color) * (width * height)
    assert mm.decode_png_pixels(mm.encode_png_raw(w, h, ch, px)) == (
        w, h, ch, px,
    )


@settings(max_examples=25, deadline=None)
@given(
    w2=st.integers(1, 8),
    h2=st.integers(1, 6),
    factor=st.integers(1, 3),
    filter_type=st.integers(0, 4),
)
def test_png_downsample_ramp_closed_form(w2, h2, factor, filter_type):
    """Box downsample of the (x+y) ramp by ANY factor: output pixel
    (X, Y) = round-half-up of the mean over its block, which for a
    linear ramp is fX + fY + (f-1) exactly (the block sum divides
    evenly when f is odd; rounds up from .0 or .5 consistently via
    (sum + n/2) // n)."""
    from from_superset_to_clickhouse_spark.operators import multimodal as mm

    w, h = w2 * factor, h2 * factor
    if w + h - 2 > 255:  # keep ramp samples exact (no mod wrap)
        return
    d = mm.downsample_png(
        mm.encode_png(w, h, filter_type=filter_type), factor
    )
    ww, hh, ch, px = mm.decode_png_pixels(d)
    assert (ww, hh, ch) == (w2, h2, 1)
    f, n = factor, factor * factor
    for Y in range(h2):
        for X in range(w2):
            block_sum = sum(
                (f * X + dx) + (f * Y + dy)
                for dy in range(f)
                for dx in range(f)
            )
            assert px[Y * w2 + X] == (block_sum + n // 2) // n


MERGE_ROWS = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 4), st.integers(-50, 50)),
    min_size=0,
    max_size=10,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=MERGE_ROWS, src=MERGE_ROWS, delete=st.booleans())
def test_merge_into_matches_reference_model(
    spark, tmp_path_factory, base, src, delete
):
    """For ANY base table and key-unique source batch, merge_into's
    final state equals the dict-model reference: matched keys updated
    (or deleted), unmatched source keys inserted, everything else
    untouched."""
    from from_superset_to_clickhouse_spark.schema import Field, Schema
    from from_superset_to_clickhouse_spark.tablestore import TableStore

    # key-unique source (contract): last occurrence wins in the model
    src_u = {}
    for k, p, v in src:
        src_u[k] = (k, p, v)
    src_rows = list(src_u.values())

    store = TableStore(spark, str(tmp_path_factory.mktemp("merge_prop")))
    store.create(
        Schema(
            "t",
            (
                Field("id", "bigint", nullable=False),
                Field("p", "bigint", nullable=False),
                Field("v", "bigint"),
            ),
            partition_by=("p",),
        )
    )
    sch = "id bigint, p bigint, v bigint"
    if base:
        # base may repeat keys (append-only table allows it); dedupe to
        # keep the model simple AND satisfy determinism (merge updates
        # every copy of a matched key)
        base_u = list({k: (k, p, v) for k, p, v in base}.values())
        store.append("t", spark.createDataFrame(base_u, sch))
    else:
        base_u = []
    if src_rows:
        res = store.merge_into(
            "t",
            spark.createDataFrame(src_rows, sch),
            on=["id"],
            delete_matched=delete,
        )
    else:
        res = store.merge_into(
            "t", spark.createDataFrame([], sch), on=["id"], delete_matched=delete
        )

    model = {k: (k, p, v) for k, p, v in base_u}
    n_upd = n_del = n_ins = 0
    for k, p, v in src_rows:
        if k in model:
            if delete:
                del model[k]
                n_del += 1
            else:
                mk, mp, mv = model[k]
                model[k] = (mk, mp, v)  # p is partition: not updated
                n_upd += 1
        else:
            model[k] = (k, p, v)
            n_ins += 1
    assert res == {"updated": n_upd, "deleted": n_del, "inserted": n_ins}
    got = {
        r["id"]: (r["id"], r["p"], r["v"]) for r in store.read("t").collect()
    }
    assert got == model


@given(
    data=st.lists(st.integers(0, 255), min_size=0, max_size=3000),
    bits=st.integers(min_value=2, max_value=8),
)
@settings(max_examples=60, deadline=None)
def test_gif_lzw_codec_is_identity(data, bits):
    """For ANY index stream and min-code-size: LZW decode(encode(x))
    == x — variable code widths, the KwKwK case, the tail width bump
    before EOI, and 4096-entry dictionary resets all on the hook."""
    from from_superset_to_clickhouse_spark.operators import multimodal as mm

    idx = bytes(v % (1 << bits) for v in data)
    assert mm._lzw_decompress(mm._lzw_compress(idx, bits), bits) == idx


@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    ncol=st.integers(1, 6),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=40, deadline=None)
def test_gif_pixel_codec_roundtrip(w, h, ncol, seed):
    """For ANY dimensions/palette: decode_gif_pixels(encode_gif_pixels)
    recovers exactly the palette-mapped RGB bytes, and the container
    header still parses as a GIF with the right dimensions."""
    import random

    from from_superset_to_clickhouse_spark.operators import multimodal as mm

    rng = random.Random(seed)
    pal = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(ncol)
    ]
    idx = bytes(rng.randrange(ncol) for _ in range(w * h))
    gif = mm.encode_gif_pixels(w, h, idx, pal)
    assert mm.decode_image_header(gif) == ("gif", w, h)
    assert mm.decode_gif_pixels(gif) == (
        w, h, 3, b"".join(bytes(pal[i]) for i in idx)
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abcd")), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_cut_repeated_spans_matches_reference_model(spark, docs):
    """For ANY corpus over a 4-token vocabulary: cut_repeated_spans
    equals an independent pure-Python model — windows shared by >= 2
    docs, n-wide coverage union, ordered survivor rebuild. Overlap
    merging, all-boilerplate collapse and sub-n docs all land in the
    random space."""
    from from_superset_to_clickhouse_spark.operators.text import (
        cut_repeated_spans,
    )

    n = 2
    texts = [" ".join(toks) for toks in docs]

    # reference model
    wins: dict[str, set[int]] = {}
    for d, toks in enumerate(docs):
        for i in range(len(toks) - n + 1):
            wins.setdefault(" ".join(toks[i : i + n]), set()).add(d)
    shared = {g for g, ds in wins.items() if len(ds) >= 2}
    expected = {}
    for d, toks in enumerate(docs):
        covered = set()
        for i in range(len(toks) - n + 1):
            if " ".join(toks[i : i + n]) in shared:
                covered.update(range(i, i + n))
        kept = [t for p, t in enumerate(toks) if p not in covered]
        expected[d] = (" ".join(kept), len(covered))

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in cut_repeated_spans(df, n=n, min_docs=2).collect()
    }
    assert got == expected


@given(
    w=st.integers(1, 20),
    h=st.integers(1, 16),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_roundtrip_bounded_error_and_solid_exact(w, h, seed):
    """For ANY dimensions: an all-ones quant table round-trips
    arbitrary grayscale content within ±1 (pure DCT float error), and
    solid even-gray content is EXACT under the standard lossy table."""
    import random

    from from_superset_to_clickhouse_spark.operators import multimodal as mm

    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h))
    _, _, _, out = mm.decode_jpeg_pixels(
        mm.encode_jpeg_gray(w, h, px, quant=[1] * 64)
    )
    assert max(abs(a - b) for a, b in zip(px, out)) <= 1

    v = rng.randrange(125) * 2
    solid = bytes([v]) * (w * h)
    assert mm.decode_jpeg_pixels(mm.encode_jpeg_gray(w, h, solid)) == (
        w, h, 1, solid,
    )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_cms_eps_delta_error_bound(spark, data):
    """The (eps, delta) guarantee the Count-Min sketch is CHOSEN for
    (VERDICT r7 item 4), not just exactness on one fixture: for any
    multiset, (a) estimates NEVER undercount — a hard deterministic
    guarantee of the min-over-rows construction; (b) per-key overshoot
    exceeds eps*N = (e/width)*N on at most a delta = e^-depth fraction
    of keys (the paper's bound is per-key probability delta; with 5
    examples x <=60 keys and the huge slack between expected collision
    mass N/width and eps*N, a violation count above delta*n_keys
    indicates a real construction bug, not bad luck)."""
    import math

    from from_superset_to_clickhouse_spark.operators import sketch as sk

    width, depth = 256, 4
    items = data.draw(
        st.lists(
            st.tuples(st.integers(0, 59), st.integers(1, 40)),
            min_size=1,
            max_size=60,
            unique_by=lambda t: t[0],
        )
    )
    rows = [(f"k{i}",) for i, c in items for _ in range(c)]
    df = spark.createDataFrame(rows, "item string")
    sketch = sk.cms_build(df, "item", width=width, depth=depth)
    keys = df.select("item").distinct()
    est = {
        r["key"]: r["est"]
        for r in sk.cms_query(
            sketch, keys, "item", width=width, depth=depth
        ).collect()
    }
    truth = {f"k{i}": c for i, c in items}
    n_total = sum(truth.values())
    assert set(est) == set(truth)
    # (a) never undercounts
    assert all(est[k] >= truth[k] for k in truth), (est, truth)
    # (b) eps*N bound violated on at most ceil(delta * n_keys) keys
    eps_n = math.e / width * n_total
    delta = math.exp(-depth)
    violations = sum(1 for k in truth if est[k] - truth[k] > eps_n)
    assert violations <= math.ceil(delta * len(truth)), (
        violations, eps_n, est, truth,
    )


def test_linear_counting_merge_and_accuracy(spark):
    """lc sketch: merge(union-distinct) of disjoint halves equals the
    one-pass sketch (idempotent, commutative), and at load factor
    n/m ~ 0.15 the estimate lands within 10% of the true cardinality
    for a deterministic fixture."""
    from pyspark.sql import functions as F

    from from_superset_to_clickhouse_spark.operators import sketch as sk

    df = spark.range(0, 2000).select(
        F.col("id").alias("event_id"), (F.col("id") % 150).alias("v")
    )
    one = sk.lc_build(df, "v")
    merged = sk.lc_merge(
        sk.lc_build(df.filter(F.col("event_id") % 2 == 0), "v"),
        sk.lc_build(df.filter(F.col("event_id") % 2 == 1), "v"),
    )
    assert sorted(r["bucket"] for r in one.collect()) == sorted(
        r["bucket"] for r in merged.collect()
    )
    est = sk.lc_estimate(merged).first()
    assert est["n_used"] <= 150
    assert abs(est["est"] - 150) / 150 < 0.10, est


@settings(
    deadline=None, max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.floats(-100, 100, allow_nan=False),
            st.floats(-100, 100, allow_nan=False),
        ),
        min_size=4,
        max_size=30,
    )
)
def test_spearman_bounded_and_antisymmetric(spark, data):
    """|rho| <= 1 always, and negating one axis flips the sign."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        spearman_corr,
    )

    rows = [("g", x, y) for x, y in data]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = spearman_corr(df, "x", "y", ["g"]).collect()[0]
    neg = spark.createDataFrame(
        [("g", x, -y) for x, y in data], "g string, x double, y double"
    )
    rn = spearman_corr(neg, "x", "y", ["g"]).collect()[0]
    if r.rho is not None:
        assert -1.0 <= r.rho <= 1.0
        assert abs(r.rho + rn.rho) < 1e-6


@settings(
    deadline=None, max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    scores=st.lists(st.floats(0, 100, allow_nan=False), min_size=6,
                    max_size=40),
    seed=st.integers(0, 2**16),
)
def test_roc_auc_score_negation_duality(spark, scores, seed):
    """AUC(-s, y) = 1 - AUC(s, y) (with midrank tie handling)."""
    import random

    from from_superset_to_clickhouse_spark.operators.mleval import (
        roc_auc,
    )

    rng = random.Random(seed)
    labels = [rng.randint(0, 1) for _ in scores]
    if len(set(labels)) < 2:
        labels[0], labels[1] = 0, 1
    df = spark.createDataFrame(
        list(zip(scores, labels)), "s double, y int"
    )
    neg = spark.createDataFrame(
        [(-s, y) for s, y in zip(scores, labels)], "s double, y int"
    )
    a = roc_auc(df, "s", "y").collect()[0].auc
    b = roc_auc(neg, "s", "y").collect()[0].auc
    assert abs((a + b) - 1.0) < 1e-5


@settings(
    deadline=None, max_examples=6,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(st.floats(0, 500, allow_nan=False), min_size=3,
                  max_size=50)
)
def test_huber_mean_bounded_and_degenerate(spark, vals):
    """The robust location stays inside [min, max]; with a huge c it
    collapses to the plain mean."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        huber_mean,
    )

    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    r = huber_mean(df, "v", ["g"], c=25.0, iters=4).collect()[0]
    assert min(vals) - 1e-6 <= r.mu <= max(vals) + 1e-6
    r2 = huber_mean(df, "v", ["g"], c=1e9, iters=3).collect()[0]
    assert abs(r2.mu - r2.plain_mean) < 1e-5


@settings(
    deadline=None, max_examples=6,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    secs=st.lists(st.integers(0, 5000), min_size=1, max_size=40,
                  unique=True)
)
def test_interval_union_bounds(spark, secs):
    """Union length <= n * dur, >= dur, and islands <= n."""
    import datetime

    from from_superset_to_clickhouse_spark.operators.temporal import (
        interval_union_length,
        max_intersections,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [("u", t0 + datetime.timedelta(seconds=s)) for s in secs]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    r = interval_union_length(df, "g", "ts", 300).collect()[0]
    assert r.n == len(secs)
    assert 300_000_000 <= r.covered_us <= len(secs) * 300_000_000
    assert 1 <= r.n_islands <= len(secs)
    m = max_intersections(df, "g", "ts", 300).collect()[0]
    assert 1 <= m.max_conc <= len(secs)


@settings(
    deadline=None, max_examples=6,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lat=st.floats(-89.9, 89.9, allow_nan=False),
    lon=st.floats(-179.9, 179.9, allow_nan=False),
)
def test_geohash_prefix_property(spark, lat, lon):
    """Truncating precision yields the parent cell: the 4-char hash
    prefixes the 6-char hash of the same point."""
    from from_superset_to_clickhouse_spark.operators.geo import (
        geohash_encode,
    )

    df = spark.createDataFrame([(1, lat, lon)], "id int, lat double, lon double")
    g6 = geohash_encode(df, "lat", "lon", precision=6).collect()[0].geohash
    g4 = geohash_encode(df, "lat", "lon", precision=4).collect()[0].geohash
    assert g6.startswith(g4)


def test_holt_winters_constant_series(spark):
    """A constant series: level = the constant, trend = 0, seasonal
    terms = 0, forecast = the constant."""
    import datetime

    from from_superset_to_clickhouse_spark.operators.temporal import (
        holt_winters,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("g", t0 + datetime.timedelta(days=d), 42.0) for d in range(21)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    r = holt_winters(df, "g", "ts", "v", period=7).collect()[0]
    assert r.level == 42.0 and r.trend == 0.0
    assert r.s_next == 0.0 and r.forecast == 42.0


@settings(
    deadline=None, max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    hour=st.integers(0, 23),
    days=st.lists(st.integers(0, 27), min_size=1, max_size=10, unique=True),
    scatter=st.lists(st.integers(0, 86_399), min_size=1, max_size=20),
)
def test_circadian_resultant_bounds_and_spike(spark, hour, days, scatter):
    """0 <= R <= 1 for ANY time-of-day distribution, and a key whose
    events all land on exactly one hour concentrates to R = 1 with
    peak_hour = that hour (the single-spike closed form)."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        circadian_stats,
    )

    rows = [
        ("spike", BASE + dt.timedelta(days=d, hours=hour)) for d in days
    ] + [
        ("noise", BASE + dt.timedelta(days=i % 5, seconds=s))
        for i, s in enumerate(scatter)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {r["key"]: r for r in circadian_stats(df, "k", "ts").collect()}
    for r in got.values():
        assert 0.0 <= r["resultant_r"] <= 1.0
        assert 0.0 <= r["peak_hour"] < 24.0
    assert abs(got["spike"]["resultant_r"] - 1.0) < 1e-9
    assert abs(got["spike"]["peak_hour"] - hour) < 1e-3
    assert got["spike"]["n"] == len(days)


@settings(
    deadline=None, max_examples=6,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lives=st.lists(
        st.tuples(st.integers(0, 90), st.booleans()),
        min_size=6,
        max_size=24,
    )
)
def test_logrank_antisymmetric_under_group_swap(spark, lives):
    """Relabeling group 0 <-> 1 must flip the z statistic's sign and
    leave the two-sided p-value unchanged (the O-E sum is zero-sum
    across groups at every death time)."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        logrank_test,
    )
    from pyspark.sql import functions as F

    rows = []
    for i, (span, grp) in enumerate(lives):
        g = int(grp)
        rows.append((i, g, BASE))
        rows.append((i, g, BASE + dt.timedelta(days=span)))
    # anchor subject pins the corpus end so horizons are stable
    rows.append((10_000, 0, BASE + dt.timedelta(days=200)))
    df = spark.createDataFrame(rows, "s long, g int, ts timestamp")
    a = logrank_test(df, "s", "ts", F.col("g"), censor_horizon_days=30).first()
    swapped = df.select("s", (1 - F.col("g")).alias("g"), "ts")
    b = logrank_test(
        swapped, "s", "ts", F.col("g"), censor_horizon_days=30
    ).first()
    assert a["n1"] == b["n2"] and a["n2"] == b["n1"]
    if a["z"] is not None and b["z"] is not None:
        assert abs(a["z"] + b["z"]) < 1e-4
        assert abs(a["p_value"] - b["p_value"]) < 1e-4


@settings(
    deadline=None, max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    codes=st.lists(st.integers(0, 2), min_size=1, max_size=40),
)
def test_sequence_count_matches_greedy_automaton(spark, codes):
    """The per-key fold must equal the greedy non-overlapping
    single-slot automaton (ClickHouse sequenceCount semantics), and is
    bounded by min(#first, #then)."""
    from from_superset_to_clickhouse_spark.operators.temporal import (
        sequence_count,
    )

    typ = {0: "x", 1: "a", 2: "b"}
    rows = [
        (7, BASE + dt.timedelta(minutes=i), typ[c], i)
        for i, c in enumerate(codes)
    ]
    df = spark.createDataFrame(
        rows, "u long, ts timestamp, t string, event_id long"
    )
    got = sequence_count(df, "u", "ts", "t", "a", "b").first()
    cnt, open_ = 0, False
    for c in codes:
        if not open_ and c == 1:
            open_ = True
        elif open_ and c == 2:
            cnt += 1
            open_ = False
    assert got["seq_count"] == cnt
    assert got["n_events"] == len(codes)
    assert got["seq_count"] <= min(codes.count(1), codes.count(2))


@settings(
    deadline=None, max_examples=6,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 4),          # user
            st.integers(0, 8),          # week offset
            st.floats(0, 100, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_cohort_ltv_triangle_monotone_and_consistent(spark, events):
    """With nonnegative revenue the cumulative column is nondecreasing
    in age within every cohort, cum_ltv * n_users == cum_revenue, and
    the triangle's final cumulative row equals the cohort's total."""
    from collections import defaultdict

    from from_superset_to_clickhouse_spark.operators.temporal import (
        cohort_ltv,
    )

    rows = [
        (u, BASE + dt.timedelta(weeks=w), float(v)) for u, w, v in events
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, v double")
    out = sorted(
        cohort_ltv(df, "u", "ts", "v", bucket="week").collect(),
        key=lambda r: (r["cohort_ts"], r["age"]),
    )
    by_cohort = defaultdict(list)
    for r in out:
        assert r["age"] >= 0
        by_cohort[r["cohort_ts"]].append(r)
    for cr in by_cohort.values():
        prev = 0.0
        for r in cr:
            assert r["cum_revenue"] >= prev - 1e-6
            prev = r["cum_revenue"]
            assert abs(r["cum_ltv"] * r["n_users"] - r["cum_revenue"]) < 1e-3
        total = sum(r["revenue"] for r in cr)
        assert abs(cr[-1]["cum_revenue"] - total) < 1e-4


@settings(
    deadline=None, max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    days=st.lists(st.integers(0, 40), min_size=1, max_size=15, unique=True),
)
def test_data_gaps_accounting_identity(spark, days):
    """expected == present + missing for ANY day set, longest_gap is
    the max run of consecutive absent buckets, and a dense span
    reports zero everywhere."""
    from from_superset_to_clickhouse_spark.operators.temporal import (
        data_gaps,
    )

    rows = [("k", BASE + dt.timedelta(days=d, hours=3)) for d in days]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    r = data_gaps(df, "k", "ts").first()
    span = max(days) - min(days) + 1
    assert r["expected"] == span
    assert r["present"] == len(days)
    assert r["missing"] == span - len(days)
    s = sorted(days)
    ref_gap = max((b - a - 1 for a, b in zip(s, s[1:])), default=0)
    assert r["longest_gap"] == ref_gap


@settings(
    deadline=None, max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    labels=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2)),
        min_size=4, max_size=40,
    )
)
def test_cohens_kappa_bounds_and_relabel_invariance(spark, labels):
    """kappa <= 1 always, == 1 exactly on perfect agreement, and a
    consistent relabeling of BOTH raters leaves it unchanged."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        cohens_kappa,
    )

    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in labels], "a string, b string"
    )
    r = cohens_kappa(df, "a", "b").first()
    if r["kappa"] is not None:
        assert r["kappa"] <= 1.0 + 1e-9
        if all(a == b for a, b in labels):
            assert r["kappa"] == 1.0
    perm = {0: "x", 1: "y", 2: "z"}
    df2 = spark.createDataFrame(
        [(perm[a], perm[b]) for a, b in labels], "a string, b string"
    )
    r2 = cohens_kappa(df2, "a", "b").first()
    assert r2["kappa"] == r["kappa"] and r2["pe"] == r["pe"]


@settings(
    deadline=None, max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 1)),
        min_size=3, max_size=40,
    )
)
def test_mcnemar_swap_antisymmetry(spark, pairs):
    """Swapping the two classifiers swaps the discordant cells and
    leaves chi2 / p unchanged (the test is symmetric in |n10-n01|)."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        mcnemar_test,
    )

    df = spark.createDataFrame(pairs, "a int, b int")
    r = mcnemar_test(df, "a", "b").first()
    w = mcnemar_test(df, "b", "a").first()
    assert (r["n10"], r["n01"]) == (w["n01"], w["n10"])
    assert r["chi2"] == w["chi2"] and r["p_value"] == w["p_value"]


@settings(
    deadline=None, max_examples=6,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    toks=st.lists(st.integers(0, 30), min_size=3, max_size=80),
)
def test_chao1_and_good_turing_invariants(spark, toks):
    """chao1 >= observed richness always, and the Good-Turing p_mass
    rows (the redistributed mass of the r<=5 classes plus unseen) sum
    to <= 1 + rounding slack."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        chao1_richness,
        good_turing,
    )

    df = spark.createDataFrame(
        [("g", f"t{t}") for t in toks], "g string, t string"
    )
    r = chao1_richness(df, "t", "g").first()
    assert r["chao1"] >= r["observed"] - 1e-9
    masses = [
        row["p_mass"] for row in good_turing(df, "t").collect()
        if row["p_mass"] is not None
    ]
    assert sum(masses) <= 1.0 + 1e-6


@settings(
    deadline=None, max_examples=6,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(0.5, 1000, allow_nan=False), min_size=8, max_size=60
    ),
    scale=st.floats(0.1, 50, allow_nan=False),
)
def test_hill_and_theil_scale_invariance(spark, vals, scale):
    """Both the Hill exponent and the Theil index are scale-free:
    multiplying every value by c > 0 changes neither (log-ratio and
    share arithmetic)."""
    from pyspark.sql import functions as F

    from from_superset_to_clickhouse_spark.operators.stats import (
        hill_tail,
        theil_index,
    )

    rows = [(i, v, f"g{i % 3}") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, x double, g string")
    df2 = df.select("i", (F.col("x") * float(scale)).alias("x"), "g")
    try:
        h1 = hill_tail(df, "x", k=5, tiebreak_col="i").first()
        h2 = hill_tail(df2, "x", k=5, tiebreak_col="i").first()
    except ValueError:
        # all-tied top-(k+1): hill_tail fails loud by contract (the
        # tail exponent is undefined); scale invariance is vacuous.
        h1 = h2 = {"alpha": None}
    if h1["alpha"] is not None and h2["alpha"] is not None:
        assert abs(h1["alpha"] - h2["alpha"]) < 1e-3 * max(
            1.0, abs(h1["alpha"])
        )
    t1 = theil_index(df, "x", "g").first()
    t2 = theil_index(df2, "x", "g").first()
    assert abs(t1["theil_total"] - t2["theil_total"]) < 1e-4
    assert abs(t1["theil_between"] - t2["theil_between"]) < 1e-4


@settings(
    deadline=None, max_examples=6,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(st.floats(-50, 50, allow_nan=False), min_size=2,
                max_size=12),
    ys=st.lists(st.floats(-50, 50, allow_nan=False), min_size=2,
                max_size=12),
)
def test_dtw_identity_and_symmetry(spark, xs, ys):
    """dtw(x, x) == 0 for any series, and DTW is symmetric in its
    arguments (the DP cost matrix transposes)."""
    import datetime as dt

    from from_superset_to_clickhouse_spark.operators.temporal import (
        dtw_distance,
    )

    rows = []
    for d, v in enumerate(xs):
        rows.append(("x", BASE + dt.timedelta(days=d), float(v)))
    for d, v in enumerate(ys):
        rows.append(("y", BASE + dt.timedelta(days=d), float(v)))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    vs_x = {r["key"]: r["dtw"]
            for r in dtw_distance(df, "k", "ts", "v", "x").collect()}
    vs_y = {r["key"]: r["dtw"]
            for r in dtw_distance(df, "k", "ts", "v", "y").collect()}
    assert vs_x["x"] == 0.0 and vs_y["y"] == 0.0
    assert abs(vs_x["y"] - vs_y["x"]) < 1e-6


# ---- round-12 additions ---------------------------------------------------

# Fractional coordinates on a 0.1 grid: the r12 RANGE-frame bug only
# bit when a dominator's x was less than 1.0 below the row (ADVICE r12),
# which integer draws can never produce — keep the grid finer than 1.0.
_XY = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 20)),
    min_size=1,
    max_size=15,
).map(lambda ps: [(x / 10.0, y / 10.0) for x, y in ps])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=_XY)
def test_skyline_dominance_invariants(spark, pts):
    """For ANY point set: every surviving row is non-dominated, every
    dropped row is strictly dominated by some survivor, and frontier
    duplicates all survive."""
    from pyspark.sql import functions as F

    from from_superset_to_clickhouse_spark.operators.relational import (
        skyline_2d,
    )

    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id int, x double, y double")
    kept = {(r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()}
    kept_ids = {
        r["id"] for r in skyline_2d(df, "x", "y").collect()
    }

    def dominated(p, q):
        return q[0] <= p[0] and q[1] <= p[1] and q != p

    for i, p in enumerate(((float(x), float(y)) for x, y in pts)):
        is_dom = any(
            dominated(p, (float(qx), float(qy)))
            for qx, qy in pts
        )
        if i in kept_ids:
            assert not is_dom, f"survivor {p} is dominated"
        else:
            assert is_dom, f"dropped {p} is not dominated"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=st.lists(st.integers(0, 1000), min_size=5, max_size=40))
def test_lorenz_curve_monotone_and_below_diagonal(spark, vals):
    """For ANY non-negative values: cumulative shares are monotone
    non-decreasing, end at exactly 1.0, and the value share never
    exceeds the population share (Lorenz dominance for ascending
    assignment)."""
    from hypothesis import assume

    from from_superset_to_clickhouse_spark.operators.stats import (
        lorenz_curve,
    )

    assume(any(v > 0 for v in vals))  # zero total mass -> NULL shares
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    rows = sorted(
        lorenz_curve(df, "v").collect(), key=lambda r: r["decile"]
    )
    assert rows[-1]["cum_pop_frac"] == 1.0
    assert rows[-1]["cum_val_frac"] == 1.0
    prev_p, prev_v = 0.0, 0.0
    for r in rows:
        assert r["cum_pop_frac"] >= prev_p
        assert r["cum_val_frac"] >= prev_v - 1e-9
        # ascending-block assignment: poorest deciles hold <= their
        # population share of the mass (tiny fxp slack)
        assert r["cum_val_frac"] <= r["cum_pop_frac"] + 1e-5
        prev_p, prev_v = r["cum_pop_frac"], r["cum_val_frac"]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    p=st.floats(
        min_value=0.001, max_value=0.999, allow_nan=False
    )
)
def test_probit_phi_roundtrip(spark, p):
    """Φ(Φ⁻¹(p)) ≈ p within the combined Acklam + A&S-erf tolerance
    (~1.5e-7) across the full open interval, both branches."""
    from pyspark.sql import functions as F

    from from_superset_to_clickhouse_spark.operators.stats import (
        normal_sf,
        probit_approx,
    )

    z = probit_approx(F.lit(float(p)))
    phi = (
        F.when(z >= 0, F.lit(1.0) - normal_sf(z))
        .otherwise(normal_sf(-z))
    )
    got = spark.range(1).select(phi.alias("p")).collect()[0]["p"]
    assert abs(got - p) < 5e-7


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(st.integers(0, 30), min_size=2, max_size=12),
    ys=st.lists(st.integers(0, 30), min_size=2, max_size=12),
)
def test_brunner_munzel_p_hat_bounds_and_antisymmetry(spark, xs, ys):
    """p̂ = P(X<Y) + ½P(X=Y) stays in [0, 1] and swapping the arms
    reflects it around ½ for ANY two samples."""
    from from_superset_to_clickhouse_spark.operators.stats import (
        brunner_munzel,
    )

    rows = [("a", float(v)) for v in xs] + [("b", float(v)) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    r = brunner_munzel(df, "v", "g").collect()[0]
    assert 0.0 <= r["p_hat"] <= 1.0
    swapped = [("b", float(v)) for v in xs] + [("a", float(v)) for v in ys]
    df2 = spark.createDataFrame(swapped, "g string, v double")
    r2 = brunner_munzel(df2, "v", "g").collect()[0]
    assert abs((r["p_hat"] + r2["p_hat"]) - 1.0) <= 2e-6  # 2x 6dp rounding
