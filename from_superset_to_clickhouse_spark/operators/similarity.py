"""Similarity search over embedding columns (array<float>).

Two tiers (north-star extension surface, BASELINE.json):

- brute-force cosine top-k: the correctness baseline. The query set is
  broadcast (it's small by construction); the corpus side streams — so
  the "cross join" is really a broadcast nested loop whose cost is
  |corpus| × |queries|, embarrassingly parallel, no shuffle of the
  corpus. All arithmetic is double-precision Catalyst higher-order
  functions.

- LSH-bucketed (random hyperplane / signed random projection): the scale
  path. Signatures are sign-bit band buckets; candidates come from a
  bucket join, then exact cosine re-ranks. At 100 TB the bucket join
  replaces the |corpus|×|queries| loop with per-bucket work.

- IVF (inverted-file) partitioned search: Lloyd-trained coarse
  centroids; the corpus is assigned to its nearest cell once, queries
  probe their ``nprobe`` nearest cells, and only those cells' vectors
  are scored exactly. The standard billion-scale ANN layout: candidate
  work is the nprobe/ncells fraction of the corpus, and the cell
  assignment doubles as a physical partitioning key for co-located
  reads.

Embedding-cosine near-duplicate detection (``embedding_dedup_pairs``)
reuses the SRP banding as a self-join blocker + exact cosine verify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.functions.scalar import let_bind
from from_superset_to_clickhouse_spark.operators.dedup import _finalize


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double precision (sequential fold, JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "qvec",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization → (id, scale, int8 codes):
    the 4× storage/shuffle-bandwidth reduction step an embedding lake
    applies before indexing (dequantize: ``v ≈ q * scale / 127``).

    Codes are ``floor(v * 127 / scale + 0.5)`` with ``scale =
    max(|v_i|)`` — floor-of-shifted rather than ROUND because ROUND's
    tie behavior differs across engines while floor is exact IEEE
    everywhere, so the oracle replays the codes bit-for-bit. The whole
    transform is Catalyst array expressions — no Python, no shuffle.
    Zero vectors quantize to all-zero codes with scale 0.
    """
    from from_superset_to_clickhouse_spark.functions.scalar import let_bind

    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    return df.select(
        F.col(id_col),
        let_bind(
            scale,
            lambda s: F.struct(
                s.alias("_s"),
                F.transform(
                    v,
                    # TINYINT, not int: codes are provably within
                    # [-127, 127] (property-tested), and the 4× narrower
                    # element type is the entire point — persisted /
                    # shuffled width actually drops vs float32.
                    lambda x: F.when(s > 0.0, F.floor(x * 127.0 / s + 0.5))
                    .otherwise(F.lit(0))
                    .cast("tinyint"),
                ).alias("_q"),
            ),
        ).alias("_sq"),
    ).select(
        id_col,
        # float→double is lossless; a stable DOUBLE output type keeps the
        # oracle schema comparison engine-neutral
        F.col("_sq._s").cast("double").alias(scale_col),
        F.col("_sq._q").alias(out_col),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query vector → (q_id, n_id, sim, rank).

    Two physically different, semantically identical plans:

    - ``vectorized=True`` (default, needs numpy): blocked matrix multiply
      via Arrow ``mapInPandas``. Queries (the small side, same contract as
      the broadcast below) are L2-normalized into one numpy matrix and
      broadcast; each corpus Arrow batch computes a (batch × nq) cosine
      matrix with one BLAS call and emits only per-batch candidates that
      can still reach the global top-k (every row with sim ≥ the batch's
      k-th best per query — tie-safe, so the final window re-rank is
      EXACT). ~30× the throughput of the per-pair expression path: the
      hot loop is C, not a per-element codegen lambda.
    - ``vectorized=False``: pure Catalyst higher-order-function pipeline
      (zip_with/aggregate cosine against a broadcast queries side). No
      Python workers; the fully-SQL-expressible twin of the oracle.

    Both exclude self-matches on equal ids and tie-break by ascending
    ``n_id``.
    """
    if vectorized:
        try:
            import numpy  # noqa: F401

            return _brute_force_topk_vectorized(corpus, queries, k, id_col, vec_col)
        except ImportError:
            pass
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    sim = cosine(F.col("q_vec"), F.col("n_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("n_id") != F.col("q_id"))
        .withColumn("sim", sim)
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("sim", 6).alias("sim"), "rank")
    )


def _brute_force_topk_vectorized(
    corpus: DataFrame, queries: DataFrame, k: int, id_col: str, vec_col: str
) -> DataFrame:
    """Blocked exact kNN: per-Arrow-batch BLAS scoring + candidate cut.

    A corpus row is dropped by a batch only when ≥ k rows in that batch
    beat it STRICTLY (sim > its sim), so no row that could appear in the
    global top-k under the (sim desc, n_id asc) order is ever lost —
    exact-ties with the k-th best are all kept and resolved by the final
    window. Shuffled volume is ~k rows per (query, batch), not |corpus|.
    """
    import numpy as np

    id_type = dict(corpus.dtypes)[id_col]
    q_rows = queries.select(id_col, vec_col).collect()
    spark = corpus.sparkSession
    if not q_rows:
        return spark.createDataFrame(
            [], f"q_id {id_type}, n_id {id_type}, sim double, rank int"
        )
    q_ids = np.array([r[0] for r in q_rows])
    qm = np.array([r[1] for r in q_rows], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0.0] = 1.0
    bq = spark.sparkContext.broadcast((q_ids, qm / qn[:, None]))
    kk = int(k)

    def score(batches):
        import pandas as pd

        qid, qnorm = bq.value
        for pdf in batches:
            for lo in range(0, len(pdf), 2048):
                chunk = pdf.iloc[lo : lo + 2048]
                ids = chunk["n_id"].to_numpy()
                m = np.asarray(list(chunk["vec"]), dtype=np.float64)
                mn = np.linalg.norm(m, axis=1)
                mn[mn == 0.0] = 1.0
                s = (m / mn[:, None]) @ qnorm.T  # B × nq
                s[ids[:, None] == qid[None, :]] = -np.inf
                t = min(kk, s.shape[0])
                part = np.argpartition(-s, t - 1, axis=0)[:t]
                thresh = np.take_along_axis(s, part, 0).min(axis=0)
                mask = (s >= thresh[None, :]) & np.isfinite(s)
                rows, cols = np.nonzero(mask)
                yield pd.DataFrame(
                    {"q_id": qid[cols], "n_id": ids[rows], "sim": s[rows, cols]}
                )

    cand = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("vec")
    ).mapInPandas(score, schema=f"q_id {id_type}, n_id {id_type}, sim double")
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("sim", 6).alias("sim"), "rank")
    )


def _rp_bits(vec: Column, planes: int, seed: int = 7) -> Column:
    """Signed-random-projection signature: ``planes`` sign bits as array<int>.

    Hyperplane weights are deterministic pseudo-random ±1 derived from
    xxhash64(seed, plane, coordinate) parity — no RNG state, identical on
    every executor, no data shuffled to build them. The vector is
    let-bound so it (and its coordinate sequence) is evaluated once per
    row for ALL planes — round 1 re-evaluated the full O(planes × dim)
    projection once per band (VERDICT.md r1 item 5). Dimensionality is
    derived from the vector itself (``F.size``), so a wrong caller-passed
    dim can no longer silently zero the signatures (ADVICE.md r1 low).
    """
    return let_bind(
        vec,
        lambda v: F.transform(
            F.sequence(F.lit(0), F.lit(planes - 1)),
            lambda p: F.when(
                F.aggregate(
                    F.zip_with(
                        v,
                        F.sequence(F.lit(0), F.size(v) - 1),
                        lambda x, i: x.cast("double")
                        * F.when(
                            F.pmod(F.xxhash64(F.lit(seed), p, i), 2) == 0,
                            F.lit(1.0),
                        ).otherwise(F.lit(-1.0)),
                    ),
                    F.lit(0.0),
                    lambda acc, val: acc + val,
                )
                >= 0,
                F.lit(1),
            ).otherwise(F.lit(0)),
        ),
    )


def _srp_buckets_vectorized(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
    planes: int,
    band_bits: int,
    seed: int = 7,
) -> DataFrame:
    """(id, band, bucket) rows via one BLAS projection per Arrow batch.

    The expression twin (``_rp_bits`` + banding) evaluates O(planes ×
    dim) hash+multiply lambdas per row inside codegen — measured as the
    dominant cost of ``lsh_topk`` (the join itself is cheap). Here the
    hyperplanes are a deterministic Gaussian matrix (fixed seed → same
    planes on every executor and every call, no RNG state shipped), the
    sign bits are one ``m @ P >= 0`` per batch, and band buckets are a
    base-2 dot product — the Arrow path, ~an order of magnitude faster.
    Sign convention matches ``_rp_bits`` (>= 0 → 1)."""
    import numpy as np

    id_type = dict(df.dtypes)[id_col]
    n_bands = planes // band_bits

    def gen(batches):
        import pandas as pd

        P = None
        pow2 = (1 << np.arange(band_bits)).astype(np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.asarray(list(pdf["vec"]), dtype=np.float64)
            if P is None:
                P = np.random.RandomState(seed).standard_normal(
                    (m.shape[1], planes)
                )
            bits = (m @ P) >= 0.0  # n × planes
            # planes need not divide evenly into bands: only the first
            # n_bands × band_bits sign bits feed buckets (the Catalyst
            # fallback slices the same prefix — behavior must match).
            buckets = (
                bits[:, : n_bands * band_bits].reshape(
                    len(pdf), n_bands, band_bits
                )
                * pow2
            ).sum(axis=2)
            yield pd.DataFrame(
                {
                    out_id: np.repeat(pdf["_sid"].to_numpy(), n_bands),
                    "band": np.tile(np.arange(n_bands, dtype=np.int32), len(pdf)),
                    "bucket": buckets.reshape(-1),
                }
            )

    src = df.select(F.col(id_col).alias("_sid"), F.col(vec_col).alias("vec"))
    # Repartition a small/compacted source so the Python projection
    # stage uses every core (no-op at real scale, where the input
    # already has >= core partitions).
    target = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    return src.mapInPandas(
        gen, schema=f"{out_id} {id_type}, band int, bucket bigint"
    )


def _srp_banded(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
    planes: int,
    band_bits: int,
    seed: int = 7,
) -> DataFrame:
    """(id, band, bucket) SRP band rows — Arrow BLAS path when numpy is
    available (one matrix multiply per batch), pure-Catalyst
    ``_rp_bits`` fallback otherwise. The two paths produce different
    bucket VALUES (base-2 band int vs hash of the bit slice), each
    internally consistent: an index must be queried by the same path
    that built it."""
    try:
        import numpy  # noqa: F401

        return _srp_buckets_vectorized(
            df, id_col, vec_col, out_id, planes, band_bits, seed
        )
    except ImportError:
        n_bands = planes // band_bits
        buckets = let_bind(
            _rp_bits(F.col(vec_col), planes, seed),
            lambda s: F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda i: F.hash(F.slice(s, i * band_bits + 1, band_bits)),
            ),
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.posexplode(buckets).alias("band", "bucket"),
        )


def lsh_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 64,
    band_bits: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Persistable SRP band index of a corpus: (n_id, band, bucket).

    Build ONCE, write to parquet (partition by ``band`` for band-local
    bucket joins), query many times with ``lsh_topk_indexed``. This is
    where LSH actually earns its keep at scale: banding touches every
    corpus vector (64 planes ≈ the FLOPs of scoring 64 queries
    exactly), so a one-shot band-and-join can never beat a blocked-BLAS
    scan — measured at a 100k-vector corpus, one-shot LSH loses to
    brute force while the SAME query batch against a prebuilt index
    wins. Amortizing the corpus-side work across query batches (and
    growing it incrementally, like ``minhash_incremental``) is the
    production pattern."""
    return _srp_banded(corpus, id_col, vec_col, "n_id", planes, band_bits, seed)


def lsh_topk_indexed(
    index: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 64,
    band_bits: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k against a prebuilt ``lsh_index``: band the
    query batch (cheap — |queries| rows), join id-only band rows
    against the index, exact re-rank of surviving candidates only.

    ``planes``/``band_bits``/``seed`` must match the index build — the
    signature function IS the index layout.

    Scale design: the band join carries ONLY (id, band, bucket) — never
    the vectors, which would multiply shuffle volume by the band count.
    Vectors are joined back just for the surviving candidate pairs
    (queries broadcast; corpus joined on its key). An index read from a
    band-partitioned parquet table arrives pre-bucketed; the query side
    is small enough to broadcast, so the index never shuffles."""
    qb = _srp_banded(queries, id_col, vec_col, "q_id", planes, band_bits, seed)
    cand = (
        index.join(qb, ["band", "bucket"])
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id")
        .distinct()
    )
    nv = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    try:
        import numpy  # noqa: F401

        # Distinct BEFORE attaching vectors: the id-only pair set is the
        # cheap thing to shuffle; deduping after the vector join would
        # move |pairs| × dim floats instead (measured 2-4× slower).
        return _rerank_candidates_vectorized(
            cand.join(nv, "n_id"), queries, k, id_col, vec_col
        )
    except ImportError:
        pass
    qv = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    scored = (
        cand.join(nv, "n_id")
        .join(F.broadcast(qv), "q_id")
        .withColumn("sim", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("sim", 6).alias("sim"), "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 64,
    band_bits: int = 4,
) -> DataFrame:
    """One-shot approximate top-k: build the SRP band index inline, then
    query it — ``lsh_index`` + ``lsh_topk_indexed`` fused.

    Defaults (64 planes, 16 bands × 4 bits) are tuned for ≥0.8 measured
    recall on the synthetic fixture embeddings, which are near-random
    (top-5 neighbor cosine ≈ 0.32, per-plane agreement p ≈ 0.6 →
    per-pair recall 1-(1-p^4)^16 ≈ 0.9). Clustered real-world embeddings
    have far higher per-plane agreement — use wider bands there
    (``band_bits=8``: 256 buckets/band, measured 0.97 recall on a
    256-cluster corpus) or 16-bucket bands explode candidate counts.

    NOTE: one-shot banding touches every corpus vector, so this form
    cannot beat a blocked-BLAS exact scan (see ``lsh_index``). Use it
    for single-pass workloads (one dedup sweep); persist the index for
    repeated query batches."""
    return lsh_topk_indexed(
        lsh_index(corpus, id_col, vec_col, planes, band_bits),
        corpus,
        queries,
        k,
        id_col,
        vec_col,
        planes,
        band_bits,
    )


def _rerank_candidates_vectorized(
    cand_v: DataFrame, queries: DataFrame, k: int, id_col: str, vec_col: str
) -> DataFrame:
    """Exact top-k over a candidate set: flat Arrow ``mapInPandas``
    scoring + Catalyst window cut.

    Query vectors (the broadcastable side, same contract as the
    expression path's ``F.broadcast``) ride along as a driver broadcast
    (id→row map + one normalized matrix); each Arrow batch computes all
    its pair similarities with ONE einsum — no per-group Python call, no
    per-pair codegen lambda. (A groupBy(q_id).applyInPandas variant was
    measured 6× slower at sf0.1: per-group overhead × |queries| beats
    the arithmetic.) The (sim desc, n_id asc) top-k cut happens in the
    window, so ties round-trip exactly like the expression path.

    ``cand_v`` must have columns (q_id, n_id, n_vec) with (q_id, n_id)
    already distinct — callers dedup the id-only pair set before
    attaching vectors.
    """
    import numpy as np

    id_type = dict(cand_v.dtypes)["q_id"]
    spark = cand_v.sparkSession
    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        return spark.createDataFrame(
            [], f"q_id {id_type}, n_id {id_type}, sim double, rank int"
        )
    qm = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0.0] = 1.0
    pos = {r[0]: i for i, r in enumerate(q_rows)}
    bq = spark.sparkContext.broadcast((pos, qm / qn[:, None]))

    def score(batches):
        import pandas as pd

        qpos, qnorm = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qi = pdf["q_id"].map(qpos)
            keep = qi.notna().to_numpy()
            if not keep.all():
                pdf = pdf[keep]
                qi = qi[keep]
                if len(pdf) == 0:
                    continue
            m = np.asarray(list(pdf["n_vec"]), dtype=np.float64)
            mn = np.linalg.norm(m, axis=1)
            mn[mn == 0.0] = 1.0
            sims = np.einsum(
                "ij,ij->i", m / mn[:, None], qnorm[qi.to_numpy(dtype=np.int64)]
            )
            yield pd.DataFrame(
                {"q_id": pdf["q_id"], "n_id": pdf["n_id"], "sim": sims}
            )

    scored = cand_v.select("q_id", "n_id", "n_vec").mapInPandas(
        score, schema=f"q_id {id_type}, n_id {id_type}, sim double"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("sim", 6).alias("sim"), "rank")
    )


def embedding_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 64,
    band_bits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: (id_a < id_b, sim ≥ threshold).

    SRP band buckets block the self-join (ids only through the explode,
    as in ``lsh_topk``), then the surviving pairs are verified with an
    exact cosine. Near-identical vectors agree on almost every plane, so
    recall at dedup-grade thresholds (≥0.9) is effectively 1: a pair at
    cosine 0.95 disagrees on a plane with p≈0.10, P(≥1 clean 4-bit band
    of 16) ≈ 1-(1-0.9^4)^16 ≈ 0.999.
    """
    n_bands = planes // band_bits
    try:
        import numpy  # noqa: F401

        unbanded = _srp_buckets_vectorized(
            df, id_col, vec_col, "vid", planes, band_bits
        )
    except ImportError:
        buckets = let_bind(
            _rp_bits(F.col(vec_col), planes),
            lambda s: F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda i: F.hash(F.slice(s, i * band_bits + 1, band_bits)),
            ),
        )
        unbanded = df.select(
            F.col(id_col).alias("vid"),
            F.posexplode(buckets).alias("band", "bucket"),
        )
    # Persisted: consumed by both sides of the self-join; payload is
    # (id, band, bucket) only. Released via _finalize below — persist
    # registers in the session CacheManager, which the ContextCleaner
    # does NOT reclaim, so the eager-materialize/unpersist pair is what
    # keeps repeated calls from accumulating storage blocks.
    banded = unbanded.persist()
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vid") < F.col("r.vid")),
        )
        .select(F.col("l.vid").alias("id_a"), F.col("r.vid").alias("id_b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    verified = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
    return _finalize(verified, banded)


def save_centroids(spark, centroids: list[list[float]], path: str) -> None:
    """Persist trained IVF centroids as a tiny parquet table — the
    production pattern: train once on a sample, ship the same coarse
    quantizer to every indexing/query job so cell assignments stay
    consistent across runs (retraining would silently re-shard the
    corpus)."""
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<float>",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_centroids(spark, path: str) -> list[list[float]]:
    """Load centroids saved by ``save_centroids`` in cell order."""
    rows = spark.read.parquet(path).orderBy("cell").collect()
    return [list(r["centroid"]) for r in rows]


def train_centroids(
    corpus: DataFrame,
    ncells: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 65536,
) -> list[list[float]]:
    """Lloyd-style coarse centroids for IVF.

    Fast path (numpy): train on a deterministic ``sample_rows``-vector
    sample — rows taken in xxhash64(id) order, which Spark executes as
    per-partition top-N + merge (TakeOrdered), NOT a global sort — then
    run Lloyd iterations on the driver in numpy. Sampling is the
    standard billion-scale IVF pattern (coarse quantizers are trained on
    a bounded sample regardless of corpus size), so driver memory is
    O(sample × dim) at any corpus scale.

    Fallback (no numpy): same algorithm distributed — assign every
    vector to its max-cosine centroid via broadcast-literal expressions,
    per-(cell, coordinate) mean via posexplode+groupBy; only ncells×dim
    rows reach the driver per iteration.

    Both paths: init = first ``ncells`` vectors in hash order; empty
    cells keep their previous centroid; centroids returned L2-normalized
    so assignment reduces to a dot product.
    """
    try:
        import numpy as np
    except ImportError:
        np = None
    if np is not None:
        rows = (
            corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
            .orderBy(F.xxhash64(F.col("i")))
            .limit(int(sample_rows))
            .collect()
        )
        v = np.asarray([r["v"] for r in rows], dtype=np.float64)

        def norm_rows(m):
            n = np.linalg.norm(m, axis=1)
            n[n == 0.0] = 1.0
            return m / n[:, None]

        cents_m = norm_rows(v[:ncells].copy())
        for _ in range(iters):
            cell = np.argmax(v @ cents_m.T, axis=1)
            for c in range(len(cents_m)):
                members = v[cell == c]
                if len(members):
                    cents_m[c] = members.mean(axis=0)
            cents_m = norm_rows(cents_m)
        return [[float(x) for x in c] for c in cents_m]

    init = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .withColumn("h", F.xxhash64(F.col("i")))
        .orderBy("h")
        .limit(ncells)
        .collect()
    )

    def normalize(vec):
        n = sum(x * x for x in vec) ** 0.5 or 1.0
        return [float(x) / n for x in vec]

    cents = [normalize(r["v"]) for r in init]
    for _ in range(iters):
        assigned = corpus.select(
            F.col(vec_col).alias("v"),
            _assign_cell(F.col(vec_col), cents).alias("cell"),
        )
        means = (
            assigned.select("cell", F.posexplode(F.col("v")).alias("idx", "x"))
            .groupBy("cell", "idx")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["idx"]] = r["m"]
        dim = len(cents[0])
        cents = [
            normalize([by_cell.get(c, {}).get(i, cents[c][i]) for i in range(dim)])
            for c in range(len(cents))
        ]
    return cents


def _dist2(vec: Column, cent: list[float]) -> Column:
    """Squared Euclidean distance to a literal centroid, computed in
    DOUBLE and rounded to 6 decimals — the rounding is the cross-engine
    determinism contract (same as the cosine scores elsewhere): double
    arithmetic agrees across engines to ~1e-13, far inside the 5e-7
    rounding margin, so argmin never flips on representation noise."""
    c = F.array(*[F.lit(float(x)) for x in cent])
    return F.round(
        F.aggregate(
            F.zip_with(vec, c, lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


# Arrow fast-path switchover: k × dim multiply-adds per row above this
# run as one BLAS matmul per Arrow batch instead of per-element
# expression lambdas (zip_with/aggregate lambdas are interpreted —
# measured ~40 s for the 256-cell × 64-dim residual assignment at the
# bench's 100k-sample operating point, vs seconds for the matmul). The
# determinism contract is IDENTICAL either way (see _grid_argmin), so
# the cut purely trades plan shape; below it the expression form stays
# whole-stage-codegen with no Python worker round-trip (and is what the
# smallest oracle twins exercise — `test_assign_arrow_matches_expression`
# pins the two paths equal on real fixture vectors).
#
# r15 optimization round: lowered 1024 → 256 (guide §4.2). Measured on
# the sf0.1 fixture (20k × dim-64 vectors, m=4 k=8 d=16 = 512 ops):
# pq_encode 2.3 s expression vs 0.64 s Arrow, identical codes — the
# interpreted-lambda cost already dominates at 512 ops/row, and an
# unrolled pure-codegen form was measured SLOWER (10.9 s: the 512-term
# expression tree blows past codegen limits into interpreted eval).
# 256 keeps the tiniest assignments (e.g. 3 × 64 = 192) in codegen so
# the expression path stays exercised end-to-end.
_ARROW_ASSIGN_MIN_OPS = 256


def _grid_argmin_codes(mat, books):
    """First-min argmin per subspace on the SAME 1e-6 grid as
    ``_dist2``: squared L2 in float64 (expansion form — the ~1e-13
    summation-order noise vs the left-to-right lambda sits far inside
    the 5e-7 rounding margin, the exact argument ``_dist2`` already
    makes cross-engine), then HALF_UP to 6 decimals as integers
    (``floor(d2 * 1e6 + 0.5)`` ≡ ``F.round(d2, 6)`` for d2 ≥ 0 — order
    AND tie structure match, so ``np.argmin``'s first-minimal pick is
    ``array_position``'s lowest-index tie-break)."""
    import numpy as np

    out = np.empty((mat.shape[0], len(books)), dtype=np.int32)
    for s, b in enumerate(books):
        bk = np.asarray(b, dtype=np.float64)
        d = bk.shape[1]
        sub = mat[:, s * d : (s + 1) * d]
        d2 = sub @ bk.T
        d2 *= -2.0
        d2 += np.einsum("ij,ij->i", sub, sub)[:, None]
        d2 += np.einsum("ij,ij->i", bk, bk)[None, :]
        out[:, s] = np.argmin(np.floor(d2 * 1e6 + 0.5), axis=1)
    return out


def _split_valid(v, dim):
    """Split an Arrow batch into (vals, good, mat): the positions whose
    vector is non-NULL and exactly ``dim`` long, densified to float64.
    ``good is None`` means every row is valid (the overwhelmingly
    common case — zero extra copies). The Arrow twins must DEGRADE the
    same rows the expression path degrades (NULL cell/codes) instead
    of raising ``np.asarray`` shape errors for the whole batch: with
    ``arrow=None`` auto-switching on k×dim, a corpus that is fine
    under the expression path must not start failing merely because
    the centroid count crossed ``_ARROW_ASSIGN_MIN_OPS``."""
    import numpy as np

    vals = list(v)
    good = [
        i for i, x in enumerate(vals) if x is not None and len(x) == dim
    ]
    if len(good) == len(vals):
        return vals, None, np.asarray(vals, dtype=np.float64).reshape(
            len(vals), dim
        )
    mat = np.asarray([vals[i] for i in good], dtype=np.float64).reshape(
        len(good), dim
    )
    return vals, good, mat


def _assign_l2_udf(cents: list[list[float]]):
    """Arrow-batched rounded-argmin cell assignment — same contract as
    the ``kmeans_assign`` expression path, one matmul per batch."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    books = [cents]
    dim = len(cents[0])

    @pandas_udf("int")
    def assign(v):
        import pandas as pd

        vals, good, mat = _split_valid(v, dim)
        cells = _grid_argmin_codes(mat, books)[:, 0]
        if good is None:
            return pd.Series(cells)
        out = [None] * len(vals)
        for j, i in enumerate(good):
            out[i] = int(cells[j])
        return pd.Series(pd.array(out, dtype="Int32"))

    return assign


def kmeans_assign(
    corpus: DataFrame,
    cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: "bool | None" = None,
) -> DataFrame:
    """(id, cell) for every vector: argmin of rounded squared-L2
    distance against the broadcast centroid literals, ties to the
    lowest cell index (``array_position`` returns the FIRST minimal
    entry). Small k × dim: pure Catalyst multiply-adds inside
    whole-stage codegen, no shuffle, no Python. Large k × dim
    (``arrow=None`` auto, ≥ ``_ARROW_ASSIGN_MIN_OPS``): the SAME
    rounded-argmin as one BLAS matmul per Arrow batch — per-element
    expression lambdas are interpreted and dominate IVF-PQ training
    otherwise."""
    from from_superset_to_clickhouse_spark.functions.scalar import let_bind

    if arrow is None:
        arrow = len(cents) * len(cents[0]) >= _ARROW_ASSIGN_MIN_OPS
    if arrow:
        try:
            cell = _assign_l2_udf(cents)(F.col(vec_col))
            return corpus.select(
                F.col(id_col), F.col(vec_col), cell.alias("cell")
            )
        except ImportError:
            pass
    dists = F.array(*[_dist2(F.col(vec_col), c) for c in cents])
    cell = let_bind(
        dists, lambda d: F.array_position(d, F.array_min(d)) - 1
    ).cast("int")
    return corpus.select(F.col(id_col), F.col(vec_col), cell.alias("cell"))


def kmeans(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Distributed Lloyd's k-means (Euclidean) → (assignments, centroids).

    Per iteration: one broadcast-literal assignment pass (no shuffle)
    and one per-(cell, coordinate) mean — posexplode + partial/final
    HashAggregate, so exactly k × dim rows cross to the driver per
    round regardless of corpus size. Init = the first ``k`` vectors by
    id (deterministic and oracle-replayable; callers wanting hash-order
    init compose with ``train_centroids``). Empty cells keep their
    previous centroid. The returned assignment is computed against the
    FINAL centroids (iters updates, then one closing assignment), which
    is exactly the unrolled form a SQL twin can replay.

    At 100 TB: state per round is k × dim floats broadcast out and
    k × dim averages back — the corpus is scanned ``iters + 1`` times
    and never shuffled on vectors; only the exploded (cell, idx, x)
    rows shuffle, combined map-side first."""
    # orderBy+limit, not filter(id < k): ids may be 1-based or sparse,
    # and "first k by id" must mean rank order, not value range.
    init = corpus.orderBy(id_col).select(vec_col).limit(k).collect()
    if len(init) < k:
        raise ValueError(
            f"kmeans needs at least k={k} vectors; corpus has {len(init)}"
        )
    cents = [[float(x) for x in r[0]] for r in init]
    dim = len(cents[0])
    for _ in range(iters):
        assigned = kmeans_assign(corpus, cents, id_col, vec_col)
        means = (
            assigned.select(
                "cell", F.posexplode(F.col(vec_col)).alias("idx", "x")
            )
            .groupBy("cell", "idx")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["idx"]] = r["m"]
        cents = [
            [by_cell.get(c, {}).get(i, cents[c][i]) for i in range(dim)]
            for c in range(k)
        ]
    return (
        kmeans_assign(corpus, cents, id_col, vec_col).select(id_col, "cell"),
        cents,
    )


def _assign_udf(cents: list[list[float]]):
    """Vectorized cell assignment: argmax dot against the (tiny) centroid
    matrix, one BLAS matmul per Arrow batch. The matrix rides in the UDF
    closure (ncells×dim floats — broadcast-sized by construction).
    First-max tie-break matches ``_assign_cell``'s ``array_position``."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(cents, dtype=np.float64)

    @pandas_udf("int")
    def assign(v):
        import pandas as pd

        vals, good, m = _split_valid(v, c.shape[1])
        cells = np.argmax(m @ c.T, axis=1).astype(np.int32)
        if good is None:
            return pd.Series(cells)
        out = [None] * len(vals)
        for j, i in enumerate(good):
            out[i] = int(cells[j])
        return pd.Series(pd.array(out, dtype="Int32"))

    return assign


def _probe_udf(cents: list[list[float]], nprobe: int):
    """Vectorized multi-cell probe: the ``nprobe`` highest-dot cells per
    query, one matmul + argsort per Arrow batch. Tie order among
    equal-similarity cells differs from the expression path (ascending
    vs descending cell id) — irrelevant to results since every probed
    cell's candidates are exactly re-ranked."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(cents, dtype=np.float64)
    npb = int(nprobe)

    @pandas_udf("array<int>")
    def probe(v):
        import pandas as pd

        vals, good, m = _split_valid(v, c.shape[1])
        idx = np.argsort(-(m @ c.T), axis=1, kind="stable")[:, :npb]
        idx = idx.astype(np.int32)
        if good is None:
            return pd.Series(list(idx))
        out = [None] * len(vals)
        for j, i in enumerate(good):
            out[i] = idx[j]
        return pd.Series(out)

    return probe


def _cent_lit(cents: list[list[float]]) -> Column:
    return F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cents])


def _assign_cell(vec: Column, cents: list[list[float]]) -> Column:
    """Index (0-based int) of the max-dot-product centroid."""
    sims = let_bind(
        vec,
        lambda v: F.transform(_cent_lit(cents), lambda c: dot(c, v)),
    )
    return let_bind(
        sims, lambda s: (F.array_position(s, F.array_max(s)) - 1).cast("int")
    )


def _probe_cells(vec: Column, cents: list[list[float]], nprobe: int) -> Column:
    """The ``nprobe`` nearest cell indices for a query vector."""
    sims = let_bind(
        vec, lambda v: F.transform(_cent_lit(cents), lambda c: dot(c, v))
    )
    return let_bind(
        sims,
        lambda s: F.slice(
            F.reverse(
                F.transform(
                    F.array_sort(
                        F.zip_with(
                            s,
                            F.sequence(F.lit(0), F.lit(len(cents) - 1)),
                            lambda sim, i: F.struct(
                                sim.alias("sim"), i.alias("cell")
                            ),
                        )
                    ),
                    lambda p: p["cell"],
                )
            ),
            1,
            nprobe,
        ),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ncells: int = 16,
    nprobe: int = 10,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse quantizer → probe nprobe cells →
    exact cosine re-rank of those cells only.

    Scoring work is the ~nprobe/ncells fraction of the corpus per query.
    The fixture embeddings are near-random (worst case for any
    partitioned index — neighbors barely correlate with cells), so the
    default probes 10/16 cells for ~0.87 measured recall; clustered
    real embeddings concentrate neighbors in 1-2 cells and prune far
    harder at the same recall.
    At 100 TB the cell id is also the partition key: assignment is a
    one-off pass (``ivf_index`` persists it; ``ivf_topk_indexed``
    queries it with partition-pruned reads), probes prune partitions,
    and each cell's vectors are co-located. Pass pre-trained
    ``centroids`` to skip training (the production pattern — train once
    on a sample).

    Scoring is a cogrouped-by-cell Arrow ``applyInPandas`` (one BLAS
    matmul per cell between the cell's corpus block and the queries
    probing it — per-cell work, C hot loop, shuffled output is only the
    per-(query, cell) top-k). Falls back to the per-pair Catalyst
    expression join when numpy is unavailable.
    """
    cents = centroids if centroids is not None else train_centroids(
        corpus, ncells, id_col=id_col, vec_col=vec_col
    )
    return ivf_topk_indexed(
        ivf_index(corpus, cents, id_col=id_col, vec_col=vec_col),
        queries,
        cents,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        nprobe=nprobe,
    )


def ivf_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Persistable IVF index: (cell, n_id, n_vec) — every corpus vector
    assigned to its nearest centroid's cell, ONCE. Write it partitioned
    by ``cell`` — ``.repartition("cell")`` first for one file per cell —
    and query batches with ``ivf_topk_indexed``. The same ``centroids``
    (persist via ``save_centroids``) MUST be used at query time — the
    quantizer IS the index layout.

    When it pays: SELECTIVE query batches, where only the probed cells'
    partition directories are read (nprobe/ncells of the corpus touched
    from storage). For a bulk batch that probes every cell anyway, the
    fused ``ivf_topk`` over a hot corpus re-assigns with one matmul and
    skips the index re-read — measured faster on local disk; the index
    wins when the corpus doesn't fit hot or reads are pruned.

    Arrow-batched pandas-UDF assignment when numpy is available; the
    expression twin inlines ncells×dim literals into per-element
    aggregate lambdas — measured ~10× slower from codegen bloat alone."""
    try:
        import numpy  # noqa: F401

        assign = _assign_udf(centroids)(F.col(vec_col))
    except ImportError:
        assign = _assign_cell(F.col(vec_col), centroids)
    return corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        assign.alias("cell"),
    )


def ivf_index_append(
    index_path: str,
    new_corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental IVF maintenance: assign ONLY the new batch to cells
    and append into the existing cell-partitioned index directories.

    Because the quantizer (the frozen ``centroids``) is deterministic
    and per-row, append(old index, new batch) is EXACTLY equal to
    rebuilding from the unioned corpus — no approximation, no re-read
    of the existing index. Daily maintenance cost is O(batch),
    corpus-size-independent: the ANN counterpart of
    ``minhash_incremental``'s new×index design. When centroids are
    re-trained (quantizer drift), rebuild — the layout IS the
    quantizer, so new centroids invalidate every cell assignment."""
    ivf_index(new_corpus, centroids, id_col=id_col, vec_col=vec_col) \
        .repartition("cell") \
        .write.mode("append").partitionBy("cell").parquet(index_path)


def ivf_topk_pruned(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 10,
) -> DataFrame:
    """Selective-batch IVF against a cell-partitioned ``ivf_index`` on
    disk: compute the batch's probed cell set FIRST (a tiny job — at
    most ncells ints reach the driver), then read ONLY those cells'
    partition directories (a static ``isin`` the scan turns into
    PartitionFilters — directories outside the probe set are never
    listed or opened), then score exactly like ``ivf_topk_indexed``.

    This is the operator the cell-partitioned layout exists for: a
    small query batch probing p of N cells touches p/N of the corpus
    FROM STORAGE, not just in compute. Results are identical to the
    fused/indexed forms — each query only ever joins its own probed
    cells, all of which are in the union read here."""
    try:
        import numpy  # noqa: F401

        probe = _probe_udf(centroids, nprobe)(F.col(vec_col))
    except ImportError:
        probe = _probe_cells(F.col(vec_col), centroids, nprobe)
    cells = [
        r["cell"]
        for r in queries.select(F.explode(probe).alias("cell"))
        .distinct()
        .collect()
    ]
    index = spark.read.parquet(index_path).filter(
        F.col("cell").isin(cells)
    )
    return ivf_topk_indexed(
        index, queries, centroids, k=k, id_col=id_col, vec_col=vec_col,
        nprobe=nprobe,
    )


def ivf_topk_indexed(
    index: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 10,
) -> DataFrame:
    """IVF top-k against a prebuilt ``ivf_index`` (columns: cell, n_id,
    n_vec): probe each query's ``nprobe`` nearest cells, exact cosine
    re-rank of those cells' vectors only.

    Scoring is a cogrouped-by-cell Arrow ``applyInPandas`` (one BLAS
    matmul per cell between the cell's corpus block and the queries
    probing it; shuffled output is only the per-(query, cell) top-k) —
    per-pair Catalyst expression join as the no-numpy fallback."""
    try:
        import numpy  # noqa: F401

        have_np = True
    except ImportError:
        have_np = False
    if have_np:
        qb = queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(_probe_udf(centroids, nprobe)(F.col(vec_col))).alias(
                "cell"
            ),
        )
        scored = _score_cells_cogrouped(
            index, qb, k, dict(index.dtypes)["n_id"]
        )
    else:
        qb = queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(
                _probe_cells(F.col(vec_col), centroids, nprobe)
            ).alias("cell"),
        )
        scored = (
            index.join(qb, "cell")
            .filter(F.col("n_id") != F.col("q_id"))
            .select(
                "q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("sim")
            )
        )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("sim", 6).alias("sim"), "rank")
    )


def _score_cells_cogrouped(
    cb: DataFrame, qb: DataFrame, k: int, id_type: str
) -> DataFrame:
    """Per-cell exact scoring: cogroup (corpus cell block, probing
    queries) → one normalized matmul → tie-safe per-query top-k cut
    (same cut as ``_brute_force_topk_vectorized``: only rows strictly
    beaten by ≥ k cell-mates are dropped, so the global re-rank is exact
    over the probed candidate set)."""
    import numpy as np

    kk = int(k)

    def score(left, right):
        import pandas as pd

        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"q_id": [], "n_id": [], "sim": []})
        n_ids = left["n_id"].to_numpy()
        m = np.asarray(list(left["n_vec"]), dtype=np.float64)
        mn = np.linalg.norm(m, axis=1)
        mn[mn == 0.0] = 1.0
        q_ids = right["q_id"].to_numpy()
        q = np.asarray(list(right["q_vec"]), dtype=np.float64)
        qn = np.linalg.norm(q, axis=1)
        qn[qn == 0.0] = 1.0
        s = (m / mn[:, None]) @ (q / qn[:, None]).T  # |cell| × nq
        s[n_ids[:, None] == q_ids[None, :]] = -np.inf
        t = min(kk, s.shape[0])
        part = np.argpartition(-s, t - 1, axis=0)[:t]
        thresh = np.take_along_axis(s, part, 0).min(axis=0)
        mask = (s >= thresh[None, :]) & np.isfinite(s)
        rows, cols = np.nonzero(mask)
        return pd.DataFrame(
            {"q_id": q_ids[cols], "n_id": n_ids[rows], "sim": s[rows, cols]}
        )

    return (
        cb.groupBy("cell")
        .cogroup(qb.groupBy("cell"))
        .applyInPandas(score, schema=f"q_id {id_type}, n_id {id_type}, sim double")
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.9,
    n_seeds: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings, then drop any
    vector that has a lower-id near-duplicate (cosine ≥ ``threshold``)
    in ITS OWN cluster → (id, cluster, keep).

    ``seeds`` is the prototype set the corpus is partitioned against
    (nearest-prototype by cosine, ties to the smallest seed id). It
    defaults to the ``n_seeds`` lowest-id vectors — a deterministic,
    oracle-replayable choice; at scale pass ``train_centroids`` output
    wrapped in a DataFrame instead (the plan is identical).

    The keep rule is the paper's one-pass pruning, NOT a transitive
    closure: v is dropped iff some u < v in the same cluster has
    cos(u, v) ≥ threshold — so it is directly expressible as NOT
    EXISTS, and the oracle checks it exactly. (For closure semantics
    compose ``embedding_dedup_pairs`` + ``connected_components``.)

    Shape at scale: the seed set is broadcast (O(N·k) scoring, no
    shuffle of the corpus); the pairwise stage is confined WITHIN
    clusters — Σ|c|² work instead of N², which is the entire point of
    SemDeDup — and shuffles on the cluster key. Scores are rounded to 6
    decimals before both the argmax and the threshold compare so every
    engine agrees on ties at the boundary.
    """
    if seeds is None:
        seeds = df.filter(F.col(id_col) < n_seeds)
    # Norms are materialized ONCE per vector/seed: the pairwise stages
    # below would otherwise re-fold the 2 norm aggregates inside every
    # pair's cosine (CSE does not reach into HOF lambdas) — measured 2×
    # on the within-cluster stage. Same arithmetic, same rounded values.
    sd = seeds.select(
        F.col(id_col).alias("seed_id"),
        F.col(vec_col).alias("seed_vec"),
        norm(F.col(vec_col)).alias("seed_nrm"),
    )
    vecs = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        norm(F.col(vec_col)).alias("nrm"),
    )
    assigned = (
        vecs.crossJoin(F.broadcast(sd))
        .withColumn(
            "score",
            F.round(
                dot(F.col("vec"), F.col("seed_vec"))
                / (F.col("nrm") * F.col("seed_nrm")),
                6,
            ),
        )
        .groupBy("vid")
        .agg(
            F.max_by(
                "seed_id", F.struct(F.col("score"), -F.col("seed_id"))
            ).alias("cluster")
        )
    )
    # r15 optimization round (guide §2.4/§5): the assignment stage
    # (N·k broadcast scoring + argmax) feeds THREE consumers — both
    # sides of the within-cluster self-join and the final keep join.
    # Materializing it once (eager localCheckpoint) replaces three
    # evaluations of the scoring subtree with one + two cheap scans
    # (measured 2.9 → 2.5 s warm at sf0.1, identical rows).
    with_vec = assigned.join(vecs, "vid").localCheckpoint(eager=True)
    assigned = with_vec.select("vid", "cluster")
    a, b = with_vec.alias("a"), with_vec.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .filter(
            F.round(
                dot(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            )
            >= F.lit(threshold)
        )
        .select(F.col("b.vid").alias("vid"))
        .distinct()
        .withColumn("_dropped", F.lit(1))
    )
    return (
        assigned.join(dropped, "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cluster",
            F.when(F.col("_dropped").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("keep"),
        )
    )


def rrf_fuse(
    ranked: "list[DataFrame]",
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of any number of ranked retrieval lists → (id, rrf_score, rank).

    Each input carries (id_col, rank_col); a candidate's fused score is
    Σ_lists 1/(c + rank), with lists that missed the candidate simply
    contributing nothing (full-outer join + coalesce-to-zero). This is
    the standard hybrid-retrieval combiner — BM25 sparse ranks fused
    with dense embedding-cosine ranks — and is rank-only, so the two
    sides' incomparable score scales never need calibration.

    Shape at scale: each input list is already top-depth (small — depth
    rows per query), so the fusion joins tiny DataFrames; the corpus
    pass happened inside the upstream retrievers. Score addition is a
    fixed left-to-right chain, bit-deterministic for the oracle. Final
    top-k is an ordered LIMIT (TakeOrderedAndProject), never a global
    sort.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked input")
    fused = None
    parts = []
    for i, df in enumerate(ranked):
        parts.append(f"_rrf_{i}")
        contrib = df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(c)) + F.col(rank_col))).alias(
                f"_rrf_{i}"
            ),
        )
        fused = (
            contrib
            if fused is None
            else fused.join(contrib, id_col, "full_outer")
        )
    score = F.coalesce(F.col(parts[0]), F.lit(0.0))
    for p in parts[1:]:
        score = score + F.coalesce(F.col(p), F.lit(0.0))
    scored = fused.select(F.col(id_col), score.alias("_score"))
    w = Window.orderBy(F.col("_score").desc(), F.col(id_col))
    return (
        scored.orderBy(F.col("_score").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            F.round("_score", 6).alias("rrf_score"),
            F.row_number().over(w).cast("int").alias("rank"),
        )
    )


# -- product quantization (PQ / ADC) --------------------------------------
#
# Compressed-domain ANN (Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011 — public literature): split each
# vector into M subspaces, k-means a tiny codebook per subspace, store
# each vector as M byte-sized code ids, and answer queries with
# Asymmetric Distance Computation — a per-query lookup table of
# query-subvector→centroid distances, so scoring a vector is M table
# lookups instead of a dim-wide float scan. THE scale path for 100 TB
# embedding corpora: 64-dim float32 vectors (256 B) compress to M=4
# bytes, turning a petabyte-scale scan problem into one that fits in
# cluster memory. Training mirrors ``kmeans`` (deterministic init,
# rounded-argmin assignment, bounded k×dim driver state), so the whole
# train→encode→search pipeline is SQL-replayable for the oracle.


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "list[list[list[float]]]":
    """Per-subspace Lloyd's → codebooks[sub][code] (len dim/m each).

    One pass per iteration trains ALL subspaces at once: each row
    computes its m assigned codes inside whole-stage codegen (broadcast
    codebook literals, rounded-distance argmin with lowest-code ties —
    the same cross-engine determinism contract as ``kmeans``), then one
    posexplode + groupBy((sub, code, idx)) mean returns exactly k × dim
    doubles to the driver per round regardless of corpus size. Init =
    subvectors of the first k rows by id; empty codes keep their
    previous centroid."""
    init = corpus.orderBy(id_col).select(vec_col).limit(k).collect()
    if len(init) < k:
        raise ValueError(f"pq_train needs at least k={k} vectors")
    dim = len(init[0][0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    books = [
        [[float(x) for x in r[0][s * d : (s + 1) * d]] for r in init]
        for s in range(m)
    ]
    for _ in range(iters):
        enc = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)
        sub_rows = enc.select(
            F.posexplode(
                F.array(*[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.col(f"code_{s}").alias("code"),
                        F.slice(F.col(vec_col), s * d + 1, d).alias("sv"),
                    )
                    for s in range(m)
                ])
            ).alias("_p", "r")
        ).select("r.sub", "r.code", F.posexplode("r.sv").alias("idx", "x"))
        means = (
            sub_rows.groupBy("sub", "code", "idx")
            .agg(F.avg(F.col("x").cast("double")).alias("mean"))
            .collect()
        )
        acc: dict = {}
        for r in means:
            acc.setdefault((r["sub"], r["code"]), {})[r["idx"]] = r["mean"]
        books = [
            [
                [
                    acc.get((s, c), {}).get(i, books[s][c][i])
                    for i in range(d)
                ]
                for c in range(k)
            ]
            for s in range(m)
        ]
    return books


def _pq_codes_udf(books: "list[list[list[float]]]"):
    """Arrow-batched PQ encoder: all m subspace codes per row from one
    blocked matmul pass — same grid/tie contract as the expression
    path (see ``_grid_argmin_codes``)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    d = len(books[0][0])
    dim = len(books) * d

    @pandas_udf("array<int>")
    def codes(v):
        import pandas as pd

        vals, good, mat = _split_valid(v, dim)
        gc = _grid_argmin_codes(mat, books)
        if good is None:
            return pd.Series(list(gc))
        out = [None] * len(vals)
        for j, i in enumerate(good):
            out[i] = gc[j]
        # ragged-but-non-NULL rows keep the expression path's
        # per-subspace rule: code_s is real iff the vector covers
        # subspace s completely, NULL past its end (rare rows, 1-row
        # matmuls)
        for i, x in enumerate(vals):
            if x is None or len(x) == dim:
                continue
            xs = np.asarray(x, dtype=np.float64)
            row = []
            for s, b in enumerate(books):
                if len(xs) >= (s + 1) * d:
                    row.append(
                        int(
                            _grid_argmin_codes(
                                xs[s * d:(s + 1) * d][None, :], [b]
                            )[0, 0]
                        )
                    )
                else:
                    row.append(None)
            out[i] = row
        return pd.Series(out)

    return codes


def pq_encode(
    corpus: DataFrame,
    books: "list[list[list[float]]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: "tuple[str, ...]" = (),
    arrow: "bool | None" = None,
) -> DataFrame:
    """(id, vec, [keep_cols...,] code_0..code_{m-1}): each subvector's
    nearest-codebook id via rounded-distance argmin, ties to the lowest
    code. Small m × k × (dim/m): pure Catalyst multiply-adds in
    codegen, no shuffle, no Python. Large (``arrow=None`` auto, total
    ops ≥ ``_ARROW_ASSIGN_MIN_OPS``): the same argmin per subspace as
    one Arrow-batched matmul pass — identical grid/tie contract. The m
    int codes ARE the compressed vector."""
    from from_superset_to_clickhouse_spark.functions.scalar import let_bind

    m = len(books)
    k = len(books[0])
    d = len(books[0][0])
    cols = [F.col(id_col), F.col(vec_col)]
    cols += [F.col(c) for c in keep_cols]
    if arrow is None:
        arrow = m * k * d >= _ARROW_ASSIGN_MIN_OPS
    if arrow:
        try:
            codes = _pq_codes_udf(books)(F.col(vec_col))
            tmp = corpus.select(*cols, codes.alias("_pq_codes"))
            return tmp.select(
                *[F.col(c) for c in tmp.columns[:-1]],
                *[
                    F.element_at(F.col("_pq_codes"), s + 1).alias(f"code_{s}")
                    for s in range(m)
                ],
            )
        except ImportError:
            pass
    for s in range(m):
        sl = F.slice(F.col(vec_col), s * d + 1, d)
        dists = F.array(*[_dist2(sl, c) for c in books[s]])
        code = let_bind(
            dists, lambda dd: F.array_position(dd, F.array_min(dd)) - 1
        ).cast("int")
        cols.append(code.alias(f"code_{s}"))
    return corpus.select(*cols)


def pq_adc_topk(
    corpus: DataFrame,
    books: "list[list[list[float]]]",
    query: "list[float]",
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encoded: bool = False,
) -> DataFrame:
    """Asymmetric Distance Computation top-k: the query is NOT
    quantized — a per-query LUT of round(||q_sub − codebook[sub][c]||²,
    6) is built driver-side (m × k doubles) and baked into the plan as
    literals, so scoring a row is m element_at lookups + a fixed
    left-to-right add chain (bit-deterministic for the oracle), and the
    result is an ordered LIMIT, never a global sort. At 100 TB the scan
    reads ONLY the m byte-ish code columns (column pruning drops the
    raw vectors), which is the entire point of PQ."""
    m = len(books)
    lut = []
    for s in range(m):
        q_s = query[s * len(books[0][0]) : (s + 1) * len(books[0][0])]
        lut.append(
            [
                round(sum((float(a) - float(b)) ** 2 for a, b in zip(q_s, c)), 6)
                for c in books[s]
            ]
        )
    # ``encoded=True``: corpus already carries code_0..code_{m-1} (the
    # persisted-index production shape — encode once, ADC-scan codes per
    # query batch); otherwise encode inline for the one-shot path.
    enc = (
        corpus
        if encoded
        else pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)
    )
    adc = F.element_at(
        F.array(*[F.lit(v) for v in lut[0]]), F.col("code_0") + 1
    )
    for s in range(1, m):
        adc = adc + F.element_at(
            F.array(*[F.lit(v) for v in lut[s]]), F.col(f"code_{s}") + 1
        )
    scored = enc.select(
        F.col(id_col),
        *[F.col(f"code_{s}") for s in range(m)],
        F.round(adc, 4).alias("adc"),
    )
    return scored.orderBy("adc", id_col).limit(topk)


def exact_rerank(
    corpus: DataFrame,
    candidates: DataFrame,
    query: "list[float]",
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The FAISS-style *refine* stage for compressed-domain search:
    join a BOUNDED candidate id set (ADC top-R) back to the raw
    vectors and rank by exact squared L2 to the query literal →
    (id, dist). PQ/IVF-PQ codes identify the right neighborhood but
    cannot order within-cluster ties (the quantization cell is wider
    than the neighbor gaps); re-scoring R ≪ N candidates exactly
    restores the ordering at R/N of the exact-scan cost. The candidate
    side broadcasts (R rows), so the join never shuffles the corpus;
    at 100 TB the raw-vector lookup is the only full-width read and
    it touches R rows."""
    qlit = F.array(*[F.lit(float(x)) for x in query])
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            qlit,
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # distinct() the candidate ids: duplicate candidate rows (e.g. a
    # probe union that emits an id twice) would otherwise duplicate
    # (id, dist) rows and burn topk slots.
    j = F.broadcast(candidates.select(id_col).distinct()).join(
        corpus, id_col
    )
    return (
        j.select(F.col(id_col), F.round(d2, 6).alias("dist"))
        .orderBy("dist", id_col)
        .limit(topk)
    )


def _residuals(
    corpus: DataFrame,
    cents: "list[list[float]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, residual): per-vector coarse assignment (rounded
    argmin, lowest-cell ties — the shared determinism contract) and the
    DOUBLE residual v − centroid[cell], all in codegen: the centroid
    table rides as a nested array literal indexed by the assigned
    cell."""
    if len(cents) * len(cents[0]) >= _ARROW_ASSIGN_MIN_OPS:
        try:
            import numpy as np
            from pyspark.sql.functions import pandas_udf

            c = np.asarray(cents, dtype=np.float64)

            @pandas_udf("struct<cell:int, residual:array<double>>")
            def cell_res(v):
                import pandas as pd

                vals, good, mat = _split_valid(v, c.shape[1])
                cell = _grid_argmin_codes(mat, [cents])[:, 0]
                res = mat - c[cell]
                if good is None:
                    return pd.DataFrame(
                        {"cell": cell, "residual": list(res)}
                    )
                cells = [None] * len(vals)
                resid = [None] * len(vals)
                for j, i in enumerate(good):
                    cells[i] = int(cell[j])
                    resid[i] = res[j]
                return pd.DataFrame(
                    {
                        "cell": pd.array(cells, dtype="Int32"),
                        "residual": resid,
                    }
                )

            tmp = corpus.select(
                F.col(id_col), cell_res(F.col(vec_col)).alias("_cr")
            )
            return tmp.select(
                F.col(id_col),
                F.col("_cr.cell").alias("cell"),
                F.col("_cr.residual").alias("residual"),
            )
        except ImportError:
            pass
    assigned = kmeans_assign(corpus, cents, id_col, vec_col)
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in cents]
    )
    res = F.zip_with(
        F.col(vec_col),
        F.element_at(cent_lit, F.col("cell") + 1),
        lambda a, b: a.cast("double") - b,
    )
    return assigned.select(
        F.col(id_col), F.col("cell"), res.alias("residual")
    )


def ivfpq_train(
    corpus: DataFrame,
    ncells: int = 4,
    coarse_iters: int = 1,
    m: int = 4,
    k: int = 8,
    pq_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "list[list[float]] | None" = None,
):
    """IVF-PQ training (the FAISS-style two-level index — Jégou et al.
    2011 §IV): a coarse Lloyd's quantizer shards the corpus into cells,
    then ONE set of product-quantization codebooks is trained on the
    RESIDUALS v − centroid[cell] (residuals are centered near zero, so
    a shared codebook quantizes them far better than raw vectors).
    Returns (centroids, codebooks). Both stages reuse the deterministic
    rounded-argmin/first-k-init contract, which is what keeps the whole
    two-level pipeline SQL-replayable.

    Cost audit (round 12): the stage is dominated by the ncells×dim
    rounded-argmin that produces residuals (zip_with/aggregate lambdas
    are interpreted per element). Two cheaper forms were evaluated and
    rejected: unrolling the distance into element_at arithmetic keeps
    bit-identity but the 256×64-term expression tree OOMs the JVM; an
    Arrow-batched matmul (``_assign_udf``) is fast but changes the
    tie-break/rounding contract the ivf/ivfpq oracle twins replay. The
    shipped fix is the residual persist below (one pass instead of
    pq_train's two) plus the bounded-sample training contract."""
    if centroids is None:
        _, cents = kmeans(
            corpus, k=ncells, iters=coarse_iters, id_col=id_col,
            vec_col=vec_col,
        )
    else:
        # Reuse already-trained coarse centroids (e.g. the persisted
        # ``train_centroids`` output an IVF deployment already has) —
        # only the residual PQ codebooks are trained.
        cents = centroids
    # Materialize the residual sample ONCE: the ncells×dim argmin that
    # produces residuals is the expensive part of this stage (for large
    # ncells the expression tree leaves whole-stage codegen), and
    # pq_train scans its input twice (init collect + encode pass) per
    # iteration — without the persist the residual pass re-runs each
    # time (measured 74.5 s → 35.9 s at the bench's 100k×64/256-cell
    # operating point). The train sample is bounded by contract
    # (FAISS-style: train on ~100k regardless of corpus size), so the
    # persist is O(sample), never O(corpus).
    res = _residuals(corpus, cents, id_col, vec_col).persist()
    try:
        res.count()
        books = pq_train(
            res, m=m, k=k, iters=pq_iters, id_col=id_col, vec_col="residual"
        )
    finally:
        res.unpersist()
    return cents, books


def _ivfpq_codes_udf(
    cents: "list[list[float]]", books: "list[list[list[float]]]"
):
    """Fused Arrow encoder for the whole IVF-PQ index row: coarse cell
    (grid argmin), residual v − centroid[cell] (IEEE float64 subtract —
    bit-identical to the expression path's per-element DOUBLE minus),
    and the m residual codes (grid argmin per subspace), in ONE Python
    round-trip per batch instead of assign-UDF → interpreted zip_with →
    encode-UDF (measured 18.1 s → ~4 s for the 400k×64/256-cell bench
    encode). Same determinism contract throughout
    (``_grid_argmin_codes``)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(cents, dtype=np.float64)

    @pandas_udf("struct<cell:int, codes:array<int>>")
    def enc(v):
        import pandas as pd

        vals, good, mat = _split_valid(v, c.shape[1])
        cell = _grid_argmin_codes(mat, [cents])[:, 0]
        res = mat - c[cell]
        codes = _grid_argmin_codes(res, books)
        if good is None:
            return pd.DataFrame({"cell": cell, "codes": list(codes)})
        cells = [None] * len(vals)
        cds = [None] * len(vals)
        for j, i in enumerate(good):
            cells[i] = int(cell[j])
            cds[i] = codes[j]
        return pd.DataFrame(
            {"cell": pd.array(cells, dtype="Int32"), "codes": cds}
        )

    return enc


def ivfpq_index(
    corpus: DataFrame,
    cents: "list[list[float]]",
    books: "list[list[list[float]]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: "bool | None" = None,
) -> DataFrame:
    """(id, cell, code_0..code_{m-1}): the complete compressed index
    row — coarse cell for partition pruning plus m residual code ids.
    At 100 TB this is what persists (partitionBy(cell), a few bytes per
    vector); the raw vectors are only ever re-read to rerank. Large
    ncells × dim takes the fused one-pass Arrow encoder (same contract
    — ``test_ivfpq_index_arrow_matches_expression`` pins the paths
    equal); small stays pure Catalyst."""
    if arrow is None:
        arrow = len(cents) * len(cents[0]) >= _ARROW_ASSIGN_MIN_OPS
    if arrow:
        try:
            m = len(books)
            enc = _ivfpq_codes_udf(cents, books)(F.col(vec_col))
            tmp = corpus.select(F.col(id_col), enc.alias("_e"))
            return tmp.select(
                F.col(id_col),
                F.col("_e.cell").alias("cell"),
                *[
                    F.element_at(F.col("_e.codes"), s + 1).alias(f"code_{s}")
                    for s in range(m)
                ],
            )
        except ImportError:
            pass
    res = _residuals(corpus, cents, id_col, vec_col)
    enc = pq_encode(
        res, books, id_col=id_col, vec_col="residual", keep_cols=("cell",)
    )
    return enc.drop("residual")


def ivfpq_topk(
    corpus: DataFrame,
    cents: "list[list[float]]",
    books: "list[list[list[float]]]",
    query: "list[float]",
    nprobe: int = 2,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: "DataFrame | None" = None,
) -> DataFrame:
    """IVF-PQ ADC search: probe the ``nprobe`` coarse cells nearest the
    query (rounded-distance order, lowest-cell ties), build ONE LUT per
    probed cell from the cell-relative query residual q − centroid[cell]
    against the shared codebooks (nprobe × m × k doubles, driver-side,
    baked as literals), then score only rows whose cell is probed: m
    lookups + a fixed left-to-right add chain, ordered LIMIT. The cell
    filter is the partition-pruning path when the index is persisted
    partitionBy(cell) — unprobed shards are never read."""
    m = len(books)
    d = len(books[0][0])
    dists = [
        (
            round(
                sum((float(a) - float(b)) ** 2 for a, b in zip(query, c)), 6
            ),
            cell,
        )
        for cell, c in enumerate(cents)
    ]
    probes = [cell for _, cell in sorted(dists)[:nprobe]]
    luts = {}
    for cell in probes:
        qr = [float(a) - float(b) for a, b in zip(query, cents[cell])]
        luts[cell] = [
            [
                round(
                    sum(
                        (qr[s * d + i] - float(c[i])) ** 2 for i in range(d)
                    ),
                    6,
                )
                for c in books[s]
            ]
            for s in range(m)
        ]
    # ``index``: a pre-built ivfpq_index DataFrame (or its persisted
    # parquet re-read) — encode once, probe many; when persisted
    # partitionBy(cell) the isin filter below is the partition-pruning
    # path, so unprobed shards are never read.
    idx = (
        index
        if index is not None
        else ivfpq_index(corpus, cents, books, id_col, vec_col)
    )
    probed = idx.filter(F.col("cell").isin(probes))
    # probe position lookup keeps the LUT a rectangular literal array
    pos = F.lit(None).cast("int")
    for i, cell in enumerate(probes):
        pos = F.when(F.col("cell") == cell, F.lit(i)).otherwise(pos)
    lut_lit = [
        F.array(*[
            F.array(*[F.lit(luts[cell][s][c]) for c in range(len(books[s]))])
            for cell in probes
        ])
        for s in range(m)
    ]
    probed = probed.withColumn("_pos", pos)
    adc = F.element_at(
        F.element_at(lut_lit[0], F.col("_pos") + 1), F.col("code_0") + 1
    )
    for s in range(1, m):
        adc = adc + F.element_at(
            F.element_at(lut_lit[s], F.col("_pos") + 1),
            F.col(f"code_{s}") + 1,
        )
    return (
        probed.select(
            F.col(id_col),
            F.col("cell"),
            *[F.col(f"code_{s}") for s in range(m)],
            F.round(adc, 4).alias("adc"),
        )
        .orderBy("adc", id_col)
        .limit(topk)
    )


def dbscan_grid(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    min_pts: int,
    max_iter: int = 30,
) -> DataFrame:
    """Density-based clustering (DBSCAN, Ester et al. 1996) over 2-D
    points → (id, cluster, is_core): cluster = min id of the point's
    density-connected core component; border points take the smallest
    cluster among their core neighbors (a deterministic refinement of
    DBSCAN's arbitrary-assignment rule); noise points are absent.

    Distributed shape — the textbook algorithm is sequential; this is
    the relational reformulation:

    1. eps-grid bucketing: each point keys to cell (⌊x/eps⌋, ⌊y/eps⌋);
       candidate pairs come from a 9-cell neighborhood equi-join (the
       left side fans out ×9, the join itself is a hash join on the
       cell key — density-bounded, never n²; same trick as
       ``geo.neighbor_pairs_grid``).
    2. neighbor counts (|N_eps(p)| includes p itself, per the paper) →
       core flags: one partial-aggregated count.
    3. core–core adjacency → ``graph.connected_components`` (the
       O(log d)-round pointer-jumping loop) labels each density-
       connected component with its min core id.
    4. border attach: one keyed join from non-core points to their
       core neighbors' labels, min-aggregated.

    All distance tests compare squared distance to eps² in double
    precision — identical arithmetic on any engine, no sqrt.
    """
    from from_superset_to_clickhouse_spark.operators.graph import (
        connected_components,
    )

    eps2 = eps * eps
    pts = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
        F.floor(F.col(x_col) / eps).cast("long").alias("cx"),
        F.floor(F.col(y_col) / eps).cast("long").alias("cy"),
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    probe = None
    for dx, dy in offs:
        part = pts.select(
            "pid", "px", "py",
            (F.col("cx") + dx).alias("cx"),
            (F.col("cy") + dy).alias("cy"),
        )
        probe = part if probe is None else probe.unionByName(part)
    right = pts.select(
        F.col("pid").alias("qid"), F.col("px").alias("qx"),
        F.col("py").alias("qy"), "cx", "cy",
    )
    near = (
        probe.join(right, ["cx", "cy"])
        .filter(
            (F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx"))
            + (F.col("py") - F.col("qy")) * (F.col("py") - F.col("qy"))
            <= F.lit(eps2)
        )
        .select("pid", "qid")
    )
    counts = near.groupBy("pid").agg(F.count(F.lit(1)).alias("n_nb"))
    core = counts.filter(F.col("n_nb") >= min_pts).select("pid")
    core_edges = (
        near.join(core.withColumnRenamed("pid", "qid"), "qid")
        .join(core, "pid")
        .filter(F.col("pid") < F.col("qid"))
        .select(F.col("pid").alias("src"), F.col("qid").alias("dst"))
    )
    labels = connected_components(
        core_edges, nodes=core.withColumnRenamed("pid", "node"),
        max_iter=max_iter,
    ).select(F.col("node").alias("pid"), F.col("component").alias("cluster"))
    core_out = labels.withColumn("is_core", F.lit(True))
    border = (
        near.join(core.withColumnRenamed("pid", "qid"), "qid")
        .join(core.withColumnRenamed("pid", "_c"),
              F.col("pid") == F.col("_c"), "left_anti")
        .join(labels.withColumnRenamed("pid", "qid")
                    .withColumnRenamed("cluster", "_qc"), "qid")
        .groupBy("pid")
        .agg(F.min("_qc").alias("cluster"))
        .withColumn("is_core", F.lit(False))
    )
    return core_out.unionByName(border).withColumnRenamed("pid", id_col)


def ndcg_at_k(
    df: DataFrame,
    query_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Ranking-quality evaluation → (query, n_judged, dcg, idcg,
    ndcg): NDCG@k with the standard graded gain (2^rel − 1) /
    log2(rank + 1), ideal ranking by relevance descending. The
    offline eval metric for every retrieval stack in this module
    (BM25 / hybrid RRF / ANN) — a ranking change is only an
    improvement if this number says so.

    Two keyed row_number windows over the same partition (system
    ranking by score, ideal ranking by relevance), one aggregation.
    ``tiebreak_col`` makes both orders total so the metric is
    engine-stable; callers pass the doc id."""
    tb = [F.col(tiebreak_col)] if tiebreak_col else []
    w_sys = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), *tb
    )
    w_ideal = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), *tb
    )
    ranked = df.select(
        F.col(query_col).alias("query"),
        F.col(rel_col).cast("double").alias("_rel"),
        F.row_number().over(w_sys).alias("_rs"),
        F.row_number().over(w_ideal).alias("_ri"),
    )
    gain = F.pow(F.lit(2.0), F.col("_rel")) - 1.0
    dcg = F.sum(
        F.when(F.col("_rs") <= k, gain / F.log2(F.col("_rs") + 1.0)).otherwise(
            0.0
        )
    )
    idcg = F.sum(
        F.when(F.col("_ri") <= k, gain / F.log2(F.col("_ri") + 1.0)).otherwise(
            0.0
        )
    )
    return (
        ranked.groupBy("query")
        .agg(
            F.count(F.lit(1)).alias("n_judged"),
            F.round(dcg, 6).alias("dcg"),
            F.round(idcg, 6).alias("idcg"),
            F.round(
                F.when(idcg > 0, dcg / idcg).otherwise(F.lit(0.0)), 6
            ).alias("ndcg"),
        )
    )


def knn_classify_eval(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Leave-one-out k-NN classification accuracy per class →
    (label, n_eval, n_correct, accuracy): every vector is classified
    by the majority label of its k nearest cosine neighbors
    (excluding itself; vote ties break to the SMALLEST label —
    deterministic on every engine), then scored against its own
    label. The standard "are these embeddings any good" probe run
    before anyone trains on them.

    Built on :func:`brute_force_topk` — the exact comparator — so the
    eval inherits its scale story: at corpus scale swap in the IVF /
    LSH top-k and this becomes the recall-weighted variant; the vote
    and scoring joins are already bounded by queries × k."""
    nb = brute_force_topk(
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
        ),
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
        ),
        k=k,
    )
    lbl = emb.select(
        F.col(id_col).alias("n_id"),
        F.col(label_col).cast("int").alias("_nl"),
    )
    qlbl = emb.select(
        F.col(id_col).alias("q_id"),
        F.col(label_col).cast("int").alias("_tl"),
    )
    votes = nb.join(lbl, "n_id").groupBy("q_id", "_nl").agg(
        F.count("*").alias("_c")
    )
    pred = votes.groupBy("q_id").agg(
        F.max(
            F.struct(
                F.col("_c").alias("c"),
                (-F.col("_nl")).alias("neg"),
                F.col("_nl").alias("lab"),
            )
        )["lab"].alias("_pred")
    )
    j = pred.join(qlbl, "q_id")
    per = j.groupBy(F.col("_tl").alias("label")).agg(
        F.count("*").alias("n_eval"),
        F.sum((F.col("_pred") == F.col("_tl")).cast("long")).alias(
            "n_correct"
        ),
    )
    return per.select(
        "label",
        "n_eval",
        "n_correct",
        F.round(
            F.col("n_correct").cast("double")
            / F.col("n_eval").cast("double"),
            6,
        ).alias("accuracy"),
    )


def pca_top_component(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 8,
) -> DataFrame:
    """Top principal component of an embedding corpus by power
    iteration → one row per dimension (dim, mu, loading) plus the
    repeated scalars (lambda1, explained): the first "what is this
    embedding space doing" diagnostic (a dominant component with high
    explained variance usually means un-normalized embeddings or a
    degenerate encoder).

    Scale/determinism shape: ONE distributed pass builds the exact
    grid-quantized covariance — Σxⱼxₖ and μ on the 2^-20 grid via a
    per-vector dimension self-join keyed on the vector id (n·d²
    expansion, never n²) — then the d×d matrix (4096 scalars at
    d = 64) collects to the driver, which runs ``iters`` power steps
    with every iterate floored to the 1e-9 grid: the same
    bounded-collect precedent as k-means centroid training and the
    same unrolled-recursion oracle contract as platt/huber (the SQL
    twin replays the identical matvec → normalize → grid walk)."""
    import math

    q = float(1 << 20)
    d = emb.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col)).alias("j", "x"),
    ).select("_id", "j", F.col("x").cast("double").alias("x"))
    a = d.select("_id", F.col("j").alias("j"), F.col("x").alias("xj"))
    b = d.select("_id", F.col("j").alias("k"), F.col("x").alias("xk"))
    sums = (
        a.join(b, "_id")
        .groupBy("j", "k")
        .agg(
            (F.sum(F.floor(F.col("xj") * F.col("xk") * q)) / q).alias(
                "_sxx"
            )
        )
    )
    mu = d.groupBy("j").agg(
        F.count("*").alias("_n"), (F.floor(F.avg("x") * q) / q).alias("_mu")
    )
    rows = sums.collect()
    mus = {r["j"]: (r["_n"], r["_mu"]) for r in mu.collect()}
    dim = 1 + max(r["j"] for r in rows)
    n = mus[0][0]
    m = [mus[j][1] for j in range(dim)]
    cmat = [[0.0] * dim for _ in range(dim)]
    for r in rows:
        j, k = r["j"], r["k"]
        cmat[j][k] = (r["_sxx"] - n * m[j] * m[k]) / (n - 1.0)
    grid = lambda x: math.floor(x * 1e9 + 0.5) / 1e9  # noqa: E731
    v = [grid(1.0 / math.sqrt(dim))] * dim
    for _ in range(iters):
        w = [
            sum(cmat[j][k] * v[k] for k in range(dim))
            for j in range(dim)
        ]
        nrm = math.sqrt(sum(x * x for x in w))
        v = [grid(x / nrm) for x in w]
    lam = sum(
        v[j] * cmat[j][k] * v[k] for j in range(dim) for k in range(dim)
    )
    trace = sum(cmat[j][j] for j in range(dim))
    spark = emb.sparkSession
    out = spark.createDataFrame(
        [
            (j, m[j], v[j], round(lam, 6), round(lam / trace, 6))
            for j in range(dim)
        ],
        "dim int, mu double, loading double, lambda1 double,"
        " explained double",
    )
    return out


def mmd_rbf(
    sample_a: DataFrame,
    sample_b: DataFrame,
    vec_col: str = "embedding",
    sigma2: float = 2.0,
) -> DataFrame:
    """Maximum Mean Discrepancy² (Gretton et al. 2012, biased
    V-statistic) between two embedding samples with the RBF kernel →
    single row (n_a, n_b, kxx, kyy, kxy, mmd2): the kernel two-sample
    test behind embedding-distribution drift detection — "did this
    week's corpus move in embedding space?" — where PSI/KS only see
    one scalar at a time.

    MMD is inherently O(n²) in the SAMPLE sizes, so the contract is
    bounded inputs (hash-sampled groups — the standard practice); the
    pair expansions are broadcast nested-loop joins of the two bounded
    sides, never a corpus×corpus product. Pair distances fold
    left-to-right over dims and land on the 1e-6 grid before exp, so
    both engines feed libm identical doubles; the three kernel means
    are ratios of bounded sums (≤1 ulp per exp term, orders below the
    6dp round)."""
    two_s2 = 2.0 * float(sigma2)

    def _k(x, y):
        d2 = F.round(
            F.aggregate(
                F.zip_with(
                    x, y,
                    lambda p, q: (p.cast("double") - q.cast("double"))
                    * (p.cast("double") - q.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        )
        return F.exp(-d2 / F.lit(two_s2))

    # NULL embeddings are dropped up front so n_a/n_b describe exactly
    # the population the kernel means average over (a null vector would
    # null its kernel terms, which avg() silently skips).
    a = (
        sample_a.filter(F.col(vec_col).isNotNull())
        .select(F.col(vec_col).alias("_xa"))
    )
    b = (
        sample_b.filter(F.col(vec_col).isNotNull())
        .select(F.col(vec_col).alias("_xb"))
    )

    def mean_k(left, right, lc, rc):
        j = left.crossJoin(F.broadcast(right))
        return j.agg(F.avg(_k(F.col(lc), F.col(rc))).alias("_m"))

    kxx = mean_k(a, a.select(F.col("_xa").alias("_xa2")), "_xa", "_xa2")
    kyy = mean_k(b, b.select(F.col("_xb").alias("_xb2")), "_xb", "_xb2")
    kxy = mean_k(a, b, "_xa", "_xb")
    na = a.groupBy().agg(F.count("*").alias("n_a"))
    nb = b.groupBy().agg(F.count("*").alias("n_b"))
    out = (
        kxx.select(F.col("_m").alias("_kxx"))
        .crossJoin(F.broadcast(kyy.select(F.col("_m").alias("_kyy"))))
        .crossJoin(F.broadcast(kxy.select(F.col("_m").alias("_kxy"))))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )
    return out.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("_kxx", 6).alias("kxx"),
        F.round("_kyy", 6).alias("kyy"),
        F.round("_kxy", 6).alias("kxy"),
        F.round(
            F.col("_kxx") + F.col("_kyy") - 2.0 * F.col("_kxy"), 6
        ).alias("mmd2"),
    )


def pq_adc_topk_batch(
    codes: DataFrame,
    books: "list[list[list[float]]]",
    queries: "dict[int, list[float]]",
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch ADC search over a pre-encoded code table → (q_id, n_id,
    adc, rank ≤ topk): ONE plan for the whole query batch instead of
    |Q| unioned scans. Per-query LUTs (|Q| × m × k doubles, bounded
    query-side state like every ANN batch here) ride a BROADCAST table
    joined to the codes, scoring stays m element_at lookups per
    (query, row), and the per-query top-k is one window over the
    q_id-partitioned scores — the offline-eval / reranker shape, where
    the per-query ordered-LIMIT plan is the online-serving one.
    Measured on the bench's 400k corpus: 16 queries in ~1 scan instead
    of 16. At 100 TB the scan cost is paid once per BATCH, not per
    query."""
    m = len(books)
    d = len(books[0][0])
    spark = codes.sparkSession
    rows = []
    for qid, q in queries.items():
        lut = [
            [
                round(
                    sum(
                        (float(q[s * d + i]) - float(c[i])) ** 2
                        for i in range(d)
                    ),
                    6,
                )
                for c in books[s]
            ]
            for s in range(m)
        ]
        rows.append((int(qid), lut))
    luts = spark.createDataFrame(
        rows, "q_id long, lut array<array<double>>"
    )
    j = codes.crossJoin(F.broadcast(luts))
    adc = F.element_at(
        F.element_at(F.col("lut"), 1), F.col("code_0") + 1
    )
    for s in range(1, m):
        adc = adc + F.element_at(
            F.element_at(F.col("lut"), s + 1), F.col(f"code_{s}") + 1
        )
    scored = j.select(
        "q_id", F.col(id_col).alias("n_id"), F.round(adc, 4).alias("adc")
    )
    w = Window.partitionBy("q_id").orderBy("adc", "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("q_id", "n_id", "adc", F.col("rank").cast("int"))
    )


def ivfpq_topk_batch(
    index: DataFrame,
    cents: "list[list[float]]",
    books: "list[list[list[float]]]",
    queries: "dict[int, list[float]]",
    nprobe: int = 2,
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch IVF-PQ ADC search over a pre-built ``ivfpq_index`` →
    (q_id, n_id, adc, rank ≤ topk), one plan for the whole batch: the
    broadcast table carries one row per PROBED (q_id, cell) pair with
    that pair's residual LUT, so the inner join against the index both
    APPLIES the probe filter and delivers the right LUT — unprobed
    cells never join, exactly the partition-pruning semantics of the
    per-query form, without |Q| separate scans."""
    m = len(books)
    d = len(books[0][0])
    spark = index.sparkSession
    rows = []
    for qid, q in queries.items():
        dists = sorted(
            (
                round(
                    sum((float(a) - float(b)) ** 2 for a, b in zip(q, c)),
                    6,
                ),
                cell,
            )
            for cell, c in enumerate(cents)
        )
        for _, cell in dists[:nprobe]:
            qr = [float(a) - float(b) for a, b in zip(q, cents[cell])]
            lut = [
                [
                    round(
                        sum(
                            (qr[s * d + i] - float(c[i])) ** 2
                            for i in range(d)
                        ),
                        6,
                    )
                    for c in books[s]
                ]
                for s in range(m)
            ]
            rows.append((int(qid), int(cell), lut))
    luts = spark.createDataFrame(
        rows, "q_id long, cell int, lut array<array<double>>"
    )
    # Static probe-union filter BEFORE the join: on a persisted
    # partitionBy(cell) index this isin becomes a scan-level
    # PartitionFilter, so the batch reads only the union of probed cell
    # directories — the join then fans each surviving row out to just
    # the queries that probed its cell.
    probe_union = sorted({cell for _, cell, _ in rows})
    j = index.filter(F.col("cell").isin(probe_union)).join(
        F.broadcast(luts), "cell"
    )
    adc = F.element_at(
        F.element_at(F.col("lut"), 1), F.col("code_0") + 1
    )
    for s in range(1, m):
        adc = adc + F.element_at(
            F.element_at(F.col("lut"), s + 1), F.col(f"code_{s}") + 1
        )
    scored = j.select(
        "q_id", F.col(id_col).alias("n_id"), F.round(adc, 4).alias("adc")
    )
    w = Window.partitionBy("q_id").orderBy("adc", "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("q_id", "n_id", "adc", F.col("rank").cast("int"))
    )


def exact_rerank_batch(
    corpus: DataFrame,
    candidates: DataFrame,
    queries: "dict[int, list[float]]",
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch refine stage → (q_id, n_id, dist, rank ≤ topk): candidate
    (q_id, n_id) pairs join the raw vectors once, the query vectors
    ride a broadcast table, and each pair is re-scored with exact
    squared L2 — |batch candidates| full-width rows read in one join
    instead of |Q| separate candidate joins."""
    spark = corpus.sparkSession
    qdf = spark.createDataFrame(
        [(int(k), [float(x) for x in v]) for k, v in queries.items()],
        "q_id long, qvec array<double>",
    )
    j = (
        # distinct per (q_id, n_id): duplicate candidate pairs would
        # duplicate scored rows and burn that query's topk slots.
        candidates.select("q_id", F.col("n_id")).distinct()
        .join(corpus.select(F.col(id_col).alias("n_id"), vec_col), "n_id")
        .join(F.broadcast(qdf), "q_id")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("qvec"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = j.select("q_id", "n_id", F.round(d2, 6).alias("dist"))
    w = Window.partitionBy("q_id").orderBy("dist", "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("q_id", "n_id", "dist", F.col("rank").cast("int"))
    )


def semdedup_cells(
    df: DataFrame,
    threshold: float = 0.93,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) keep/drop decisions → (id, cell,
    keep): within each pre-assigned cluster CELL, a vector is dropped
    iff some LOWER-id cell-mate sits within cosine ≥ threshold — the
    semantic-duplicate policy that removes re-phrasings exact/MinHash
    dedup cannot see. The caller supplies the cell assignment
    (k-means cells, sign-octants, IVF coarse cells — anything
    deterministic); this operator is the within-cell pair scan +
    keep policy.

    Scale contract: pairs are generated ONLY inside a cell (the
    SemDeDup design point — candidates scale with Σ|cell|², never
    n²), via a cell-keyed self-join with the lower-id side reduced to
    (cell, id, vec). Cosine = sequential fold dot/norms (the
    engine-replayable array aggregate), an exact computation both
    engines run identically; the keep flag is an anti-join-style
    aggregate, one shuffle on the cell key."""
    base = df.select(
        F.col(cell_col).alias("_cell"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
    )
    a = base.select(
        F.col("_cell"),
        F.col("_id").alias("_ida"),
        F.col("_v").alias("_va"),
    )
    b = base.select(
        F.col("_cell"),
        F.col("_id").alias("_idb"),
        F.col("_v").alias("_vb"),
    )
    pairs = a.join(b, "_cell").filter(F.col("_ida") < F.col("_idb"))
    cos = cosine(F.col("_va"), F.col("_vb"))
    dropped = (
        pairs.filter(cos >= F.lit(threshold))
        .select("_cell", F.col("_idb").alias("_id"))
        .distinct()
    )
    return (
        base.join(
            dropped.withColumn("_drop", F.lit(1)), ["_cell", "_id"], "left"
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_cell").alias(cell_col),
            F.when(F.col("_drop").isNull(), 1).otherwise(0)
            .cast("int")
            .alias("keep"),
        )
    )
