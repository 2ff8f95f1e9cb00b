"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point at 100 TB):
- exact: one hash-groupBy on the fingerprint — single shuffle, map-side
  partial agg.
- MinHash+LSH: shingle → 64-bit hash → k minhashes via universal hashing
  (a*h+b mod p) → band buckets → self-join on (band, bucket). The
  candidate join is on bucket keys, so cost scales with collisions, not
  with n² — the standard large-scale near-dup pipeline. All shingle and
  minhash math is Catalyst higher-order functions (no Python).
- SimHash: weighted bit-vote over token hashes → 64-bit signature;
  near-dups = signatures at small Hamming distance, bucketed by bands.
- verification: exact Jaccard on token sets for candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from from_superset_to_clickhouse_spark.operators.text import word_tokens

def normalize_text(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: keep the lowest-id row per normalized-text fingerprint.

    Returns the deduplicated rows. One shuffle on the 128-bit fingerprint;
    at 100 TB the min-by aggregation is partial-aggregated map-side so the
    shuffle carries one row per (fingerprint, map partition).
    """
    fp = F.md5(normalize_text(F.col(text_col)))
    w = Window.partitionBy(fp).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def shingles(text: Column, k: int = 3) -> Column:
    """k-word shingle set as array<long> (xxhash64 of each shingle).

    Hashing shingles to 64-bit ints immediately keeps the row payload
    small — we never shuffle raw shingle strings.
    """
    toks = word_tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array(F.xxhash64(F.concat_ws(" ", toks)))
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """num_hashes minhash values (array<long>), hash family = seeded xxhash64.

    min over xxhash64(seed_i, shingle_hash) per hash function — pure
    higher-order expressions, evaluated JVM-side per row, fully
    deterministic (xxhash64 is seed-stable across Spark versions).
    """
    sigs = [
        F.array_min(
            F.transform(shingle_col, lambda x, i=i: F.xxhash64(F.lit(i), x))
        )
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b, n_shared_bands).

    rows-per-band r = num_hashes/bands; docs sharing any band bucket are
    candidates. The self-join is on (band, bucket_hash) — a hash join on
    a well-distributed key, no n² blowup. Returns distinct pairs with the
    number of shared bands (a cheap similarity proxy).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    sig = minhash_signature(shingles(F.col(text_col), shingle_k), num_hashes)
    banded = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.hash(F.slice(sig, bnd * r + 1, r)),
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .groupBy(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .agg(F.count("*").alias("n_shared_bands"))
    )


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only (id_a, id_b, jaccard).

    Joining the (small) candidate set back to the corpus twice keeps the
    expensive set-intersection off the full n² space.
    """
    sh = df.select(
        F.col(id_col).alias("_jid"),
        shingles(F.col(text_col), shingle_k).alias("_jsh"),
    )
    a = sh.withColumnRenamed("_jid", "id_a").withColumnRenamed("_jsh", "sh_a")
    b = sh.withColumnRenamed("_jid", "id_b").withColumnRenamed("_jsh", "sh_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Near-dup pairs above a Jaccard threshold: LSH candidates → exact verify."""
    cand = minhash_candidates(df, text_col, id_col, num_hashes, bands, shingle_k)
    return jaccard_verify(df, cand, text_col, id_col, threshold, shingle_k)


def simhash_signature(text: Column, bits: int = 64) -> Column:
    """SimHash: per-bit majority vote over token xxhash64 values → long.

    bit_j(sig) = 1 if sum over tokens of sign(bit_j(hash(tok))) > 0.
    Expressed as aggregate() over the token array — one pass, JVM-side.
    """
    toks = word_tokens(text)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    votes = [
        F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << j) if j < 63 else F.lit(-(1 << 63))) != 0, 1).otherwise(-1),
        )
        for j in range(bits)
    ]
    sig = None
    for j, v in enumerate(votes):
        bit = F.when(v > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return sig


def simhash_dedup_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_bits: int = 16,
) -> DataFrame:
    """Candidate near-dups: equal 16-bit SimHash band (4 bands over 64 bits).

    Docs within Hamming distance 3 share at least one exact band
    (pigeonhole) — the classic SimHash blocking scheme.
    """
    sig = simhash_signature(F.col(text_col))
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(sig, i * band_bits).bitwiseAND(F.lit(mask))
                    for i in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .distinct()
    )
