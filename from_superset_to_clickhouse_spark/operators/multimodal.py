"""Multimodal column plumbing: binary payloads + typed metadata.

Treats image/audio/video as opaque ``binary`` columns with a metadata
struct, processed by Arrow-batched ``mapInPandas`` — the Spark-side
shape (schema, partitioning, batch iteration, UDF signature) is real and
tested; the actual media decoding is STUBBED (this container has no
image/audio libraries): ``decode_stub`` produces deterministic fake
features from the bytes so tests are reproducible, and ``decode_real``
raises ``NotImplementedError`` marking where a codec would plug in.

At scale: binary payloads ride in Parquet binary columns;
``mapInPandas`` streams Arrow batches so one task never materializes its
whole partition; ``maxRecordsPerBatch`` bounds batch memory for large
blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, payload_from: str) -> DataFrame:
    """Build a media table from any source column — deterministic fake
    payloads (the string bytes) so the plumbing is testable without codecs."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        (F.when(F.col(id_col) % 3 == 0, "image")
         .when(F.col(id_col) % 3 == 1, "audio")
         .otherwise("video")).alias("kind"),
        F.encode(F.col(payload_from), "UTF-8").alias("payload"),
        (F.pmod(F.col(id_col), F.lit(1920)) + 1).cast("int").alias("meta_width"),
        (F.pmod(F.col(id_col), F.lit(1080)) + 1).cast("int").alias("meta_height"),
        (F.pmod(F.col(id_col), F.lit(60000)) + 1).cast("int").alias("meta_duration_ms"),
    )


def decode_real(payload: bytes, kind: str):
    """Where a real codec plugs in (PIL / torchaudio / pyav)."""
    raise NotImplementedError(
        "media decoding requires image/audio libs not present in this "
        "environment; use decode_stub for the pipeline plumbing"
    )


def decode_stub(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector: bytes of sha256(payload) scaled.

    Stands in for decode→resize/frame-sample→embed; same signature a real
    extractor would have.
    """
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    The per-batch loop is the real shape of a media pipeline: decode each
    payload, emit fixed-width features. Python is unavoidable here
    (codecs are native libs) — Arrow batching amortizes the crossing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int32"),
                    "content_hash": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "feature": payloads.map(
                        lambda p, d=dim: decode_stub(p, "", d)
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
