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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), False),
        T.StructField("meta_height", T.IntegerType(), False),
    ]
)

# Stub resize payloads are capped so a 1920×1080 target doesn't tile a
# digest into 2 MB of fake pixels per row; a real codec replaces this.
_STUB_PAYLOAD_CAP = 4096


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake of decode→resize→re-encode: sha256(payload)
    tiled to min(width*height, cap) bytes. Same signature a real
    implementation (PIL ``Image.resize`` + encode) would have."""
    digest = hashlib.sha256(payload or b"")
    digest.update(f"{width}x{height}".encode())
    block = digest.digest()
    n = min(width * height, _STUB_PAYLOAD_CAP)
    return (block * (n // len(block) + 1))[:n]


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every image row to (width, height) — non-image rows are
    filtered JVM-side BEFORE the Python stage, so only image payloads
    cross into Arrow batches. Output keeps the media shape (payload +
    updated dims) so downstream feature extraction composes."""
    imgs = media.filter(F.col("kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": pdf["payload"].map(
                        lambda p: resize_stub(p, width, height)
                    ),
                    "meta_width": width,
                    "meta_height": height,
                }
            )

    return imgs.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frame_times(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling schedule for video rows → (media_id, frame_idx,
    ts_ms): one frame every ``every_ms`` starting at 0, strictly inside
    the duration.

    Pure Catalyst (posexplode of ``sequence``) — the schedule needs no
    Python, only frame CONTENT does. At scale this is the pruning step:
    a 2-hour video at 5 s cadence explodes to 1 440 schedule rows, and
    the decoder stage receives (media_id, ts) pairs it can seek to
    instead of streaming whole files.
    """
    frames = F.sequence(
        F.lit(0), F.col("meta_duration_ms") - 1, F.lit(every_ms)
    )
    return media.filter(F.col("kind") == "video").select(
        "media_id", F.posexplode(frames).alias("frame_idx", "ts_ms")
    )


def extract_frames(
    media: DataFrame, every_ms: int = 5000, dim: int = 8
) -> DataFrame:
    """Frame features: JVM-side schedule (``sample_frame_times``) joined
    back to payloads, then one Arrow pass stub-decodes each (payload,
    ts) pair. Real decoder plugs into the same seam with a seek."""
    sched = sample_frame_times(media, every_ms)
    vids = media.select("media_id", "payload")
    rows = sched.join(vids, "media_id")
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("ts_ms", T.IntegerType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "ts_ms": pdf["ts_ms"],
                    "feature": [
                        decode_stub(
                            (p or b"") + int(t).to_bytes(8, "big"), "video", dim
                        )
                        for p, t in zip(pdf["payload"], pdf["ts_ms"])
                    ],
                }
            )

    return rows.mapInPandas(run, schema=schema)
