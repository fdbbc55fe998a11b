"""Binary (image/audio/video) column operators.

Media is modeled as opaque ``binary`` payload columns with typed metadata —
the Spark-side plumbing (schemas, Arrow batch shapes, partition behavior)
is real and tested; the actual codec calls are stubbed because no
image/audio libraries ship in this container:

* :func:`decode_image` raises ``NotImplementedError`` unless
  ``fake=True``, in which case a deterministic fake decoder produces
  plausible (width, height, n_channels) from the payload bytes — the
  downstream pipeline shape is identical to a real decoder's.

Everything Python-side goes through ``mapInPandas`` (Arrow batches), never
row-at-a-time UDFs; batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal record layout
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = (
    "media_id long, media_type string, width int, height int, n_channels int"
)
FEATURE_DIM = 16
FEATURE_SCHEMA = f"media_id long, feature array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def attach_binary_payload(
    df: DataFrame, text_col: str, id_col: str, media_type: str = "image"
) -> DataFrame:
    """Derive a MEDIA_SCHEMA table from a text table (test stand-in for a
    real blob store read — the engine treats the payload as opaque bytes)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("origin"), F.lit("synthetic"), F.lit("codec"), F.lit("raw")
        ).alias("meta"),
    )


def payload_metadata(df: DataFrame) -> DataFrame:
    """Size + content digest per payload — pure JVM expressions (no UDF)."""
    return df.select(
        "media_id",
        "media_type",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256"),
    )


def decode_image(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads to (width, height, n_channels) via Arrow batches.

    STUB: real decoding needs an image library not present in this
    container; ``fake=True`` swaps in a deterministic stand-in so the
    mapInPandas plumbing (batch iteration, schema, partitioning) is
    exercised for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires an image library (PIL/opencv) "
                    "not present in this container; pass fake=True for the "
                    "deterministic stand-in"
                )
            digests = pdf["payload"].map(
                lambda b: hashlib.sha256(bytes(b or b"")).digest()
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": digests.map(lambda d: 16 + d[0] % 640).astype("int32"),
                    "height": digests.map(lambda d: 16 + d[1] % 480).astype("int32"),
                    "n_channels": digests.map(lambda d: 1 + d[2] % 4).astype("int32"),
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Fixed-size float feature vector per payload (deterministic fake).

    Shape-compatible with a real embedding model runner: binary in,
    array<float> out, Arrow-batched.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(
                lambda b: [
                    byte / 255.0
                    for byte in hashlib.sha256(bytes(b or b"")).digest()[:FEATURE_DIM]
                ]
            )
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Split each payload into n evenly-spaced chunks ("frames") — pure
    JVM expressions; the real video path would swap substring for a codec
    seek but keep the same output shape."""
    chunk = (F.length("payload") / n_frames).cast("int")
    frames = F.array(
        *[
            F.expr(
                f"substring(payload, {i} * (int(length(payload) / {n_frames})) + 1, "
                f"int(length(payload) / {n_frames}))"
            )
            for i in range(n_frames)
        ]
    )
    return df.select(
        "media_id", F.posexplode(frames).alias("frame_idx", "frame_payload")
    )
