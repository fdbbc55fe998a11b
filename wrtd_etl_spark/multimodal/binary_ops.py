"""Binary (image/audio/video) column operators.

Media is modeled as opaque ``binary`` payload columns with typed metadata —
the Spark-side plumbing (schemas, Arrow batch shapes, partition behavior)
is real and tested:

* :func:`decode_image` decodes real images: full raster decode via Pillow
  when importable (not shipped in this container), else a pure-stdlib
  PNG/JPEG/GIF header parse (:func:`sniff_image_dims`) — real dimensions
  from real bytes either way. ``fake=True`` swaps in a deterministic
  stand-in that accepts any payload, for plumbing tests on non-image
  bytes.

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


#: PNG color type -> sample count (PNG spec, IHDR color byte)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: JPEG start-of-frame markers (all SOF variants that carry dimensions)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF
}


def sniff_image_dims(b: bytes) -> tuple[int, int, int]:
    """(width, height, n_channels) from PNG/JPEG/GIF headers — pure
    stdlib, no codec library. Raises ``ValueError`` on anything else.

    This is a REAL metadata decode of real image bytes (the fields come
    from the format spec: PNG IHDR, JPEG SOFn segment, GIF logical screen
    descriptor); only pixel decoding needs Pillow.
    """
    import struct

    if len(b) >= 26 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        ch = _PNG_CHANNELS.get(b[25])
        if ch is None:
            raise ValueError(f"bad PNG color type {b[25]}")
        return w, h, ch
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return w, h, 3
    if len(b) >= 4 and b[:2] == b"\xff\xd8":  # JPEG SOI, walk the segments
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return w, h, b[i + 9]
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            i += 2 + seg_len
        raise ValueError("JPEG without SOF segment")
    raise ValueError("not a recognizable PNG/JPEG/GIF payload")


def decode_image(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads to (width, height, n_channels) via Arrow batches.

    Three paths, most capable available wins per batch:

    * **Pillow** (import-gated — not shipped in this container): full
      decode via ``Image.open``, dimensions from the actual raster;
    * **header parse** (:func:`sniff_image_dims`): real PNG/JPEG/GIF
      metadata from the format headers, stdlib only — runs everywhere;
    * ``fake=True``: deterministic stand-in that accepts ANY payload, so
      tests exercise the mapInPandas plumbing on non-image bytes.

    Non-image payloads on the real paths raise (a corrupt blob store
    entry should fail loudly, not emit garbage dimensions).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: PLC0415
        except ImportError:
            Image = None

        def real_dims(b) -> tuple[int, int, int]:
            raw = bytes(b or b"")
            if Image is not None:
                import io

                with Image.open(io.BytesIO(raw)) as im:
                    return im.width, im.height, len(im.getbands())
            return sniff_image_dims(raw)

        for pdf in batches:
            if fake:
                digests = pdf["payload"].map(
                    lambda b: hashlib.sha256(bytes(b or b"")).digest()
                )
                w = digests.map(lambda d: 16 + d[0] % 640)
                h = digests.map(lambda d: 16 + d[1] % 480)
                ch = digests.map(lambda d: 1 + d[2] % 4)
            else:
                dims = pdf["payload"].map(real_dims)
                w = dims.map(lambda t: t[0])
                h = dims.map(lambda t: t[1])
                ch = dims.map(lambda t: t[2])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "n_channels": ch.astype("int32"),
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def extract_image_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """REAL fixed-size feature vector from decoded pixels (r10): 16-bin
    normalized luminance histogram + per-channel mean/std (4 channels,
    zero-padded) + aspect ratio + channel count = 26 floats. Decodes
    via the stdlib PNG codec (Pillow fast path inside
    ``decode_image_pixels``' helper), so the image→vector leg of an
    embedding pipeline runs end-to-end in any environment; swap a
    model runner in by replacing this function — the schema and batch
    shape are identical. Undecodable payloads → NULL feature
    (tolerant) or raise (``strict``)."""
    import numpy as np

    from .png_codec import decode_png

    schema = "media_id long, feature array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                try:
                    w, h, ch, raster = decode_png(bytes(b or b""))
                except Exception:
                    if strict:
                        raise
                    feats.append(None)
                    continue
                a = np.frombuffer(raster, np.uint8).reshape(-1, ch)
                # luminance: mean across channels (alpha included as a
                # plain channel — deterministic, not colorimetric)
                lum = a.mean(axis=1)
                hist = np.histogram(lum, bins=16, range=(0, 256))[0]
                hist = hist / max(1, len(lum))
                means = np.zeros(4)
                stds = np.zeros(4)
                means[:ch] = a.mean(axis=0) / 255.0
                stds[:ch] = a.std(axis=0) / 255.0
                vec = np.concatenate(
                    [hist, means, stds, [w / h, ch / 4.0]]
                )
                feats.append([float(x) for x in vec])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats}
            )

    return df.mapInPandas(run, schema=schema)


def extract_features(df: DataFrame) -> DataFrame:
    """Fixed-size float feature vector per payload (deterministic fake).

    Shape-compatible with a real embedding model runner: binary in,
    array<float> out, Arrow-batched. For PNG payloads prefer
    :func:`extract_image_features`, which computes REAL pixel-derived
    features; this stand-in accepts arbitrary bytes for plumbing tests.
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


PIXEL_SCHEMA = (
    "media_id long, width int, height int, n_channels int, "
    "raster binary, channel_means array<double>"
)


def attach_png_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """MEDIA_SCHEMA table whose payloads are REAL, valid PNG bytes —
    deterministic rasters minted from the row's text (sha256 stream)
    with the stdlib encoder (png_codec.encode_png), so every
    environment can exercise a genuine decode without an image library
    or external fixtures. Dimensions/channels vary per row (8-16 px a
    side, gray/RGB/RGBA) to cover the codec's layout paths."""
    from .png_codec import encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, txt in zip(pdf[id_col], pdf[text_col]):
                mid = int(mid)
                w, h = 8 + mid % 9, 8 + mid % 7
                ch = (1, 3, 4)[mid % 3]
                need, out = w * h * ch, bytearray()
                seed = (str(txt or "") + str(mid)).encode()
                ctr = 0
                while len(out) < need:
                    out += hashlib.sha256(seed + ctr.to_bytes(4, "big")).digest()
                    ctr += 1
                payloads.append(encode_png(w, h, ch, bytes(out[:need])))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "media_type": "image",
                    "payload": payloads,
                    "meta": [{"origin": "synthetic", "codec": "png"}]
                    * len(pdf),
                }
            )

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def decode_image_pixels(df: DataFrame, strict: bool = False) -> DataFrame:
    """REAL raster decode to packed pixel bytes + per-channel means —
    Pillow when importable, else the stdlib PNG codec
    (multimodal/png_codec.py), the same real-codec treatment the WAV
    path got in audio_ops. Tolerant scan by default: an undecodable
    payload yields NULL columns (one bad object must not kill a 100 TB
    pass); ``strict=True`` raises instead. Arrow-batched mapInPandas —
    payload bytes never leave the executor; only the typed raster and
    its summary come back."""
    import numpy as np

    from .png_codec import decode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: PLC0415
        except ImportError:
            Image = None

        def dec(b) -> tuple:
            raw = bytes(b or b"")
            if Image is not None:
                import io

                with Image.open(io.BytesIO(raw)) as im:
                    a = np.asarray(im)
                    if a.dtype != np.uint8:
                        raise ValueError(f"unsupported pixel dtype {a.dtype}")
                    ch = 1 if a.ndim == 2 else a.shape[2]
                    return im.width, im.height, ch, a.tobytes()
            return decode_png(raw)

        for pdf in batches:
            cols = {"w": [], "h": [], "ch": [], "raster": [], "means": []}
            for b in pdf["payload"]:
                try:
                    w, h, ch, raster = dec(b)
                except Exception:
                    if strict:
                        raise
                    for c in cols.values():
                        c.append(None)
                    continue
                a = np.frombuffer(raster, np.uint8).reshape(-1, ch)
                cols["w"].append(w)
                cols["h"].append(h)
                cols["ch"].append(ch)
                cols["raster"].append(raster)
                cols["means"].append(a.mean(axis=0).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array(cols["w"], dtype="Int32"),
                    "height": pd.array(cols["h"], dtype="Int32"),
                    "n_channels": pd.array(cols["ch"], dtype="Int32"),
                    "raster": cols["raster"],
                    "channel_means": cols["means"],
                }
            )

    return df.mapInPandas(run, schema=PIXEL_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor thumbnail pass over PIXEL_SCHEMA-shaped rows
    (the decode output), re-encoded as PNG payloads — decode →
    transform → re-encode entirely executor-side. Every OTHER input
    column passes through (width/height update to the target, the
    raw ``raster`` is replaced by the thumbnail ``payload``), so a
    decode→resize chain stays ONE linear pipeline — no join back to
    the decode output, which would recompute it. NULL (undecoded)
    rows pass through as NULL payloads."""
    from .png_codec import encode_png, resize_nearest

    in_fields = [f for f in df.schema.fields if f.name != "raster"]
    schema = T.StructType(
        in_fields + [T.StructField("payload", T.BinaryType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for w, h, ch, raster in zip(
                pdf["width"], pdf["height"], pdf["n_channels"], pdf["raster"]
            ):
                if raster is None or pd.isna(w):
                    payloads.append(None)
                    continue
                small = resize_nearest(
                    int(w), int(h), int(ch), bytes(raster), out_w, out_h
                )
                payloads.append(encode_png(out_w, out_h, int(ch), small))
            out = pdf.drop(columns=["raster"]).copy()
            out["width"] = out["width"].where(out["width"].isna(), out_w)
            out["height"] = out["height"].where(out["height"].isna(), out_h)
            out["payload"] = payloads
            yield out

    return df.mapInPandas(run, schema=schema)
