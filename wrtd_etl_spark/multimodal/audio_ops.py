"""Audio (WAV/PCM) column operators — the audio leg of the multimodal
layer (sibling of binary_ops.py's image/video legs).

Unlike image codecs (Pillow-gated in binary_ops.decode_image), WAV is
fully parseable with the stdlib ``wave`` module, so the decode here is
REAL, not a stub: channels, sample rate, bit depth, frame count and
duration come from the actual RIFF header of the payload bytes.

Scale shape mirrors decode_image: Arrow-batched ``mapInPandas`` over
the binary column — payload bytes never leave the executor, only typed
metadata (or frame-aligned windows) come back. Window extraction is
frame-aligned via ``block_align`` (channels × bytes/sample), the real
constraint a PCM splitter must respect — a mid-frame cut corrupts every
downstream sample.

Non-WAV payloads yield NULL metadata (the tolerant-scan contract: one
bad object must not kill a 100 TB pass); the strict=True variant
surfaces the error for pipelines that prefer failing loudly.
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AUDIO_META_SCHEMA = (
    "media_id long, n_channels int, sample_rate int, bits int, "
    "n_frames long, duration_s double"
)

WINDOW_SCHEMA = "media_id long, window_idx int, n_frames long, pcm binary"


def wav_meta(b: bytes) -> tuple[int, int, int, int] | None:
    """(channels, sample_rate, bits, n_frames) from a RIFF/WAVE payload,
    None if the payload is not parseable WAV."""
    try:
        with wave.open(io.BytesIO(b)) as w:
            return (
                w.getnchannels(),
                w.getframerate(),
                w.getsampwidth() * 8,
                w.getnframes(),
            )
    except (wave.Error, EOFError, OSError):
        return None


def decode_audio(df: DataFrame, strict: bool = False) -> DataFrame:
    """Typed audio metadata per payload; non-WAV rows → NULL columns
    (or raise under ``strict``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = wav_meta(bytes(payload))
                if meta is None:
                    if strict:
                        raise ValueError(f"media_id={mid}: not a WAV payload")
                    out.append((mid, None, None, None, None, None))
                else:
                    ch, rate, bits, n = meta
                    out.append((mid, ch, rate, bits, n, n / rate))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "n_channels",
                    "sample_rate",
                    "bits",
                    "n_frames",
                    "duration_s",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(
        run, AUDIO_META_SCHEMA
    )


def audio_windows(df: DataFrame, window_s: float = 1.0) -> DataFrame:
    """Frame-aligned PCM windows of ``window_s`` seconds per payload
    (last window ragged). Alignment uses the header's true block size —
    channels × bytes-per-sample — so every window starts on a frame
    boundary; non-WAV rows produce no windows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                meta = wav_meta(b)
                if meta is None:
                    continue
                ch, rate, bits, n_frames = meta
                block = ch * (bits // 8)
                frames_per_window = max(1, int(rate * window_s))
                with wave.open(io.BytesIO(b)) as w:
                    idx = 0
                    while True:
                        pcm = w.readframes(frames_per_window)
                        if not pcm:
                            break
                        rows.append((mid, idx, len(pcm) // block, pcm))
                        idx += 1
            yield pd.DataFrame(
                rows, columns=["media_id", "window_idx", "n_frames", "pcm"]
            )

    return df.select("media_id", "payload").mapInPandas(run, WINDOW_SCHEMA)
