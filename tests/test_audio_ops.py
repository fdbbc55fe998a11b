"""Audio operators (multimodal/audio_ops.py): REAL WAV decode via the
stdlib codec, frame-aligned windowing, tolerant-vs-strict contracts."""

from __future__ import annotations

import io
import math
import struct
import wave

import pytest

from wrtd_etl_spark.multimodal.audio_ops import (
    audio_windows,
    decode_audio,
    wav_meta,
)


def _make_wav(
    seconds: float, rate: int = 8000, channels: int = 1, freq: float = 440.0
) -> bytes:
    buf = io.BytesIO()
    n = int(rate * seconds)
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = bytearray()
        for i in range(n):
            v = int(20000 * math.sin(2 * math.pi * freq * i / rate))
            frames += struct.pack("<h", v) * channels
        w.writeframes(bytes(frames))
    return buf.getvalue()


def _media(spark):
    rows = [
        (1, _make_wav(1.25, rate=8000, channels=1)),
        (2, _make_wav(0.5, rate=16000, channels=2)),
        (3, b"not audio at all"),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_decode_audio_real_header_fields(spark):
    got = {r.media_id: r for r in decode_audio(_media(spark)).collect()}
    assert (got[1].n_channels, got[1].sample_rate, got[1].bits) == (1, 8000, 16)
    assert got[1].n_frames == 10000 and got[1].duration_s == 1.25
    assert (got[2].n_channels, got[2].sample_rate) == (2, 16000)
    assert got[2].duration_s == 0.5
    # tolerant scan: junk row survives with NULL metadata
    assert got[3].n_channels is None and got[3].duration_s is None


def test_decode_audio_strict_raises_on_junk(spark):
    with pytest.raises(Exception):
        decode_audio(_media(spark), strict=True).collect()


def test_audio_windows_frame_aligned(spark):
    wins = audio_windows(_media(spark), window_s=0.5).collect()
    by_media: dict[int, list] = {}
    for r in wins:
        by_media.setdefault(r.media_id, []).append(r)
    assert 3 not in by_media  # junk row produces no windows
    w1 = sorted(by_media[1], key=lambda r: r.window_idx)
    # 1.25 s at 0.5 s windows -> 0.5 + 0.5 + 0.25
    assert [r.n_frames for r in w1] == [4000, 4000, 2000]
    # stereo 16-bit: every window's byte length is a multiple of block=4
    for r in by_media[2]:
        assert len(r.pcm) % 4 == 0
    # windows reassemble to the original PCM stream exactly
    original = _make_wav(1.25, rate=8000, channels=1)
    with wave.open(io.BytesIO(original)) as w:
        pcm_all = w.readframes(w.getnframes())
    assert b"".join(bytes(r.pcm) for r in w1) == pcm_all


def test_wav_meta_none_on_garbage():
    assert wav_meta(b"\x00" * 64) is None
    assert wav_meta(b"") is None
