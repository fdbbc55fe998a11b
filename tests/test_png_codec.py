"""Stdlib PNG raster codec (multimodal/png_codec.py).

The decode oracle VERDICT r9 asked for: expected pixels come from
HAND-ASSEMBLED byte streams (chunks built with struct/zlib right here,
filters applied with an independent per-byte reference loop), never
from an encoder round-trip alone — the codec's numpy unfilter paths
are checked against spec arithmetic, not against themselves.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from wrtd_etl_spark.multimodal.png_codec import (
    decode_png,
    encode_png,
    resize_nearest,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png(
    w, h, ctyp, scanlines: bytes, plte: bytes | None = None,
    depth: int = 8, interlace: int = 0,
) -> bytes:
    """Assemble a PNG independently of encode_png (filter bytes are the
    caller's, compression + framing here)."""
    out = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctyp, 0, 0, interlace)
    )
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(scanlines)) + _chunk(b"IEND", b"")


def _ref_unfilter(raw: bytes, w: int, h: int, bpp: int) -> bytes:
    """Spec-literal reference reconstruction (RFC 2083 §6), all filters,
    one byte at a time — the independent oracle."""
    stride = w * bpp
    out = bytearray()
    prev = bytes(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        cur = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        rec = bytearray(stride)
        for x in range(stride):
            a = rec[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                v = cur[x]
            elif f == 1:
                v = cur[x] + a
            elif f == 2:
                v = cur[x] + b
            elif f == 3:
                v = cur[x] + ((a + b) >> 1)
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = cur[x] + pr
            else:  # pragma: no cover
                raise AssertionError(f)
            rec[x] = v & 0xFF
        out += rec
        prev = bytes(rec)
    return bytes(out)


def test_filter0_known_pixels():
    """2x2 RGB, no filtering: pixels land exactly where written."""
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7])
    scan = b"\x00" + px[:6] + b"\x00" + px[6:]
    w, h, ch, raster = decode_png(_png(2, 2, 2, scan))
    assert (w, h, ch) == (2, 2, 3)
    assert raster == px


def test_sub_filter_hand_pinned():
    """Filter 1 on RGB: recon(x) = filt(x) + recon(x-3), pinned by
    hand: row [10,20,30 | +5,+5,+5 | +1,+2,+3]."""
    filt = bytes([10, 20, 30, 5, 5, 5, 1, 2, 3])
    scan = b"\x01" + filt
    _, _, _, raster = decode_png(_png(3, 1, 2, scan))
    assert list(raster) == [10, 20, 30, 15, 25, 35, 16, 27, 38]


def test_up_filter_hand_pinned():
    """Filter 2: each byte adds the byte directly above (row 0 above =
    zeros); second row [1,1] over [7,250] -> [8,251]; wraparound case
    [10] over [250] -> 4 (mod 256)."""
    scan = b"\x02" + bytes([7, 250]) + b"\x02" + bytes([1, 1])
    _, _, _, raster = decode_png(_png(2, 2, 0, scan))
    assert list(raster) == [7, 250, 8, 251]
    scan2 = b"\x02" + bytes([250]) + b"\x02" + bytes([10])
    _, _, _, r2 = decode_png(_png(1, 2, 0, scan2))
    assert list(r2) == [250, 4]


def test_average_and_paeth_vs_reference():
    """Filters 3/4 across several rows and channel layouts must equal
    the spec-literal reference reconstruction byte for byte."""
    import random

    rng = random.Random(42)
    for ctyp, bpp in ((0, 1), (4, 2), (2, 3), (6, 4)):
        w, h = 7, 5
        stride = w * bpp
        raw = b"".join(
            bytes([rng.choice([0, 1, 2, 3, 4])])
            + bytes(rng.randrange(256) for _ in range(stride))
            for _ in range(h)
        )
        _, _, ch, raster = decode_png(_png(w, h, ctyp, raw))
        assert raster == _ref_unfilter(raw, w, h, bpp)
        assert len(raster) == stride * h and ch == bpp


def test_palette_expands_to_rgb():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    scan = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])
    w, h, ch, raster = decode_png(_png(2, 2, 3, scan, plte=plte))
    assert (w, h, ch) == (2, 2, 3)
    assert list(raster) == [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 0, 0]


def test_round_trip_every_channel_layout():
    import random

    rng = random.Random(7)
    for nch in (1, 2, 3, 4):
        w, h = 9, 4
        raster = bytes(rng.randrange(256) for _ in range(w * h * nch))
        got = decode_png(encode_png(w, h, nch, raster))
        assert got == (w, h, nch, raster)


def test_corruption_fails_loudly():
    px = bytes(12)
    scan = b"\x00" + px[:6] + b"\x00" + px[6:]
    good = _png(2, 2, 2, scan)
    # flip one IDAT byte: CRC must catch it
    i = good.index(b"IDAT") + 6
    bad = good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1 :]
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bad)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + good)
    with pytest.raises(ValueError, match="truncated|IEND"):
        decode_png(good[:-8])
    # sub-byte depths and the spec-invalid 16-bit palette still refuse
    ihdr4 = struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0)
    png4 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr4)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 4))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(png4)
    ihdr16p = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    png16p = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr16p)
        + _chunk(b"PLTE", bytes(3))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="16-bit palette"):
        decode_png(png16p)
    # declared size disagrees with pixel data
    with pytest.raises(ValueError, match="length"):
        decode_png(_png(3, 3, 2, scan))


def test_resize_nearest_known_grid():
    """2x2 -> 4x4 nearest: each source pixel becomes a 2x2 block; and
    downscale picks the top-left representative."""
    src = bytes([1, 2, 3, 4])  # gray 2x2
    up = resize_nearest(2, 2, 1, src, 4, 4)
    assert list(up) == [1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4]
    down = resize_nearest(4, 4, 1, up, 2, 2)
    assert list(down) == [1, 2, 3, 4]


def _sub_filter(row: bytes, bpp: int) -> bytes:
    """Apply (not reconstruct) the Sub filter — independent arithmetic."""
    return bytes(
        (row[x] - (row[x - bpp] if x >= bpp else 0)) & 0xFF
        for x in range(len(row))
    )


def _up_filter(row: bytes, prev: bytes) -> bytes:
    return bytes((row[x] - prev[x]) & 0xFF for x in range(len(row)))


def test_16bit_decodes_equal_to_8bit_twin():
    """r11 (VERDICT r10 ask #6): a 16-bit image whose samples are the
    spec's v*257 widening of an 8-bit twin decodes to the SAME raster
    (high-byte reduction) — with Sub and Up filters exercised at the
    16-bit filter unit (bpp = samples * 2)."""
    w, h = 3, 3
    r8 = bytes(range(10, 10 + w * h * 3))  # RGB, distinct values
    rows8 = [r8[y * w * 3 : (y + 1) * w * 3] for y in range(h)]
    rows16 = [
        b"".join(bytes([v, v]) for v in row) for row in rows8
    ]  # v*257 big-endian == (v, v)
    bpp16 = 6
    scan16 = (
        b"\x00" + rows16[0]
        + b"\x01" + _sub_filter(rows16[1], bpp16)
        + b"\x02" + _up_filter(rows16[2], rows16[1])
    )
    got = decode_png(_png(w, h, 2, scan16, depth=16))
    scan8 = b"".join(b"\x00" + r for r in rows8)
    want = decode_png(_png(w, h, 2, scan8))
    assert got == want == (w, h, 3, r8)


def _adam7_scan(w, h, bpp, raster: bytes, up_filter: bool = False) -> bytes:
    """Build the interlaced pixel stream independently of the codec:
    extract each Adam7 pass's sub-image row-by-row (spec §8.2 origins/
    steps) and prepend filter bytes — filter 0, or Up WITHIN the pass
    when ``up_filter`` (pinning that passes filter against their OWN
    previous row, never across passes)."""
    out = []
    for x0, y0, dx, dy in (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ):
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        prev = None
        for i in range(ph):
            y = y0 + i * dy
            row = b"".join(
                raster[(y * w + x0 + j * dx) * bpp :][:bpp]
                for j in range(pw)
            )
            if up_filter and prev is not None:
                out.append(b"\x02" + _up_filter(row, prev))
            else:
                out.append(b"\x00" + row)
            prev = row
    return b"".join(out)


@pytest.mark.parametrize("w,h", [(8, 8), (5, 3), (1, 1), (2, 9), (9, 1)])
def test_adam7_decodes_equal_to_sequential_twin(w, h):
    """r11: interlaced images — including sizes with EMPTY and partial
    passes — de-interlace to exactly the sequential twin's raster."""
    n = 3
    raster = bytes((7 * i + 3) % 256 for i in range(w * h * n))
    seq = decode_png(encode_png(w, h, n, raster))
    inter = decode_png(
        _png(w, h, 2, _adam7_scan(w, h, n, raster), interlace=1)
    )
    assert inter == seq == (w, h, n, raster)


def test_adam7_passes_filter_independently_and_16bit_combo():
    """Up-filtered rows inside a pass reference that pass's previous
    row (never the neighboring pass); Adam7 composes with 16-bit."""
    w = h = 8
    raster = bytes((i * 31 + 5) % 256 for i in range(w * h))
    got = decode_png(
        _png(w, h, 0, _adam7_scan(w, h, 1, raster, up_filter=True),
             interlace=1)
    )
    assert got == (w, h, 1, raster)
    r16 = b"".join(bytes([v, v]) for v in raster)
    got16 = decode_png(
        _png(w, h, 0, _adam7_scan(w, h, 2, r16), depth=16, interlace=1)
    )
    assert got16 == (w, h, 1, raster)


def test_adam7_truncated_stream_fails_loudly():
    w = h = 8
    raster = bytes(w * h)
    scan = _adam7_scan(w, h, 1, raster)
    with pytest.raises(ValueError, match="length"):
        decode_png(_png(w, h, 0, scan[:-3], interlace=1))
