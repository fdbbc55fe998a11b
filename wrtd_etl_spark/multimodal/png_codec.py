"""Pure-stdlib PNG raster codec — the image leg's real decode.

The WAV codec (audio_ops.py) made audio decode REAL with nothing but
the stdlib; this does the same for images: PNG is zlib (stdlib) over
per-scanline filtered samples, so 8-bit grayscale / gray+alpha / RGB /
RGBA / palette images decode to actual pixel bytes everywhere — no
Pillow required (binary_ops.decode_image keeps Pillow as the
fast/most-capable path when importable, mirroring the reference's
optional-dependency posture; reference parity: the source repo treats
media as opaque blobs, functions.py stores attachment URLs only).

Decoder contract (PNG spec, RFC 2083):
* chunk walk with length/CRC framing — IHDR → IDAT* → IEND; ancillary
  chunks are skipped, CRCs are VERIFIED on critical chunks (a corrupt
  blob must fail loudly on the strict path);
* bit depth 8, color types 0/2/3/4/6, interlace 0 (Adam7 is refused,
  not mis-decoded);
* inflate all IDAT data, then per-scanline unfilter (None/Sub/Up/
  Average/Paeth). Sub and Up vectorize with numpy (uint8 wraparound IS
  the spec's mod-256); Average/Paeth carry a true sequential
  dependency on the reconstructed left pixel, so those rows fall back
  to a per-pixel loop — the honest cost, paid only on rows that used
  those filters.

Encoder: filter-0 scanlines + one zlib stream — enough to round-trip
any decoded raster and to mint deterministic fixtures/payloads without
an image library. Tests pin the decoder against HAND-ASSEMBLED byte
streams with per-filter expected pixels (independent arithmetic, not
an encoder round-trip).
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: color type -> samples per pixel (after palette expansion for type 3)
_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: channels surfaced to the caller (palette expands to RGB)
_OUT_CHANNELS = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}


def _chunks(b: bytes, verify_crc: bool = True):
    """Yield (type, data) for each chunk; raises on bad framing/CRC."""
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    i = 8
    while i + 8 <= len(b):
        (length,) = struct.unpack(">I", b[i : i + 4])
        ctype = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + length]
        if len(data) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        if verify_crc:
            (crc,) = struct.unpack(
                ">I", b[i + 8 + length : i + 12 + length]
            )
            if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        yield ctype, data
        i += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG without IEND chunk")


def _paeth_row(cur, prev, bpp):
    """Reconstruct one Paeth-filtered scanline (sequential in x)."""
    out = bytearray(cur)
    for x in range(len(cur)):
        a = out[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (cur[x] + pr) & 0xFF
    return bytes(out)


def _avg_row(cur, prev, bpp):
    """Reconstruct one Average-filtered scanline (sequential in x)."""
    out = bytearray(cur)
    for x in range(len(cur)):
        a = out[x - bpp] if x >= bpp else 0
        out[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
    return bytes(out)


def decode_png(b: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, n_channels, raster) — raster is row-major packed
    uint8 samples, palette images expanded to RGB. Raises ValueError on
    anything that is not a decodable 8-bit non-interlaced PNG."""
    import numpy as np

    ihdr = None
    plte = None
    idat = []
    for ctype, data in _chunks(b):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, ctyp, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    if ctyp not in _SAMPLES:
        raise ValueError(f"unsupported PNG color type {ctyp}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if w == 0 or h == 0:
        raise ValueError("empty PNG raster")
    bpp = _SAMPLES[ctyp]  # bytes per pixel pre-expansion (8-bit depth)
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError(
            f"PNG pixel data length {len(raw)} != expected {(stride + 1) * h}"
        )
    rows = []
    prev = bytes(stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        cur = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        if ftype == 0:  # None
            rec = cur
        elif ftype == 1:  # Sub: cumulative per byte-lane, mod 256
            a = np.frombuffer(cur, np.uint8).reshape(w, bpp).copy()
            np.add.accumulate(a, axis=0, out=a)  # uint8 wraps = mod 256
            rec = a.tobytes()
        elif ftype == 2:  # Up: previous reconstructed row + raw
            rec = (
                np.frombuffer(cur, np.uint8)
                + np.frombuffer(prev, np.uint8)
            ).tobytes()
        elif ftype == 3:
            rec = _avg_row(cur, prev, bpp)
        elif ftype == 4:
            rec = _paeth_row(cur, prev, bpp)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        rows.append(rec)
        prev = rec
    raster = b"".join(rows)
    if ctyp == 3:  # palette -> RGB expansion
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG without a valid PLTE chunk")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        ix = np.frombuffer(raster, np.uint8)
        if ix.max(initial=0) >= len(pal):
            raise ValueError("palette index out of range")
        raster = pal[ix].tobytes()
    return w, h, _OUT_CHANNELS[ctyp], raster


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int, height: int, n_channels: int, raster: bytes
) -> bytes:
    """Minimal valid 8-bit PNG (filter-0 rows, one zlib stream).
    ``n_channels`` ∈ {1: gray, 2: gray+alpha, 3: RGB, 4: RGBA}."""
    ctyp = {1: 0, 2: 4, 3: 2, 4: 6}.get(n_channels)
    if ctyp is None:
        raise ValueError(f"unsupported channel count {n_channels}")
    stride = width * n_channels
    if len(raster) != stride * height:
        raise ValueError(
            f"raster length {len(raster)} != {stride}*{height}"
        )
    scan = b"".join(
        b"\x00" + raster[y * stride : (y + 1) * stride]
        for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctyp, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(
    width: int, height: int, n_channels: int, raster: bytes,
    out_w: int, out_h: int,
) -> bytes:
    """Nearest-neighbor resample of a packed uint8 raster — the
    cheap deterministic resize a thumbnailing pass needs (bilinear
    would be a one-line swap of the index math for a gather-average)."""
    import numpy as np

    a = np.frombuffer(raster, np.uint8).reshape(height, width, n_channels)
    ys = (np.arange(out_h) * height) // out_h
    xs = (np.arange(out_w) * width) // out_w
    return a[ys][:, xs].tobytes()
