"""Per-file bloom sketches for point-lookup data skipping.

Min/max file stats (versioned.py ``skip_filter``) prune RANGE predicates,
but a point lookup — ``key = ?`` / ``key IN (...)`` — on a column whose
values are scattered across files (any table not clustered on that
column) intersects every file's [min, max] and prunes nothing. That is
exactly the CDC shape at scale: merging a small batch of keys into a
100-TB table clustered by date touches every file under range pruning.

The standard lakehouse answer (Delta/Iceberg both ship it) is a small
bloom filter per data file per column, stored in table metadata: a file
whose bloom cannot contain ANY requested value is skipped with zero
false negatives (bloom false POSITIVES only cost a wasted read, never a
wrong result — pruning stays a pure optimization).

Encoding: bits are a base64 bitset sized ~10 bits per distinct value
(clamped to [1 KiB, 128 KiB] per file/column) with k=7 probes — ~1%
false-positive rate at capacity. Probe positions come from the
Kirsch-Mitzenmacher construction (h1 + i*h2 mod m) over an md5 split,
computed with uint64 numpy on BOTH the build and the query side so
overflow wraps identically. Values hash through a canonical type-tagged
string encoding (int/float/str/bool/date/timestamp), so manifests stay
engine-agnostic like the min/max stats.
"""

from __future__ import annotations

import base64
import decimal
import hashlib

import numpy as np

MIN_BITS = 8 * 1024
MAX_BITS = 1 << 20
K = 7
BITS_PER_VALUE = 10


def token(v) -> bytes | None:
    """Canonical hash input for one value; None for NULL or for types
    with no stable cross-engine encoding (binary — mirrors _json_val's
    rule of never recording stats for them)."""
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        # decimals tokenize through the FLOAT encoding below: integral
        # values hash as ints, the rest as float repr — so tokens stay
        # value-canonical across a decimal(p,s) -> decimal(p+k,s)
        # widening (the value is scale-invariant) AND across int/float
        # typed lookups of a decimal column. Two decimals that collide
        # on the same float64 share a token, which is only a bloom
        # false POSITIVE — pruning stays safe.
        if v.is_nan():
            return None
        v = float(v)
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return b"b:" + (b"1" if v else b"0")
    if isinstance(v, (int, np.integer)):
        return b"i:%d" % int(v)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if f != f:  # NaN never matches anything
            return None
        if f == int(f) and abs(f) < 2**53:
            # integral floats hash like ints so a lookup value that
            # arrives as 42 finds a column stored as 42.0
            return b"i:%d" % int(f)
        return b"f:" + repr(f).encode()
    if isinstance(v, str):
        return b"s:" + v.encode("utf-8", "surrogatepass")
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        if s == "NaT":
            return None
        # a DATE and the midnight TIMESTAMP hash identically: pandas
        # surfaces parquet date columns as midnight datetime64, so the
        # build side would otherwise never match a date-valued lookup
        if s.endswith("T00:00:00"):
            s = s[: -len("T00:00:00")]
        return b"t:" + s.encode()
    return None


def _h12(values) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 arrays for the hashable values (order-aligned);
    h2 is forced odd so probe sequences cover the bitset."""
    h1, h2 = [], []
    for v in values:
        t = token(v)
        if t is None:
            continue
        d = hashlib.md5(t).digest()
        h1.append(int.from_bytes(d[:8], "little"))
        h2.append(int.from_bytes(d[8:], "little") | 1)
    return (
        np.array(h1, dtype=np.uint64),
        np.array(h2, dtype=np.uint64),
    )


def _positions(h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> np.ndarray:
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(
        np.int64
    )


def size_bits(n_distinct: int) -> int:
    m = max(MIN_BITS, min(MAX_BITS, BITS_PER_VALUE * max(1, n_distinct)))
    return (m + 63) & ~63


def build(values) -> dict | None:
    """Bloom dict {"m", "k", "b"} over the distinct hashable values;
    None when nothing is hashable (all-NULL / binary column) — absent
    blooms mean "always keep", pruning stays safe."""
    distinct = {token(v): v for v in values}
    distinct.pop(None, None)
    if not distinct:
        return None
    h1, h2 = _h12(distinct.values())
    m = size_bits(len(h1))
    bits = np.zeros(m, dtype=np.uint8)
    bits[_positions(h1, h2, m, K).ravel()] = 1
    return {
        "m": m,
        "k": K,
        "b": base64.b64encode(np.packbits(bits).tobytes()).decode(),
    }


def fold(bloom: dict, min_bits: int = 4096) -> dict | None:
    """Halve a bloom's bitset by OR-folding its two halves — the probe
    positions are ``h mod m``, and for any p, ``p mod (m/2)`` lands on a
    bit the fold set whenever bit p was set (p ≡ p mod m/2 (mod m/2)),
    so folding preserves ZERO FALSE NEGATIVES and only raises the
    false-positive rate. The degrade path for a table-wide bloom byte
    budget: shrink sketches, never break the pruning contract.

    None when the bloom is at the floor (``min_bits``) or its half is
    not byte-aligned — callers stop folding there."""
    m = int(bloom["m"])
    half = m // 2
    if m % 2 or half % 8 or half < min_bits:
        return None
    bits = np.unpackbits(
        np.frombuffer(base64.b64decode(bloom["b"]), dtype=np.uint8)
    )[:m]
    folded = bits[:half] | bits[half:]
    return {
        "m": half,
        "k": bloom["k"],
        "b": base64.b64encode(np.packbits(folded).tobytes()).decode(),
    }


def contains_any(bloom: dict, values) -> bool:
    """True iff the bloom may contain AT LEAST ONE of ``values`` —
    the file-keep test for ``col IN (...)``. Unhashable lookup values
    keep the file (never a semantic prune)."""
    h1, h2 = _h12(values)
    if len(h1) < len(list(values)):
        return True  # some value we cannot hash — cannot rule the file out
    if len(h1) == 0:
        return True
    bits = np.unpackbits(
        np.frombuffer(base64.b64decode(bloom["b"]), dtype=np.uint8)
    )
    pos = _positions(h1, h2, int(bloom["m"]), int(bloom["k"]))
    return bool(bits[pos].all(axis=1).any())
