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
overflow wraps identically. Values hash through canonical type-tagged
string tokens (int/float/decimal/str/bool/date/timestamp — numerics may
emit an exact-int AND a double-image token, see :func:`tokens`), so
manifests stay engine-agnostic like the min/max stats and lookups stay
false-negative-free across int/float/decimal typed comparisons.
"""

from __future__ import annotations

import base64
import decimal
import hashlib
import math

import numpy as np

MIN_BITS = 8 * 1024
MAX_BITS = 1 << 20
K = 7
BITS_PER_VALUE = 10


def _num_tokens(n, fd) -> list[bytes]:
    """Tokens for a numeric value given its exact integral image ``n``
    (None when the value is not a mathematical integer) and its double
    image ``fd`` (float(v); None when float() overflows).

    Soundness contract: two numeric values that Spark's ``=`` could
    call equal — exact int/decimal comparison OR mixed-type comparison
    through a double cast — must share at least one token. Exact
    comparisons ride the ``i:`` token (arbitrary precision, never
    folded through float64, so a decimal(18,0) snowflake ID >= 2**53
    matches its exact int lookup). Double-cast comparisons ride the
    ``f:`` token, emitted whenever the double image is AMBIGUOUS —
    |n| >= 2**53 (several integers share one double) or the value is
    non-integral. Below 2**53 every integral value has a unique,
    exactly-round-tripping double, so the ``i:`` token alone covers
    both semantics and blooms stay one-token-per-value in the common
    case. Extra tokens can only add false POSITIVES — pruning is never
    semantic."""
    out: list[bytes] = []
    if n is not None:
        out.append(b"i:%d" % n)
        if abs(n) >= 2**53 and fd is not None and not math.isinf(fd):
            out.append(b"f:" + repr(fd).encode())
        return out
    # non-integral value: the double image carries the comparison.
    if fd is None:
        return out
    if not math.isinf(fd) and fd.is_integer():
        # e.g. Decimal('4503599627370496.5') rounds to the integral
        # double 2**52 — emit the integral-double's tokens so an
        # integer-typed lookup of that double still finds the file
        return _num_tokens(int(fd), fd)
    out.append(b"f:" + repr(fd).encode())
    return out


def tokens(v) -> list[bytes]:
    """Canonical hash tokens for one value; empty for NULL / NaN or for
    types with no stable cross-engine encoding (binary — mirrors
    _json_val's rule of never recording stats for them). Numerics may
    emit TWO tokens (exact-int + double-image, see _num_tokens) so that
    exact int/decimal lookups and double-cast mixed-type lookups both
    find the value with zero false negatives."""
    if v is None:
        return []
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return [b"b:" + (b"1" if v else b"0")]
    if isinstance(v, decimal.Decimal):
        if v.is_nan():
            return []
        try:
            fd = float(v)
        except OverflowError:
            fd = None
        n = int(v) if v == v.to_integral_value() else None
        return _num_tokens(n, fd)
    if isinstance(v, (int, np.integer)):
        n = int(v)
        try:
            fd = float(n)
        except OverflowError:
            fd = None
        return _num_tokens(n, fd)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if f != f:  # NaN never matches anything
            return []
        n = int(f) if not math.isinf(f) and f.is_integer() else None
        return _num_tokens(n, f)
    if isinstance(v, str):
        return [b"s:" + v.encode("utf-8", "surrogatepass")]
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        if s == "NaT":
            return []
        # a DATE and the midnight TIMESTAMP hash identically: pandas
        # surfaces parquet date columns as midnight datetime64, so the
        # build side would otherwise never match a date-valued lookup
        if s.endswith("T00:00:00"):
            s = s[: -len("T00:00:00")]
        return [b"t:" + s.encode()]
    return []


def token(v) -> bytes | None:
    """Primary canonical token (compat shim over :func:`tokens`)."""
    tk = tokens(v)
    return tk[0] if tk else None


def _h12(toks) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 arrays for the token byte strings
    (order-aligned); h2 is forced odd so probe sequences cover the
    bitset."""
    h1, h2 = [], []
    for t in toks:
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
    blooms mean "always keep", pruning stays safe. Sized by distinct
    TOKEN count (a numeric value may emit two, see :func:`tokens`) so
    the ~1% FPR target holds regardless of token fan-out."""
    distinct: set[bytes] = set()
    for v in values:
        distinct.update(tokens(v))
    if not distinct:
        return None
    h1, h2 = _h12(sorted(distinct))
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
    the file-keep test for ``col IN (...)``. A lookup value matches
    when ANY of its tokens probes present (the multi-token numeric
    scheme: either the exact-int or the double-image token hitting
    means some stored value could Spark-equal it). Unhashable lookup
    values keep the file (never a semantic prune)."""
    per_value = [tokens(v) for v in values]
    if not per_value:
        return True
    if any(not tk for tk in per_value):
        return True  # some value we cannot hash — cannot rule the file out
    bits = np.unpackbits(
        np.frombuffer(base64.b64decode(bloom["b"]), dtype=np.uint8)
    )
    m, k = int(bloom["m"]), int(bloom["k"])
    h1, h2 = _h12([t for tk in per_value for t in tk])
    pos = _positions(h1, h2, m, k)
    return bool(bits[pos].all(axis=1).any())
