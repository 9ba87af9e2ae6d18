"""Pure-Python xxHash64 matching Spark's `F.xxhash64` bit-for-bit.

Spark's XxHash64 expression (sql/catalyst XXH64.java — public Apache
source) is the standard xxHash64 algorithm (Yann Collet's public
spec) applied per column with the running hash as the seed for the
next column, starting from seed 42:

    hash = 42
    for col in cols: hash = xxh64_<type>(value, seed=hash)

Per type (the three the repo's fixtures need):
  * long   -> the 8-byte-word tail step + avalanche (`hashLong`)
  * int    -> widened to unsigned 32 bits, the 4-byte tail step +
              avalanche (`hashInt`)
  * string -> full xxHash64 over the UTF-8 bytes

This kernel exists so the driver-side numpy oracles can value-pin
engine-hash-valued outputs (MinHash band hashes, SimHash bits) as
literal expected-values parquet — graduating `dedup_minhash_lsh` /
`dedup_simhash` from rows-only to SQL-value-exact.  Parity with the
engine is asserted by tests/test_xxh64.py over random strings (all
tail lengths), longs, ints, and multi-column chains.

Everything is plain-int arithmetic masked to 64 bits; results are
returned as SIGNED int64 (Spark's hash column type).
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SEED = 42  # Spark's XxHash64 default seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def hash_long(value: int, seed: int = SEED) -> int:
    """Spark XXH64.hashLong: the 8-byte tail step + avalanche."""
    v = value & _M64
    h = (seed + _P5 + 8) & _M64
    h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _signed(_fmix(h))


def hash_int(value: int, seed: int = SEED) -> int:
    """Spark XXH64.hashInt: the 4-byte tail step + avalanche.  Spark
    hashes int (and smaller integral) columns through this path; the
    int is reinterpreted as unsigned 32 bits."""
    h = (seed + _P5 + 4) & _M64
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _signed(_fmix(h))


def _word(h: int, k1: int) -> int:
    h ^= (_rotl((k1 * _P2) & _M64, 31) * _P1) & _M64
    return (_rotl(h, 27) * _P1 + _P4) & _M64


def hash_bytes(data: bytes, seed: int = SEED) -> int:
    """Standard xxHash64 over a byte string (== Spark's
    hashUnsafeBytes over the UTF8String payload)."""
    seed &= _M64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            k = int.from_bytes(data[i:i + 8], "little")
            v1 = (_rotl((v1 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[i + 8:i + 16], "little")
            v2 = (_rotl((v2 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[i + 16:i + 24], "little")
            v3 = (_rotl((v3 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[i + 24:i + 32], "little")
            v4 = (_rotl((v4 + k * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h = _word(h, int.from_bytes(data[i:i + 8], "little"))
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _signed(_fmix(h))


def hash_string(s: str, seed: int = SEED) -> int:
    return hash_bytes(s.encode("utf-8"), seed)


def xxhash64(*values, seed: int = SEED) -> int:
    """Chain like Spark's multi-column `F.xxhash64(...)`: the running
    hash seeds the next column.  Python ints are ambiguous between
    Spark int and long — pass explicit (kind, value) tuples with kind
    in {'int','long','str'} when mixing, else bare values hash as
    long (int for values tagged via small-int heuristics is NOT
    attempted: explicitness over guessing)."""
    h = seed
    for v in values:
        if isinstance(v, tuple):
            kind, val = v
            if kind == "int":
                h = hash_int(val, h)
            elif kind == "long":
                h = hash_long(val, h)
            elif kind == "str":
                h = hash_string(val, h)
            else:
                raise ValueError(f"unknown kind {kind!r}")
        elif isinstance(v, str):
            h = hash_string(v, h)
        elif isinstance(v, int):
            h = hash_long(v, h)
        else:
            raise TypeError(f"unsupported type {type(v)}")
    return h
