"""Pure-Python XXH64 matching Catalyst's ``xxhash64`` bit-for-bit.

The postings layout hive-partitions by ``bucket = pmod(xxhash64(term), B)``
(``operators/index_build.py``). Query-time bucket pruning needs those bucket
ids for the batch's terms — values the driver already holds as Python
strings. Computing them in-process replaces a per-search Spark job (a
``distinct().collect()`` over a literal term relation) with microseconds of
arithmetic; at reranking batch sizes that job was pure fixed cost.

Catalyst's ``XXH64.hashUnsafeBytes`` is the standard XXH64 algorithm
(little-endian words, the 4-byte tail lane, the avalanche) over the UTF-8
bytes with seed 42; parity with the JVM implementation is asserted in
tests/test_xxh64.py over tokenizer-shaped and adversarial inputs. Index
terms are ASCII by construction (both tokenizer modes emit ``[a-z0-9_]``
sub-tokens only), but the implementation is correct for arbitrary UTF-8.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1

SPARK_HASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxhash64_bytes(data: bytes, seed: int = SPARK_HASH_SEED) -> int:
    """Unsigned 64-bit XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxhash64_str(s: str, seed: int = SPARK_HASH_SEED) -> int:
    """Signed 64-bit value, exactly Catalyst's ``xxhash64(string)``."""
    h = xxhash64_bytes(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_term_bucket(term: str, num_buckets: int, seed: int = SPARK_HASH_SEED) -> int:
    """``pmod(xxhash64(term), num_buckets)`` exactly as Catalyst computes it
    (Python's ``%`` on a positive modulus IS pmod)."""
    return xxhash64_str(term, seed) % num_buckets
