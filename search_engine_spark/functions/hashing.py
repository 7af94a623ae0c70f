"""Deterministic hashing shared by the Spark engine and the single-node oracle.

Replaces the reference's stateful sequential doc-ID allocation
(/root/reference/backend/app.py:239-283) with a deterministic,
coordination-free ``doc_id = f(url)`` — no global counter, no lock, no
driver-side state, which is what makes the build resumable and
executor-parallel at 10^12 docs.

Design note on the hash choice: this environment's Spark build ships an
``xxhash64`` whose output does NOT match the public xxHash64 spec (verified
by invoking the JVM class directly — its results differ from a faithful
spec implementation AND from its own decompiled bytecode, i.e. the runtime
class is patched). Engine semantics must not depend on a JVM
implementation detail, so doc IDs derive from **MD5** instead, which is
standardized and bit-identical across Spark (``F.md5``), Python
(``hashlib.md5``) and DuckDB (``md5()``) — all three verified in
tests/test_hashing.py:

    doc_id = int(md5(utf8(url)).hexdigest()[:15], 16)   # 60-bit, positive

In Spark this is ``F.conv(F.substring(F.md5(url), 1, 15), 16, 10)`` cast to
long — fully JVM-side, no Python in the hot path. 60 bits is
collision-checked at test scale; the documented 10^12-doc upgrade path is
the full 128-bit digest as the doc key (or dense per-partition ordinals via
the partition-offset / zipWithIndex pattern, also provided in
operators/index_build.py).

The xxHash64-style hash below is a portable pure-Python/numpy 64-bit hash
(xxHash64 construction, public spec) used for MinHash/SimHash token
hashing where engine and oracle share the same Python definition — Spark
parity is irrelevant there by design.
"""

from __future__ import annotations

import hashlib

MASK64 = 0xFFFFFFFFFFFFFFFF
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D4F879B4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * P2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * P1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * P1) + P4) & MASK64


def xxhash64(data: bytes, seed: int = SPARK_DEFAULT_SEED) -> int:
    """XXH64 of ``data`` as a SIGNED 64-bit int (Spark LongType semantics)."""
    n = len(data)
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - P1) & MASK64
        i = 0
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK64
        i = 0
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK64
        h = (_rotl(h, 23) * P2 + P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK64
        h = (_rotl(h, 11) * P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    # to signed int64
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_str(s: str, seed: int = SPARK_DEFAULT_SEED) -> int:
    """Portable 64-bit hash of a string (xxHash64 construction over UTF-8
    bytes). Shared by engine + oracle for MinHash/SimHash token hashing."""
    return xxhash64(s.encode("utf-8"), seed)


DOC_ID_HEX_CHARS = 15  # 60 bits — fits signed int64, always positive


def doc_id_from_url(url: str) -> int:
    """Oracle-side doc id: first 15 hex chars of md5(url) as int.

    Spark-side equivalent (bit-identical, JVM-only):
        F.conv(F.substring(F.md5("url"), 1, 15), 16, 10).cast("long")
    DuckDB-side equivalent:
        CAST(('0x' || substr(md5(url), 1, 15)) AS BIGINT)  -- via from_hex
    """
    return int(hashlib.md5(url.encode("utf-8")).hexdigest()[:DOC_ID_HEX_CHARS], 16)
