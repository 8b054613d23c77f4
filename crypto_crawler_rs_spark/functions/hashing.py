"""Hashing: URL identity and host partition keys.

The reference keys its cross-process politeness locks by a mangled
endpoint string (crypto-crawler/src/utils/lock.rs:43-122) — a
many-URL -> one-key collapse.  We key everything on Murmur3:

* ``url_hash``   — 64-bit ``xxhash64(url)``, JVM-side, the identity
  used by the seen-set and bloom shards.
* ``host_hash``  — 32-bit ``hash(host)`` (Spark's Murmur3 x86_32,
  seed 42), the partition/bucket key for seen shards and politeness
  windows.

Both are computed with built-in JVM expressions (whole-stage codegen,
no Python).  :func:`murmur3_32` is a pure-Python replica of Spark's
``hash()`` used ONLY by unit tests (golden (url, hash) pairs) and the
oracle — it must agree bit-for-bit with the JVM.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_MASK32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _MASK32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _MASK32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK32


def murmur3_32(data: bytes | str, seed: int = 42) -> int:
    """Murmur3 x86_32 over bytes, matching Spark's ``hash()`` for
    string columns (UTF8String.getBytes + Murmur3_x86_32.hashUnsafeBytes).

    Spark processes the tail bytes one at a time through the full
    mix (unlike the reference Murmur3 spec's tail handling) — see
    org.apache.spark.unsafe.hash.Murmur3_x86_32#hashUnsafeBytes.
    Returns a SIGNED 32-bit int like Spark.
    """
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    h1 = seed & _MASK32
    rounded = n - (n % 4)
    for i in range(0, rounded, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    for i in range(rounded, n):
        b = data[i]
        if b >= 128:
            b -= 256  # Java bytes are signed; sign-extend
        h1 = _mix_h1(h1, _mix_k1(b & _MASK32))
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def hash_cols(df, url_col: str = "url", host_col: str = "host"):
    """Attach url_hash (xxhash64) + host_hash (murmur3_32) columns —
    all JVM-side expressions."""
    return df.withColumn("url_hash", F.xxhash64(F.col(url_col))).withColumn(
        "host_hash", F.hash(F.col(host_col))
    )
