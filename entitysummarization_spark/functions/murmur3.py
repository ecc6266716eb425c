"""Pure-Python Murmur3_x86_32 for Spark-compatible partition assignment.

Spark's ``repartition(n, col)`` routes each row to partition
``pmod(murmur3(col, seed=42), n)`` (HashPartitioning's
``partitionIdExpression``); for a LongType column the hash is
Murmur3_x86_32 over the value's two 32-bit halves (low word first) with
total length 8 — the same public algorithm behind ``F.hash``
(Austin Appleby's MurmurHash3, public domain). Re-implemented here so the
single-process NumPy pipeline oracle (models/pipeline_oracle.py) can
reproduce the EXACT doc→partition assignment of the distributed AD-LDA
sampler without a SparkSession — which is what makes multi-partition runs
bit-checkable against an independent implementation.

Verified against ``F.hash`` / ``spark_partition_id()`` in
tests/test_pipeline_oracle.py.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def hash_long(value: int, seed: int = 42) -> int:
    """Murmur3_x86_32 of a 64-bit value, Spark's LongType layout
    (low word, then high word, length 8). Returns a SIGNED int32 —
    the JVM int ``F.hash`` would produce."""
    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = _mix_h1(seed & _M32, _mix_k1(v & _M32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _M32))
    h = _fmix(h1, 8)
    return h - (1 << 32) if h >= (1 << 31) else h


def partition_of_long(value: int, n_partitions: int, seed: int = 42) -> int:
    """Spark HashPartitioning target partition for a LongType key:
    ``pmod(murmur3(key), n)``."""
    h = hash_long(value, seed)
    return ((h % n_partitions) + n_partitions) % n_partitions
