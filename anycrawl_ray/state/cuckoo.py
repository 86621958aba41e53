"""Partitioned cuckoo filter for the URL-seen set (north_rule component).

The reference deduplicates URLs through Crawlee's persistent RequestQueueV2
uniqueKey index (packages/scrape/src/engines/Base.ts:412-420,
packages/scrape/src/managers/EngineQueue.ts:122-127) — an exact disk-backed
set. At 10^10-URL frontier scale an exact in-memory set per shard is too
large, so each frontier shard holds:

- a **cuckoo filter** (this module): 16-bit fingerprints, 4-slot buckets,
  ~95% load factor => ~2.5 bytes/URL, ~0.003% false-positive rate — the
  fast-path membership test;
- an exact per-shard key set (in-memory at test scale; the design doc's
  sorted Lance ``seen`` table at production scale) consulted only when the
  filter says "maybe present", keeping the seen-set semantics exact.

Standard cuckoo-filter algorithm (Fan et al., "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT'14): two candidate buckets
``i1 = hash(x)``, ``i2 = i1 xor hash(fp)``, bounded eviction chain with a
deterministic (seeded LCG) victim choice so runs are reproducible.
"""

from __future__ import annotations

import numpy as np

_MAX_KICKS = 500


def _mix64(x: int) -> int:
    """splitmix64 finalizer — cheap int hash for 64-bit keys."""
    x &= (1 << 64) - 1
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & ((1 << 64) - 1)
    return x ^ (x >> 31)


def _mix64_np(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — bit-identical to ``_mix64`` (uint64 wraps)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class CuckooFilter:
    """Cuckoo filter over 64-bit integer keys."""

    def __init__(self, capacity: int = 1 << 16, seed: int = 12345) -> None:
        nb = 1
        while nb * 4 * 0.95 < capacity:
            nb <<= 1
        self.num_buckets = nb
        self.table = np.zeros((nb, 4), dtype=np.uint16)
        self.count = 0
        self._rng_state = seed or 1

    # deterministic LCG for eviction victim choice
    def _rand(self, n: int) -> int:
        self._rng_state = (self._rng_state * 6364136223846793005 + 1442695040888963407) & (
            (1 << 64) - 1
        )
        return (self._rng_state >> 33) % n

    def _fingerprint(self, key: int) -> int:
        fp = _mix64(key) & 0xFFFF
        return fp or 1  # 0 marks an empty slot

    def _i1(self, key: int) -> int:
        return _mix64(key ^ 0x9E3779B97F4A7C15) & (self.num_buckets - 1)

    def _alt(self, i: int, fp: int) -> int:
        return (i ^ _mix64(fp)) & (self.num_buckets - 1)

    def contains(self, key: int) -> bool:
        fp = self._fingerprint(key)
        i1 = self._i1(key)
        row = self.table[i1]
        if fp in row:
            return True
        i2 = self._alt(i1, fp)
        return fp in self.table[i2]

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership probe over a uint64 key array — one numpy
        pass instead of a Python loop per key (the frontier's admission hot
        path). Semantics identical to ``contains`` (tests pin equality)."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        m = _mix64_np(keys)
        fp = (m & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 marks an empty slot
        mask = np.uint64(self.num_buckets - 1)
        i1 = (_mix64_np(keys ^ np.uint64(0x9E3779B97F4A7C15)) & mask).astype(
            np.int64)
        i2 = ((i1.astype(np.uint64) ^ _mix64_np(fp.astype(np.uint64))) & mask
              ).astype(np.int64)
        f = fp[:, None]
        return ((self.table[i1] == f).any(axis=1)
                | (self.table[i2] == f).any(axis=1))

    def insert(self, key: int) -> bool:
        """Insert; False only when the filter is saturated (caller should
        grow / rely on the exact set)."""
        fp = self._fingerprint(key)
        i1 = self._i1(key)
        i2 = self._alt(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict with a recorded kick chain; on failure the chain is rolled
        # back so no EARLIER key's fingerprint is ever lost (a dropped
        # victim would turn into a false negative for a key the caller
        # believes inserted — callers only know about THIS key's failure)
        i = i1 if self._rand(2) == 0 else i2
        cur = fp
        chain: list[tuple[int, int, int]] = []  # (bucket, slot, old_value)
        for _ in range(_MAX_KICKS):
            slot = self._rand(4)
            displaced = int(self.table[i][slot])
            chain.append((i, slot, displaced))
            self.table[i][slot] = cur
            cur = displaced
            i = self._alt(i, cur)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = cur
                self.count += 1
                return True
        for bucket, slot, old in reversed(chain):
            self.table[bucket][slot] = old
        return False

    def delete(self, key: int) -> bool:
        fp = self._fingerprint(key)
        i1 = self._i1(key)
        for i in (i1, self._alt(i1, fp)):
            row = self.table[i]
            hit = np.flatnonzero(row == fp)
            if hit.size:
                row[hit[0]] = 0
                self.count -= 1
                return True
        return False

    def __len__(self) -> int:
        return self.count

    # -- serialization (checkpointing) -----------------------------------
    def to_bytes(self) -> bytes:
        header = np.array([self.num_buckets, self.count, self._rng_state], dtype=np.uint64)
        return header.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        header = np.frombuffer(blob[:24], dtype=np.uint64)
        obj = cls.__new__(cls)
        obj.num_buckets = int(header[0])
        obj.count = int(header[1])
        obj._rng_state = int(header[2])
        obj.table = (
            np.frombuffer(blob[24:], dtype=np.uint16).reshape(obj.num_buckets, 4).copy()
        )
        return obj
