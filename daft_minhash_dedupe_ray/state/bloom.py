"""Vectorised Bloom filter over uint64 content hashes.

The membership sketch that makes *incremental* corpus dedupe wave-sized at
100 TB: the already-ingested corpus is summarised once into a bit array
(bits/item ~ 14 at 0.1% FP), and each new ingest wave probes the sketch
map-only — only Bloom-positive rows ever touch the persisted corpus hash
index, and the corpus itself never re-shuffles.  No false negatives (a
"definitely new" verdict is exact); false positives only cost an extra
pruned read, never a wrong answer, because callers confirm positives
against the exact hash index (``functions/incremental.py``).

Math is the standard Bloom sizing (public: Bloom 1970):
``m = -n ln p / (ln 2)^2``, ``k = (m/n) ln 2``.  The k probe positions are
independent splitmix64 re-mixes of the item hash — no per-item Python, all
paths are sort/reduceat/gather kernels (``np.bitwise_or.at`` is ~10x slower
than the sorted reduceat scatter on this host, see CLAUDE.md).

Reference parity note: the reference keeps its whole corpus in memory per
run (daft notebook semantics) and has no incremental contract; this module
is part of the beyond-reference training-data-pipeline surface.
"""

from __future__ import annotations

import math

import numpy as np

from ..hashing import splitmix64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


class BloomFilter:
    """Bit-array membership sketch keyed by uint64 hashes (vectorised)."""

    def __init__(
        self, n_bits: int, n_hashes: int, seed: int = 0xB100, words=None, capacity: int = 0
    ):
        if n_bits <= 0 or n_hashes <= 0:
            raise ValueError("n_bits and n_hashes must be positive")
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        self.seed = int(seed)
        # the item count this filter was sized for (0 = unknown/legacy);
        # incremental absorbs use it to decide when a resize/compaction is due
        self.capacity = int(capacity)
        n_words = (self.n_bits + 63) // 64
        self.words = (
            np.zeros(n_words, np.uint64) if words is None else np.asarray(words, np.uint64)
        )
        # one independent mixing constant per probe function
        self.mix = splitmix64(
            (np.arange(1, n_hashes + 1, dtype=np.uint64) * _GOLDEN) ^ np.uint64(seed)
        )

    @classmethod
    def sized(cls, capacity: int, fp_rate: float = 1e-3, seed: int = 0xB100) -> "BloomFilter":
        """Size for ``capacity`` items at target false-positive rate."""
        n = max(1, int(capacity))
        m = max(64, int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2))))
        k = max(1, min(12, round(m / n * math.log(2))))
        return cls(m, k, seed=seed, capacity=n)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(k, n) int64 bit positions for each item hash."""
        h = np.asarray(h, np.uint64)
        pos = np.empty((self.n_hashes, len(h)), np.int64)
        nb = np.uint64(self.n_bits)
        for j in range(self.n_hashes):
            pos[j] = (splitmix64(h ^ self.mix[j]) % nb).astype(np.int64)
        return pos

    def add_hashes(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        pos = self._positions(h).ravel()
        word = pos >> 6
        order = np.argsort(word, kind="stable")
        word = word[order]
        masks = np.uint64(1) << (pos[order] & 63).astype(np.uint64)
        starts = np.flatnonzero(np.r_[True, word[1:] != word[:-1]])
        # OR all masks that hit the same word in one reduceat pass, then a
        # single gather-scatter on the distinct words
        self.words[word[starts]] |= np.bitwise_or.reduceat(masks, starts)

    def contains(self, h: np.ndarray) -> np.ndarray:
        """Boolean mask; True = possibly present, False = definitely absent."""
        if len(h) == 0:
            return np.zeros(0, bool)
        pos = self._positions(h)
        w = self.words[pos >> 6]
        hit = (w >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """OR-union with an identically-parameterised filter (partial-build
        merge: per-block partials OR losslessly, like the HLL register max)."""
        if (self.n_bits, self.n_hashes, self.seed) != (
            other.n_bits,
            other.n_hashes,
            other.seed,
        ):
            raise ValueError("cannot merge differently-parameterised Bloom filters")
        self.words |= other.words
        return self

    def save(self, path: str) -> None:
        np.savez(
            path,
            words=self.words,
            meta=np.array(
                [self.n_bits, self.n_hashes, self.seed, self.capacity], np.int64
            ),
        )

    @classmethod
    def load(cls, path: str) -> "BloomFilter":
        z = np.load(path)
        meta = [int(x) for x in z["meta"]]
        n_bits, n_hashes, seed = meta[:3]
        capacity = meta[3] if len(meta) > 3 else 0  # legacy 3-field saves
        return cls(n_bits, n_hashes, seed=seed, words=z["words"], capacity=capacity)
