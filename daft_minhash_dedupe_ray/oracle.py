"""Exact brute-force oracles for correctness tests.

Replaces the reference's igraph validation (``workload/minhash_dedupe.py:559-614``)
with dependency-free exact computation: pairwise word-n-gram Jaccard over the
normalised text, pHash Hamming distance, python union-find components.
Only for small fixtures (O(n^2)).
"""

from __future__ import annotations

import numpy as np

from .config import DedupeConfig
from .hashing import hamming_distance64
from .state.union_find import UnionFind
from .text import normalize_strings


def ngram_set(text: str, n: int) -> set[tuple[str, ...]]:
    toks = text.split()
    if not toks:
        return set()
    if len(toks) < n:
        return {tuple(toks)}
    return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def oracle_dup_pairs(
    node_ids: list[int],
    captions: list[str],
    cfg: DedupeConfig,
    phashes: list[int] | None = None,
    phash_max_hamming: int | None = None,
) -> set[tuple[int, int]]:
    """All true duplicate pairs (u < v): caption n-gram Jaccard >= threshold,
    union pHash Hamming < phash_bands (the pigeonhole-guaranteed band recall
    region) unless ``phash_max_hamming`` overrides it."""
    norm = normalize_strings([c if c is not None else "" for c in captions], cfg.normalize)
    shingles = [ngram_set(t, cfg.ngram_size) for t in norm]
    n = len(node_ids)
    pairs: set[tuple[int, int]] = set()
    # inverted-index prefilter: J >= threshold > 0 requires sharing a shingle,
    # so only pairs co-occurring under some shingle need an exact check
    inv: dict[tuple[str, ...], list[int]] = {}
    for i, ss in enumerate(shingles):
        for s in ss:
            inv.setdefault(s, []).append(i)
    cand: set[tuple[int, int]] = set()
    for idxs in inv.values():
        if len(idxs) > 1:
            for ai in range(len(idxs)):
                for bi in range(ai + 1, len(idxs)):
                    cand.add((idxs[ai], idxs[bi]))
    for i, j in cand:
        if jaccard(shingles[i], shingles[j]) >= cfg.threshold:
            u, v = sorted((node_ids[i], node_ids[j]))
            pairs.add((u, v))
    if phashes is not None and cfg.phash_col is not None:
        maxh = phash_max_hamming if phash_max_hamming is not None else cfg.phash_bands - 1
        ph = np.asarray(phashes, dtype=np.int64)
        for i in range(n):
            d = hamming_distance64(np.full(n - i - 1, ph[i]), ph[i + 1 :])
            for k in np.flatnonzero(d <= maxh):
                j = i + 1 + int(k)
                u, v = sorted((node_ids[i], node_ids[j]))
                pairs.add((u, v))
    return pairs


def oracle_assignments(node_ids: list[int], pairs: set[tuple[int, int]]) -> dict[int, int]:
    """{node: min-id representative} — transitive closure of the pair set;
    singletons map to themselves."""
    uf = UnionFind()
    for x in node_ids:
        uf.add(int(x))
    for u, v in pairs:
        uf.union(u, v)
    return uf.finalize()


def oracle_survivors(node_ids: list[int], pairs: set[tuple[int, int]]) -> set[int]:
    """Keep-set under the reference's merge semantics
    (``workload/minhash_dedupe.py:626-647``): isolated rows plus the min-id
    representative of every cluster."""
    assign = oracle_assignments(node_ids, pairs)
    return {x for x in node_ids if assign[int(x)] == int(x)}


def dup_pair_recall(
    predicted_assign: dict[int, int], oracle_pairs: set[tuple[int, int]]
) -> float:
    """Fraction of oracle dup pairs whose endpoints land in the same predicted
    cluster (BASELINE.json metric: recall >= 0.99)."""
    if not oracle_pairs:
        return 1.0
    hit = sum(
        1
        for u, v in oracle_pairs
        if predicted_assign.get(u, u) == predicted_assign.get(v, v)
    )
    return hit / len(oracle_pairs)
