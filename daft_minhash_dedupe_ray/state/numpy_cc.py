"""Vectorised in-memory connected components over an edge array.

``numpy_cc(pairs)`` computes, for every node appearing in ``pairs``
(shape (n, 2) uint64), the minimum node id of its connected component —
min-label propagation with pointer jumping, fully vectorised (no Python
per-edge loop).  Converges in O(log n) sweeps; each sweep is two
``np.minimum.at`` scatters plus label-path compression.

This is the CPU kernel used by the union-find actors and the edge routers
(``dist_union_find.py``); the dict-based ``UnionFind`` remains the reference
oracle (tests assert they agree on random graphs).
"""

from __future__ import annotations

import numpy as np


def _unique_inverse(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Manual unique+inverse: ``np.unique(..., return_inverse=True)`` is
    ~15x slower than a plain argsort on large uint64 arrays (measured 27s vs
    1.8s at 12.8M elements on numpy 1.26)."""
    order = np.argsort(x, kind="stable")
    xs = x[order]
    flag = np.r_[True, xs[1:] != xs[:-1]]
    nodes = xs[flag]
    inv = np.empty(len(x), dtype=np.int64)
    # cast before cumsum: numpy's bool cumsum path is ~25x slower than int64
    inv[order] = np.cumsum(flag.astype(np.int64)) - 1
    return nodes, inv


def numpy_cc(pairs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, 2) edge array -> (nodes, roots): root = component-min node id."""
    if len(pairs) == 0:
        e = np.zeros(0, dtype=np.uint64)
        return e, e
    nodes, inv = _unique_inverse(np.ascontiguousarray(pairs).reshape(-1))
    e0 = inv[0::2]
    e1 = inv[1::2]
    lab = np.arange(len(nodes), dtype=np.int64)
    # pre-sort each edge direction once so the per-iteration grouped min is a
    # reduceat (np.minimum.at is an order of magnitude slower than reduceat)
    order0 = np.argsort(e0, kind="stable")
    g0 = e0[order0]
    starts0 = np.flatnonzero(np.r_[True, g0[1:] != g0[:-1]])
    uniq0 = g0[starts0]
    order1 = np.argsort(e1, kind="stable")
    g1 = e1[order1]
    starts1 = np.flatnonzero(np.r_[True, g1[1:] != g1[:-1]])
    uniq1 = g1[starts1]
    while True:
        before = lab.copy()
        m = np.minimum(lab[e0], lab[e1])  # per-edge min label
        lab[uniq0] = np.minimum(lab[uniq0], np.minimum.reduceat(m[order0], starts0))
        lab[uniq1] = np.minimum(lab[uniq1], np.minimum.reduceat(m[order1], starts1))
        # pointer jumping: compress label chains (labels index into nodes order,
        # and node order is sorted, so lab[i] <= i always decreases toward roots)
        while True:
            nl = lab[lab]
            if np.array_equal(nl, lab):
                break
            lab = nl
        if np.array_equal(lab, before):
            break
    return nodes, nodes[lab]


def forest_pairs(pairs: np.ndarray) -> np.ndarray:
    """Contract an edge array to its spanning forest (node, root) pairs,
    excluding self-rows — the minimal equivalent edge set."""
    nodes, roots = numpy_cc(pairs)
    m = nodes != roots
    return np.stack([roots[m], nodes[m]], axis=1)
