"""Distributed union-find over a Ray actor pool (the primary clustering engine).

Replaces the reference's driver-orchestrated star-contraction loops
(``workload/minhash_dedupe.py:279-358, 429-557``) with a single streaming pass
over the candidate edges plus a few small boundary-exchange rounds — the
union-find-actor design the north_star mandates (cf. BTS, ICDE 2024, in
PAPERS.md: load-balanced distributed union-find).

Topology: ``num_actors`` actors; node ``x`` is *owned* by actor
``splitmix64(x) % num_actors``.  Edge batches are pre-contracted in the
routing tasks (vectorised ``numpy_cc``), routed to the owner of each
forest-pair root, and buffered; actors contract their buffers with the same
vectorised kernel (no per-edge Python loop anywhere).  Convergence rounds
then exchange boundary knowledge:

  push: every actor sends ``(x, root(x))`` for each known *foreign* node x to
        x's owner (transfers cross-partition connectivity toward owners);
  pull: every actor asks each owner for the current root of its foreign
        nodes and merges the answers (transfers owner knowledge back).

Roots only ever decrease (min convention), so the fixpoint exists; rounds
stop when no actor's owned-assignment fingerprint changes.  At fixpoint the
owner's root for every node is the global component minimum (property-tested
against the pure-python oracle on random graphs in tests/test_cc.py).

Merges are idempotent and commutative, so Ray task retries that re-ingest an
edge batch are harmless (at-least-once delivery is sufficient).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..hashing import splitmix64
from .numpy_cc import forest_pairs, numpy_cc


def owner_of(nodes: np.ndarray, num_actors: int) -> np.ndarray:
    return (splitmix64(nodes.astype(np.uint64)) % np.uint64(num_actors)).astype(np.int64)


@ray.remote
class UnionFindActor:
    def __init__(self, actor_id: int, num_actors: int) -> None:
        self.actor_id = actor_id
        self.num_actors = num_actors
        self.buffers: list[np.ndarray] = []  # pending (n, 2) edge arrays
        self.nodes = np.zeros(0, dtype=np.uint64)  # sorted known nodes
        self.roots = np.zeros(0, dtype=np.uint64)  # component-min per node

    def reset(self) -> None:
        self.buffers.clear()
        self.nodes = np.zeros(0, dtype=np.uint64)
        self.roots = np.zeros(0, dtype=np.uint64)

    def ingest(self, u: np.ndarray, v: np.ndarray) -> int:
        self.buffers.append(np.stack([u, v], axis=1).astype(np.uint64))
        return len(u)

    def union_pairs(self, nodes: np.ndarray, roots: np.ndarray) -> int:
        self.buffers.append(np.stack([nodes, roots], axis=1).astype(np.uint64))
        return len(nodes)

    def contract(self) -> int:
        """Merge buffered edges with the existing forest via vectorised CC."""
        if not self.buffers:
            return len(self.nodes)
        parts = list(self.buffers)
        self.buffers.clear()
        if len(self.nodes):
            m = self.nodes != self.roots
            parts.append(np.stack([self.roots[m], self.nodes[m]], axis=1))
            # keep isolated known nodes as self-edges so they stay known
            iso = ~m
            if iso.any():
                parts.append(np.stack([self.nodes[iso], self.nodes[iso]], axis=1))
        pairs = np.concatenate(parts)
        self.nodes, self.roots = numpy_cc(pairs)
        return len(self.nodes)

    def boundary_pairs(self) -> dict[int, tuple[np.ndarray, np.ndarray]]:
        """{owner_actor: (foreign_nodes, their_current_roots)}."""
        self.contract()
        if not len(self.nodes):
            return {}
        owners = owner_of(self.nodes, self.num_actors)
        out: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for o in np.unique(owners):
            if int(o) == self.actor_id:
                continue
            m = owners == o
            out[int(o)] = (self.nodes[m], self.roots[m])
        return out

    def lookup(self, nodes: np.ndarray) -> np.ndarray:
        """Current root per requested node (unknown nodes map to themselves)."""
        self.contract()
        if not len(self.nodes):
            return nodes.astype(np.uint64)
        q = nodes.astype(np.uint64)
        pos = np.searchsorted(self.nodes, q)
        pos_c = np.minimum(pos, len(self.nodes) - 1)
        found = self.nodes[pos_c] == q
        out = q.copy()
        out[found] = self.roots[pos_c[found]]
        return out

    def owned_fingerprint(self) -> int:
        self.contract()
        if not len(self.nodes):
            return 0
        mine = owner_of(self.nodes, self.num_actors) == self.actor_id
        if not mine.any():
            return 0
        mix = splitmix64(splitmix64(self.nodes[mine]) ^ self.roots[mine])
        return int(np.bitwise_xor.reduce(mix))

    def owned_assignments(self) -> pa.Table:
        """Arrow table (u, rep) for nodes this actor owns."""
        self.contract()
        if not len(self.nodes):
            return pa.table({"u": pa.array([], pa.uint64()), "rep": pa.array([], pa.uint64())})
        mine = owner_of(self.nodes, self.num_actors) == self.actor_id
        return pa.table(
            {
                "u": pa.array(self.nodes[mine], pa.uint64()),
                "rep": pa.array(self.roots[mine], pa.uint64()),
            }
        )


def _make_router(actors: list, num_actors: int):
    def route(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # batch-local vectorised contraction: LSH emits each pair in up to B
        # bands and chains within the batch collapse to their spanning forest
        pairs = forest_pairs(np.stack([u, v], axis=1))
        if len(pairs) == 0:
            return pa.table({"n": pa.array([len(u)], pa.int64())})
        owners = owner_of(pairs[:, 0], num_actors)
        refs = []
        for o in np.unique(owners):
            sel = owners == o
            refs.append(actors[int(o)].ingest.remote(pairs[sel, 0], pairs[sel, 1]))
        ray.get(refs)  # backpressure: batch is done only once actors accepted it
        return pa.table({"n": pa.array([len(u)], pa.int64())})

    return route


_POOLS: dict[int, list] = {}


def get_uf_pool(num_actors: int) -> list:
    """Cached union-find actor pool (actor cold-start costs ~1s each; a
    long-lived pipeline reuses the pool across runs, resetting state)."""
    pool = _POOLS.get(num_actors)
    if pool is None:
        pool = [UnionFindActor.remote(i, num_actors) for i in range(num_actors)]
        _POOLS[num_actors] = pool
    return pool


def warm_uf_pool(num_actors: int) -> None:
    ray.get([a.reset.remote() for a in get_uf_pool(num_actors)])


def cluster_edges(
    edges,
    num_actors: int = 8,
    max_rounds: int = 50,
):
    """Candidate-edge Dataset (u, v) -> assignments Dataset (u, rep).

    ``rep`` is the global min node id of u's component; every node that
    appears in any edge gets a row (isolated input rows simply never appear).
    """
    actors = get_uf_pool(num_actors)
    ray.get([a.reset.remote() for a in actors])
    # stream edges into the pool; .sum() drives execution with backpressure
    edges.map_batches(
        _make_router(actors, num_actors), batch_format="pyarrow"
    ).sum("n")
    return converge_and_collect(actors, max_rounds)


def converge_and_collect(actors: list, max_rounds: int = 50):
    """Boundary-exchange rounds to fixpoint, then collect the owned
    assignments — used by both ``cluster_edges`` and the fused ingest path."""
    prev_fp = None
    for _ in range(max_rounds):
        outs = ray.get([a.boundary_pairs.remote() for a in actors])
        # push foreign knowledge to owners (all actors in parallel)
        push_refs = []
        pull_requests: list[list[tuple[int, np.ndarray]]] = [[] for _ in actors]
        for src, d in enumerate(outs):
            for owner, (nodes, roots) in d.items():
                push_refs.append(actors[owner].union_pairs.remote(nodes, roots))
                pull_requests[src].append((owner, nodes))
        ray.get(push_refs)
        # pull owner knowledge back: issue every lookup first, then every
        # merge — two parallel waves instead of a serial per-pair loop
        lookup_items = [
            (src, nodes, actors[owner].lookup.remote(nodes))
            for src, reqs in enumerate(pull_requests)
            for owner, nodes in reqs
        ]
        roots_list = ray.get([ref for _, _, ref in lookup_items])
        pull_refs = [
            actors[src].union_pairs.remote(nodes, roots)
            for (src, nodes, _), roots in zip(lookup_items, roots_list)
        ]
        ray.get(pull_refs)
        fp = tuple(ray.get([a.owned_fingerprint.remote() for a in actors]))
        if fp == prev_fp:
            break
        prev_fp = fp

    tables = [a.owned_assignments.remote() for a in actors]
    import ray.data as rd

    return rd.from_arrow_refs(tables).materialize()
