"""Distributed union-find over a Ray actor pool (the primary clustering engine).

Replaces the reference's driver-orchestrated star-contraction loops
(``workload/minhash_dedupe.py:279-358, 429-557``) with a single streaming pass
over the candidate edges plus a few small boundary-exchange rounds — the
union-find-actor design the north_star mandates (cf. BTS, ICDE 2024, in
PAPERS.md: load-balanced distributed union-find).

Topology: ``num_actors`` actors; node ``x`` is *owned* by actor
``splitmix64(x) % num_actors``.  Edge batches are routed from Ray Data tasks
to the owner of ``u`` (``ingest_edges``) and unioned into a local
path-compressed DSU with the min-root convention.  Convergence rounds then
exchange boundary knowledge:

  push: every actor sends ``(x, find(x))`` for each known *foreign* node x to
        x's owner, which unions the pair (transfers cross-partition
        connectivity toward owners);
  pull: every actor asks each owner for the current root of its foreign
        nodes and unions the answers (transfers owner knowledge back).

Roots only ever decrease (min convention), so the fixpoint exists; rounds
stop when no actor's owned-assignment fingerprint changes.  At fixpoint the
owner's root for every node is the global component minimum (property-tested
against the pure-python oracle on random graphs in tests/test_cc.py).

Unions are idempotent and commutative, so Ray task retries that re-ingest an
edge batch are harmless (at-least-once delivery is sufficient).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..hashing import splitmix64
from .union_find import UnionFind


def owner_of(nodes: np.ndarray, num_actors: int) -> np.ndarray:
    return (splitmix64(nodes.astype(np.uint64)) % np.uint64(num_actors)).astype(np.int64)


@ray.remote
class UnionFindActor:
    def __init__(self, actor_id: int, num_actors: int) -> None:
        self.actor_id = actor_id
        self.num_actors = num_actors
        self.uf = UnionFind()

    def ingest(self, u: np.ndarray, v: np.ndarray) -> int:
        union = self.uf.union
        for a, b in zip(u.tolist(), v.tolist()):
            union(a, b)
        return len(u)

    def union_pairs(self, nodes: np.ndarray, roots: np.ndarray) -> int:
        union = self.uf.union
        for a, b in zip(nodes.tolist(), roots.tolist()):
            union(a, b)
        return len(nodes)

    def boundary_pairs(self) -> dict[int, tuple[np.ndarray, np.ndarray]]:
        """{owner_actor: (foreign_nodes, their_current_roots)}."""
        assign = self.uf.finalize()
        if not assign:
            return {}
        nodes = np.fromiter(assign.keys(), dtype=np.uint64, count=len(assign))
        roots = np.fromiter(assign.values(), dtype=np.uint64, count=len(assign))
        owners = owner_of(nodes, self.num_actors)
        out: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for o in np.unique(owners):
            if int(o) == self.actor_id:
                continue
            m = owners == o
            out[int(o)] = (nodes[m], roots[m])
        return out

    def lookup(self, nodes: np.ndarray) -> np.ndarray:
        find = self.uf.find
        return np.fromiter((find(int(x)) for x in nodes), dtype=np.uint64, count=len(nodes))

    def owned_fingerprint(self) -> int:
        assign = self.uf.finalize()
        if not assign:
            return 0
        nodes = np.fromiter(assign.keys(), dtype=np.uint64, count=len(assign))
        roots = np.fromiter(assign.values(), dtype=np.uint64, count=len(assign))
        mine = owner_of(nodes, self.num_actors) == self.actor_id
        mix = splitmix64(splitmix64(nodes[mine]) ^ roots[mine])
        return int(np.bitwise_xor.reduce(mix)) if mine.any() else 0

    def owned_assignments(self) -> pa.Table:
        """Arrow table (u, rep) for nodes this actor owns."""
        assign = self.uf.finalize()
        if not assign:
            return pa.table({"u": pa.array([], pa.uint64()), "rep": pa.array([], pa.uint64())})
        nodes = np.fromiter(assign.keys(), dtype=np.uint64, count=len(assign))
        roots = np.fromiter(assign.values(), dtype=np.uint64, count=len(assign))
        mine = owner_of(nodes, self.num_actors) == self.actor_id
        return pa.table(
            {"u": pa.array(nodes[mine], pa.uint64()), "rep": pa.array(roots[mine], pa.uint64())}
        )


def _make_router(actors: list, num_actors: int):
    def route(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # local pre-contraction: a batch-level DSU collapses duplicate and
        # chained edges before they hit the actors
        uf = UnionFind()
        union = uf.union
        for a, b in zip(u.tolist(), v.tolist()):
            union(a, b)
        assign = uf.finalize()
        nodes = np.fromiter(assign.keys(), dtype=np.uint64, count=len(assign))
        roots = np.fromiter(assign.values(), dtype=np.uint64, count=len(assign))
        m = nodes != roots
        nodes, roots = nodes[m], roots[m]
        owners = owner_of(roots, num_actors)
        refs = []
        for o in np.unique(owners):
            sel = owners == o
            refs.append(actors[int(o)].ingest.remote(roots[sel], nodes[sel]))
        ray.get(refs)  # backpressure: batch is done only once actors accepted it
        return pa.table({"n": pa.array([len(u)], pa.int64())})

    return route


def cluster_edges(
    edges,
    num_actors: int = 8,
    max_rounds: int = 50,
):
    """Candidate-edge Dataset (u, v) -> assignments Dataset (u, rep).

    ``rep`` is the global min node id of u's component; every node that
    appears in any edge gets a row (isolated input rows simply never appear).
    """
    actors = [UnionFindActor.remote(i, num_actors) for i in range(num_actors)]
    # stream edges into the pool; .sum() drives execution with backpressure
    edges.map_batches(
        _make_router(actors, num_actors), batch_format="pyarrow"
    ).sum("n")

    prev_fp = None
    for _ in range(max_rounds):
        outs = ray.get([a.boundary_pairs.remote() for a in actors])
        # push foreign knowledge to owners
        push_refs = []
        pull_requests: list[list[tuple[int, np.ndarray]]] = [[] for _ in actors]
        for src, d in enumerate(outs):
            for owner, (nodes, roots) in d.items():
                push_refs.append(actors[owner].union_pairs.remote(nodes, roots))
                pull_requests[src].append((owner, nodes))
        ray.get(push_refs)
        # pull owner knowledge back
        lookups = {}
        for src, reqs in enumerate(pull_requests):
            for owner, nodes in reqs:
                lookups[(src, owner)] = (nodes, actors[owner].lookup.remote(nodes))
        pull_refs = []
        for (src, _owner), (nodes, roots_ref) in lookups.items():
            roots = ray.get(roots_ref)
            pull_refs.append(actors[src].union_pairs.remote(nodes, roots))
        ray.get(pull_refs)
        fp = tuple(ray.get([a.owned_fingerprint.remote() for a in actors]))
        if fp == prev_fp:
            break
        prev_fp = fp

    tables = [a.owned_assignments.remote() for a in actors]
    import ray.data as rd

    ds = rd.from_arrow_refs(tables).materialize()
    for a in actors:
        ray.kill(a)
    return ds
