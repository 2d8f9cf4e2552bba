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
vectorised kernel (no per-edge Python loop anywhere).

Convergence is a *delta* protocol with direct actor-to-actor messages — no
(node, root) array ever transits the driver, and each round sends only pairs
whose root changed since the last round:

  * an actor pushes changed pairs for *foreign* nodes to their owner,
    registering itself as a subscriber for those nodes;
  * an owner replies to new registrations with its current roots once, then
    pushes only changed owned roots to the registered subscribers.

Roots only ever decrease (min convention), so the fixpoint exists; rounds
stop when no actor sent anything (a root that stopped changing everywhere is
globally minimal).  At fixpoint the owner's root for every node is the global
component minimum (property-tested against the pure-python oracle on random
graphs in tests/test_cc.py).

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


def _sorted_union(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not len(a):
        return np.unique(b)
    return np.union1d(a, b)


# ingest-side amortised-contract trigger: don't fold buffers below this many
# pairs (tiny graphs gain nothing from mid-stream contraction)
_CONTRACT_MIN_ROWS = 1_500_000


@ray.remote
class UnionFindActor:
    def __init__(
        self, actor_id: int, num_actors: int, contract_min_rows: int = _CONTRACT_MIN_ROWS
    ) -> None:
        self.actor_id = actor_id
        self.num_actors = num_actors
        self.contract_min_rows = contract_min_rows
        self.pool: list | None = None  # peer handles (set once per run)
        self.buffers: list[np.ndarray] = []  # pending (n, 2) edge arrays
        self._buffered = 0  # rows across self.buffers (contract trigger)
        self.nodes = np.zeros(0, dtype=np.uint64)  # sorted known nodes
        self.roots = np.zeros(0, dtype=np.uint64)  # component-min per node
        # delta-exchange state
        self.last_nodes = np.zeros(0, dtype=np.uint64)
        self.last_roots = np.zeros(0, dtype=np.uint64)
        self.interest: dict[int, np.ndarray] = {}  # subscriber -> sorted owned nodes
        self.pending_reply: dict[int, list[np.ndarray]] = {}  # new registrations

    def set_pool(self, pool: list) -> None:
        self.pool = pool

    def reset(self) -> None:
        self.buffers.clear()
        self._buffered = 0
        self.nodes = np.zeros(0, dtype=np.uint64)
        self.roots = np.zeros(0, dtype=np.uint64)
        self.last_nodes = np.zeros(0, dtype=np.uint64)
        self.last_roots = np.zeros(0, dtype=np.uint64)
        self.interest = {}
        self.pending_reply = {}

    def ingest(self, u: np.ndarray, v: np.ndarray) -> int:
        self.buffers.append(np.stack([u, v], axis=1).astype(np.uint64))
        # amortised contract-on-ingest: the reduce wave runs for the whole
        # ingest phase while this actor would otherwise sit idle, then pay
        # one serial bulk contract at converge round 1 (measured 8.7 s at
        # 4M rows).  Folding the buffers in once they exceed the current
        # forest keeps total contract work within ~2x the single bulk pass
        # and overlaps it with the reduce tasks (reducers blocked on this
        # ack release their CPU slots inside ray.get, so other reducers
        # keep the cores busy).
        self._buffered += len(u)
        if self._buffered >= max(self.contract_min_rows, len(self.nodes)):
            self.contract()
        return len(u)

    def union_pairs(self, nodes: np.ndarray, roots: np.ndarray, register_from: int | None = None) -> int:
        self.buffers.append(np.stack([nodes, roots], axis=1).astype(np.uint64))
        self._buffered += len(nodes)
        if register_from is not None:
            m = owner_of(nodes, self.num_actors) == self.actor_id
            if m.any():
                self.pending_reply.setdefault(register_from, []).append(
                    (nodes[m].astype(np.uint64), roots[m].astype(np.uint64))
                )
                self.interest[register_from] = _sorted_union(
                    self.interest.get(register_from, np.zeros(0, np.uint64)),
                    nodes[m].astype(np.uint64),
                )
        return len(nodes)

    def contract(self) -> int:
        """Merge buffered edges with the existing forest via vectorised CC.

        Incremental path: when the buffered delta is small relative to the
        forest (the convergence rounds' regime), the forest is NOT re-CC'd.
        Buffered endpoints resolve to their current roots, CC runs over the
        tiny root-pair graph only, and the result scatters back through a
        sorted remap — O(delta·log delta + n) instead of O(n log n) per
        round.  Falls back to full CC when the delta is large (bulk ingest)."""
        if not self.buffers:
            return len(self.nodes)
        parts = list(self.buffers)
        self.buffers.clear()
        self._buffered = 0
        delta = np.concatenate(parts)
        n_forest = len(self.nodes)
        if n_forest and len(delta) <= n_forest // 8:
            flat = delta.reshape(-1)
            known_roots = self._current_roots_of(flat)
            # CC over the root-level graph of the delta (plus self-pairs so
            # brand-new nodes stay known)
            root_pairs = known_roots.reshape(-1, 2)
            sub_nodes, sub_roots = numpy_cc(root_pairs)
            # remap every forest root through the contraction of its root
            pos = np.searchsorted(sub_nodes, self.roots)
            pos_c = np.minimum(pos, len(sub_nodes) - 1)
            hit = sub_nodes[pos_c] == self.roots
            self.roots = np.where(hit, sub_roots[pos_c], self.roots)
            # insert delta nodes the forest didn't know yet
            ins = np.searchsorted(self.nodes, flat)
            ins_c = np.minimum(ins, n_forest - 1)
            new_mask = self.nodes[ins_c] != flat
            if new_mask.any():
                new_nodes = np.unique(flat[new_mask])
                # their root: contraction of their own root-level component
                p2 = np.searchsorted(sub_nodes, new_nodes)
                p2c = np.minimum(p2, len(sub_nodes) - 1)
                h2 = sub_nodes[p2c] == new_nodes
                new_roots = np.where(h2, sub_roots[p2c], new_nodes)
                merged_n = np.concatenate([self.nodes, new_nodes])
                merged_r = np.concatenate([self.roots, new_roots])
                order = np.argsort(merged_n, kind="stable")
                self.nodes, self.roots = merged_n[order], merged_r[order]
            return len(self.nodes)
        if n_forest:
            m = self.nodes != self.roots
            parts.append(np.stack([self.roots[m], self.nodes[m]], axis=1))
            # keep isolated known nodes as self-edges so they stay known
            iso = ~m
            if iso.any():
                parts.append(np.stack([self.nodes[iso], self.nodes[iso]], axis=1))
            pairs = np.concatenate(parts)
        else:
            pairs = delta
        self.nodes, self.roots = numpy_cc(pairs)
        return len(self.nodes)

    def _current_roots_of(self, q: np.ndarray) -> np.ndarray:
        """Root per requested node against the current forest (unknown -> self)."""
        if not len(self.nodes):
            return q.astype(np.uint64)
        pos = np.searchsorted(self.nodes, q)
        pos_c = np.minimum(pos, len(self.nodes) - 1)
        found = self.nodes[pos_c] == q
        out = q.astype(np.uint64).copy()
        out[found] = self.roots[pos_c[found]]
        return out

    def lookup(self, nodes: np.ndarray) -> np.ndarray:
        """Current root per requested node (unknown nodes map to themselves)."""
        self.contract()
        return self._current_roots_of(nodes.astype(np.uint64))

    def _delta(self) -> tuple[np.ndarray, np.ndarray]:
        """(nodes, roots) whose root changed since the last exchange round
        (new nodes count as changed)."""
        if not len(self.nodes):
            return self.nodes, self.roots
        if not len(self.last_nodes):
            return self.nodes, self.roots
        pos = np.searchsorted(self.last_nodes, self.nodes)
        pos_c = np.minimum(pos, len(self.last_nodes) - 1)
        known = self.last_nodes[pos_c] == self.nodes
        same = known & (self.last_roots[pos_c] == self.roots)
        ch = ~same
        return self.nodes[ch], self.roots[ch]

    def exchange_round(self) -> tuple[int, list]:
        """One delta round: contract, then send (a) changed foreign pairs to
        their owners (with registration), (b) registration replies, and
        (c) changed owned roots to registered subscribers — all directly
        actor-to-actor.  Returns (pairs_sent, delivery_refs); the driver
        awaits the refs as the round barrier and stops when every actor sent
        zero pairs."""
        assert self.pool is not None, "set_pool() must run before exchange rounds"
        self.contract()
        ch_nodes, ch_roots = self._delta()
        self.last_nodes, self.last_roots = self.nodes.copy(), self.roots.copy()
        refs: list = []
        n_sent = 0
        if len(ch_nodes):
            owners = owner_of(ch_nodes, self.num_actors)
            for o in np.unique(owners):
                if int(o) == self.actor_id:
                    continue
                m = owners == o
                refs.append(
                    self.pool[int(o)].union_pairs.remote(
                        ch_nodes[m], ch_roots[m], register_from=self.actor_id
                    )
                )
                n_sent += int(m.sum())
        # registration replies: current roots for newly-subscribed nodes —
        # but ONLY where the owner's root improves on what the subscriber
        # itself sent (the contract() above already folded those pairs in,
        # so owner_root <= sent_root always; equal pairs carry zero
        # information and any later improvement flows through the interest
        # subscription).  Unfiltered replies were the dominant converge
        # traffic: 2.2M of 2.2M pairs in round 2 at 4M rows, pushing the
        # receiver's next contract past its incremental-path threshold.
        pending, self.pending_reply = self.pending_reply, {}
        for sub, arrs in pending.items():
            q = np.concatenate([n for n, _ in arrs])
            believed = np.concatenate([r for _, r in arrs])
            # per-node MIN believed root (a subscriber may repeat a node)
            order = np.lexsort((believed, q))
            q, believed = q[order], believed[order]
            first = np.r_[True, q[1:] != q[:-1]]
            q, believed = q[first], believed[first]
            cur = self._current_roots_of(q)
            send = cur < believed
            if send.any():
                refs.append(self.pool[sub].union_pairs.remote(q[send], cur[send]))
                n_sent += int(send.sum())
        # changed owned roots -> subscribers tracking them
        if len(ch_nodes) and self.interest:
            mine = owner_of(ch_nodes, self.num_actors) == self.actor_id
            if mine.any():
                mn, mr = ch_nodes[mine], ch_roots[mine]
                for sub, tracked in self.interest.items():
                    pos = np.searchsorted(tracked, mn)
                    pos_c = np.minimum(pos, len(tracked) - 1)
                    hit = len(tracked) > 0
                    sel = (tracked[pos_c] == mn) if hit else np.zeros(len(mn), bool)
                    if sel.any():
                        refs.append(self.pool[sub].union_pairs.remote(mn[sel], mr[sel]))
                        n_sent += int(sel.sum())
        return n_sent, refs

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

    def owned_dup_ids(self) -> np.ndarray:
        """Sorted owned node ids that are duplicates (root != node) — the
        merge stage's broadcast drop-set, built shard-side."""
        self.contract()
        if not len(self.nodes):
            return np.zeros(0, dtype=np.uint64)
        mine = owner_of(self.nodes, self.num_actors) == self.actor_id
        dups = self.nodes[mine & (self.nodes != self.roots)]
        return np.sort(dups)


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


def converge(actors: list, max_rounds: int = 50, stats: dict | None = None) -> None:
    """Run delta exchange rounds to the global fixpoint.  Per round, every
    actor contracts and fires its delta messages peer-to-peer; the driver
    only aggregates sent-pair counts and stops after a round where nothing
    moved anywhere."""
    ray.get([a.set_pool.remote(actors) for a in actors])
    sent_per_round: list[int] = []
    for _ in range(max_rounds):
        outs = ray.get([a.exchange_round.remote() for a in actors])
        ray.get([r for _, refs in outs for r in refs])  # delivery barrier
        total = sum(n for n, _ in outs)
        sent_per_round.append(total)
        if total == 0:
            break
    if stats is not None:
        stats["rounds"] = len(sent_per_round)
        stats["sent_per_round"] = sent_per_round


def converge_and_collect(actors: list, max_rounds: int = 50, stats: dict | None = None):
    """Converge, then collect the owned assignments as a Dataset — used by
    both ``cluster_edges`` and the fused ingest path."""
    converge(actors, max_rounds, stats)
    tables = [a.owned_assignments.remote() for a in actors]
    import ray.data as rd

    return rd.from_arrow_refs(tables).materialize()
