"""Dataframe-native connected components: alternating / two-phase star
contraction + global min-label propagation.

Conformance port of the reference's CC operator set (SURVEY.md §2.E;
``workload/minhash_dedupe.py:279-557``) expressed as Ray Data
groupby/map_groups/aggregate stages.  The union-find actor pool
(``state/dist_union_find.py``) is the primary engine; this path exists as the
relational fallback and as a cross-check — both must agree with the
pure-python oracle (tests/test_cc.py).

Differences from the reference, by design:
  * convergence is detected with a distributed fingerprint
    ``(count, xor of hash64(u, v))`` over the canonicalized edge set
    (variant precedent: ``references/daft_minhash.py:95-97``) instead of
    materialising both edge sets into driver Python sets
    (``workload/minhash_dedupe.py:379-385`` — a driver-memory hazard at
    scale, SURVEY.md §4);
  * each iteration is ``materialize()``d to cut lineage, mirroring the
    reference's eager ``.collect()`` behaviour.

Algorithm source: "Connected Components in MapReduce and Beyond"
(Kiveris et al.) — large-star / small-star, cited in the reference's
FRICTION_LOG.md:183.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from ..config import DedupeConfig
from ..hashing import hash64_int_pairs
from ..stages.util import ensure_schema

EDGE_SCHEMA = pa.schema([("u", pa.uint64()), ("v", pa.uint64())])
ASSIGN_SCHEMA = pa.schema([("u", pa.uint64()), ("rep", pa.uint64())])


def _swap(edges):
    return edges.map_batches(
        lambda b: pa.table({"u": b["v"], "v": b["u"]}), batch_format="pyarrow"
    )


def symmetrize(edges):
    """edges ∪ reversed(edges) — reference D5 (workload/minhash_dedupe.py:370-377)."""
    return edges.union(_swap(edges))


def canonicalize(edges):
    """Orient u < v, drop self-loops (reference D4,
    workload/minhash_dedupe.py:360-368).  Distinctness is handled by callers
    (fingerprints are xor-based and the star ops re-dedupe per group)."""

    def canon(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        m = lo != hi
        return pa.table({"u": pa.array(lo[m], pa.uint64()), "v": pa.array(hi[m], pa.uint64())})

    return edges.map_batches(canon, batch_format="pyarrow")


def _dedup_uv(edges, cfg: DedupeConfig):
    kwargs = {"num_partitions": cfg.num_partitions} if cfg.num_partitions else {}
    return ensure_schema(
        edges.groupby(["u", "v"], **kwargs).map_groups(
            lambda b: b.slice(0, 1), batch_format="pyarrow"
        ),
        EDGE_SCHEMA,
    )


def _star_group(batch: pa.Table, large: bool) -> pa.Table:
    """map_groups body shared by large/small star.  ``batch`` holds the full
    neighbourhood of one u (already directed appropriately by the caller).
    m = min(neighbours ∪ {u}); large emits (nbr, m) for nbr > u, small for all
    nbrs plus u itself; self-loops dropped."""
    u = int(batch["u"][0].as_py())
    v = np.unique(batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64))
    m = min(int(v.min()), u)
    if large:
        out_nodes = v[v > u]
    else:
        out_nodes = np.union1d(v, np.array([u], dtype=np.uint64))
    m_arr = np.full(len(out_nodes), m, dtype=np.uint64)
    keep = out_nodes != m_arr
    return pa.table(
        {"u": pa.array(out_nodes[keep], pa.uint64()), "v": pa.array(m_arr[keep], pa.uint64())}
    )


def large_star(edges, cfg: DedupeConfig):
    """Reference E1 (workload/minhash_dedupe.py:279-316): symmetrize; per-u
    neighbourhood min (null-safe with u itself); emit (nbr, m) for nbr > u."""
    kwargs = {"num_partitions": cfg.num_partitions} if cfg.num_partitions else {}
    sym = symmetrize(edges)
    return ensure_schema(
        sym.groupby("u", **kwargs).map_groups(
            functools.partial(_star_group, large=True), batch_format="pyarrow"
        ),
        EDGE_SCHEMA,
    )


def small_star(edges, cfg: DedupeConfig):
    """Reference E2 (workload/minhash_dedupe.py:318-358): orient high->low,
    per-u min over smaller neighbours ∪ {u}; emit (nbr, m) for all nbrs and u.

    Note: the reference emits only the neighbours; emitting u as well (the
    published Kiveris et al. formulation) is a superset that never changes
    connectivity and keeps isolated chains attached — both converge to the
    same components (tests/test_cc.py pins the reference's 3-component graph).
    """
    kwargs = {"num_partitions": cfg.num_partitions} if cfg.num_partitions else {}

    def orient(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        hi, lo = np.maximum(u, v), np.minimum(u, v)
        m = hi != lo
        return pa.table({"u": pa.array(hi[m], pa.uint64()), "v": pa.array(lo[m], pa.uint64())})

    directed = edges.map_batches(orient, batch_format="pyarrow")
    return ensure_schema(
        directed.groupby("u", **kwargs).map_groups(
            functools.partial(_star_group, large=False), batch_format="pyarrow"
        ),
        EDGE_SCHEMA,
    )


def edge_fingerprint(edges) -> tuple[int, int]:
    """(count, xor-of-pair-hashes) over the canonicalized edge set — a
    distributed stand-in for exact set equality (E3/E10).  Deduplication is
    unnecessary for equality checking only if both sides are deduped; star
    outputs are distinct per group but may repeat across groups, so callers
    compare fingerprints of deduped sets OR treat this as a fast pre-check."""

    def fp_batch(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = hash64_int_pairs(np.minimum(u, v), np.maximum(u, v))
        x = int(np.bitwise_xor.reduce(h)) if len(h) else 0
        return pa.table({"x": pa.array([x], pa.uint64()), "n": pa.array([len(u)], pa.int64())})

    # xor isn't a built-in aggregate; the per-batch partials are tiny (one row
    # per block), so folding them on the driver is safe at any scale
    parts = edges.map_batches(fp_batch, batch_format="pyarrow").to_pandas()
    x = 0
    for vx in parts["x"]:
        x ^= int(vx)
    return int(parts["n"].sum()), x


def connected_components_dataframe(edges, cfg: DedupeConfig):
    """Edge Dataset (u, v), already distinct -> assignments Dataset (u, rep)
    with rep = global component min.  Driver loop per reference E4
    (workload/minhash_dedupe.py:507-557): 'alternating' = (large, small) per
    round; 'two_phase' = inner large-star fixed point, then one small-star.
    Followed by construct_assignments (E5) + global min-label propagation (E6).
    """
    algorithm = cfg.cc_algorithm if cfg.cc_algorithm != "union_find" else "alternating"
    b = canonicalize(edges).materialize()
    if b.count() == 0:
        return b  # empty assignments

    prev_fp = None
    for _ in range(cfg.max_cc_iterations):
        if algorithm == "two_phase":
            inner_prev = None
            for _ in range(cfg.max_cc_iterations):
                b = _dedup_uv(large_star(b, cfg), cfg).materialize()
                fp = edge_fingerprint(b)
                if fp == inner_prev:
                    break
                inner_prev = fp
            b = _dedup_uv(small_star(b, cfg), cfg).materialize()
        else:
            b = _dedup_uv(large_star(b, cfg), cfg).materialize()
            b = _dedup_uv(small_star(b, cfg), cfg).materialize()
        fp = edge_fingerprint(canonicalize(b))
        if fp == prev_fp:
            break
        prev_fp = fp

    assignments = construct_assignments(b, cfg)
    return global_min_label_propagation(b, assignments, cfg)


def construct_assignments(b, cfg: DedupeConfig):
    """Reference E5 (workload/minhash_dedupe.py:388-421): every node in the
    edge set joined with its min neighbour; nodes without a smaller neighbour
    become their own representative."""
    kwargs = {"num_partitions": cfg.num_partitions} if cfg.num_partitions else {}
    sym = symmetrize(b)

    def min_per_group(batch: pa.Table) -> pa.Table:
        u = int(batch["u"][0].as_py())
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        rep = min(int(v.min()), u)
        return pa.table({"u": pa.array([u], pa.uint64()), "rep": pa.array([rep], pa.uint64())})

    # symmetrized groupby covers every node that appears on either side,
    # subsuming the reference's nodes-union + left-join formulation
    return ensure_schema(
        sym.groupby("u", **kwargs).map_groups(min_per_group, batch_format="pyarrow"),
        ASSIGN_SCHEMA,
    )


_MSG_SCHEMA = pa.schema(
    [("node", pa.uint64()), ("peer", pa.uint64()), ("lab", pa.uint64()), ("is_label", pa.bool_())]
)


def global_min_label_propagation(edges, assignments, cfg: DedupeConfig):
    """Reference E6 (workload/minhash_dedupe.py:429-505): iterative min-label
    diffusion until the (u, label) set stabilises — guarantees every label is
    the global component min (igraph parity), fixing residual local minima
    after star contraction.

    Expressed as a cogroup (one groupby per direction) instead of the
    reference's join: rows keyed by node carry either the node's current
    label or an adjacent edge; each group forwards its min label to every
    peer and to itself, then a min-aggregate produces the next labels.  This
    is the classic BSP min-label step and avoids ``Dataset.join`` entirely
    (whose hash-join backend mishandles empty partitions in Ray 2.49).
    """
    kwargs = {"num_partitions": cfg.num_partitions} if cfg.num_partitions else {}
    sym = symmetrize(edges).materialize()
    labels = assignments.materialize()

    def edges_as_msgs(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "node": b["u"].cast(pa.uint64()),
                "peer": b["v"].cast(pa.uint64()),
                "lab": pa.array(np.zeros(n, np.uint64), pa.uint64()),
                "is_label": pa.array(np.zeros(n, bool), pa.bool_()),
            }
        )

    def labels_as_msgs(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "node": b["u"].cast(pa.uint64()),
                "peer": pa.array(np.zeros(n, np.uint64), pa.uint64()),
                "lab": b["rep"].cast(pa.uint64()),
                "is_label": pa.array(np.ones(n, bool), pa.bool_()),
            }
        )

    def forward(batch: pa.Table) -> pa.Table:
        node = int(batch["node"][0].as_py())
        is_label = batch["is_label"].to_numpy(zero_copy_only=False)
        labs = batch["lab"].to_numpy(zero_copy_only=False).astype(np.uint64)[is_label]
        peers = batch["peer"].to_numpy(zero_copy_only=False).astype(np.uint64)[~is_label]
        lab = int(labs.min()) if len(labs) else node
        out_nodes = np.concatenate([peers, np.array([node], np.uint64)])
        return pa.table(
            {
                "u": pa.array(out_nodes, pa.uint64()),
                "rep": pa.array(np.full(len(out_nodes), lab, np.uint64), pa.uint64()),
            }
        )

    def min_label(batch: pa.Table) -> pa.Table:
        u = int(batch["u"][0].as_py())
        lab = batch["rep"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {"u": pa.array([u], pa.uint64()), "rep": pa.array([int(lab.min())], pa.uint64())}
        )

    edge_msgs = sym.map_batches(edges_as_msgs, batch_format="pyarrow").materialize()

    prev_fp = None
    for _ in range(cfg.max_cc_iterations):
        msgs = edge_msgs.union(labels.map_batches(labels_as_msgs, batch_format="pyarrow"))
        forwarded = ensure_schema(
            msgs.groupby("node", **kwargs).map_groups(forward, batch_format="pyarrow"),
            ASSIGN_SCHEMA,
        )
        labels = ensure_schema(
            forwarded.groupby("u", **kwargs).map_groups(min_label, batch_format="pyarrow"),
            ASSIGN_SCHEMA,
        ).materialize()
        fp = edge_fingerprint(
            labels.map_batches(
                lambda b: pa.table({"u": b["u"], "v": b["rep"]}), batch_format="pyarrow"
            )
        )
        if fp == prev_fp:
            break
        prev_fp = fp
    return labels
