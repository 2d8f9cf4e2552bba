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
from ..stages.util import DEFAULT_PARTITIONS, partition_groupby

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


def _dedup_partition(b: pa.Table) -> pa.Table:
    u = b["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
    v = b["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
    pairs = np.unique(np.stack([u, v], axis=1), axis=0) if len(u) else np.zeros((0, 2), np.uint64)
    return pa.table(
        {"u": pa.array(pairs[:, 0], pa.uint64()), "v": pa.array(pairs[:, 1], pa.uint64())}
    )


def _dedup_uv(edges, cfg: DedupeConfig):
    return partition_groupby(
        edges, ["u", "v"], _dedup_partition, EDGE_SCHEMA,
        num_partitions=cfg.num_partitions,  # None -> input-sized (stages/util)
    )


def _star_partition(batch: pa.Table, large: bool) -> pa.Table:
    """Partition-granular star contraction, vectorised over every u in the
    partition (all rows of a given u are co-located by partition_groupby).
    Per u: m = min(neighbours ∪ {u}); large emits (nbr, m) for nbr > u,
    small for all nbrs plus u itself; self-loops dropped."""
    u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
    v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
    if len(u) == 0:
        return EDGE_SCHEMA.empty_table()
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    # drop duplicate (u, v) rows
    keep = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
    u, v = u[keep], v[keep]
    new_run = np.r_[True, u[1:] != u[:-1]]
    run_id = np.cumsum(new_run) - 1
    run_starts = np.flatnonzero(new_run)
    run_u = u[run_starts]
    m = np.minimum(v[run_starts], run_u)  # min neighbour is first v in the run
    if large:
        mask = v > u
        out_u, out_v = v[mask], m[run_id][mask]
    else:
        out_u = np.concatenate([v, run_u])
        out_v = np.concatenate([m[run_id], m])
    keep = out_u != out_v
    return pa.table(
        {"u": pa.array(out_u[keep], pa.uint64()), "v": pa.array(out_v[keep], pa.uint64())}
    )


def large_star(edges, cfg: DedupeConfig):
    """Reference E1 (workload/minhash_dedupe.py:279-316): symmetrize; per-u
    neighbourhood min (null-safe with u itself); emit (nbr, m) for nbr > u."""
    sym = symmetrize(edges)
    return partition_groupby(
        sym, ["u"], functools.partial(_star_partition, large=True), EDGE_SCHEMA,
        num_partitions=cfg.num_partitions,
    )


def small_star(edges, cfg: DedupeConfig):
    """Reference E2 (workload/minhash_dedupe.py:318-358): orient high->low,
    per-u min over smaller neighbours ∪ {u}; emit (nbr, m) for all nbrs and u.

    Note: the reference emits only the neighbours; emitting u as well (the
    published Kiveris et al. formulation) is a superset that never changes
    connectivity and keeps isolated chains attached — both converge to the
    same components (tests/test_cc.py pins the reference's 3-component graph).
    """
    def orient(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        hi, lo = np.maximum(u, v), np.minimum(u, v)
        m = hi != lo
        return pa.table({"u": pa.array(hi[m], pa.uint64()), "v": pa.array(lo[m], pa.uint64())})

    directed = edges.map_batches(orient, batch_format="pyarrow")
    return partition_groupby(
        directed, ["u"], functools.partial(_star_partition, large=False), EDGE_SCHEMA,
        num_partitions=cfg.num_partitions,
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


def pair_sets_equal(a, b, cfg: DedupeConfig, cols: tuple[str, str] = ("u", "v")) -> bool:
    """EXACT distributed set equality of two pair Datasets — the anti-join
    confirmation behind the fingerprint pre-check (SURVEY §2.E3; reference
    ``friction/connected_components.py:88-93`` counts anti-join rows, and
    ``workload/minhash_dedupe.py:379-385`` compares driver-side sets).  Both
    sides are hash-partitioned on the pair, each partition compares its
    co-located deduped shards, and the mismatch counts are summed — no pair
    set ever lands on the driver."""
    from ..stages.util import raw_cogroup_exchange

    c0, c1 = cols
    schema = pa.schema([("neq", pa.int64())])

    def arr(t: pa.Table | None, ca: str, cb: str) -> np.ndarray:
        if t is None or len(t) == 0:
            return np.zeros((0, 2), np.uint64)
        x = t[ca].to_numpy(zero_copy_only=False).astype(np.uint64)
        y = t[cb].to_numpy(zero_copy_only=False).astype(np.uint64)
        return np.unique(np.stack([x, y], axis=1), axis=0)

    def cmp(left: pa.Table | None, right: pa.Table | None) -> pa.Table:
        la = arr(left, c0, c1)
        rb = arr(right, c0, c1)
        eq = la.shape == rb.shape and np.array_equal(la, rb)
        return pa.table({"neq": pa.array([0 if eq else 1], pa.int64())})

    out = raw_cogroup_exchange(
        a, b, [c0, c1], [c0, c1], cmp, schema,
        cfg.num_partitions or DEFAULT_PARTITIONS,
    )
    return int(out.sum("neq")) == 0


def connected_components_dataframe(edges, cfg: DedupeConfig):
    """Edge Dataset (u, v), already distinct -> assignments Dataset (u, rep)
    with rep = global component min.  Driver loop per reference E4
    (workload/minhash_dedupe.py:507-557): 'alternating' = (large, small) per
    round; 'two_phase' = inner large-star fixed point, then one small-star.
    Followed by construct_assignments (E5) + global min-label propagation (E6).
    """
    algorithm = cfg.cc_algorithm if cfg.cc_algorithm != "union_find" else "alternating"
    b = canonicalize(edges).materialize()
    n_edges = b.count()
    if n_edges == 0:
        return b  # empty assignments
    if cfg.num_partitions is None:
        # size the per-round exchanges to the edge volume: a small graph on
        # 64 partitions pays hundreds of empty reduce tasks per round (the
        # loop runs several rounds, each with 2 exchanges + a convergence
        # check) for zero parallelism gain
        adaptive = max(1, min(DEFAULT_PARTITIONS, -(-n_edges // 50_000)))
        cfg = cfg.with_overrides(num_partitions=adaptive)

    prev_fp = None
    prev_b = None
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
        # fast fingerprint pre-check, then EXACT anti-join set equality of
        # consecutive rounds' edge sets (E3): a 2^-64 xor collision can never
        # terminate the loop early
        if fp == prev_fp and prev_b is not None and pair_sets_equal(
            _dedup_uv(canonicalize(prev_b), cfg), _dedup_uv(canonicalize(b), cfg), cfg
        ):
            break
        prev_fp = fp
        prev_b = b

    assignments = construct_assignments(b, cfg)
    return global_min_label_propagation(b, assignments, cfg)


def construct_assignments(b, cfg: DedupeConfig):
    """Reference E5 (workload/minhash_dedupe.py:388-421): every node in the
    edge set joined with its min neighbour; nodes without a smaller neighbour
    become their own representative.  The symmetrized partition-groupby
    covers every node on either side, subsuming the reference's nodes-union +
    left-join formulation; the per-u min is a vectorised run-min."""
    sym = symmetrize(b)

    def min_per_u(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(u) == 0:
            return ASSIGN_SCHEMA.empty_table()
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        rep = np.minimum(v[starts], u[starts])
        return pa.table(
            {"u": pa.array(u[starts], pa.uint64()), "rep": pa.array(rep, pa.uint64())}
        )

    return partition_groupby(
        sym, ["u"], min_per_u, ASSIGN_SCHEMA, num_partitions=cfg.num_partitions
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
        """Partition-vectorised: per node run, lab = min(label rows) else the
        node itself; forwarded to every peer and to the node."""
        node = batch["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(node) == 0:
            return ASSIGN_SCHEMA.empty_table()
        is_label = batch["is_label"].to_numpy(zero_copy_only=False)
        lab = batch["lab"].to_numpy(zero_copy_only=False).astype(np.uint64)
        peer = batch["peer"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # sort label rows first within each node so the run head carries lab-min
        sort_lab = np.where(is_label, lab, np.iinfo(np.uint64).max)
        order = np.lexsort((sort_lab, node))
        node, is_label, lab, peer = node[order], is_label[order], lab[order], peer[order]
        new_run = np.r_[True, node[1:] != node[:-1]]
        run_id = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        head_lab = np.where(is_label[starts], lab[starts], node[starts])
        row_lab = head_lab[run_id]
        edge_rows = ~is_label
        out_u = np.concatenate([peer[edge_rows], node[starts]])
        out_rep = np.concatenate([row_lab[edge_rows], head_lab])
        return pa.table(
            {"u": pa.array(out_u, pa.uint64()), "rep": pa.array(out_rep, pa.uint64())}
        )

    def min_label(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(u) == 0:
            return ASSIGN_SCHEMA.empty_table()
        rep = batch["rep"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((rep, u))
        u, rep = u[order], rep[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        return pa.table(
            {"u": pa.array(u[starts], pa.uint64()), "rep": pa.array(rep[starts], pa.uint64())}
        )

    # size the per-iteration exchanges once from the (materialized) edge
    # volume — the loop reuses P every round, so per-call measurement would
    # just repeat the same count
    P = cfg.num_partitions or max(1, min(DEFAULT_PARTITIONS, -(-sym.count() // 50_000)))
    edge_msgs = sym.map_batches(edges_as_msgs, batch_format="pyarrow").materialize()

    prev_fp = None
    prev_labels = None
    for _ in range(cfg.max_cc_iterations):
        msgs = edge_msgs.union(labels.map_batches(labels_as_msgs, batch_format="pyarrow"))
        forwarded = partition_groupby(msgs, ["node"], forward, ASSIGN_SCHEMA, num_partitions=P)
        labels = partition_groupby(
            forwarded, ["u"], min_label, ASSIGN_SCHEMA, num_partitions=P
        ).materialize()
        fp = edge_fingerprint(
            labels.map_batches(
                lambda b: pa.table({"u": b["u"], "v": b["rep"]}), batch_format="pyarrow"
            )
        )
        # fingerprint pre-check + exact set-equality confirmation (E3)
        if fp == prev_fp and prev_labels is not None and pair_sets_equal(
            prev_labels, labels, cfg, cols=("u", "rep")
        ):
            break
        prev_fp = fp
        prev_labels = labels
    return labels
