"""Merge stage: apply cluster assignments back to the input table.

Reference semantics (``merge_results``, ``workload/minhash_dedupe.py:626-647``):
left-join docs with assignments on the id, keep rows where the component is
null (never clustered) OR equals the row's own id (the min-id representative
of its cluster), then drop the component column.

Because node ids are deterministic functions of the index column (see
``stages/signature.py``), the reference's two string-mapping joins
(``_assignments_back_to_strings``, ``workload/minhash_dedupe.py:616-624``)
vanish; the keep rule also simplifies: pre-filter assignments to true
duplicates (``rep != u``) and keep every input row with no match — one
anti-join instead of a left join + filter.

Strategy is size-aware: if the duplicate set is small it is broadcast via
``ray.put`` and applied as a vectorised mask inside ``map_batches`` (no
shuffle); otherwise a hash-partitioned ``Dataset.join`` does the anti-join at
scale.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray

from ..config import DedupeConfig
from .signature import NodeIdStage, node_ids_for

# below this many assignment rows, broadcast a sorted u64 drop-array instead
# of shuffling: 8 B/id (160 MB at the limit), ray.put once and zero-copy-read
# per node, while the cogroup anti-join must EXCHANGE the full-width input —
# payload bytes included — to co-locate it with the dup ids.  Single-node the
# two are a wash (both read-dominated: 9.3 vs 8.8 s at 16M docs / 7.9M
# assignments, same window); multi-node the broadcast avoids moving the
# corpus, so the limit is set by driver/worker heap, not by preference.
# Beyond it (billions of dups at 100 TB) the exact anti-join takes over.
BROADCAST_LIMIT = 20_000_000


def _broadcast_filter(batch: pa.Table, cfg: DedupeConfig, drop_ref) -> pa.Table:
    drop_sorted = ray.get(drop_ref) if isinstance(drop_ref, ray.ObjectRef) else drop_ref
    if len(drop_sorted) == 0 or len(batch) == 0:
        return batch
    nodes = node_ids_for(batch, cfg)
    # drop array is pre-sorted: probe via searchsorted (np.isin kind="sort"
    # would re-sort the drop side on every batch)
    idx = np.minimum(np.searchsorted(drop_sorted, nodes), len(drop_sorted) - 1)
    return batch.filter(pa.array(drop_sorted[idx] != nodes))


@ray.remote
def _dups_from_assign_blocks(*tables) -> np.ndarray:
    """Sorted duplicate-id array from assignment blocks — runs as a task so
    the assignments never land on the driver; the driver only holds the ref."""
    outs = []
    for t in tables:
        if t is None or len(t) == 0:
            continue
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        r = t["rep"].to_numpy(zero_copy_only=False).astype(np.uint64)
        outs.append(u[u != r])
    if not outs:
        return np.zeros(0, dtype=np.uint64)
    return np.sort(np.concatenate(outs))


def merge_keep(input_ds, assignments, cfg: DedupeConfig, num_partitions: int | None = None):
    """Input Dataset + assignments Dataset (u, rep) -> deduplicated Dataset
    (input schema unchanged; duplicates dropped, representatives kept)."""
    P = num_partitions or cfg.num_partitions  # None -> input-sized exchange
    # assignments is small relative to input (one row per clustered node);
    # counting it is metadata-cheap when materialized, and the duplicate set
    # is reduced to a broadcast drop-array inside a task when it fits the
    # broadcast budget
    n_assign = assignments.count()
    if n_assign == 0:
        return input_ds
    if n_assign <= BROADCAST_LIMIT:
        drop_ref = _dups_from_assign_blocks.remote(*assignments.to_arrow_refs())
        return input_ds.map_batches(
            functools.partial(_broadcast_filter, cfg=cfg, drop_ref=drop_ref),
            batch_format="pyarrow",
            batch_size=None,  # whole blocks: one UDF call per block, not 1024 rows
        )
    # at scale: exact hash-partitioned anti-join via the cogroup exchange
    # (ray.data.Dataset.join's hash backend mishandles empty partitions in
    # 2.49, so the engine's own exchange does the anti-join)
    from .util import raw_cogroup_exchange

    dups = assignments.filter(expr="u != rep").select_columns(["u"])
    with_ids = input_ds.map_batches(NodeIdStage(cfg), batch_format="pyarrow")
    # derive the output schema from the INPUT dataset, not with_ids: if Ray's
    # schema resolution ever surfaced a node_id-only guard block's schema from
    # the NodeIdStage map, out_schema would silently collapse to empty and the
    # anti-join path would emit empty tables — fail loudly instead
    in_schema = input_ds.schema()
    if in_schema is None or not in_schema.names:
        raise ValueError("merge_keep: input dataset has no resolvable schema")
    out_schema = pa.schema(
        [(n, t) for n, t in zip(in_schema.names, in_schema.types) if n != "node_id"]
    )

    def anti(left: pa.Table | None, right: pa.Table | None) -> pa.Table | None:
        if left is None:
            return None
        if right is None or len(right) == 0:
            return left.drop_columns(["node_id"])
        drop = np.unique(right["u"].to_numpy(zero_copy_only=False).astype(np.uint64))
        nodes = left["node_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = ~np.isin(nodes, drop, kind="sort")
        return left.filter(pa.array(keep)).drop_columns(["node_id"])

    return raw_cogroup_exchange(
        with_ids, dups, ["node_id"], ["u"], anti, out_schema, P
    )
