"""Merge keep-semantics (FIXTURES.md F5; reference
tests/test_minhash_dedupe_unit.py:388-394, 492-498)."""

import numpy as np
import pyarrow as pa

from daft_minhash_dedupe_ray.config import DedupeConfig
from daft_minhash_dedupe_ray.stages.merge import merge_keep
from daft_minhash_dedupe_ray.stages.signature import node_ids_for


def _docs_cfg():
    return DedupeConfig(index_col="block_id", content_col="block_text", phash_col=None)


def test_merge_keep_semantics(ray_session):
    import ray.data as rd

    cfg = _docs_cfg()
    t = pa.table(
        {
            "block_id": pa.array(["a", "b", "c"], pa.string()),
            "block_text": pa.array(["ta", "tb", "tc"], pa.string()),
        }
    )
    nodes = node_ids_for(t, cfg)
    # b is a duplicate of a; c unassigned
    assignments = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([nodes[0], nodes[1]], pa.uint64()),
                "rep": pa.array([nodes[0], nodes[0]], pa.uint64()),
            }
        )
    )
    out = merge_keep(rd.from_arrow(t), assignments, cfg).to_pandas()
    assert sorted(out["block_id"]) == ["a", "c"]
    assert list(out.columns) == ["block_id", "block_text"]  # schema unchanged


def test_merge_empty_assignments_keeps_all(ray_session):
    import ray.data as rd

    cfg = _docs_cfg()
    t = pa.table(
        {
            "block_id": pa.array(["a", "b"], pa.string()),
            "block_text": pa.array(["x", "y"], pa.string()),
        }
    )
    empty = rd.from_arrow(
        pa.table({"u": pa.array([], pa.uint64()), "rep": pa.array([], pa.uint64())})
    )
    out = merge_keep(rd.from_arrow(t), empty, cfg).to_pandas()
    assert sorted(out["block_id"]) == ["a", "b"]


def test_merge_scale_path_cogroup_anti_join(ray_session, monkeypatch):
    """Force the at-scale exact anti-join (cogroup exchange) path."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.stages import merge as M

    monkeypatch.setattr(M, "BROADCAST_LIMIT", 0)
    cfg = _docs_cfg()
    t = pa.table(
        {
            "block_id": pa.array([f"b{k}" for k in range(50)], pa.string()),
            "block_text": pa.array([f"text {k}" for k in range(50)], pa.string()),
        }
    )
    nodes = node_ids_for(t, cfg)
    # drop every odd row
    drops = [int(nodes[k]) for k in range(1, 50, 2)]
    assignments = rd.from_arrow(
        pa.table(
            {
                "u": pa.array(drops + [int(nodes[0])], pa.uint64()),
                "rep": pa.array([int(nodes[0])] * len(drops) + [int(nodes[0])], pa.uint64()),
            }
        )
    )
    out = M.merge_keep(rd.from_arrow(t), assignments, cfg).to_pandas()
    assert sorted(out["block_id"]) == sorted(f"b{k}" for k in range(0, 50, 2))
    assert sorted(out.columns) == ["block_id", "block_text"]
