"""Planted-skew stress (VERDICT r4 item 2): the at-scale measurement the
Spark ancestor's bottleneck comment calls for
(references/chengmao_minhash_spark.py:464).

Input: the bench's deterministic 4M-row image+caption table with 20% of the
rows' captions overwritten by ONE identical caption — an adversarially hot
band key on every caption band (800k rows share all 16 band keys).

Runs, all on the same cached input in one Ray session (32 CPUs):

1. modular path, num_salts=1   — the batch combiner is the only skew defense
2. modular path, num_salts=8   — salted keys + chain round
3. fused path (default config) — the throughput path's combiner + one-pass
   exchange

Asserts all three produce the IDENTICAL assignment set (salting changes the
edge set, never the components), prints one JSON line with walls + parity,
and is the artifact behind the BASELINE.md skew section.

Usage: RAY_GRAFT_CPUS=32 python scripts/skew_stress.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(os.environ.get("GRAFT_SKEW_ROWS", "4000000"))
HOT_EVERY = 5  # rows with index % 5 == 0 (20%) share one caption
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
HOT_CAPTION = (
    "breaking this exact viral caption was reposted verbatim across a fifth "
    "of the entire corpus by every aggregator account overnight"
)


def build_input() -> str:
    from bench import synth_path

    base = synth_path(N_ROWS)
    p = os.path.join("/tmp/graft_synth_cache", f"skew{HOT_EVERY}_{N_ROWS}.parquet")
    if os.path.exists(p):
        return p
    t = pq.read_table(base)
    caps = t["caption"].to_pylist()
    for i in range(0, len(caps), HOT_EVERY):
        caps[i] = HOT_CAPTION
    t = t.set_column(
        t.schema.get_field_index("caption"), "caption", pa.array(caps, pa.string())
    )
    pq.write_table(t, p + ".tmp", row_group_size=16384)
    os.rename(p + ".tmp", p)
    return p


def assign_fingerprint(assign_ds) -> tuple[int, int, int]:
    """(n_rows, xor-hash, n_components) of the (u, rep) assignment set —
    order-independent identity."""
    from daft_minhash_dedupe_ray.hashing import splitmix64

    n = 0
    acc = np.uint64(0)
    reps = []
    for b in assign_ds.iter_batches(batch_format="pyarrow"):
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        r = b["rep"].to_numpy(zero_copy_only=False).astype(np.uint64)
        acc ^= np.bitwise_xor.reduce(splitmix64(splitmix64(u) ^ r)) if len(u) else np.uint64(0)
        n += len(u)
        reps.append(np.unique(r))
    n_comp = len(np.unique(np.concatenate(reps))) if reps else 0
    return n, int(acc), n_comp


def main() -> None:
    import ray

    path = build_input()
    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from bench import host_membw_gbs
    from dataclasses import replace

    from daft_minhash_dedupe_ray.config import NORTH_STAR_CONFIG
    from daft_minhash_dedupe_ray.pipelines.dedupe import MinHashDedupePipeline
    from daft_minhash_dedupe_ray.state.dist_union_find import warm_uf_pool

    rd.read_parquet(path).count()  # page-cache warm
    n_uf = max(1, NUM_CPUS // 2)
    warm_uf_pool(n_uf)

    out: dict = {"n_rows": N_ROWS, "hot_fraction": 1.0 / HOT_EVERY, "num_cpus": NUM_CPUS}
    results = {}
    for name, cfg, fused in [
        ("modular_unsalted", NORTH_STAR_CONFIG, False),
        ("modular_salted8", replace(NORTH_STAR_CONFIG, num_salts=8), False),
        ("fused_default", NORTH_STAR_CONFIG, True),
    ]:
        probe = host_membw_gbs(3)
        pipe = MinHashDedupePipeline(cfg)
        ds = rd.read_parquet(path)
        t0 = time.perf_counter()
        if fused:
            _out_ds, assign, report = pipe.run_fused(
                ds, num_actors=n_uf, materialize_output=False
            )
            survivors = report.rows_after
            wall = time.perf_counter() - t0
        else:
            prepped = pipe.prep(ds)
            edges = pipe.edges(prepped)
            assign = pipe.assignments(edges, num_actors=n_uf).materialize()
            survivors = pipe.merge(ds, assign).count()
            wall = time.perf_counter() - t0
        n, h, n_comp = assign_fingerprint(assign)
        results[name] = {
            "wall_s": round(wall, 2),
            "membw_probe_gbs": probe,
            "survivors": survivors,
            "n_assigned": n,
            "assign_hash": h,
            "n_components": n_comp,
        }
    out["runs"] = results
    fps = {(r["n_assigned"], r["assign_hash"], r["survivors"]) for r in results.values()}
    out["parity"] = len(fps) == 1
    ray.shutdown()
    print(json.dumps(out))
    if not out["parity"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
