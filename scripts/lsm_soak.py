"""LSM absorb soak at bench scale (VERDICT r4 item 4's measurement half):
run IngestCorpus for enough fixed-size waves that the exact index's
per-partition delta count crosses _MAX_SEGMENTS and compaction fires
mid-loop, and record the per-wave wall — the claim under test is that wave
cost stays FLAT (absorb is O(wave), compaction amortised) instead of
growing with the corpus.

Waves are consecutive slices of the deterministic bench table (north-star
image+caption shape, planted dup clusters included — realistic overlap).

Usage: RAY_GRAFT_CPUS=32 GRAFT_SOAK_WAVES=24 GRAFT_SOAK_WAVE_ROWS=50000 \
           python scripts/lsm_soak.py
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_WAVES = int(os.environ.get("GRAFT_SOAK_WAVES", "24"))
WAVE_ROWS = int(os.environ.get("GRAFT_SOAK_WAVE_ROWS", "50000"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ROOT = os.environ.get("GRAFT_SOAK_ROOT", "/tmp/graft_lsm_soak")


def main() -> None:
    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow.parquet as pq
    import ray.data as rd

    from bench import host_membw_gbs, synth_path
    from daft_minhash_dedupe_ray.config import NORTH_STAR_CONFIG
    from daft_minhash_dedupe_ray.functions import incremental as inc
    from daft_minhash_dedupe_ray.pipelines.ingest import IngestCorpus
    from daft_minhash_dedupe_ray.state.dist_union_find import warm_uf_pool

    src = synth_path(N_WAVES * WAVE_ROWS)
    table = pq.read_table(src)
    shutil.rmtree(ROOT, ignore_errors=True)
    ic = IngestCorpus(ROOT, NORTH_STAR_CONFIG)
    n_uf = max(1, NUM_CPUS // 2)
    warm_uf_pool(n_uf)

    def delta_counts():
        return [
            len(glob.glob(os.path.join(d, "delta-*.parquet")))
            for d in glob.glob(os.path.join(ROOT, "exact_index", "part=*"))
        ]

    waves = []
    compactions = 0
    prev = []
    for w in range(N_WAVES):
        chunk = table.slice(w * WAVE_ROWS, WAVE_ROWS)
        probe = host_membw_gbs(3)
        t0 = time.perf_counter()
        e = ic.ingest(rd.from_arrow(chunk), num_actors=n_uf)
        wall = time.perf_counter() - t0
        cur = delta_counts()
        if prev and any(c < p for c, p in zip(sorted(cur), sorted(prev))):
            compactions += 1
        prev = cur
        waves.append(
            {
                "wave": w,
                "wall_s": round(wall, 2),
                "rows_kept": e["rows_kept"],
                "corpus_distinct": e["corpus_distinct"],
                "max_deltas": max(cur) if cur else 0,
                "membw_probe_gbs": probe,
            }
        )
        print(json.dumps(waves[-1]), file=sys.stderr)
    out = {
        "n_waves": N_WAVES,
        "wave_rows": WAVE_ROWS,
        "num_cpus": NUM_CPUS,
        "compaction_waves_observed": compactions,
        "max_segments": inc._MAX_SEGMENTS,
        "wave_walls": [x["wall_s"] for x in waves],
        "waves": waves,
    }
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
