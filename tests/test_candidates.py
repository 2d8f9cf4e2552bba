"""Candidate generation: star-edge semantics, salting-preserves-connectivity,
pHash Hamming verification (FIXTURES.md F3; reference
tests/test_minhash_dedupe_unit.py:282-300)."""

import numpy as np
import pyarrow as pa
import pytest

from daft_minhash_dedupe_ray.config import DedupeConfig
from daft_minhash_dedupe_ray.stages.candidates import (
    KIND_CAPTION,
    KIND_PHASH,
    _group_contract,
    candidate_edges,
)
from daft_minhash_dedupe_ray.state.union_find import connected_components_oracle


def _contract(keys, nodes, kinds=None, payloads=None, max_h=3, cross=True):
    keys = np.asarray(keys, np.uint64)
    nodes = np.asarray(nodes, np.uint64)
    kinds = (
        np.asarray(kinds, np.uint8) if kinds is not None else np.zeros(len(keys), np.uint8)
    )
    payloads = (
        np.asarray(payloads, np.uint64)
        if payloads is not None
        else np.zeros(len(keys), np.uint64)
    )
    eu, ev, reps = _group_contract(keys, nodes, kinds, payloads, max_h, cross)
    return set(zip(eu.tolist(), ev.tolist())), reps


def test_star_edges_pinned():
    # groups [[1,2,3],[4,5]] -> {(1,2),(1,3),(4,5)}, no self-loops
    edges, _ = _contract([10, 10, 10, 20, 20], [1, 2, 3, 4, 5])
    assert edges == {(1, 2), (1, 3), (4, 5)}


def test_singleton_groups_emit_nothing():
    edges, reps = _contract([1, 2, 3], [7, 8, 9])
    assert edges == set()
    assert len(reps) == 3  # but every key forwards a representative


def test_duplicate_rows_collapse():
    edges, reps = _contract([5, 5, 5], [1, 1, 2])
    assert edges == {(1, 2)}
    assert len(reps) == 1


def test_phash_verification_rejects_far_pairs():
    # same bucket, payloads at Hamming 2 and 64
    far = np.uint64(0xFFFFFFFFFFFFFFFF)
    edges, _ = _contract(
        [9, 9, 9],
        [1, 2, 3],
        kinds=[KIND_PHASH] * 3,
        payloads=[0b0000, 0b0011, int(far)],
        max_h=3,
    )
    assert edges == {(1, 2)}  # 3 (far payload) rejected


def test_phash_identical_payloads_star():
    edges, reps = _contract(
        [9, 9, 9], [3, 1, 2], kinds=[KIND_PHASH] * 3, payloads=[7, 7, 7]
    )
    assert edges == {(1, 2), (1, 3)}
    assert len(reps) == 1


@pytest.mark.parametrize("num_salts", [1, 4, 16])
def test_salting_preserves_connectivity(ray_session, num_salts):
    """The salted three-round plan must produce the same connected components
    as a direct per-key grouping, for any salt count."""
    import ray.data as rd

    rng = np.random.RandomState(7)
    n = 300
    keys = rng.randint(0, 40, n).astype(np.uint64)  # hot keys guaranteed
    nodes = np.arange(1000, 1000 + n).astype(np.uint64)
    cand = pa.table(
        {
            "node_id": pa.array(nodes, pa.uint64()),
            "band_key": pa.array(keys, pa.uint64()),
            "kind": pa.array(np.zeros(n, np.uint8), pa.uint8()),
            "payload": pa.array(np.zeros(n, np.uint64), pa.uint64()),
        }
    )
    cfg = DedupeConfig(num_salts=num_salts, batch_size=32)  # small batches: many combiners
    out = candidate_edges(rd.from_arrow(cand), cfg).to_pandas()
    got = connected_components_oracle(
        list(zip(out["u"].astype(np.uint64).astype(int), out["v"].astype(np.uint64).astype(int)))
    )
    # expected: direct grouping by key
    want_edges = []
    for k in np.unique(keys):
        members = nodes[keys == k]
        m = int(members.min())
        want_edges += [(m, int(x)) for x in members if int(x) != m]
    want = connected_components_oracle(want_edges)
    assert got == want


def test_mixed_kind_candidates_end_to_end(ray_session):
    """Caption + phash candidate rows for the same nodes union into one edge set."""
    import ray.data as rd

    cand = pa.table(
        {
            "node_id": pa.array([1, 2, 3, 4], pa.uint64()),
            "band_key": pa.array([100, 100, 200, 200], pa.uint64()),
            "kind": pa.array(
                [KIND_CAPTION, KIND_CAPTION, KIND_PHASH, KIND_PHASH], pa.uint8()
            ),
            "payload": pa.array([0, 0, 5, 4], pa.uint64()),  # Hamming(5,4)=1
        }
    )
    out = candidate_edges(rd.from_arrow(cand), DedupeConfig()).to_pandas()
    got = set(zip(out["u"].astype(int), out["v"].astype(int)))
    assert got == {(1, 2), (3, 4)}


def test_extreme_hot_caption_salted_vs_unsalted(ray_session):
    """Adversarial skew: 20% of rows share one caption.  The salted two-round
    path and the default single-shuffle path must produce identical clusters,
    and the hot group must not blow up the edge count (star edges are O(n))."""
    import ray.data as rd

    import pyarrow as pa_

    from daft_minhash_dedupe_ray.pipelines.dedupe import MinHashDedupePipeline

    rng = np.random.RandomState(3)
    vocab = [f"w{k}" for k in range(200)]
    hot = "the very same caption repeated across a fifth of the corpus verbatim"
    caps = [
        hot if rng.rand() < 0.2 else " ".join(rng.choice(vocab, 12))
        for _ in range(2000)
    ]
    t = pa_.table(
        {
            "image_id": pa_.array([f"i{k}" for k in range(2000)], pa_.string()),
            "caption": pa_.array(caps, pa_.string()),
        }
    )
    base = DedupeConfig(phash_col=None, batch_size=256)
    out_plain = MinHashDedupePipeline(base)(rd.from_arrow(t), num_actors=3).to_pandas()
    out_salted = MinHashDedupePipeline(base.with_overrides(num_salts=16))(
        rd.from_arrow(t), num_actors=3
    ).to_pandas()
    assert sorted(out_plain["image_id"]) == sorted(out_salted["image_id"])
    # the ~400 hot rows collapse to one representative
    kept_hot = sum(1 for c in out_plain["caption"] if c == hot)
    assert kept_hot == 1


def test_input_sized_exchange_partitions(ray_session):
    """Round-3 verdict item: exchange partition counts derive from the
    stream's measured rows (not a fixed 64) — 1 reduce task for a tiny
    stream, ROWS_PER_PARTITION-proportional growth, MAX_PARTITIONS cap."""
    import pyarrow as pa
    import ray.data as rd

    from daft_minhash_dedupe_ray.stages.util import (
        MAX_PARTITIONS,
        ROWS_PER_PARTITION,
        partition_groupby,
        sized_partitions,
    )

    assert sized_partitions(0) == 1
    assert sized_partitions(ROWS_PER_PARTITION) == 1
    assert sized_partitions(ROWS_PER_PARTITION + 1) == 2
    assert sized_partitions(10 * ROWS_PER_PARTITION) == 10
    # cap scales with the cluster: max(MAX_PARTITIONS, 8 x cluster CPUs) —
    # at this 4-CPU test session that is the single-node floor
    import ray

    cap = max(MAX_PARTITIONS, 8 * int(ray.cluster_resources().get("CPU", 0)))
    assert sized_partitions(10**12) == cap

    # fused band exchange sizing: coarse BAND_ROWS_PER_PARTITION target
    # (narrow rows; M x P shard-count economics) with a 2-tasks-per-CPU
    # parallelism floor that never over-splits small streams
    from daft_minhash_dedupe_ray.stages.util import (
        BAND_ROWS_PER_PARTITION,
        band_sized_partitions,
    )

    assert band_sized_partitions(0) == 1
    assert band_sized_partitions(1000) == 1  # tiny stream -> one reduce task

    # pin CONCRETE counts at fixed cluster sizes (not the formula restated):
    # monkeypatch the CPU probe so a regression in the floor/coarse interplay
    # actually fails (ADVICE r4)
    import daft_minhash_dedupe_ray.stages.util as util_mod

    real_cpus = util_mod._cluster_cpus
    try:
        util_mod._cluster_cpus = lambda: 32
        # 500k docs x 24 keys = 12M band rows: coarse asks for 8, the
        # 2-tasks/CPU floor feeds the 32-CPU cluster -> 48
        assert band_sized_partitions(12_000_000) == 48
        # 16M docs x 24 keys = 384M band rows: coarse target dominates -> 256
        assert band_sized_partitions(256 * BAND_ROWS_PER_PARTITION) == 256
        assert band_sized_partitions(10**13) == 1024  # capped at MAX_PARTITIONS
        util_mod._cluster_cpus = lambda: 4
        assert band_sized_partitions(12_000_000) == 8  # coarse >= tiny floor
        util_mod._cluster_cpus = lambda: 16384  # 256 nodes x 64 cores
        assert band_sized_partitions(10**13) == 8 * 16384  # cap grows w/ cluster
    finally:
        util_mod._cluster_cpus = real_cpus
    assert band_sized_partitions(10**13) == cap  # live-session cap unchanged

    ds = rd.from_arrow(
        pa.table({"k": pa.array(list(range(10)) * 3, pa.int64())})
    ).repartition(3)
    schema = pa.schema([("k", pa.int64()), ("n", pa.int64())])

    def count_per_key(t: pa.Table) -> pa.Table:
        import numpy as np

        k = t["k"].to_numpy(zero_copy_only=False)
        u, c = np.unique(k, return_counts=True)
        return pa.table({"k": pa.array(u, pa.int64()), "n": pa.array(c, pa.int64())})

    out = partition_groupby(ds, ["k"], count_per_key, schema)  # adaptive P
    assert out.num_blocks() == 1  # 30 rows -> ONE reduce task, not 64
    pdf = out.to_pandas()
    assert len(pdf) == 10 and (pdf["n"] == 3).all()
