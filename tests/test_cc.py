"""Connected components: pure union-find oracle pins (FIXTURES.md F3/F4),
distributed union-find actor pool vs oracle, dataframe star-contraction vs
oracle — the replacement for the reference's igraph parity validation
(workload/minhash_dedupe.py:559-614)."""

import numpy as np
import pyarrow as pa
import pytest

from daft_minhash_dedupe_ray.config import DedupeConfig
from daft_minhash_dedupe_ray.state.union_find import UnionFind, connected_components_oracle


def test_union_find_pinned_components():
    # reference graph [[1,2,3,4],[5,6],[7]] (tests/test_minhash_dedupe_unit.py:342-353)
    uf = UnionFind()
    for u, v in [(1, 2), (2, 3), (3, 4), (5, 6)]:
        uf.union(u, v)
    uf.add(7)
    a = uf.finalize()
    assert {k: a[k] for k in (1, 2, 3, 4)} == {1: 1, 2: 1, 3: 1, 4: 1}
    assert a[5] == 5 and a[6] == 5 and a[7] == 7


def test_union_find_chain_collapses_to_global_min():
    # F4 pin: chain 1-2-3-4 -> all labels 1 (ref :371-376)
    a = connected_components_oracle([(2, 1), (3, 2), (4, 3)])
    assert a == {1: 1, 2: 1, 3: 1, 4: 1}


def _edge_ds(ray, edges):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "u": pa.array([e[0] for e in edges], pa.uint64()),
                "v": pa.array([e[1] for e in edges], pa.uint64()),
            }
        )
    )


def _random_edges(seed, n_nodes=80, n_edges=70):
    rng = np.random.RandomState(seed)
    return [
        (int(a), int(b))
        for a, b in zip(rng.randint(0, n_nodes, n_edges), rng.randint(0, n_nodes, n_edges))
        if a != b
    ]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_distributed_union_find_matches_oracle(ray_session, seed):
    from daft_minhash_dedupe_ray.state.dist_union_find import cluster_edges

    edges = _random_edges(seed)
    want = connected_components_oracle(edges)
    out = cluster_edges(_edge_ds(ray_session, edges), num_actors=3).to_pandas()
    got = dict(zip(out["u"].astype(np.uint64).astype(int), out["rep"].astype(np.uint64).astype(int)))
    assert got == want


def test_distributed_union_find_adversarial_chain(ray_session):
    # long chain split across many batches/actors forces multi-round exchange
    from daft_minhash_dedupe_ray.state.dist_union_find import cluster_edges

    edges = [(i, i + 1) for i in range(200, 0, -1)]
    want = connected_components_oracle(edges)
    out = cluster_edges(_edge_ds(ray_session, edges), num_actors=4).to_pandas()
    got = dict(zip(out["u"].astype(np.uint64).astype(int), out["rep"].astype(np.uint64).astype(int)))
    assert got == want


@pytest.mark.parametrize("algo", ["alternating", "two_phase"])
def test_dataframe_cc_pinned_graph(ray_session, algo):
    from daft_minhash_dedupe_ray.state.cc_dataframe import connected_components_dataframe

    ds = _edge_ds(ray_session, [(1, 2), (2, 3), (3, 4), (5, 6)])
    out = connected_components_dataframe(ds, DedupeConfig(cc_algorithm=algo)).to_pandas()
    got = dict(zip(out["u"].astype(int), out["rep"].astype(int)))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}


def test_dataframe_cc_matches_oracle_random(ray_session):
    from daft_minhash_dedupe_ray.state.cc_dataframe import connected_components_dataframe

    edges = _random_edges(3, n_nodes=50, n_edges=45)
    want = connected_components_oracle(edges)
    out = connected_components_dataframe(
        _edge_ds(ray_session, edges), DedupeConfig(cc_algorithm="alternating")
    ).to_pandas()
    got = dict(zip(out["u"].astype(int), out["rep"].astype(int)))
    assert got == want


def test_empty_edges(ray_session):
    from daft_minhash_dedupe_ray.state.cc_dataframe import connected_components_dataframe
    from daft_minhash_dedupe_ray.state.dist_union_find import cluster_edges

    ds = _edge_ds(ray_session, [])
    assert cluster_edges(ds, num_actors=2).count() == 0
    assert connected_components_dataframe(ds, DedupeConfig()).count() == 0


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=0, max_size=120))
@settings(max_examples=60, deadline=None)
def test_numpy_cc_matches_union_find(edge_list):
    from daft_minhash_dedupe_ray.state.numpy_cc import numpy_cc

    edges = [(u, v) for u, v in edge_list if u != v]
    E = np.array(edges, dtype=np.uint64).reshape(-1, 2)
    nodes, roots = numpy_cc(E)
    got = dict(zip(nodes.tolist(), roots.tolist()))
    want = connected_components_oracle(edges)
    assert got == want


def test_contract_on_ingest_matches_oracle(ray_session):
    """Mid-ingest amortised contraction (contract_min_rows tiny so every
    few ingests trigger a fold — at production scale the trigger is 1.5M
    buffered rows) must leave converge with identical assignments."""
    import ray

    from daft_minhash_dedupe_ray.state.dist_union_find import (
        UnionFindActor,
        converge_and_collect,
        owner_of,
    )

    edges = _random_edges(7, n_nodes=300, n_edges=400)
    want = connected_components_oracle(edges)
    actors = [UnionFindActor.remote(i, 3, contract_min_rows=8) for i in range(3)]
    u = np.array([e[0] for e in edges], np.uint64)
    v = np.array([e[1] for e in edges], np.uint64)
    # route in small slices so the threshold fires many times mid-stream
    for s in range(0, len(u), 16):
        uu, vv = u[s : s + 16], v[s : s + 16]
        owners = owner_of(uu, 3)
        ray.get(
            [
                actors[o].ingest.remote(uu[owners == o], vv[owners == o])
                for o in np.unique(owners)
            ]
        )
    out = converge_and_collect(actors).to_pandas()
    got = dict(zip(out["u"].astype(np.uint64).astype(int), out["rep"].astype(np.uint64).astype(int)))
    assert got == want
