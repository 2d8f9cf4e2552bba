"""Round-2 additions: prefix-filtered Jaccard join, blocked/banded cosine,
delta union-find exchange, exact CC set-equality confirmation, winnowing
substring routing, interrupted checkpoint resume, IVF empty-cluster probes."""

import numpy as np
import pyarrow as pa
import pytest

from daft_minhash_dedupe_ray.config import DedupeConfig, NormalizeFlags


# --------------------------------------------------- word-Jaccard prefix filter


def test_jaccard_prefix_excludes_stopwords():
    """A token in every doc (max df) never lands in a prefix when docs have
    >= 5 tokens at t=0.8 — the O(df^2) stopword blowup is structurally gone."""
    from daft_minhash_dedupe_ray.functions.similarity import jaccard_prefix

    rng = np.random.RandomState(0)
    stop_hash = np.uint64(7)
    for n in (5, 8, 12, 30):
        h = np.sort(rng.randint(100, 2**60, n - 1).astype(np.uint64))
        h = np.sort(np.r_[h, stop_hash])
        df = np.where(h == stop_hash, 1000, rng.randint(1, 5, n)).astype(np.int64)
        pref = jaccard_prefix(h, df, 0.8)
        # prefix length bound: n - ceil(0.8 n) + 1 (<= 20% of tokens + 1)
        assert len(pref) == n - int(np.ceil(0.8 * n)) + 1
        assert stop_hash not in pref


def test_word_jaccard_stopword_fixture_matches_bruteforce(ray_session):
    """20%-stopword fixture: result matches a brute-force oracle exactly."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.similarity import word_jaccard_pairs

    rng = np.random.RandomState(1)
    vocab = [f"w{i}" for i in range(60)]
    stopwords = ["the", "of", "and"]  # appear in every doc
    docs = []
    for i in range(48):
        base = list(rng.choice(vocab, size=8, replace=False))
        docs.append(" ".join(stopwords + base))
    # planted near-dup pairs: drop one non-stop token (J = 10/12 > 0.8)
    for i in range(0, 12, 2):
        toks = docs[i].split()
        docs.append(" ".join(toks[:-1]))
    ids = list(range(len(docs)))

    def jac(a, b):
        sa, sb = set(a.split()), set(b.split())
        return len(sa & sb) / len(sa | sb)

    expect = {
        (i, j)
        for i in ids
        for j in ids
        if i < j and jac(docs[i], docs[j]) >= 0.8
    }
    assert expect, "fixture must contain true pairs"

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(docs, pa.string())})
    )
    out = word_jaccard_pairs(ds, threshold=0.8, text_col="text", id_col="doc_id").to_pandas()
    got = {(int(u), int(v)) for u, v in zip(out["u"], out["v"])}
    assert got == expect


def test_word_jaccard_correct_with_capped_df_table(ray_session):
    """Capping the df broadcast changes the token order, never the result."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.similarity import word_jaccard_pairs

    docs = ["a b c d e", "a b c d e f", "x y z w q", "x y z w q r s"]
    ids = [0, 1, 2, 3]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(docs, pa.string())})
    )
    full = word_jaccard_pairs(ds, 0.7, "text", "doc_id").to_pandas()
    capped = word_jaccard_pairs(ds, 0.7, "text", "doc_id", max_df_entries=2).to_pandas()
    key = lambda d: sorted(zip(d["u"], d["v"]))
    assert key(full) == key(capped) == [(0, 1), (2, 3)]


# --------------------------------------------------- blocked / banded cosine


def test_cosine_blocked_multi_tile_exact(ray_session):
    """Planted exact near-dup pairs recovered across many blocks (tests the
    cross-tile canonicalization and that nothing dataset-sized hits the
    driver path)."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.similarity import cosine_dup_pairs

    rng = np.random.RandomState(7)
    # tile count derives from cluster CPUs, not n, so this still exercises
    # multiple cross-id-space tiles at the test session's 4 CPUs
    n, d = 12_000, 32
    base = rng.randn(n, d)
    # plant near-dup pairs far apart in id space (cross-block pairs)
    planted = set()
    for k in range(100):
        i, j = k, n - 1 - k
        base[j] = base[i] + rng.randn(d) * 1e-3
        planted.add((i, j))
    ids = np.arange(n, dtype=np.int64)
    flat = pa.array(base.astype(np.float32).ravel(), pa.float32())
    vec = pa.FixedSizeListArray.from_arrays(flat, d)
    ds = rd.from_arrow(pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": vec}))
    out = cosine_dup_pairs(ds, threshold=0.999).to_pandas()
    got = {(int(u), int(v)) for u, v in zip(out["u"], out["v"])}
    assert got == planted


def test_cosine_lsh_banded_matches_exact(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.similarity import cosine_dup_pairs, lsh_params_for

    r, b = lsh_params_for(0.8)
    assert r >= 4 and b > 1  # AND-OR amplification actually on

    rng = np.random.RandomState(3)
    n, d = 600, 24
    base = rng.randn(n, d)
    for k in range(40):  # planted dups at sim ~0.95+
        base[n - 1 - k] = base[k] + rng.randn(d) * 0.05
    flat = pa.array(base.astype(np.float32).ravel(), pa.float32())
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(flat, d),
            }
        )
    )
    exact = cosine_dup_pairs(ds, threshold=0.8).to_pandas()
    lsh = cosine_dup_pairs(ds, threshold=0.8, force_lsh=True).to_pandas()
    key = lambda df: sorted(zip(df["u"], df["v"]))
    assert key(exact) == key(lsh)
    assert len(exact) >= 40


def test_embedding_dedupe_matches_oracle(ray_session):
    """Pairs -> union-find -> min-id survivor, vs a pure-python oracle."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.similarity import embedding_dedupe
    from daft_minhash_dedupe_ray.state.union_find import UnionFind

    rng = np.random.RandomState(11)
    n, d = 400, 16
    base = rng.randn(n, d)
    for k in range(30):  # planted duplicate chains: k ~ k+200 ~ (some) k+201
        base[k + 200] = base[k] + rng.randn(d) * 0.03
        if k % 3 == 0:
            base[k + 230] = base[k + 200] + rng.randn(d) * 0.03
    base = base.astype(np.float32).astype(np.float64)  # what the table stores
    en = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = en @ en.T
    uf = UnionFind()
    for i in range(n):
        uf.find(i)
    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= 0.95:
                uf.union(i, j)
    comps: dict[int, list[int]] = {}
    for i in range(n):
        comps.setdefault(uf.find(i), []).append(i)
    expect = sorted(min(m) for m in comps.values())

    flat = pa.array(base.astype(np.float32).ravel(), pa.float32())
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(flat, d),
            }
        )
    )
    out = embedding_dedupe(ds, threshold=0.95, num_actors=3)
    got = sorted(out.select_columns(["vec_id"]).to_pandas()["vec_id"])
    assert got == expect


# --------------------------------------------------- delta union-find exchange


def test_exchange_delta_traffic_and_parity(ray_session):
    import ray

    from daft_minhash_dedupe_ray.state.dist_union_find import (
        converge,
        converge_and_collect,
        get_uf_pool,
        owner_of,
    )

    actors = get_uf_pool(4)
    ray.get([a.reset.remote() for a in actors])
    # chain graph 0-1-2-...-499 ingested as per-owner routed edges
    u = np.arange(0, 499, dtype=np.uint64)
    v = u + np.uint64(1)
    owners = owner_of(u, 4)
    for o in range(4):
        m = owners == o
        ray.get(actors[o].ingest.remote(u[m], v[m]))
    stats: dict = {}
    assign = converge_and_collect(actors, stats=stats).to_pandas()
    assert (assign["rep"] == 0).all() and len(assign) == 500
    assert stats["sent_per_round"][-1] == 0
    # already-converged pool: one zero-traffic confirmation round only
    stats2: dict = {}
    converge(actors, stats=stats2)
    assert stats2["sent_per_round"] == [0]
    # delta property: an incremental edge into a converged pool costs traffic
    # proportional to the change, not O(known nodes) per round
    nu = np.array([600], dtype=np.uint64)
    nv = np.array([0], dtype=np.uint64)
    ray.get(actors[int(owner_of(nu, 4)[0])].ingest.remote(nu, nv))
    stats3: dict = {}
    converge(actors, stats=stats3)
    assert sum(stats3["sent_per_round"]) <= 20
    # and the new node resolved to the component min
    import ray.data as rd  # noqa: F401

    from daft_minhash_dedupe_ray.state.dist_union_find import converge_and_collect as cac

    assign2 = cac(actors).to_pandas()
    assert int(assign2.loc[assign2["u"] == 600, "rep"].iloc[0]) == 0


# ------------------------------------------- exact CC set-equality confirmation


def test_pair_sets_equal(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.state.cc_dataframe import pair_sets_equal

    cfg = DedupeConfig(num_partitions=8)
    t1 = pa.table(
        {"u": pa.array([1, 2, 3], pa.uint64()), "v": pa.array([4, 5, 6], pa.uint64())}
    )
    t2 = pa.table(
        {"u": pa.array([3, 1, 2], pa.uint64()), "v": pa.array([6, 4, 5], pa.uint64())}
    )
    t3 = pa.table(
        {"u": pa.array([1, 2, 3], pa.uint64()), "v": pa.array([4, 5, 7], pa.uint64())}
    )
    assert pair_sets_equal(rd.from_arrow(t1), rd.from_arrow(t2), cfg)
    assert not pair_sets_equal(rd.from_arrow(t1), rd.from_arrow(t3), cfg)
    # duplicates on one side don't break set semantics
    t1dup = pa.concat_tables([t1, t1])
    assert pair_sets_equal(rd.from_arrow(t1dup), rd.from_arrow(t2), cfg)


def test_cc_survives_colliding_fingerprint(ray_session, monkeypatch):
    """Simulated xor-collision: with the fingerprint forced constant, the
    exact anti-join confirmation must keep iterating until true convergence
    (E3's 'fingerprint pre-check BEFORE exact compare')."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.state import cc_dataframe as cc

    monkeypatch.setattr(cc, "edge_fingerprint", lambda edges: (0, 0))
    cfg = DedupeConfig(cc_algorithm="alternating", num_partitions=2)
    # chain: needs more than one star round to collapse
    u = np.arange(1, 10, dtype=np.uint64)
    edges = rd.from_arrow(
        pa.table({"u": pa.array(u, pa.uint64()), "v": pa.array(u + 1, pa.uint64())})
    )
    assign = cc.connected_components_dataframe(edges, cfg).to_pandas()
    assert (assign["rep"] == 1).all()
    assert set(assign["u"]) == set(range(1, 11))


# --------------------------------------------------- winnowing substring routing


def test_substring_partitioned_interior_containment(ray_session):
    """Mid-string containments (neither prefix nor suffix) are found by the
    winnowing-anchor routing — the round-1 first/last/min routing's
    documented recall gap."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.substring import substring_dup_pairs

    cfg = DedupeConfig(
        index_col="doc_id",
        content_col="text",
        phash_col=None,
        normalize=NormalizeFlags(False, False, False, False),
    )
    rng = np.random.RandomState(5)
    vocab = [f"tok{i}" for i in range(400)]

    def sent(n):
        return " ".join(rng.choice(vocab, size=n))

    docs = []
    for i in range(12):
        docs.append(sent(40))
    # interior containments: doc i's middle span becomes its own doc
    expect = set()
    for i in range(6):
        toks = docs[i].split()
        inner = " ".join(toks[13 : 13 + 18])  # strictly interior, 18 tokens
        docs.append(inner)
        expect.add((i, len(docs) - 1))
    ids = list(range(len(docs)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(docs, pa.string())})
    ds = rd.from_arrow(t)

    from daft_minhash_dedupe_ray.stages.signature import node_ids_for

    nodes = node_ids_for(t, cfg)
    idx = {int(n): i for i, n in enumerate(nodes)}

    def pairs(out):
        pdf = out.to_pandas()
        return {
            tuple(sorted((idx[int(np.uint64(u))], idx[int(np.uint64(v))])))
            for u, v in zip(pdf["u"].astype(np.uint64), pdf["v"].astype(np.uint64))
        }

    exact = pairs(substring_dup_pairs(ds, cfg, exact=True))
    part = pairs(substring_dup_pairs(ds, cfg, exact=False))
    assert expect <= exact
    assert part == exact


# --------------------------------------------------- interrupted checkpoint resume


def test_checkpoint_interrupted_after_edges_resumes(ray_session, tmp_path):
    import ray.data as rd

    from daft_minhash_dedupe_ray.pipelines.dedupe import MinHashDedupePipeline
    from daft_minhash_dedupe_ray.sources.io import CheckpointManager
    from daft_minhash_dedupe_ray.synth import generate_table

    t = generate_table(300, seed=11, with_images=False)
    cfg = DedupeConfig()
    pipe = MinHashDedupePipeline(cfg)
    root = str(tmp_path / "ck")

    # clean full run for the expected survivor set
    expected = sorted(
        pipe.run_with_checkpoints(rd.from_arrow(t), str(tmp_path / "ref"), num_actors=2)[0]
        .select_columns(["image_id"])
        .to_pandas()["image_id"]
    )

    # "crash" after the edges stage: only the edges checkpoint exists
    ckpt = CheckpointManager(root)
    edge_calls = []

    def compute_edges():
        edge_calls.append(1)
        return pipe.edges(pipe.prep(rd.from_arrow(t)))

    ckpt.run("edges", cfg, compute_edges)
    assert edge_calls == [1]

    # resume: edges restored (not recomputed), assignments computed, output matches
    real_edges = pipe.edges

    def counting_edges(ds):
        edge_calls.append(1)
        return real_edges(ds)

    pipe.edges = counting_edges
    out, _ = pipe.run_with_checkpoints(rd.from_arrow(t), root, num_actors=2)
    got = sorted(out.select_columns(["image_id"]).to_pandas()["image_id"])
    assert edge_calls == [1], "edges stage must restore from checkpoint, not recompute"
    assert got == expected


# --------------------------------------------------- IVF empty-cluster handling


def test_ivf_more_clusters_than_points(ray_session, tmp_path):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.similarity import build_ivf_index, ivf_topk

    rng = np.random.RandomState(9)
    n, d = 20, 8
    emb = rng.randn(n, d).astype(np.float32)
    flat = pa.array(emb.ravel(), pa.float32())
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(flat, d),
            }
        )
    )
    path = str(tmp_path / "ivf")
    build_ivf_index(ds, path, n_clusters=16)
    out = ivf_topk(path, emb[:1].astype(np.float64), k=5, nprobe=3).to_pandas()
    assert len(out) == 5
    assert out.iloc[0]["vec_id"] == 0  # the query vector itself is its own top-1


def test_ann_topk_empty_dataset(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.similarity import ann_topk

    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        }
    )
    out = ann_topk(rd.from_arrow(empty), np.zeros((1, 4)), k=3)
    assert len(out) == 0
