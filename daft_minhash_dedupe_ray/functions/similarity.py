"""Similarity / dedup operator family beyond MinHash (SURVEY.md extras):

  * exact dedup (content-hash partition + per-group min-id keep)
  * brute-force cosine top-k ANN (broadcast query matrix, per-batch matmul)
  * LSH-bucketed cosine near-dup pairs (random-hyperplane buckets + verify)
  * SimHash near-dup (Hamming-banded, verified — reuses the pHash machinery)
  * exact word-set Jaccard similarity join (token inverted index)

Each distributed step is a ``map_batches``/``groupby`` composition; small
sides (query matrices, doc-size maps) are broadcast once with ``ray.put``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..config import DedupeConfig
from ..hashing import hash64_str_array, simhash64, splitmix64
from ..stages.candidates import KIND_PHASH, candidate_edges
from ..stages.util import ensure_schema, partition_groupby


# ------------------------------------------------------------- exact dedup


def exact_dedup(ds, text_col: str, id_col: str):
    """Exact duplicate removal: hash-partition on the content hash, keep the
    min-id row per group.  Two-level: per-batch local dedup first (combiner),
    then the global groupby over survivors only."""

    def add_hash(b: pa.Table) -> pa.Table:
        h = hash64_str_array(b[text_col].to_pylist())
        t = b.append_column("__h__", pa.array(h, pa.uint64()))
        # local combine: keep min-id row per hash within the batch
        import pyarrow.compute as pc

        idx = pc.sort_indices(t, sort_keys=[("__h__", "ascending"), (id_col, "ascending")])
        t = t.take(idx)
        hh = t["__h__"].to_numpy(zero_copy_only=False)
        first = np.r_[True, hh[1:] != hh[:-1]]
        return t.filter(pa.array(first))

    local = ds.map_batches(add_hash, batch_format="pyarrow")
    in_schema = pa.schema(
        list(zip(ds.schema().names, ds.schema().types)) + [("__h__", pa.uint64())]
    )

    def keep_min(b: pa.Table) -> pa.Table:
        # partition-vectorised: min-id row per hash run
        import pyarrow.compute as pc

        if len(b) == 0:
            return in_schema.empty_table()
        idx = pc.sort_indices(b, sort_keys=[("__h__", "ascending"), (id_col, "ascending")])
        b = b.take(idx)
        hh = b["__h__"].to_numpy(zero_copy_only=False)
        first = np.r_[True, hh[1:] != hh[:-1]]
        return b.filter(pa.array(first))

    out = partition_groupby(local, ["__h__"], keep_min, in_schema)
    return out.drop_columns(["__h__"])


# ------------------------------------------------------ brute-force ANN topk


def ann_topk(ds, query_vectors: np.ndarray, k: int, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k of each query against the whole dataset.

    Baseline path (SURVEY.md "similarity search"): queries are broadcast once
    via ``ray.put``; every batch does one float64 matmul and emits its local
    top-k per query; the driver merges the tiny per-batch candidate sets.
    Returns a pyarrow Table (query_idx, vec_id, cos_sim) sorted by
    (query_idx, -cos_sim, vec_id).
    """
    q = np.asarray(query_vectors, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put(qn)

    def local_topk(b: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        emb = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        en = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        sims = qm @ en.T  # (n_q, n_batch)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = []
        for qi in range(sims.shape[0]):
            for j in part[qi]:
                rows.append((qi, int(ids[j]), float(sims[qi, j])))
        arr = np.array(rows, dtype=object)
        return pa.table(
            {
                "query_idx": pa.array([r[0] for r in rows], pa.int64()),
                id_col: pa.array([r[1] for r in rows], pa.int64()),
                "cos_sim": pa.array([r[2] for r in rows], pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = []
    for qi, grp in cand.groupby("query_idx"):
        grp = grp.sort_values(["cos_sim", id_col], ascending=[False, True]).head(k)
        out.append(grp)
    import pandas as pd

    merged = pd.concat(out).reset_index(drop=True)
    return pa.Table.from_pandas(merged, preserve_index=False)


# ------------------------------------------- cosine near-dup pair detection


def cosine_dup_pairs(
    ds,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 0,
    seed: int = 42,
):
    """All pairs (u < v) with cosine similarity >= threshold.

    ``n_planes == 0``: exact path — the (normalised) matrix is broadcast and
    each batch verifies its rows against the full set (O(n^2) flops spread
    over batches; right for <= ~10^5 rows).  ``n_planes > 0``: scale path —
    random-hyperplane signatures bucket the vectors first (cosine LSH) and
    only bucket-mates are verified, trading recall for scale; recall for
    pairs at angle θ is 1-(1-(1-θ/π)^n_planes)^... per standard SimHash LSH.
    """
    if n_planes > 0:
        return _cosine_pairs_lsh(ds, threshold, vec_col, id_col, n_planes, seed)

    tbl = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = tbl[id_col].to_numpy()
    emb_all = np.asarray(list(tbl[vec_col]), dtype=np.float64)
    en_all = emb_all / np.maximum(np.linalg.norm(emb_all, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, en_all))

    def verify(b: pa.Table) -> pa.Table:
        ids_a, en_a = ray.get(ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        emb = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        en = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        sims = en @ en_a.T
        bi, aj = np.nonzero(sims >= threshold)
        u = ids[bi]
        v = ids_a[aj]
        keep = u < v  # each unordered pair exactly once
        return pa.table(
            {
                "u": pa.array(u[keep].astype(np.int64), pa.int64()),
                "v": pa.array(v[keep].astype(np.int64), pa.int64()),
                "cos_sim": pa.array(sims[bi, aj][keep], pa.float64()),
            }
        )

    return ds.map_batches(verify, batch_format="pyarrow")


def _cosine_pairs_lsh(ds, threshold, vec_col, id_col, n_planes, seed):
    """Scale path: bucket by random-hyperplane sign pattern, verify inside
    buckets via groupby.  Pairs in different buckets are missed (documented
    LSH recall tradeoff); identical vectors always share a bucket."""

    def bucket(b: pa.Table) -> pa.Table:
        emb = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        rng = np.random.RandomState(seed)
        planes = rng.randn(emb.shape[1], n_planes)
        signs = (emb @ planes) > 0
        key = np.zeros(len(emb), dtype=np.uint64)
        for j in range(n_planes):
            key = (key << np.uint64(1)) | signs[:, j].astype(np.uint64)
        return pa.table(
            {
                id_col: b[id_col],
                "__bucket__": pa.array(splitmix64(key), pa.uint64()),
                vec_col: b[vec_col],
            }
        )

    schema = pa.schema([("u", pa.int64()), ("v", pa.int64()), ("cos_sim", pa.float64())])

    def verify_partition(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return schema.empty_table()
        buckets = b["__bucket__"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        emb = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        en = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        order = np.argsort(buckets, kind="stable")
        buckets, ids, en = buckets[order], ids[order], en[order]
        starts = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1]])
        ends = np.r_[starts[1:], len(buckets)]
        us, vs, cs = [], [], []
        for s0, e0 in zip(starts, ends):  # vectorised matmul per bucket run
            if e0 - s0 < 2:
                continue
            sub = en[s0:e0]
            sims = sub @ sub.T
            ii, jj = np.triu_indices(e0 - s0, k=1)
            ok = sims[ii, jj] >= threshold
            a, c = ids[s0:e0][ii[ok]], ids[s0:e0][jj[ok]]
            us.append(np.minimum(a, c))
            vs.append(np.maximum(a, c))
            cs.append(sims[ii[ok], jj[ok]])
        if not us:
            return schema.empty_table()
        return pa.table(
            {
                "u": pa.array(np.concatenate(us).astype(np.int64), pa.int64()),
                "v": pa.array(np.concatenate(vs).astype(np.int64), pa.int64()),
                "cos_sim": pa.array(np.concatenate(cs), pa.float64()),
            }
        )

    return partition_groupby(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["__bucket__"],
        verify_partition,
        schema,
    )


# -------------------------------------------------------------- SimHash dedup


def simhash_candidates(ds, cfg: DedupeConfig, text_col: str, id_col: str):
    """SimHash near-dup candidate edges: 64-bit SimHash per doc, banded into
    Hamming buckets and verified — reusing the pHash sub-band + verify
    machinery (the kind=KIND_PHASH path of the candidate stages)."""
    from ..hashing import phash_band_keys
    from ..stages.signature import node_ids_for

    def sim_batch(b: pa.Table) -> pa.Table:
        cfg_local = cfg
        ids = b[id_col]
        if pa.types.is_string(ids.type):
            nodes = hash64_str_array(ids.to_pylist())
        else:
            nodes = ids.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        sh = simhash64(b[text_col].to_pylist(), ngram_size=1)
        keys = phash_band_keys(sh.view(np.int64), cfg_local.phash_bands)
        nb = cfg_local.phash_bands
        return pa.table(
            {
                "node_id": pa.array(np.repeat(nodes, nb), pa.uint64()),
                "band_key": pa.array(keys.reshape(-1), pa.uint64()),
                "kind": pa.array(np.full(len(nodes) * nb, KIND_PHASH, np.uint8), pa.uint8()),
                "payload": pa.array(np.repeat(sh, nb), pa.uint64()),
            }
        )

    cand = ds.map_batches(sim_batch, batch_format="pyarrow", batch_size=cfg.batch_size)
    return candidate_edges(cand, cfg)


# ----------------------------------------- exact word-set Jaccard similarity


def word_jaccard_pairs(ds, threshold: float, text_col: str, id_col: str):
    """Exact word-set Jaccard similarity join: all pairs with
    |A ∩ B| / |A ∪ B| >= threshold.

    Distributed shape: explode distinct (doc, token) -> groupby token emits
    co-occurrence pairs -> count per pair -> broadcast doc set sizes ->
    filter.  NOTE the token groupby emits O(df^2) pairs per token — exact
    set-similarity joins need frequency-ordered prefix filtering at web
    scale; this operator is the exact small/medium-scale tool and the oracle
    for the MinHash approximation.
    """

    def explode_tokens(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        texts = b[text_col].to_pylist()
        out_ids, out_toks = [], []
        for i, t in enumerate(texts):
            toks = set((t or "").split())
            out_ids += [int(ids[i])] * len(toks)
            out_toks += list(toks)
        th = hash64_str_array(out_toks)
        return pa.table(
            {
                id_col: pa.array(out_ids, pa.int64()),
                "token": pa.array(th, pa.uint64()),
            }
        )

    pairs_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()), ("n", pa.int64())])
    tokens = ds.map_batches(explode_tokens, batch_format="pyarrow")

    # doc set sizes: tiny (one row per doc) -> aggregate then broadcast
    from ray.data.aggregate import Count

    sizes_pdf = tokens.groupby(id_col).aggregate(Count(alias_name="sz")).to_pandas()
    size_map = dict(zip(sizes_pdf[id_col].astype(int), sizes_pdf["sz"].astype(int)))
    size_ref = ray.put(size_map)

    def emit_pairs(b: pa.Table) -> pa.Table:
        # partition-vectorised: co-occurrence pairs per token run
        if len(b) == 0:
            return pairs_schema.empty_table()
        toks = b["token"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, toks))
        toks, ids = toks[order], ids[order]
        starts = np.flatnonzero(np.r_[True, toks[1:] != toks[:-1]])
        ends = np.r_[starts[1:], len(toks)]
        us, vs = [], []
        for s0, e0 in zip(starts, ends):
            if e0 - s0 < 2:
                continue
            g = ids[s0:e0]
            ii, jj = np.triu_indices(e0 - s0, k=1)
            us.append(g[ii])
            vs.append(g[jj])
        if not us:
            return pairs_schema.empty_table()
        u = np.concatenate(us)
        v = np.concatenate(vs)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "n": pa.array(np.ones(len(u), np.int64), pa.int64()),
            }
        )

    co = partition_groupby(tokens, ["token"], emit_pairs, pairs_schema)

    def local_sum(b: pa.Table) -> pa.Table:
        # combiner: pre-sum pair counts within the batch before the groupby
        import pandas as pd

        df = b.to_pandas().groupby(["u", "v"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(df, preserve_index=False).cast(pairs_schema)

    out_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()), ("jaccard", pa.float64())])

    def finalize(b: pa.Table) -> pa.Table:
        # partition-vectorised: sum counts per (u, v) run, then threshold
        if len(b) == 0:
            return out_schema.empty_table()
        sizes = ray.get(size_ref)
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v, n = u[order], v[order], n[order]
        new_run = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
        run_id = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        inter = np.bincount(run_id, weights=n).astype(np.int64)
        ru, rv = u[starts], v[starts]
        import pandas as pd

        szs = pd.Series(ru).map(sizes).to_numpy() + pd.Series(rv).map(sizes).to_numpy()
        union = szs - inter
        j = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        ok = j >= threshold
        return pa.table(
            {
                "u": pa.array(ru[ok], pa.int64()),
                "v": pa.array(rv[ok], pa.int64()),
                "jaccard": pa.array(j[ok], pa.float64()),
            }
        )

    combined = co.map_batches(local_sum, batch_format="pyarrow")
    return partition_groupby(combined, ["u", "v"], finalize, out_schema)


# ------------------------------------------------------------------ IVF ANN


def train_centroids(
    ds, n_clusters: int, vec_col: str = "embedding", seed: int = 42, n_iters: int = 10,
    sample_limit: int = 50_000,
):
    """Seeded mini k-means over a driver-side sample (the coarse quantizer).
    The sample is bounded; training cost is independent of dataset size."""
    sample = np.asarray(
        ds.limit(sample_limit).select_columns([vec_col]).to_pandas()[vec_col].tolist(),
        dtype=np.float64,
    )
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def build_ivf_index(
    ds, path: str, n_clusters: int = 16, vec_col: str = "embedding",
    id_col: str = "vec_id", seed: int = 42,
):
    """IVF index = the dataset written as cluster-partitioned parquet
    (``cluster=<c>/`` directories) plus the centroid matrix.  Queries then
    read ONLY the probed clusters' files — the column/partition-pruned-read
    pattern for similarity search at scale.  Returns the centroids."""
    cent = train_centroids(ds, n_clusters, vec_col, seed)
    cent_ref = ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        emb = np.asarray(b[vec_col].to_pylist(), dtype=np.float64)
        en = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        cluster = np.argmax(en @ c.T, axis=1).astype(np.int64)
        return b.append_column("cluster", pa.array(cluster, pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        path, partition_cols=["cluster"]
    )
    np.save(f"{path}/centroids.npy", cent)
    return cent


def ivf_topk(
    index_path: str, query_vectors: np.ndarray, k: int, nprobe: int = 4,
    vec_col: str = "embedding", id_col: str = "vec_id",
):
    """Approximate cosine top-k over an IVF index: probe the ``nprobe``
    nearest clusters per query, reading only those partitions from disk.
    ``nprobe == n_clusters`` degrades gracefully to exact search."""
    import ray.data as rd

    cent = np.load(f"{index_path}/centroids.npy")
    qn = np.asarray(query_vectors, dtype=np.float64)
    qn = qn / np.maximum(np.linalg.norm(qn, axis=1, keepdims=True), 1e-12)
    sims_c = qn @ cent.T
    probe = np.argsort(-sims_c, axis=1)[:, : min(nprobe, cent.shape[0])]
    clusters = sorted(set(probe.ravel().tolist()))
    import glob

    files = [
        f
        for c in clusters
        for f in sorted(glob.glob(f"{index_path}/cluster={c}/*.parquet"))
    ]
    sub = rd.read_parquet(files)
    return ann_topk(sub, query_vectors, k, vec_col=vec_col, id_col=id_col)
