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
import pyarrow.compute as pc
import ray

from ..config import DedupeConfig
from ..hashing import hash64_str_array, simhash64, splitmix64
from ..stages.candidates import KIND_PHASH, candidate_edges
from ..stages.util import partition_groupby


def embedding_matrix(b: pa.Table, vec_col: str) -> np.ndarray:
    """Zero-copy-ish (n, d) float64 matrix from a list<float> /
    fixed_size_list<float> column — flatten the child values and reshape,
    never a per-row ``to_pylist`` Python round-trip."""
    col = b[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type) or pa.types.is_fixed_size_list(col.type):
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        n = len(col)
        if n == 0:
            return np.zeros((0, 0), dtype=np.float64)
        d = flat.size // n
        return flat.astype(np.float64, copy=False).reshape(n, d)
    return np.asarray(col.to_pylist(), dtype=np.float64)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


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
    qn = _normalize_rows(q)
    q_ref = ray.put(qn)
    empty = pa.schema(
        [("query_idx", pa.int64()), (id_col, pa.int64()), ("cos_sim", pa.float64())]
    ).empty_table()

    def local_topk(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return empty
        qm = ray.get(q_ref)
        en = _normalize_rows(embedding_matrix(b, vec_col))
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = qm @ en.T  # (n_q, n_batch)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]  # (n_q, kk)
        qi = np.repeat(np.arange(sims.shape[0], dtype=np.int64), kk)
        jj = part.ravel()
        return pa.table(
            {
                "query_idx": pa.array(qi, pa.int64()),
                id_col: pa.array(ids[jj], pa.int64()),
                "cos_sim": pa.array(sims[qi, jj], pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if len(cand) == 0:
        return empty
    out = []
    for qi, grp in cand.groupby("query_idx"):
        grp = grp.sort_values(["cos_sim", id_col], ascending=[False, True]).head(k)
        out.append(grp)
    import pandas as pd

    merged = pd.concat(out).reset_index(drop=True)
    return pa.Table.from_pandas(merged, preserve_index=False)


# ------------------------------------------- cosine near-dup pair detection


# above this many rows the exact O(n^2) path auto-switches to banded LSH
EXACT_COSINE_LIMIT = 200_000

_PAIR_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64()), ("cos_sim", pa.float64())])


@ray.remote
def _norm_concat_block(vec_col: str, id_col: str, *tbls: pa.Table) -> pa.Table:
    """Concat a group of native block refs and L2-normalize into one tile
    block (runs as a task — tiles never touch the driver)."""
    b = pa.concat_tables(tbls)
    en = _normalize_rows(embedding_matrix(b, vec_col))
    flat = pa.array(en.ravel(), pa.float64())
    return pa.table(
        {
            "__id__": pc.cast(b[id_col], pa.int64()),
            "__vec__": pa.FixedSizeListArray.from_arrays(flat, en.shape[1] if len(b) else 1),
        }
    )


@ray.remote
def _block_pair_sims(left: pa.Table, right: pa.Table | None, threshold: float, id_col: str) -> pa.Table:
    """Exact cosine pairs between two normalized blocks (right=None: within
    the left block).  Runs as a task; neither block ever lands on the driver."""
    ids_l = left["__id__"].to_numpy(zero_copy_only=False)
    en_l = embedding_matrix(left, "__vec__")
    if right is None:
        ids_r, en_r = ids_l, en_l
    else:
        ids_r = right["__id__"].to_numpy(zero_copy_only=False)
        en_r = embedding_matrix(right, "__vec__")
    sims = en_l @ en_r.T
    li, rj = np.nonzero(sims >= threshold)
    u, v = ids_l[li], ids_r[rj]
    if right is None:
        keep = u < v  # within-block: each unordered pair exactly once
        lo, hi = u[keep], v[keep]
    else:
        keep = u != v  # cross-block tile computes each pair once; canonicalize
        lo = np.minimum(u[keep], v[keep])
        hi = np.maximum(u[keep], v[keep])
    return pa.table(
        {
            "u": pa.array(lo, pa.int64()),
            "v": pa.array(hi, pa.int64()),
            "cos_sim": pa.array(sims[li, rj][keep], pa.float64()),
        }
    )


def cosine_dup_pairs(
    ds,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 0,
    seed: int = 42,
    exact_limit: int = EXACT_COSINE_LIMIT,
    force_lsh: bool = False,
):
    """All pairs (u < v) with cosine similarity >= threshold.

    Default: exact *blocked* path — rows are normalized per block inside
    ``map_batches``, blocks stay in the object store, and one task per block
    pair computes that tile of the O(n^2) similarity matrix (the driver only
    holds object refs — nothing dataset-sized is ever materialized on it).
    Above ``exact_limit`` rows (where O(n^2) flops stop being sensible) the
    call auto-switches to the AND-OR banded LSH path sized for recall ~0.999
    at ``threshold``.  ``n_planes > 0`` forces the LSH path with bands of
    ``n_planes`` hyperplanes each.
    """
    if n_planes > 0 or force_lsh:
        return _cosine_pairs_lsh(ds, threshold, vec_col, id_col, n_planes, seed)
    n_rows = ds.count()
    if n_rows > exact_limit:
        return _cosine_pairs_lsh(ds, threshold, vec_col, id_col, 0, seed)

    # Tile sizing targets two invariants: (a) a tile's sims matrix stays
    # bounded (block_rows^2 float64 <= ~256 MB), (b) the task count
    # B*(B+1)/2 lands near 2x the cluster CPUs — r2's sqrt(n)-derived blocks
    # produced ~170 ~10ms tasks at 20k rows, and pure scheduling overhead
    # regressed the bench 2.2x (VERDICT r2 item 3).
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    want_blocks = max(1, int(np.sqrt(4.0 * ncpu)))  # B(B+1)/2 ~= 2*ncpu tasks
    block_rows = int(np.clip(-(-n_rows // want_blocks), 2048, 5600))
    n_blocks = max(1, -(-n_rows // block_rows))
    # Tile construction groups the source's NATIVE block refs (one per
    # parquet row group) and concat+normalizes each group in a Ray task —
    # no Ray Data exchange.  A Dataset.repartition here costs 1-3s of
    # orchestration regardless of data size (A/B'd interleaved, r3), and
    # skipping it entirely is worse: to_arrow_refs() hands back one ref per
    # native block, tile pairing is quadratic in that count, so 64 stray
    # row-group blocks means 2080 micro-tasks (the r2 bench regression).
    # Repartition only remains as the fallback when the source has FEWER
    # blocks than tiles (one giant upstream block would break the memory
    # bound otherwise).
    src = ds.select_columns([id_col, vec_col])
    raw = src.to_arrow_refs()
    if len(raw) < n_blocks:
        raw = src.repartition(n_blocks).to_arrow_refs()
    groups = np.array_split(np.arange(len(raw)), min(n_blocks, max(1, len(raw))))
    blocks = [
        _norm_concat_block.remote(vec_col, id_col, *[raw[i] for i in g])
        for g in groups
        if len(g)
    ]
    out_refs = []
    for i in range(len(blocks)):
        out_refs.append(_block_pair_sims.remote(blocks[i], None, threshold, id_col))
        for j in range(i + 1, len(blocks)):
            out_refs.append(_block_pair_sims.remote(blocks[i], blocks[j], threshold, id_col))
    import ray.data as rd

    if not out_refs:
        return rd.from_arrow(_PAIR_SCHEMA.empty_table())
    return rd.from_arrow_refs(out_refs)


def lsh_params_for(threshold: float, n_planes: int = 0, eps: float = 1e-4) -> tuple[int, int]:
    """(planes_per_band r, n_bands b) for AND-OR amplified hyperplane LSH.

    Per-pair collision prob at cosine ``t`` is p = 1 - arccos(t)/pi per
    plane; a pair at the threshold is missed with prob (1 - p^r)^b, so b is
    sized for miss prob <= ``eps`` (reference analogue: the MinHash side's
    optimal_param S-curve sizing, workload/minhash_dedupe.py:88-130)."""
    r = n_planes if n_planes > 0 else (8 if threshold >= 0.7 else 4 if threshold >= 0.5 else 2)
    p = 1.0 - np.arccos(min(max(threshold, -1.0), 1.0)) / np.pi
    pr = p**r
    if pr >= 1.0:
        return r, 1
    b = int(np.ceil(np.log(eps) / np.log(max(1.0 - pr, 1e-300))))
    return r, max(1, min(b, 128))


class _HyperplaneBucketer:
    """Banded random-hyperplane bucketing; the plane tensor is generated once
    per (worker, dim) and cached on the instance — not per batch."""

    def __init__(self, vec_col: str, id_col: str, n_planes: int, n_bands: int, seed: int):
        self.vec_col, self.id_col = vec_col, id_col
        self.n_planes, self.n_bands, self.seed = n_planes, n_bands, seed
        self._planes: np.ndarray | None = None  # (dim, n_bands * n_planes)

    def _planes_for(self, dim: int) -> np.ndarray:
        if self._planes is None or self._planes.shape[0] != dim:
            rng = np.random.RandomState(self.seed)
            self._planes = rng.randn(dim, self.n_bands * self.n_planes)
        return self._planes

    def __call__(self, b: pa.Table) -> pa.Table:
        emb = embedding_matrix(b, self.vec_col)
        n = len(b)
        if n == 0:
            return pa.schema(
                [(self.id_col, pa.int64()), ("__bucket__", pa.uint64()), (self.vec_col, b[self.vec_col].type)]
            ).empty_table()
        planes = self._planes_for(emb.shape[1])
        signs = (emb @ planes) > 0  # (n, b*r)
        bits = signs.reshape(n, self.n_bands, self.n_planes)
        key = np.zeros((n, self.n_bands), dtype=np.uint64)
        for j in range(self.n_planes):
            key = (key << np.uint64(1)) | bits[:, :, j].astype(np.uint64)
        # mix the band index into the key so band b's buckets never collide
        # with band b''s in the shared shuffle
        key ^= splitmix64(np.arange(self.n_bands, dtype=np.uint64) + np.uint64(0x9E37))[None, :]
        ids = pc.cast(b[self.id_col], pa.int64())
        take = np.repeat(np.arange(n), self.n_bands)
        return pa.table(
            {
                self.id_col: ids.take(pa.array(take)),
                "__bucket__": pa.array(splitmix64(key.ravel()), pa.uint64()),
                self.vec_col: b[self.vec_col].take(pa.array(take)),
            }
        )


def _cosine_pairs_lsh(ds, threshold, vec_col, id_col, n_planes, seed):
    """Scale path: AND-OR banded hyperplane LSH.  ``n_bands`` independent
    plane sets each produce an r-bit bucket key; a pair collides if it shares
    ANY band's bucket (OR amplification), then bucket-mates are verified with
    the exact cosine, and the pair stream is deduplicated across bands.  Band
    count is sized for miss prob <= 1e-4 at the threshold, so recall ~1 and
    precision exact (every emitted pair is verified)."""
    r, n_bands = lsh_params_for(threshold, n_planes)
    bucketer = _HyperplaneBucketer(vec_col, id_col, r, n_bands, seed)

    schema = _PAIR_SCHEMA

    def verify_partition(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return schema.empty_table()
        buckets = b["__bucket__"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        en = _normalize_rows(embedding_matrix(b, vec_col))
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

    def dedup_pairs(b: pa.Table) -> pa.Table:
        # a pair colliding in k bands arrives k times (identical cos_sim);
        # keep the first occurrence per (u, v)
        if len(b) == 0:
            return schema.empty_table()
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        first = np.zeros(len(u), dtype=bool)
        us, vs = u[order], v[order]
        keep = np.r_[True, (us[1:] != us[:-1]) | (vs[1:] != vs[:-1])]
        first[order[keep]] = True
        return b.filter(pa.array(first))

    pairs = partition_groupby(
        ds.map_batches(bucketer, batch_format="pyarrow"),
        ["__bucket__"],
        verify_partition,
        schema,
    )
    return partition_groupby(pairs, ["u", "v"], dedup_pairs, schema)


# -------------------------------------------------------------- SimHash dedup


def simhash_candidates(ds, cfg: DedupeConfig, text_col: str, id_col: str):
    """SimHash near-dup candidate edges: 64-bit SimHash per doc, banded into
    Hamming buckets and verified — reusing the pHash sub-band + verify
    machinery (the kind=KIND_PHASH path of the candidate stages)."""
    from ..hashing import phash_band_keys

    def sim_batch(b: pa.Table) -> pa.Table:
        cfg_local = cfg
        ids = b[id_col]
        if pa.types.is_string(ids.type):
            from ..hashing import id_hash64_str_array

            nodes = id_hash64_str_array(ids)
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


def _seg_gather(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated index ranges [starts[i], starts[i]+lens[i]) — the
    vectorised 'gather these segments' primitive (all lens must be > 0)."""
    tot = int(lens.sum())
    if tot == 0:
        return np.empty(0, np.int64)
    starts = np.asarray(starts, np.int64)
    lens = np.asarray(lens, np.int64)
    step = np.ones(tot, np.int64)
    step[0] = starts[0]
    ends = np.cumsum(lens)
    if len(starts) > 1:
        # jump from the last index of segment i to starts[i+1]
        step[ends[:-1]] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(step)


def _distinct_row_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Per-row DISTINCT sorted token hashes: (flat values asc within each
    row, row offsets).  Arrow-split + byte-poly hashing (token_hashes_flat,
    5x the per-token Python path per CLAUDE.md) + one lexsort."""
    from ..hashing import token_hashes_flat

    flat, counts = token_hashes_flat(texts)
    n = len(counts)
    offs = np.zeros(n + 1, np.int64)
    if flat.size == 0:
        return flat, offs
    row_id = np.repeat(np.arange(n, dtype=np.int64), counts)
    order = np.lexsort((flat, row_id))
    rs, fs = row_id[order], flat[order]
    keep = np.r_[True, (rs[1:] != rs[:-1]) | (fs[1:] != fs[:-1])]
    rs, fs = rs[keep], fs[keep]
    np.cumsum(np.bincount(rs, minlength=n).astype(np.int64), out=offs[1:])
    return fs, offs


def jaccard_prefix(h: np.ndarray, df: np.ndarray, threshold: float) -> np.ndarray:
    """Prefix tokens under the global (df asc, hash asc) order: the first
    |d| - ceil(t*|d|) + 1 tokens — any J>=t pair must share a token lying in
    BOTH docs' prefixes (Bayardo all-pairs / Chaudhuri prefix-filter bound),
    so only these enter the inverted index."""
    order = np.lexsort((h, df))
    L = len(h) - int(np.ceil(threshold * len(h))) + 1
    return h[order[:L]]


def word_jaccard_pairs(
    ds, threshold: float, text_col: str, id_col: str, max_df_entries: int = 5_000_000
):
    """Exact word-set Jaccard similarity join: all pairs with
    |A ∩ B| / |A ∪ B| >= threshold — via *frequency-ordered prefix
    filtering* (Bayardo all-pairs / Vernica et al. VLDB'10 distributed
    shape), not the O(df^2) per-token clique emission.

    Under a global token total order, any pair with J >= t must share a
    token inside both docs' length-(|d| - ceil(t*|d|) + 1) prefixes, so the
    inverted index holds only prefix tokens; ordering tokens rarest-first
    makes prefixes avoid stopwords, bounding per-token fan-out.  Candidates
    are verified with the exact intersection inside the token group (each
    doc's row carries its full sorted token-hash list), then deduplicated.
    Correctness needs only *a* consistent global order, so the document-
    frequency table broadcast for ordering may be capped at
    ``max_df_entries`` (uncapped tokens order as df=1 by hash) — the cap
    trades prefix quality, never correctness.
    """
    out_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()), ("jaccard", pa.float64())])
    tok_schema = pa.schema([(id_col, pa.int64()), ("token", pa.uint64())])

    def explode_tokens(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        fs, offs = _distinct_row_hashes(b[text_col])
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, np.diff(offs)), pa.int64()),
                "token": pa.array(fs, pa.uint64()),
            }
        )

    tokens = ds.map_batches(explode_tokens, batch_format="pyarrow")

    # --- pass 1: token document frequencies (df >= 2; df-1 tokens cannot
    # form pairs and default to rank df=1 anyway)
    df_schema = pa.schema([("token", pa.uint64()), ("df", pa.int64())])

    def count_df(b: pa.Table) -> pa.Table:
        t = b["token"].to_numpy(zero_copy_only=False).astype(np.uint64)
        t.sort()
        first = np.r_[True, t[1:] != t[:-1]]
        starts = np.flatnonzero(first)
        cnt = np.diff(np.r_[starts, len(t)])
        keep = cnt >= 2
        return pa.table(
            {
                "token": pa.array(t[starts][keep], pa.uint64()),
                "df": pa.array(cnt[keep], pa.int64()),
            }
        )

    df_pdf = partition_groupby(tokens, ["token"], count_df, df_schema).to_pandas()
    if len(df_pdf) > max_df_entries:
        df_pdf = df_pdf.nlargest(max_df_entries, "df")
    df_tok = np.sort(df_pdf["token"].to_numpy().astype(np.uint64))
    order_tok = np.argsort(df_pdf["token"].to_numpy().astype(np.uint64))
    df_cnt = df_pdf["df"].to_numpy()[order_tok].astype(np.int64)
    df_ref = ray.put((df_tok, df_cnt))

    # --- pass 2: per doc, emit one row per *prefix* token carrying the full
    # value-sorted token-hash list for exact verification
    prefix_schema = pa.schema(
        [
            ("token", pa.uint64()),
            (id_col, pa.int64()),
            ("toks", pa.list_(pa.uint64())),
        ]
    )

    def emit_prefix(b: pa.Table) -> pa.Table:
        """Fully vectorised (VERDICT r2 item 4): Arrow-split+hash tokenize,
        one global (row, df, hash) lexsort picks every row's prefix, one
        segment-gather materialises the carried full-list column."""
        dft, dfc = ray.get(df_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        fs, offs = _distinct_row_hashes(b[text_col])
        if fs.size == 0:
            return prefix_schema.empty_table()
        n = len(b)
        rowlen = np.diff(offs)
        dfv = np.ones(len(fs), np.int64)
        if len(dft):
            pos = np.minimum(np.searchsorted(dft, fs), len(dft) - 1)
            found = dft[pos] == fs
            dfv[found] = dfc[pos[found]]
        row_id = np.repeat(np.arange(n, dtype=np.int64), rowlen)
        order = np.lexsort((fs, dfv, row_id))  # rows contiguous, (df, hash) asc
        pos_in_row = np.arange(len(fs), dtype=np.int64) - np.repeat(offs[:-1], rowlen)
        L = rowlen - np.ceil(threshold * rowlen).astype(np.int64) + 1
        keep = pos_in_row < np.repeat(L, rowlen)  # ordered space: rows stay contiguous
        emit_tok = fs[order][keep]
        emit_row = row_id[keep]  # row_id is identical in ordered space
        if emit_tok.size == 0:
            return prefix_schema.empty_table()
        # each emitted prefix row carries its doc's full value-sorted list
        lens_e = rowlen[emit_row]
        values = pa.array(fs[_seg_gather(offs[:-1][emit_row], lens_e)], pa.uint64())
        list_offs = np.zeros(len(emit_row) + 1, np.int64)
        np.cumsum(lens_e, out=list_offs[1:])
        toks_col = pa.ListArray.from_arrays(pa.array(list_offs, pa.int32()), values)
        return pa.table(
            {
                "token": pa.array(emit_tok, pa.uint64()),
                id_col: pa.array(ids[emit_row], pa.int64()),
                "toks": toks_col,
            }
        )

    prefix_rows = ds.map_batches(emit_prefix, batch_format="pyarrow")

    # --- pass 3: group by prefix token; exact-verify candidate pairs.
    # Vectorised end-to-end (VERDICT r2 item 4): the only Python loop left
    # runs once per token GROUP to emit triu index pairs; candidate pairs
    # are then deduped across groups (each pair verifies once per
    # PARTITION, not once per shared prefix token), length-filtered, and
    # intersected with ONE global (pair, token) lexsort + run-length count
    # instead of np.intersect1d per pair.
    def verify(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        tok = b["token"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        toks_col = b["toks"]
        if isinstance(toks_col, pa.ChunkedArray):
            toks_col = toks_col.combine_chunks()
        offs = toks_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = toks_col.values.to_numpy(zero_copy_only=False).astype(np.uint64)
        lens = np.diff(offs)
        order = np.argsort(tok, kind="stable")
        tko = tok[order]
        g_starts = np.flatnonzero(np.r_[True, tko[1:] != tko[:-1]])
        g_ends = np.r_[g_starts[1:], len(tko)]
        ra_parts, rc_parts = [], []
        for s0, e0 in zip(g_starts, g_ends):
            m = e0 - s0
            if m < 2:
                continue
            ai, ci = np.triu_indices(m, k=1)
            grp = order[s0:e0]
            ra_parts.append(grp[ai])
            rc_parts.append(grp[ci])
        if not ra_parts:
            return out_schema.empty_table()
        ra = np.concatenate(ra_parts)
        rc = np.concatenate(rc_parts)
        mask = ids[ra] != ids[rc]
        ra, rc = ra[mask], rc[mask]
        if not len(ra):
            return out_schema.empty_table()
        u = np.minimum(ids[ra], ids[rc])
        v = np.maximum(ids[ra], ids[rc])
        o2 = np.lexsort((v, u))
        uu, vv = u[o2], v[o2]
        first = np.r_[True, (uu[1:] != uu[:-1]) | (vv[1:] != vv[:-1])]
        sel = o2[first]
        ra, rc, u, v = ra[sel], rc[sel], u[sel], v[sel]
        sa, sc = lens[ra], lens[rc]
        lf = np.minimum(sa, sc) >= threshold * np.maximum(sa, sc)
        ra, rc, u, v, sa, sc = ra[lf], rc[lf], u[lf], v[lf], sa[lf], sc[lf]
        if not len(ra):
            return out_schema.empty_table()
        n_pairs = len(ra)
        # Intersection counts via ONE C-level searchsorted over a composite
        # key: token hashes are rank-remapped to < 2^32 within the batch,
        # each pair's larger list becomes a segment of a globally-sorted
        # (target_slot << 32 | rank) stream (each unique target row stored
        # ONCE), and every element of the smaller list probes that stream
        # with its pair's slot prefix.  No per-pair Python, no per-iteration
        # temporaries (a vectorised-bisection variant measured 540ns/probe
        # from numpy temp churn; this is ~25ns/probe).
        from ..state.numpy_cc import _unique_inverse

        dv = np.unique(vals)
        vrank = np.searchsorted(dv, vals).astype(np.int64)
        # unique docs among the candidate pairs, one representative row each
        # (rows carrying the same doc id carry identical token lists)
        uids, uinv = _unique_inverse(np.concatenate([ids[ra], ids[rc]]))
        rep_row = np.empty(len(uids), np.int64)
        rep_row[uinv] = np.concatenate([ra, rc])
        ia, ic = uinv[:n_pairs], uinv[n_pairs:]
        n_u = len(uids)
        rep_lens = lens[rep_row]
        if n_u * len(dv) <= 32_000_000 and n_u * n_u <= 16_000_000:
            # Dense path: one 0/1 doc x token matrix, BLAS M @ M.T yields
            # EVERY pairwise intersection count at once (0/1 float32 sums of
            # <= doclen terms are exact), then candidate pairs are a single
            # gather.  This box's random-gather latency is ~400ns/element
            # out of cache (CLAUDE.md), so per-probe streams lose to sgemm
            # by >10x whenever the matrices fit.
            M = np.zeros((n_u, len(dv)), np.float32)
            M[
                np.repeat(np.arange(n_u, dtype=np.int64), rep_lens),
                vrank[_seg_gather(offs[rep_row], rep_lens)],
            ] = 1.0
            G = M @ M.T
            inter = G[ia, ic].astype(np.int64)
        else:
            # Stream fallback (huge sparse partitions): smaller list probes
            # the larger list's segment of a (doc_slot << 32 | token_rank)
            # sorted stream, chunked to bound temporaries.
            swap = sa > sc
            p_side = np.where(swap, ic, ia)
            t_side = np.where(swap, ia, ic)
            psa = rep_lens[p_side]
            t_stream = vrank[_seg_gather(offs[rep_row], rep_lens)] + (
                np.repeat(np.arange(n_u, dtype=np.int64), rep_lens) << 32
            )
            inter = np.empty(n_pairs, np.int64)
            cum = np.cumsum(psa)
            budget = 16_000_000
            start = 0
            while start < n_pairs:
                base = cum[start - 1] if start else 0
                end = min(
                    n_pairs, max(start + 1, int(np.searchsorted(cum, base + budget)) + 1)
                )
                sl = slice(start, end)
                m = end - start
                pid = np.repeat(np.arange(m, dtype=np.int64), psa[sl])
                comp = vrank[_seg_gather(offs[rep_row[p_side[sl]]], psa[sl])] + (
                    t_side[sl][pid] << 32
                )
                pos = np.minimum(np.searchsorted(t_stream, comp), len(t_stream) - 1)
                hit = t_stream[pos] == comp
                inter[sl] = np.bincount(pid[hit], minlength=m).astype(np.int64)
                start = end
        jac = inter / (sa + sc - inter)
        ok = jac >= threshold
        if not ok.any():
            return out_schema.empty_table()
        return pa.table(
            {
                "u": pa.array(u[ok], pa.int64()),
                "v": pa.array(v[ok], pa.int64()),
                "jaccard": pa.array(jac[ok], pa.float64()),
            }
        )

    cand = partition_groupby(prefix_rows, ["token"], verify, out_schema)

    def dedup(b: pa.Table) -> pa.Table:
        # pairs sharing k prefix tokens arrive k times; keep the first
        if len(b) == 0:
            return out_schema.empty_table()
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        us, vs = u[order], v[order]
        keep = np.r_[True, (us[1:] != us[:-1]) | (vs[1:] != vs[:-1])]
        first = np.zeros(len(u), dtype=bool)
        first[order[keep]] = True
        return b.filter(pa.array(first))

    return partition_groupby(cand, ["u", "v"], dedup, out_schema)


# ------------------------------------------------- embedding near-dup dedupe


def embedding_dedupe(
    ds,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_actors: int = 4,
    force_lsh: bool = False,
):
    """Embedding-cosine near-duplicate REMOVAL (not just pair detection):
    cosine pairs (exact blocked tiles, or banded LSH at scale) -> union-find
    clustering over the pair graph -> keep the min-id row per component.

    The full training-data dedupe composition over an embedding column —
    same cluster/merge machinery as the MinHash flagship, different
    similarity front-end.  Returns the surviving rows of ``ds``.
    """
    from ..config import DedupeConfig
    from ..stages.merge import merge_keep
    from ..state.dist_union_find import cluster_edges

    pairs = cosine_dup_pairs(ds, threshold, vec_col, id_col, force_lsh=force_lsh)

    def as_edges(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pc.cast(b["u"], pa.int64()).cast(pa.uint64()),
                "v": pc.cast(b["v"], pa.int64()).cast(pa.uint64()),
            }
        )

    edges = pairs.map_batches(as_edges, batch_format="pyarrow")
    assign = cluster_edges(edges, num_actors=num_actors)
    cfg = DedupeConfig(index_col=id_col, content_col=id_col, phash_col=None)
    return merge_keep(ds, assign, cfg)


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


def kmeans_assign(
    ds, n_clusters: int = 16, vec_col: str = "embedding", id_col: str = "vec_id",
    seed: int = 42,
):
    """Document clustering: assign every vector to its nearest trained
    centroid by cosine similarity.  Centroids train on a bounded driver-side
    sample (:func:`train_centroids`), broadcast once via ``ray.put``, and the
    assignment is one matmul per batch — dataset-size-independent driver
    state, no shuffle.  Returns ``(id_col, cluster, sim)`` rows."""
    cent = train_centroids(ds, n_clusters, vec_col, seed)
    cent_ref = ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        n = len(b)
        if n == 0:
            return pa.table(
                {
                    id_col: b[id_col],
                    "cluster": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        en = _normalize_rows(embedding_matrix(b, vec_col))
        sims = en @ c.T
        cl = np.argmax(sims, axis=1)
        return pa.table(
            {
                id_col: b[id_col],
                "cluster": pa.array(cl.astype(np.int64), pa.int64()),
                "sim": pa.array(sims[np.arange(n), cl], pa.float64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


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
        en = _normalize_rows(embedding_matrix(b, vec_col))
        cluster = np.argmax(en @ c.T, axis=1).astype(np.int64)
        return b.append_column("cluster", pa.array(cluster, pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        path, partition_cols=["cluster"]
    )
    # underscore-prefixed so dataset readers globbing the dir skip it
    np.save(f"{path}/_centroids.npy", cent)
    return cent


def ivf_topk(
    index_path: str, query_vectors: np.ndarray, k: int, nprobe: int = 4,
    vec_col: str = "embedding", id_col: str = "vec_id",
):
    """Approximate cosine top-k over an IVF index: probe the ``nprobe``
    nearest clusters per query, reading only those partitions from disk.
    ``nprobe == n_clusters`` degrades gracefully to exact search."""
    import glob
    import os

    import ray.data as rd

    cent = np.load(f"{index_path}/_centroids.npy")
    qn = _normalize_rows(np.asarray(query_vectors, dtype=np.float64))
    sims_c = qn @ cent.T
    # probe order: nearest centroids first; k-means can leave clusters empty
    # (no cluster=<c>/ dir written), so walk outward until nprobe non-empty
    # cluster file sets are found
    probe_order = np.argsort(-sims_c, axis=1)
    want = min(nprobe, cent.shape[0])
    files: list[str] = []
    n_nonempty = 0
    seen: set[int] = set()
    for rank in range(cent.shape[0]):
        for qi in range(probe_order.shape[0]):
            c = int(probe_order[qi, rank])
            if c in seen:
                continue
            seen.add(c)
            fs = sorted(glob.glob(os.path.join(index_path, f"cluster={c}", "*.parquet")))
            if fs:
                files.extend(fs)
                n_nonempty += 1
        if n_nonempty >= want:
            break
    if not files:
        return pa.schema(
            [("query_idx", pa.int64()), (id_col, pa.int64()), ("cos_sim", pa.float64())]
        ).empty_table()
    sub = rd.read_parquet(files)
    return ann_topk(sub, query_vectors, k, vec_col=vec_col, id_col=id_col)


def incremental_exact_dedupe(
    new_ds, corpus_ds, text_col: str, id_col: str, num_partitions: int = 16
):
    """Streaming-ingest dedupe: drop rows of ``new_ds`` whose content already
    exists in ``corpus_ds`` (the previously-ingested snapshot), and dedupe
    within the new batch itself (min-id wins) — the incremental contract a
    100TB pipeline needs so each ingest wave only pays for its own data.

    Scale shape: the corpus side is reduced to DISTINCT content hashes
    per batch BEFORE the shuffle (the corpus text never moves); both sides
    co-locate via the content-hash keyed cogroup exchange; each partition
    does a vectorised sorted-membership anti-join.  Nothing corpus-sized
    ever reaches the driver."""
    import pyarrow.compute as pc

    from ..stages.util import raw_cogroup_exchange

    def hash_new(b: pa.Table) -> pa.Table:
        h = hash64_str_array(b[text_col].to_pylist())
        t = b.append_column("__h__", pa.array(h, pa.uint64()))
        idx = pc.sort_indices(t, sort_keys=[("__h__", "ascending"), (id_col, "ascending")])
        t = t.take(idx)
        hh = t["__h__"].to_numpy(zero_copy_only=False)
        first = np.r_[True, hh[1:] != hh[:-1]] if len(t) else np.zeros(0, bool)
        return t.filter(pa.array(first))

    def hash_corpus(b: pa.Table) -> pa.Table:
        h = np.unique(hash64_str_array(b[text_col].to_pylist()))
        return pa.table({"__h__": pa.array(h, pa.uint64())})

    schema = pa.schema(list(zip(new_ds.schema().names, new_ds.schema().types)))

    def fn(left: pa.Table | None, right: pa.Table | None) -> pa.Table:
        if left is None or len(left) == 0:
            return schema.empty_table()
        idx = pc.sort_indices(left, sort_keys=[("__h__", "ascending"), (id_col, "ascending")])
        left = left.take(idx)
        hh = left["__h__"].to_numpy(zero_copy_only=False)
        keep = np.r_[True, hh[1:] != hh[:-1]]
        if right is not None and len(right):
            seen = np.unique(right["__h__"].to_numpy(zero_copy_only=False))
            pos = np.searchsorted(seen, hh)
            pos[pos == len(seen)] = 0
            keep &= seen[pos] != hh
        return left.filter(pa.array(keep)).drop_columns(["__h__"])

    return raw_cogroup_exchange(
        new_ds.map_batches(hash_new, batch_format="pyarrow"),
        corpus_ds.select_columns([text_col]).map_batches(hash_corpus, batch_format="pyarrow"),
        ["__h__"],
        ["__h__"],
        fn,
        schema,
        num_partitions,
    )
