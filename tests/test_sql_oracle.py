"""Bit-exactness of the DuckDB SQL hash-kernel generators vs the numpy
kernels (sql_oracle.py).  Pure DuckDB + numpy — no Ray — so these stay fast;
the end-to-end query-vs-oracle comparison runs in the driver's correctness
gate and scripts/check_correctness.py."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from daft_minhash_dedupe_ray import sql_oracle as so
from daft_minhash_dedupe_ray.hashing import (
    band_keys,
    make_permutations,
    minhash_signatures,
    shingle_hashes,
    simhash64,
    splitmix64,
    token_hashes_flat,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "hello world",
    "",
    "   ",
    "a b c d e f g h i j k l m n o p",
    "single",
    "x y z w v repeated x y z w v repeated",
    "the quick brown fox jumps over the lazy dog",  # exact dup of 0
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE TABLE documents AS SELECT * FROM "
        "(SELECT unnest(?) AS doc_id, unnest(?) AS text)",
        [list(range(len(TEXTS))), TEXTS],
    )
    return c


def test_sql_splitmix64_bit_exact(con):
    q = so.chain_select(
        "SELECT CAST(range AS UBIGINT) AS x FROM range(0, 2000)",
        so.sm64_steps("x", "h", "t"),
    )
    got = con.execute(f"SELECT h FROM {q} q ORDER BY x").fetchnumpy()["h"]
    ref = splitmix64(np.arange(2000, dtype=np.uint64))
    assert np.array_equal(got.astype(np.uint64), ref)


def test_sql_token_hashes_bit_exact(con):
    th = so.token_hash_select(so.tokens_select())
    r = con.execute(f"SELECT doc_id, pos, tokh FROM {th} t ORDER BY doc_id, pos").fetchnumpy()
    flat_ref, counts = token_hashes_flat(pa.array(TEXTS))
    assert np.array_equal(np.bincount(r["doc_id"], minlength=len(TEXTS)), counts)
    assert np.array_equal(r["tokh"].astype(np.uint64), flat_ref)


@pytest.mark.parametrize("ngram", [1, 3, 5])
def test_sql_shingles_bit_exact(con, ngram):
    q = so.shingles_select(so.tokens_select(), ngram)
    r = con.execute(f"SELECT doc_id, sh FROM {q} s ORDER BY doc_id, sh").fetchnumpy()
    flat, offs = shingle_hashes(TEXTS, ngram)
    ref = sorted(
        (d, int(h)) for d in range(len(TEXTS)) for h in flat[offs[d] : offs[d + 1]]
    )
    got = sorted(zip(r["doc_id"].tolist(), r["sh"].astype(np.uint64).tolist()))
    assert ref == got


def test_sql_band_keys_bit_exact(con):
    B, R, seed = 8, 8, 42
    q = so.lsh_bands_select(threshold=0.7, num_perm=64, ngram=5, seed=seed)
    r = con.execute(f"SELECT doc_id, bk FROM {q} b ORDER BY doc_id, bk").fetchnumpy()
    flat, offs = shingle_hashes(TEXTS, 5)
    a, b = make_permutations(64, seed)
    sig, has = minhash_signatures(flat, offs, a, b)
    bk = band_keys(sig, B, R)
    ref = sorted(
        (d, int(k)) for d in np.flatnonzero(has) for k in bk[d]
    )
    got = sorted(zip(r["doc_id"].tolist(), r["bk"].astype(np.uint64).tolist()))
    assert ref == got
    # docs without shingles emit no band keys (has_sig semantics)
    assert set(r["doc_id"].tolist()) == set(np.flatnonzero(has).tolist())


def test_sql_simhash_keep_runs_and_dedupes(con):
    out = con.execute(so.simhash_cc_keep_sql(max_hamming=3)).df()
    sims = simhash64(TEXTS, ngram_size=1)
    # doc 7 is an exact dup of doc 0 (Hamming 0) -> exactly one survives
    assert (sims[0] == sims[7]) and 0 in out["doc_id"].values and 7 not in out["doc_id"].values


def test_sql_minhash_keep_drops_exact_dup(con):
    out = con.execute(so.minhash_cc_keep_sql()).df()
    assert 0 in out["doc_id"].values and 7 not in out["doc_id"].values
    # empty docs emit no bands and survive as singletons
    assert 2 in out["doc_id"].values and 3 in out["doc_id"].values


def test_sql_semantic_dedupe_matches_embedder(con):
    """Full SQL SemDeDup oracle vs the in-process embedder + numpy cosine +
    union-find reference on a corpus with planted exact and permuted dups."""
    from daft_minhash_dedupe_ray.functions.embed import HashingEmbedder
    from daft_minhash_dedupe_ray.functions.similarity import _normalize_rows

    texts = TEXTS + ["quick the brown fox dog jumps lazy the over"]
    c2 = duckdb.connect()
    c2.execute(
        "CREATE TABLE documents AS SELECT * FROM (SELECT unnest(?) AS doc_id, unnest(?) AS text)",
        [list(range(len(texts))), texts],
    )
    emb = HashingEmbedder(dim=128)(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    )
    nv = _normalize_rows(np.asarray(emb["embedding"].to_pylist(), dtype=np.float64))
    sims = nv @ nv.T
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if sims[i, j] >= 0.9:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    ref_keep = sorted(d for d in range(len(texts)) if find(d) == d)
    got = c2.execute(so.semantic_dedupe_sql(threshold=0.9, dim=128)).df()["doc_id"].tolist()
    assert got == ref_keep
    assert len(ref_keep) < len(texts)  # the planted dups actually collapsed


def test_sql_image_clusters_match_union_graph():
    """image_clusters_sql == numpy CC over caption-band UNION pHash graph
    on the persisted synthetic table (small n, fresh cache entry)."""
    from collections import defaultdict

    from daft_minhash_dedupe_ray.hashing import hamming_distance64
    from daft_minhash_dedupe_ray.synth import cached_table_path

    path = cached_table_path(300, seed=42)
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    caps, ids = t["caption"].to_pylist(), t["image_id"].to_pylist()
    ph = t["phash"].to_numpy().astype(np.int64).view(np.uint64)
    flat, offs = shingle_hashes(caps, 5)
    a, b = make_permutations(128, 42)
    sig, has = minhash_signatures(flat, offs, a, b)
    bk = band_keys(sig, 16, 8)
    parent = list(range(len(ids)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(u, v):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)

    bybk = defaultdict(list)
    for d, k in zip(np.repeat(np.flatnonzero(has), 16), bk[has].reshape(-1)):
        bybk[int(k)].append(int(d))
    for mem in bybk.values():
        for m in mem[1:]:
            union(mem[0], m)
    for i in range(len(ids)):
        d = hamming_distance64(np.full(len(ids) - i - 1, ph[i], np.uint64), ph[i + 1 :])
        for j in np.flatnonzero(d <= 3):
            union(i, i + 1 + j)
    comp = defaultdict(list)
    for i in range(len(ids)):
        comp[find(i)].append(ids[i])
    ref = sorted((min(m), len(m)) for m in comp.values())
    out = duckdb.connect().execute(so.image_clusters_sql(path)).df()
    assert list(zip(out["cluster_rep"], out["n_members"])) == ref
    assert any(n > 1 for _, n in ref)  # planted dups collapsed


def test_sql_image_wave_keep_semantics():
    """image_wave_keep_sql drops exactly the wave rows with a corpus caption
    band match or a corpus pHash within Hamming<=3."""
    from collections import defaultdict

    from daft_minhash_dedupe_ray.hashing import hamming_distance64
    from daft_minhash_dedupe_ray.synth import cached_table_path

    path = cached_table_path(300, seed=42)
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    caps, ids = t["caption"].to_pylist(), t["image_id"].to_pylist()
    ph = t["phash"].to_numpy().astype(np.int64).view(np.uint64)
    n_corpus = 150
    flat, offs = shingle_hashes(caps, 5)
    a, b = make_permutations(128, 42)
    sig, has = minhash_signatures(flat, offs, a, b)
    bk = band_keys(sig, 16, 8)
    corpus_keys = {
        int(k) for d in np.flatnonzero(has) if d < n_corpus for k in bk[d]
    }
    keep = []
    for w in range(n_corpus, len(ids)):
        band_hit = has[w] and any(int(k) in corpus_keys for k in bk[w])
        ham_hit = bool(
            (hamming_distance64(np.full(n_corpus, ph[w], np.uint64), ph[:n_corpus]) <= 3).any()
        )
        if not band_hit and not ham_hit:
            keep.append(ids[w])
    out = duckdb.connect().execute(so.image_wave_keep_sql(path, n_corpus=n_corpus)).df()
    assert out["image_id"].tolist() == sorted(keep)
    assert len(keep) < len(ids) - n_corpus  # something was actually dropped


def test_sql_mix_sources_copies(con):
    c2 = duckdb.connect()
    c2.execute(
        "CREATE TABLE documents AS SELECT * FROM (SELECT unnest(?) AS doc_id, unnest(?) AS source)",
        [list(range(100)), [f"src{i % 4}" for i in range(100)]],
    )
    weights = {"src0": 0.5, "src1": 0.0, "src2": 2.0, "src3": 2.5}
    out = c2.execute(so.mix_sources_sql(weights, seed=7)).df()
    from daft_minhash_dedupe_ray.hashing import splitmix64 as sm

    h = sm(np.arange(100, dtype=np.uint64) ^ np.uint64(7))
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    w = np.array([weights[f"src{i % 4}"] for i in range(100)])
    copies = np.floor(w).astype(int) + (u < (w - np.floor(w)))
    got = out.groupby("doc_id").size().reindex(range(100), fill_value=0).to_numpy()
    assert np.array_equal(got, copies)


def test_sql_shuffle_shard_placement(con):
    out = con.execute(so.shuffle_shard_sql(8, 13, table="(SELECT range AS doc_id FROM range(0, 500))")).df()
    ref = (splitmix64(np.arange(500, dtype=np.uint64) ^ np.uint64(13)) % np.uint64(8)).astype(np.int64)
    assert np.array_equal(out.sort_values("doc_id")["shard"].to_numpy(), ref)


def test_sql_pack_layout_token_conservation(con):
    out = con.execute(so.pack_sequences_sql(max_tokens=4)).df()
    _, counts = token_hashes_flat(pa.array(TEXTS))
    per_doc = out.groupby("doc_id").apply(
        lambda g: int((g["tok_end"] - g["tok_start"]).sum()), include_groups=False
    )
    for d in range(len(TEXTS)):
        assert per_doc.get(d, 0) == counts[d]
    # fragments tile each doc without gaps
    for d, g in out.groupby("doc_id"):
        g = g.sort_values("tok_start")
        assert g["tok_start"].iloc[0] == 0
        assert (g["tok_start"].iloc[1:].to_numpy() == g["tok_end"].iloc[:-1].to_numpy()).all()


def test_sql_packed_texts_reconstruction(con):
    out = con.execute(so.packed_texts_sql(max_tokens=4)).df()
    # every token of every doc appears exactly once across sequences
    all_toks = " ".join(t for t in out.sort_values("seq_id")["text"] if t).split()
    ref_toks = [tok for t in TEXTS for tok in t.split()]
    assert sorted(all_toks) == sorted(ref_toks)
    assert int(out["n_tokens"].sum()) == len(ref_toks)


def test_sql_image_stats_blob_decode_bit_exact():
    """image_stats_sql parses the raw P6 PPM blob inside DuckDB and must
    reproduce the engine decode's exact integer pixel moments (small n,
    real pixels)."""
    import pyarrow.parquet as pq

    from daft_minhash_dedupe_ray.synth import cached_table_path, ppm_decode

    path = cached_table_path(120, seed=7, with_images=True)
    t = pq.read_table(path, columns=["image_id", "bytes"])
    truth = {}
    for iid, blob in zip(t["image_id"].to_pylist(), t["bytes"].to_pylist()):
        px = ppm_decode(blob).astype(np.int64).ravel()
        truth[iid] = (int(px.sum()), int((px * px).sum()))
    rows = duckdb.sql(so.image_stats_sql(path)).fetchall()
    assert len(rows) == len(truth)
    for iid, s, ss in rows:
        assert truth[iid] == (s, ss)


def test_sql_split_docs_key_and_ladder_bit_exact(con):
    """split_docs_sql == content_keys + searchsorted edge ladder on
    adversarial texts (dups, empty, None, whitespace runs)."""
    from daft_minhash_dedupe_ray.hashing import content_keys

    texts = ["a b c", "a b c", "c b a", "", None, "  x   y ", "q", "a"] + [
        f"tok{i} tok{i + 1} shared suffix words" for i in range(40)
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    con.register("split_probe", t)
    fr = {"train": 0.5, "val": 0.25, "test": 0.25}
    names = list(fr)
    edges = (np.cumsum([fr[n] for n in names]) * float(2**64)).astype(np.float64)
    keys = content_keys(t["text"], seed=0x5917)
    idx = np.minimum(np.searchsorted(edges, keys.astype(np.float64), side="right"), 2)
    expect = [names[i] for i in idx]
    rows = sorted(con.sql(so.split_docs_sql(fr, table="split_probe")).fetchall())
    assert [r[1] for r in rows] == expect
    assert expect[0] == expect[1]  # identical texts co-locate


def test_sql_audio_stats_wav_decode_bit_exact():
    """audio_stats_sql parses the RIFF/PCM16 blob inside DuckDB and must
    reproduce the engine decode's exact integer sample moments, including
    zero moments for non-wav / null payloads."""
    from daft_minhash_dedupe_ray.functions.audio import cached_audio_path, wav_decode
    import pyarrow.parquet as pq

    path = cached_audio_path(90, seed=3)
    t = pq.read_table(path)
    truth = {}
    for aid, blob, fmt in zip(
        t["audio_id"].to_pylist(), t["bytes"].to_pylist(), t["fmt"].to_pylist()
    ):
        if fmt != "wav" or blob is None:
            truth[aid] = (0, 0, 0)
            continue
        s = wav_decode(blob)[0].astype(np.int64)
        truth[aid] = (len(s), int(s.sum()), int((s * s).sum()))
    rows = duckdb.sql(so.audio_stats_sql(path)).fetchall()
    assert len(rows) == len(truth)
    for aid, *moms in rows:
        assert truth[aid] == tuple(moms)


def test_sql_doc_fingerprints_bit_exact(con):
    """doc_fingerprints_sql == content_keys + min-of-mixed-1-gram-hashes on
    adversarial texts (dups, empty, whitespace runs, singletons)."""
    from daft_minhash_dedupe_ray.functions.textops import (
        fingerprint_batch,
        rolling_fingerprint_batch,
    )

    texts = ["a b c", "a b c", "c b a", "", "  pad  ", "solo"] + [
        f"w{i} w{i + 1} w{i + 2} common tail" for i in range(30)
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    con.register("fp_probe", t)
    b = rolling_fingerprint_batch(fingerprint_batch(t))
    want_fp = b["fingerprint"].to_numpy().astype(np.uint64).view(np.int64)
    want_mn = b["doc_fingerprint"].to_numpy().astype(np.uint64).view(np.int64)
    rows = sorted(con.sql(so.doc_fingerprints_sql("fp_probe")).fetchall())
    assert [r[1] for r in rows] == want_fp.tolist()
    assert [r[2] for r in rows] == want_mn.tolist()


def test_sql_dhash_from_raw_bytes_bit_exact():
    """dhash_select reproduces multimodal.dhash64 bit-for-bit from the raw
    PPM payload (integer cross-multiplied block-mean comparisons on both
    sides — float noise never decides a tie)."""
    import pyarrow.parquet as pq

    from daft_minhash_dedupe_ray.functions.multimodal import dhash64
    from daft_minhash_dedupe_ray.synth import cached_table_path, ppm_decode

    path = cached_table_path(120, seed=7, with_images=True)
    t = pq.read_table(path, columns=["image_id", "bytes"])
    truth = {
        iid: dhash64(ppm_decode(blob))
        for iid, blob in zip(t["image_id"].to_pylist(), t["bytes"].to_pylist())
    }
    rows = duckdb.sql(
        f"SELECT * FROM {so.dhash_select(path)} q ORDER BY image_id"
    ).fetchall()
    assert len(rows) == len(truth)
    assert all(truth[iid] == dh for iid, dh in rows)


def test_sql_cdc_stats_bit_exact(con):
    """cdc_stats_sql reproduces the gear-hash chunker: identical cut
    positions (low-bits window-lag rolling hash) and identical dedupe stats
    on blobs with planted shared regions and shifts."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from daft_minhash_dedupe_ray.functions.cdc import (
        cdc_chunk_batch,
    )

    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, 5000, dtype=np.uint8).tobytes()
    blobs = [
        base,
        base,  # exact dup
        b"\x00" * 37 + base,  # shifted copy: interior chunks re-align
        base[:2500] + rng.randint(0, 256, 2500, dtype=np.uint8).tobytes(),
        rng.randint(0, 256, 64, dtype=np.uint8).tobytes(),  # single chunk
        None,
        b"",
    ]
    t = pa.table(
        {
            "image_id": pa.array([f"b{i}" for i in range(len(blobs))], pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
        }
    )
    # engine truth (no Ray needed: chunk one batch, reduce in pandas)
    ch = cdc_chunk_batch(t).to_pandas()
    g = ch.groupby("chunk_hash")["chunk_len"].agg(["sum", "count", "min"])
    want = (
        int(g["sum"].sum()),
        int(g["count"].sum()),
        len(g),
        int(g["min"].sum()),
        round(float(g["min"].sum()) / max(int(g["sum"].sum()), 1), 6),
    )
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "blobs.parquet")
        pq.write_table(t, p)
        got = duckdb.sql(so.cdc_stats_sql(p)).fetchone()
    assert tuple(got) == want


def test_sql_video_keep_end_to_end():
    """video_keep_sql == video_dedupe survivor set on a small fixture with
    planted trimmed+noisy duplicates (frame dHash, MinHash bands and CC all
    recomputed from the raw rawv bytes inside DuckDB)."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.video import cached_video_path, video_dedupe

    path = cached_video_path(24, seed=5, dup_rate=0.4)
    cfg = DedupeConfig(
        index_col="video_id", content_col="bytes", phash_col=None, threshold=0.2
    )
    out = video_dedupe(rd.read_parquet(path), cfg, every_n=1, num_actors=2)
    eng = sorted(out.select_columns(["video_id"]).to_pandas()["video_id"].tolist())
    ora = [r[0] for r in duckdb.sql(so.video_keep_sql(path, 24, 18)).fetchall()]
    assert eng == ora
    assert len(ora) < 24 + 9  # some planted dups must collapse


def test_sql_node_hash_matches_id_hash64():
    """node_hash_select == hashing.id_hash64_str_array (the surrogate node
    id for string index columns) — the primitive that makes SURVIVOR-set
    oracles possible (rep = min node id, reproduced in SQL)."""
    from daft_minhash_dedupe_ray.hashing import id_hash64_str_array

    ids = [f"img-{i:08d}" for i in range(64)] + ["a", "zz top", "0"]
    c2 = duckdb.connect()
    c2.execute("CREATE TABLE t AS SELECT unnest(?) AS image_id", [ids])
    q = so.node_hash_select("t")
    r = c2.execute(f"SELECT image_id, nh FROM {q} n").fetchall()
    ref = dict(zip(ids, id_hash64_str_array(ids)))
    assert {k: int(v) for k, v in r} == {k: int(v) for k, v in ref.items()}


def test_sql_image_dhash_keep_consistent_with_clusters():
    """One survivor per dHash cluster: |keep set| must equal the cluster
    count and every cluster rep's component must contribute exactly one
    kept id (pure-SQL structural check on the 300-row cached fixture; the
    engine-vs-oracle hash equality runs in scripts/check_correctness)."""
    from daft_minhash_dedupe_ray.synth import cached_table_path

    p = cached_table_path(300, seed=42, with_images=True)
    keep = [r[0] for r in duckdb.sql(so.image_dhash_keep_sql(p)).fetchall()]
    clusters = duckdb.sql(so.image_dhash_clusters_sql(p)).fetchall()
    assert len(keep) == len(clusters)
    assert keep == sorted(keep) and len(set(keep)) == len(keep)


def test_sql_image_dedupe_keep_end_to_end():
    """image_dedupe_keep_sql == the flagship MinHashDedupePipeline survivor
    set (caption bands + pHash Hamming + CC + min-node-hash keeper) on a
    small slice of the persisted synth table."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import NORTH_STAR_CONFIG
    from daft_minhash_dedupe_ray.pipelines.dedupe import MinHashDedupePipeline
    from daft_minhash_dedupe_ray.synth import cached_table_path

    path = cached_table_path(300, seed=7)
    out = MinHashDedupePipeline(NORTH_STAR_CONFIG)(rd.read_parquet(path), num_actors=2)
    eng = sorted(out.select_columns(["image_id"]).to_pandas()["image_id"].tolist())
    ora = [r[0] for r in duckdb.sql(so.image_dedupe_keep_sql(path)).fetchall()]
    assert eng == ora
    assert len(ora) < 300  # the synth table plants duplicates


def test_sql_hll_distinct_matches_sketch():
    """hll_distinct_sql == the engine's HLL registers + estimate on a small
    two-group fixture (register ranks, exact-rational indicator sum and the
    rounded Flajolet estimate all reproduced in DuckDB)."""
    from daft_minhash_dedupe_ray.functions.sketch import (
        estimate,
        registers_from_hashes,
    )
    from daft_minhash_dedupe_ray.hashing import token_hashes_flat

    texts = [
        "the quick brown fox",
        "jumps over the lazy dog",
        "pack my box",
        "five dozen jugs",
        "the quick quick",
    ]
    langs = ["en", "en", "fr", "fr", "en"]
    c2 = duckdb.connect()
    c2.execute(
        "CREATE TABLE documents AS SELECT unnest(?) AS doc_id, unnest(?) AS text, unnest(?) AS lang",
        [list(range(5)), texts, langs],
    )
    got = dict(c2.execute(so.hll_distinct_sql(p=12)).fetchall())
    ref = {}
    for g in ("en", "fr"):
        toks = set()
        for t, l in zip(texts, langs):
            if l == g:
                toks.update(t.split())
        th, _ = token_hashes_flat(sorted(toks))
        ref[g] = int(round(estimate(registers_from_hashes(th, 12))))
    assert got == ref


def test_sql_corpus_assembly_end_to_end(ray_session):
    """corpus_assembly_sql == assemble_corpus on a small synthetic docs
    table: the 4-stage composition (quality gate -> exact dedupe -> MinHash
    near-dedupe -> span removal) must agree row-for-row including the
    cleaned text and removed-span counts."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.pipelines.corpus import assemble_corpus

    rng = np.random.RandomState(5)
    words = np.array([f"tok{i}" for i in range(40)])
    texts = [" ".join(words[rng.choice(40, rng.randint(2, 30))]) for _ in range(120)]
    for i in range(0, 40, 4):
        texts[i + 1] = texts[i]  # exact dups
    for i in range(40, 80, 4):
        texts[i + 1] = texts[i] + " extraword"  # near dups
    shared = " ".join(words[rng.choice(40, 12)])
    texts[100] = texts[100] + " " + shared
    texts[101] = texts[101] + " " + shared  # long duplicated span
    t = pa.table(
        {"doc_id": pa.array(np.arange(120), pa.int64()), "text": pa.array(texts)}
    )
    eng = (
        assemble_corpus(rd.from_arrow(t), num_actors=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    c2 = duckdb.connect()
    c2.register("documents", t)
    ora = c2.execute(so.corpus_assembly_sql()).df()
    assert eng["doc_id"].tolist() == ora["doc_id"].tolist()
    assert eng["text"].tolist() == ora["text"].tolist()
    assert eng["n_spans_removed"].tolist() == ora["n_spans_removed"].tolist()
    assert len(eng) < 120  # stages actually dropped rows


def test_sql_audio_fingerprint_bit_exact():
    """audio_fingerprint_select reproduces the engine's integer square-wave
    fingerprint bit-for-bit from the raw RIFF/PCM16 payload (positional
    sample decode + baked period constants + HUGEINT energy comparisons)."""
    from daft_minhash_dedupe_ray.functions.audio import (
        audio_fingerprints64_int,
        cached_audio_dups_path,
        wav_decode,
    )
    import pyarrow.parquet as pq

    path = cached_audio_dups_path(60, seed=3, dup_rate=0.4)
    t = pq.read_table(path)
    truth = {}
    for aid, blob, fmt in zip(
        t["audio_id"].to_pylist(), t["bytes"].to_pylist(), t["fmt"].to_pylist()
    ):
        if fmt != "wav" or blob is None:
            continue
        s = wav_decode(blob)[0]
        if len(s) < 4:
            continue
        truth[aid] = int(audio_fingerprints64_int([s])[0])
    rows = duckdb.sql(
        "SELECT * FROM " + so.audio_fingerprint_select(path) + " q"
    ).fetchall()
    assert len(rows) == len(truth)
    for aid, afp in rows:
        assert truth[aid] == int(afp)


def test_sql_audio_dedupe_keep_end_to_end(ray_session):
    """audio_dedupe_keep_sql == the engine's audio near-dup survivor set
    (fingerprint + Hamming banding + verify + CC + min-id keep) on a fixture
    with planted gain-scaled noisy duplicates."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.audio import (
        audio_dedupe_candidates,
        cached_audio_dups_path,
    )
    from daft_minhash_dedupe_ray.stages.merge import merge_keep
    from daft_minhash_dedupe_ray.state.dist_union_find import cluster_edges

    path = cached_audio_dups_path(60, seed=3, dup_rate=0.4)
    cfg = DedupeConfig(
        index_col="audio_id", content_col="bytes", phash_col=None, phash_max_hamming=3
    )
    ds = rd.read_parquet(path)
    edges = audio_dedupe_candidates(ds, cfg)
    assign = cluster_edges(edges, num_actors=2)
    out = merge_keep(ds, assign, cfg)
    eng = sorted(out.select_columns(["audio_id"]).to_pandas()["audio_id"].tolist())
    ora = [r[0] for r in duckdb.sql(so.audio_dedupe_keep_sql(path, 3)).fetchall()]
    assert eng == ora
    assert len(ora) < 60 + 24  # some planted dups must collapse


def test_sql_audio_fingerprint_centered_window_long_clips(tmp_path):
    """Round-4 review fix: the fingerprint window is CENTERED (chunk-aligned)
    so clips sharing ~4 s of leading content — shared intros, exact leading
    silence — no longer systematically collide; same-length gain variants
    still match; and the SQL oracle reproduces the centered window
    bit-for-bit on clips LONGER than FP_WINDOW."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from daft_minhash_dedupe_ray.functions.audio import (
        FP_WINDOW,
        audio_fingerprints64_int,
        fp_window_start,
        wav_encode,
    )

    assert fp_window_start(FP_WINDOW) == 0
    assert fp_window_start(100) == 0
    s = fp_window_start(200_000)
    assert s % 4 == 0 and abs(s - (200_000 - FP_WINDOW) // 2) < 4

    sr = 8_000
    n = 80_000  # 10 s: window covers the middle 4.1 s
    rng = np.random.RandomState(7)
    t = np.arange(n) / sr
    tail_a = np.clip(np.round(6000 * np.sin(2 * np.pi * 440 * t)), -32768, 32767)
    tail_b = np.clip(np.round(6000 * np.sin(2 * np.pi * 1337 * t)), -32768, 32767)
    shared = np.clip(np.round(5000 * np.sin(2 * np.pi * 220 * t[:40_000])), -32768, 32767)
    clip_a = np.concatenate([shared, tail_a[40_000:]]).astype(np.int16)
    clip_b = np.concatenate([shared, tail_b[40_000:]]).astype(np.int16)
    silent_a = np.concatenate([np.zeros(40_000, np.int16), tail_a[40_000:].astype(np.int16)])
    silent_b = np.concatenate([np.zeros(40_000, np.int16), tail_b[40_000:].astype(np.int16)])
    fps = audio_fingerprints64_int([clip_a, clip_b, silent_a, silent_b])
    # distinct middles -> distinct fingerprints despite 5 s shared prefix
    assert fps[0] != fps[1] and fps[2] != fps[3]
    # gain variant of a long clip still matches (window start is length-only)
    ga = np.clip(np.round(clip_a.astype(np.float64) * 0.6), -32768, 32767)
    fg = audio_fingerprints64_int([ga])[0]
    assert bin(int(fps[0]) ^ int(fg)).count("1") <= 3

    # SQL parity on long clips (the centered start actually fires)
    blobs = [wav_encode(c.astype(np.int16), sr) for c in (clip_a, clip_b, silent_a)]
    path = str(tmp_path / "aud.parquet")
    pq.write_table(
        pa.table(
            {
                "audio_id": pa.array([0, 1, 2], pa.int64()),
                "bytes": pa.array(blobs, pa.binary()),
                "fmt": pa.array(["wav"] * 3),
                "sample_rate": pa.array([sr] * 3, pa.int32()),
            }
        ),
        path,
    )
    rows = dict(
        duckdb.sql("SELECT * FROM " + so.audio_fingerprint_select(path) + " q").fetchall()
    )
    assert {k: int(v) for k, v in rows.items()} == {
        0: int(fps[0]),
        1: int(fps[1]),
        2: int(fps[2]),
    }
