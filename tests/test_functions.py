"""Training-data operator family: text analysis, similarity, multimodal."""

import numpy as np
import pyarrow as pa
import pytest

from daft_minhash_dedupe_ray.functions.textops import (
    LangId,
    QualityScorer,
    distinct_token_count_batch,
    fingerprint_batch,
    rolling_fingerprint_batch,
    token_count_batch,
)


def _docs(texts):
    return pa.table(
        {"doc_id": pa.array(list(range(len(texts))), pa.int64()), "text": pa.array(texts)}
    )


def test_token_counts():
    b = token_count_batch(_docs(["a b c", "", "  x  ", "one"]), "text")
    assert b["n_tokens"].to_pylist() == [3, 0, 1, 1]


def test_distinct_token_counts():
    b = distinct_token_count_batch(_docs(["a b a b c", "", "x x x"]), "text")
    assert b["n_distinct_tokens"].to_pylist() == [3, 0, 1]


def test_quality_scorer():
    b = QualityScorer("text")(_docs(["Hello, World!", "abc"]))
    assert b["n_chars_q"].to_pylist() == [13, 3]
    assert b["n_tokens"].to_pylist() == [2, 1]
    assert b["n_punct"].to_pylist() == [2, 0]  # "," and "!"
    assert b["n_upper"].to_pylist() == [2, 0]


def test_lang_id_heuristic():
    b = LangId("text")(
        _docs(
            [
                "the cat and the dog sing of the morning",
                "der hund und die katze singen schnell",
                "",
            ]
        )
    )
    assert b["lang_pred"].to_pylist()[:2] == ["en", "de"]
    assert b["lang_pred"].to_pylist()[2] == "und"


def test_fingerprints_deterministic_and_edit_robust():
    b1 = fingerprint_batch(_docs(["hello world", "hello world", "other"]), "text")
    fps = b1["fingerprint"].to_pylist()
    assert fps[0] == fps[1] != fps[2]
    long = "w" + " w".join(str(i) for i in range(50))
    b2 = rolling_fingerprint_batch(_docs([long, long + " extra tail"]), "text")
    # winnowing min over rolling windows is robust to a small tail edit
    assert b2["doc_fingerprint"].to_pylist()[0] == b2["doc_fingerprint"].to_pylist()[1]


def test_exact_dedup(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.similarity import exact_dedup

    t = pa.table(
        {
            "doc_id": pa.array([5, 1, 2, 3], pa.int64()),
            "text": pa.array(["same", "same", "same", "unique"]),
        }
    )
    out = exact_dedup(rd.from_arrow(t), "text", "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]  # min id kept per text


def test_ann_topk_exact(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.similarity import ann_topk

    rng = np.random.RandomState(0)
    emb = rng.randn(100, 16)
    t = pa.table(
        {
            "vec_id": pa.array(list(range(100)), pa.int64()),
            "embedding": pa.array([list(map(float, e)) for e in emb]),
        }
    )
    q = emb[7]
    out = ann_topk(rd.from_arrow(t), q[None, :], k=5).to_pandas()
    # brute-force oracle
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = en @ (q / np.linalg.norm(q))
    want = set(np.argsort(-sims)[:5].tolist())
    assert set(out["vec_id"]) == want
    assert out["vec_id"].iloc[0] == 7  # self is the top hit


def test_cosine_pairs_exact_vs_lsh(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.similarity import cosine_dup_pairs

    rng = np.random.RandomState(1)
    base = rng.randn(30, 8)
    # plant near-dup pairs: rows 30..39 are tiny perturbations of rows 0..9
    near = base[:10] + rng.randn(10, 8) * 0.01
    emb = np.vstack([base, near])
    t = pa.table(
        {
            "vec_id": pa.array(list(range(40)), pa.int64()),
            "embedding": pa.array([list(map(float, e)) for e in emb]),
        }
    )
    exact = cosine_dup_pairs(rd.from_arrow(t), threshold=0.99).to_pandas()
    got = set(zip(exact["u"], exact["v"]))
    assert {(i, 30 + i) for i in range(10)} <= got
    lsh = cosine_dup_pairs(rd.from_arrow(t), threshold=0.99, n_planes=6).to_pandas()
    got_lsh = set(zip(lsh["u"], lsh["v"]))
    assert got_lsh <= got  # LSH path never invents pairs
    assert len(got_lsh) >= 5  # and recalls most planted near-identical pairs


def test_simhash_dedupe_clusters_near_identical(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.similarity import simhash_candidates
    from daft_minhash_dedupe_ray.state.union_find import connected_components_oracle

    base = "w" + " w".join(str(i) for i in range(60))
    texts = [base, base + " tail", "completely different words here now ok yes"]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(texts)})
    cfg = DedupeConfig(index_col="doc_id", content_col="text", phash_col=None, phash_max_hamming=6)
    edges = simhash_candidates(rd.from_arrow(t), cfg, "text", "doc_id").to_pandas()
    assign = connected_components_oracle(
        list(zip(edges["u"].astype(np.uint64).astype(int), edges["v"].astype(np.uint64).astype(int)))
    )
    n0, n1, n2 = (int(np.int64(i).astype(np.uint64)) for i in (0, 1, 2))
    assert assign.get(n0, n0) == assign.get(n1, n1)
    assert assign.get(n2, n2) != assign.get(n0, n0)


def test_word_jaccard_pairs(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.similarity import word_jaccard_pairs

    t = _docs(["a b c d", "a b c e", "x y z w", "a b c d"])
    out = word_jaccard_pairs(rd.from_arrow(t), 0.6, "text", "doc_id").to_pandas()
    got = {(int(u), int(v)): round(j, 3) for u, v, j in zip(out["u"], out["v"], out["jaccard"])}
    assert got[(0, 3)] == 1.0
    assert got[(0, 1)] == round(3 / 5, 3)
    assert (0, 2) not in got and (2, 3) not in got


def test_multimodal_decode_resize_phash(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.multimodal import (
        ImageDecodeStage,
        ImageResizeStage,
        PHashStage,
    )
    from daft_minhash_dedupe_ray.synth import generate_table, ppm_decode

    t = generate_table(40, seed=13, with_images=True)
    ds = rd.from_arrow(t)
    dec = ds.map_batches(ImageDecodeStage(), batch_format="pyarrow", batch_size=16).to_pandas()
    assert dec["decode_ok"].all()
    assert (dec["mean_luma"] > 0).all()

    rs = ds.map_batches(
        ImageResizeStage(16, 16), batch_format="pyarrow", batch_size=16
    ).to_pandas()
    px = ppm_decode(rs["bytes"].iloc[0])
    assert px.shape == (16, 16, 3)
    assert (rs["w"] == 16).all() and (rs["h"] == 16).all()

    ph = ds.map_batches(PHashStage(), batch_format="pyarrow", batch_size=16).to_pandas()
    # recomputed phash matches the stored column except planted bit flips
    from daft_minhash_dedupe_ray.hashing import hamming_distance64

    d = hamming_distance64(
        ph["phash"].to_numpy().astype(np.int64).view(np.uint64),
        t["phash"].to_numpy().astype(np.int64).view(np.uint64),
    )
    assert (d <= 3).all()


def test_multimodal_unsupported_fmt_stub():
    from daft_minhash_dedupe_ray.functions.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff", "jpeg")


def test_fused_equals_modular(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import NORTH_STAR_CONFIG
    from daft_minhash_dedupe_ray.pipelines.dedupe import MinHashDedupePipeline
    from daft_minhash_dedupe_ray.synth import generate_table

    t = generate_table(500, seed=99, with_images=False)
    ds = rd.from_arrow(t)
    pipe = MinHashDedupePipeline(NORTH_STAR_CONFIG)
    out_mod = pipe(ds, num_actors=3).to_pandas()
    out_fused, _, _ = pipe.run_fused(ds, num_actors=3)
    assert sorted(out_mod["image_id"]) == sorted(out_fused.to_pandas()["image_id"])


def test_ivf_topk_recall(ray_session, tmp_path):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.similarity import (
        ann_topk,
        build_ivf_index,
        ivf_topk,
    )

    rng = np.random.RandomState(4)
    emb = rng.randn(400, 16)
    t = pa.table(
        {
            "vec_id": pa.array(list(range(400)), pa.int64()),
            "embedding": pa.array([list(map(float, e)) for e in emb]),
        }
    )
    idx = str(tmp_path / "ivf")
    build_ivf_index(rd.from_arrow(t), idx, n_clusters=8)
    q = emb[3][None, :]
    exact = set(ann_topk(rd.from_arrow(t), q, 10).to_pandas()["vec_id"])
    approx = set(ivf_topk(idx, q, 10, nprobe=4).to_pandas()["vec_id"])
    assert 3 in approx  # self always found (its own cluster is the nearest)
    assert len(approx & exact) >= 6  # decent recall at nprobe=4/8
    full = set(ivf_topk(idx, q, 10, nprobe=8).to_pandas()["vec_id"])
    assert full == exact  # probing every cluster is exact


def test_wav_codec_roundtrip_and_chunk_walk():
    import struct

    from daft_minhash_dedupe_ray.functions.audio import wav_decode, wav_encode

    s = (np.sin(np.arange(800) / 10.0) * 20000).astype(np.int16)
    data = wav_encode(s, 8000)
    out, sr = wav_decode(data)
    assert sr == 8000 and np.array_equal(out, s)
    # decoder must walk past extra chunks before data (real WAVs have LIST etc.)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = data[:12] + extra + data[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    out2, _ = wav_decode(patched)
    assert np.array_equal(out2, s)
    # stereo downmix
    inter = np.empty(400, dtype=np.int16)
    inter[0::2], inter[1::2] = 1000, 3000
    stereo = wav_encode(inter, 8000)
    # patch channels=2, byte_rate/block_align accordingly
    stereo = stereo[:22] + struct.pack("<H", 2) + stereo[24:]
    mono, _ = wav_decode(stereo)
    assert np.all(mono == 2000)


def test_audio_feature_stage_matches_direct(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.audio import (
        AudioFeatureStage,
        synth_audio_table,
        wav_decode,
    )

    t = synth_audio_table(120, seed=5)
    out = (
        rd.from_arrow(t)
        .map_batches(AudioFeatureStage, concurrency=2, batch_size=32, batch_format="pyarrow")
        .to_pandas()
        .sort_values("audio_id")
        .reset_index(drop=True)
    )
    assert len(out) == 120
    # unsupported/null rows survive with decode_ok False
    bad = out[~out["decode_ok"]]
    assert len(bad) > 0 and (bad["rms"] == 0).all()
    # spot-check features against a direct computation
    row = out[out["decode_ok"]].iloc[3]
    blob = t["bytes"][int(row["audio_id"])].as_py()
    s, sr = wav_decode(blob)
    x = s.astype(np.float64) / 32768.0
    assert row["duration_s"] == round(len(x) / sr, 6)
    assert abs(row["rms"] - np.sqrt(np.mean(x * x))) < 1e-5
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
    assert abs(row["spectral_centroid_hz"] - (freqs * mag).sum() / mag.sum()) < 1e-2
    # synth clips are sine-dominated: centroid should sit near the tone
    ok = out[out["decode_ok"]]
    assert (ok["spectral_centroid_hz"] > 50).all()


def test_audio_resample_stage(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.audio import (
        AudioResampleStage,
        synth_audio_table,
        wav_decode,
    )

    t = synth_audio_table(60, seed=9, sample_rate=8000)
    out = (
        rd.from_arrow(t)
        .map_batches(
            lambda b: AudioResampleStage(4000)(b), batch_size=16, batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("audio_id")
        .reset_index(drop=True)
    )
    src = t.to_pandas()
    for i in range(len(out)):
        if src["fmt"][i] != "wav" or src["bytes"][i] is None:
            assert out["bytes"][i] == src["bytes"][i]  # untouched pass-through
            continue
        s0, _ = wav_decode(src["bytes"][i])
        s1, sr1 = wav_decode(out["bytes"][i])
        assert sr1 == 4000
        assert abs(len(s1) - len(s0) / 2) <= 1
    assert (out["sample_rate"] == 4000).all()


def test_audio_unsupported_fmt_stub():
    import pytest as _pytest

    from daft_minhash_dedupe_ray.functions.audio import decode_audio

    with _pytest.raises(NotImplementedError):
        decode_audio(b"xx", "mp3")


def test_audio_fingerprint_invariance_and_dedupe_recall(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.audio import (
        audio_dedupe_candidates,
        audio_fingerprint64,
        synth_audio_table_with_dups,
        wav_decode,
    )
    from daft_minhash_dedupe_ray.hashing import hamming_distance64
    from daft_minhash_dedupe_ray.stages.merge import merge_keep
    from daft_minhash_dedupe_ray.state.dist_union_find import cluster_edges

    # exact amplitude invariance (float scaling leaves every band-sign bit)
    rng = np.random.RandomState(0)
    s = (np.sin(np.arange(4000) / 7.0) * 15000 + rng.randn(4000) * 300).astype(np.int16)
    assert audio_fingerprint64(s, 8000) == audio_fingerprint64(s * 0.37, 8000)

    t, pairs = synth_audio_table_with_dups(150, seed=3, dup_rate=0.4)
    # planted dup fingerprints stay within the Hamming verify budget — both
    # the float FFT fingerprint and the integer (SQL-replayable) one the
    # dedupe path uses
    from daft_minhash_dedupe_ray.functions.audio import audio_fingerprint64_int

    blobs = t["bytes"].to_pylist()
    for a, b in pairs[:10]:
        fa = audio_fingerprint64(*wav_decode(blobs[a]))
        fb = audio_fingerprint64(*wav_decode(blobs[b]))
        d = hamming_distance64(np.array([fa], np.uint64), np.array([fb], np.uint64))[0]
        assert d <= 3
        ia = audio_fingerprint64_int(wav_decode(blobs[a])[0])
        ib = audio_fingerprint64_int(wav_decode(blobs[b])[0])
        di = hamming_distance64(np.array([ia], np.uint64), np.array([ib], np.uint64))[0]
        assert di <= 3
    # integer fingerprint: exact invariance under exact-float gain
    s16 = wav_decode(blobs[pairs[0][0]])[0]
    assert audio_fingerprint64_int(s16) == audio_fingerprint64_int(
        s16.astype(np.float64) * 0.25
    )

    cfg = DedupeConfig(
        index_col="audio_id", content_col="bytes", phash_col=None, phash_max_hamming=3
    )
    ds = rd.from_arrow(t)
    edges = audio_dedupe_candidates(ds, cfg)
    assign = cluster_edges(edges, num_actors=2)
    adf = assign.to_pandas()
    rep = dict(zip(adf["u"].astype(np.uint64), adf["rep"].astype(np.uint64)))
    same = sum(
        rep.get(np.uint64(a), np.uint64(a)) == rep.get(np.uint64(b), np.uint64(b))
        for a, b in pairs
    )
    assert same / len(pairs) >= 0.95  # planted-pair recall
    out = merge_keep(ds, assign, cfg)
    n_out = out.count()
    assert n_out < len(t)  # duplicates actually removed
    assert n_out >= len(t) - len(pairs) - 5  # and not over-merged wildly


def test_kmeans_assign_matches_numpy_oracle(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.similarity import (
        embedding_matrix,
        kmeans_assign,
        train_centroids,
    )

    rng = np.random.RandomState(11)
    n, d, k = 400, 16, 5
    vecs = rng.randn(n, d).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t)
    out = (
        kmeans_assign(ds, n_clusters=k, seed=7)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # oracle: retrain identically, assign with plain numpy
    cent = train_centroids(rd.from_arrow(t), k, "embedding", seed=7)
    en = embedding_matrix(t, "embedding")
    en = en / np.maximum(np.linalg.norm(en, axis=1, keepdims=True), 1e-12)
    sims = en @ cent.T
    exp = np.argmax(sims, axis=1)
    assert (out["cluster"].values == exp).all()
    np.testing.assert_allclose(out["sim"].values, sims[np.arange(n), exp], rtol=1e-9)
    assert out["cluster"].nunique() > 1  # genuinely partitions the space
