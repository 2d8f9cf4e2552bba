"""Incremental ingest dedupe: Bloom sketch semantics, persisted corpus hash
index build/probe, and exact parity between the indexed path, the cogroup
anti-join path, and a pure-python oracle."""

import numpy as np
import pyarrow as pa
import pytest

from daft_minhash_dedupe_ray.state.bloom import BloomFilter


def test_bloom_no_false_negatives_and_bounded_fp():
    rng = np.random.RandomState(7)
    members = rng.randint(0, 2**63, 20_000).astype(np.uint64)
    bf = BloomFilter.sized(len(members), fp_rate=1e-3)
    bf.add_hashes(members)
    # no false negatives, ever
    assert bf.contains(members).all()
    probes = rng.randint(0, 2**63, 50_000).astype(np.uint64)
    fresh = probes[~np.isin(probes, members)]
    fp = bf.contains(fresh).mean()
    assert fp < 5e-3, fp  # target 1e-3, generous margin
    # empty probe / empty add are no-ops
    assert bf.contains(np.zeros(0, np.uint64)).shape == (0,)
    bf.add_hashes(np.zeros(0, np.uint64))


def test_bloom_merge_and_roundtrip(tmp_path):
    a = BloomFilter.sized(1000, 1e-3, seed=3)
    b = BloomFilter.sized(1000, 1e-3, seed=3)
    ha = np.arange(100, dtype=np.uint64) * np.uint64(2654435761)
    hb = np.arange(100, 200, dtype=np.uint64) * np.uint64(2654435761)
    a.add_hashes(ha)
    b.add_hashes(hb)
    a.merge(b)
    assert a.contains(ha).all() and a.contains(hb).all()
    p = str(tmp_path / "bf.npz")
    a.save(p)
    back = BloomFilter.load(p)
    assert np.array_equal(back.words, a.words)
    assert back.contains(hb).all()
    with pytest.raises(ValueError):
        a.merge(BloomFilter.sized(1000, 1e-3, seed=4))


def _wave_oracle(corpus_texts, new_rows):
    """Pure-python NOT-EXISTS + min-id-wins oracle."""
    seen = set(corpus_texts)
    best = {}
    for i, t in new_rows:
        if t not in seen and (t not in best or i < best[t]):
            best[t] = i
    return sorted(best.values())


def test_indexed_incremental_dedupe_matches_oracle(ray_session, tmp_path):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.incremental import (
        build_corpus_index,
        incremental_dedupe_indexed,
    )
    from daft_minhash_dedupe_ray.functions.similarity import incremental_exact_dedupe

    rng = np.random.RandomState(11)
    vocab = [f"doc body number {i}" for i in range(400)]
    corpus_texts = [vocab[i] for i in rng.randint(0, 400, 600)]
    new_rows = [(int(i), vocab[j]) for i, j in enumerate(rng.randint(0, 400, 500))]
    corpus = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(10_000, 10_000 + len(corpus_texts)), pa.int64()),
                "text": pa.array(corpus_texts),
            }
        )
    )
    new = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in new_rows], pa.int64()),
                "text": pa.array([t for _, t in new_rows]),
            }
        )
    )
    idx = str(tmp_path / "corpus_index")
    meta = build_corpus_index(corpus, idx, num_partitions=8)
    assert sum(meta["parts"].values()) == len(set(corpus_texts))
    got = sorted(
        incremental_dedupe_indexed(new, idx, text_col="text", id_col="doc_id")
        .to_pandas()["doc_id"]
        .tolist()
    )
    want = _wave_oracle(corpus_texts, new_rows)
    assert got == want
    # parity with the shuffle-the-corpus exact path
    alt = sorted(
        incremental_exact_dedupe(new, corpus, text_col="text", id_col="doc_id")
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert alt == want


def test_indexed_dedupe_edge_cases(ray_session, tmp_path):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.incremental import (
        build_corpus_index,
        incremental_dedupe_indexed,
    )

    corpus = rd.from_arrow(pa.table({"doc_id": [1], "text": ["A"]}))
    idx = str(tmp_path / "ix")
    build_corpus_index(corpus, idx, num_partitions=4)
    # all-duplicate wave -> nothing survives
    wave = rd.from_arrow(pa.table({"doc_id": pa.array([5, 6], pa.int64()), "text": ["A", "A"]}))
    assert incremental_dedupe_indexed(wave, idx, "text", "doc_id").count() == 0
    # empty wave
    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert incremental_dedupe_indexed(empty, idx, "text", "doc_id").count() == 0
    # wave hitting hash ranges with no corpus partition dir at all
    wave2 = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(50), pa.int64()),
                "text": pa.array([f"unseen {i}" for i in range(50)]),
            }
        )
    )
    assert incremental_dedupe_indexed(wave2, idx, "text", "doc_id").count() == 50
    # missing index dir raises
    with pytest.raises(FileNotFoundError):
        incremental_dedupe_indexed(wave, str(tmp_path / "nope"), "text", "doc_id")
    # power-of-two enforcement
    with pytest.raises(ValueError):
        build_corpus_index(corpus, str(tmp_path / "ix9"), num_partitions=9)


def test_incremental_near_dedupe_planted_recall(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.incremental import incremental_near_dedupe

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(800)]
    corpus_texts = [" ".join(rng.choice(vocab, 60)) for _ in range(300)]
    fresh = [" ".join(rng.choice(vocab, 60)) for _ in range(150)]
    copies = []
    for i in range(100):  # near-copies: a trailing edit (Jaccard ~0.97,
        # comfortably above the 0.7 S-curve knee — threshold-straddling
        # pairs are covered by the pipeline recall tests)
        copies.append(corpus_texts[i % 300] + f" appended{i}")
    wave_texts = fresh + copies
    cfg = DedupeConfig(index_col="doc_id", content_col="text", phash_col=None)

    def tab(texts, start):
        return pa.table(
            {
                "doc_id": pa.array(np.arange(start, start + len(texts), dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        )

    corpus = rd.from_arrow(tab(corpus_texts, 0)).repartition(3)
    wave = rd.from_arrow(tab(wave_texts, 10_000)).repartition(3)
    out = incremental_near_dedupe(wave, corpus, cfg, num_partitions=4).to_pandas()
    kept = set(out["doc_id"])
    copy_ids = set(range(10_000 + len(fresh), 10_000 + len(wave_texts)))
    fresh_ids = set(range(10_000, 10_000 + len(fresh)))
    dropped_copies = len(copy_ids - kept)
    kept_fresh = len(fresh_ids & kept)
    assert dropped_copies >= 95  # planted near-copies recalled
    assert kept_fresh >= 145  # fresh docs survive (banding FPs are rare)
    # dedupe against an empty corpus is the identity
    empty = rd.from_arrow(tab([], 0))
    out2 = incremental_near_dedupe(wave, empty, cfg, num_partitions=4).to_pandas()
    assert len(out2) == len(wave_texts)


def test_band_index_matches_direct_near_dedupe(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.incremental import (
        build_band_index,
        incremental_near_dedupe,
        incremental_near_dedupe_indexed,
    )

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(600)]
    corpus_texts = [" ".join(rng.choice(vocab, 50)) for _ in range(200)]
    wave_texts = [" ".join(rng.choice(vocab, 50)) for _ in range(80)] + [
        corpus_texts[i] + f" tail{i}" for i in range(60)
    ]
    cfg = DedupeConfig(index_col="doc_id", content_col="text", phash_col=None)

    def tab(texts, start):
        return pa.table(
            {
                "doc_id": pa.array(np.arange(start, start + len(texts), dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        )

    corpus = rd.from_arrow(tab(corpus_texts, 0)).repartition(3)
    wave = rd.from_arrow(tab(wave_texts, 5000)).repartition(3)

    p = str(tmp_path / "bandidx")
    meta = build_band_index(corpus, p, cfg, num_partitions=8)
    assert meta["kind"] == "band" and sum(meta["parts"].values()) > 0

    via_index = (
        incremental_near_dedupe_indexed(wave, p, cfg).to_pandas().sort_values("doc_id")
    )
    direct = (
        incremental_near_dedupe(wave, corpus, cfg, num_partitions=8)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert via_index["doc_id"].tolist() == direct["doc_id"].tolist()
    assert len(via_index) < len(wave_texts)  # planted tails were dropped

    # a mismatched signature config refuses to probe
    with pytest.raises(ValueError):
        incremental_near_dedupe_indexed(
            wave, p, cfg.with_overrides(num_perm=128, bands=16, rows=8)
        )


def test_image_wave_near_dedupe_phash_and_caption_paths(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.incremental import incremental_image_near_dedupe

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(500)]

    def cap():
        return " ".join(rng.choice(vocab, 40))

    n_c = 200
    corpus_caps = [cap() for _ in range(n_c)]
    corpus_ph = rng.integers(0, 2**63, n_c, dtype=np.int64)

    # wave: 60 phash-near copies (<=2 bit flips, FRESH captions),
    #       40 caption near-copies (trailing edit, FRESH phash),
    #       100 fully fresh rows
    wave_caps, wave_ph, roles = [], [], []
    for i in range(60):
        flips = rng.choice(64, rng.integers(0, 3), replace=False)
        ph = corpus_ph[i]
        for b in flips:
            ph ^= np.int64(1) << np.int64(b)
        wave_caps.append(cap()); wave_ph.append(ph); roles.append("phash")
    for i in range(40):
        wave_caps.append(corpus_caps[i] + f" tail{i}")
        wave_ph.append(int(rng.integers(0, 2**63))); roles.append("caption")
    for i in range(100):
        wave_caps.append(cap()); wave_ph.append(int(rng.integers(0, 2**63))); roles.append("fresh")

    cfg = DedupeConfig(index_col="image_id", content_col="caption", phash_col="phash")

    def tab(caps, phs, start):
        return pa.table(
            {
                "image_id": pa.array([f"i{start + j}" for j in range(len(caps))], pa.string()),
                "caption": pa.array(caps, pa.string()),
                "phash": pa.array(np.asarray(phs, dtype=np.int64)),
            }
        )

    corpus = rd.from_arrow(tab(corpus_caps, corpus_ph, 0)).repartition(3)
    wave = rd.from_arrow(tab(wave_caps, wave_ph, 10_000)).repartition(3)
    out = incremental_image_near_dedupe(wave, corpus, cfg, num_partitions=4).to_pandas()
    kept = set(out["image_id"])
    by_role = {}
    for j, r in enumerate(roles):
        by_role.setdefault(r, []).append(f"i{10_000 + j}")
    phash_dropped = sum(1 for i in by_role["phash"] if i not in kept)
    caption_dropped = sum(1 for i in by_role["caption"] if i not in kept)
    fresh_kept = sum(1 for i in by_role["fresh"] if i in kept)
    assert phash_dropped >= 57  # Hamming <= 2 vs budget 3: near-certain recall
    assert caption_dropped >= 38
    assert fresh_kept >= 97


def test_update_corpus_index_absorbs_wave(ray_session, tmp_path):
    """Ingest-loop contract: dedupe wave-1, absorb its survivors, and
    wave-2 copies of wave-1 content must now be dropped — with the updated
    index byte-equivalent in behavior to a from-scratch rebuild, only
    touched partitions rewritten, and re-absorption idempotent."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.incremental import (
        build_corpus_index,
        incremental_dedupe_indexed,
        update_corpus_index,
    )

    def tab(texts, start):
        return pa.table(
            {
                "doc_id": pa.array(range(start, start + len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )

    corpus_texts = [f"corpus doc {i}" for i in range(300)]
    w1_texts = [f"wave one doc {i}" for i in range(100)] + corpus_texts[:40]
    idx = str(tmp_path / "ix")
    build_corpus_index(rd.from_arrow(tab(corpus_texts, 0)), idx, num_partitions=8)

    s1 = incremental_dedupe_indexed(
        rd.from_arrow(tab(w1_texts, 1000)), idx, text_col="text", id_col="doc_id"
    )
    s1_texts = sorted(s1.to_pandas()["text"])
    assert s1_texts == sorted(f"wave one doc {i}" for i in range(100))

    meta = update_corpus_index(rd.from_arrow(tab(s1_texts, 2000)), idx)
    assert sum(meta["parts"].values()) == 400  # 300 corpus + 100 absorbed

    # wave 2: re-sends of wave-1 survivors + genuinely new docs
    w2_texts = s1_texts[:30] + [f"wave two doc {i}" for i in range(20)]
    s2 = sorted(
        incremental_dedupe_indexed(
            rd.from_arrow(tab(w2_texts, 3000)), idx, text_col="text", id_col="doc_id"
        )
        .to_pandas()["text"]
        .tolist()
    )
    assert s2 == sorted(f"wave two doc {i}" for i in range(20))

    # parity with a from-scratch rebuild over corpus + survivors
    idx2 = str(tmp_path / "ix2")
    build_corpus_index(
        rd.from_arrow(tab(corpus_texts + s1_texts, 0)), idx2, num_partitions=8
    )
    s2b = sorted(
        incremental_dedupe_indexed(
            rd.from_arrow(tab(w2_texts, 3000)), idx2, text_col="text", id_col="doc_id"
        )
        .to_pandas()["text"]
        .tolist()
    )
    assert s2 == s2b

    # idempotent: absorbing the same survivors again changes nothing
    meta2 = update_corpus_index(rd.from_arrow(tab(s1_texts, 4000)), idx)
    assert meta2["parts"] == meta["parts"]


def test_update_band_index_absorbs_wave(ray_session, tmp_path):
    """Near-dup analogue: after absorbing wave-1 survivors, near-copies of
    them are dropped from wave-2 exactly as a rebuilt index would; config
    fingerprint still guards the update path."""
    import pytest
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.incremental import (
        build_band_index,
        incremental_near_dedupe_indexed,
        update_band_index,
    )

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(500)]

    def txts(n):
        return [" ".join(rng.choice(vocab, 40)) for _ in range(n)]

    def tab(texts, start):
        return pa.table(
            {
                "doc_id": pa.array(
                    np.arange(start, start + len(texts), dtype=np.int64)
                ),
                "text": pa.array(texts, pa.string()),
            }
        )

    cfg = DedupeConfig(index_col="doc_id", content_col="text", phash_col=None)
    corpus_texts, w1 = txts(150), txts(60)
    p = str(tmp_path / "bix")
    build_band_index(rd.from_arrow(tab(corpus_texts, 0)), p, cfg, num_partitions=8)

    s1 = incremental_near_dedupe_indexed(rd.from_arrow(tab(w1, 1000)), p, cfg)
    s1_texts = s1.to_pandas()["text"].tolist()
    assert len(s1_texts) == 60  # random texts: no near-dups of the corpus
    update_band_index(rd.from_arrow(tab(s1_texts, 2000)), p, cfg)

    # wave 2 = near-copies (tail-edited) of absorbed wave-1 docs + fresh docs
    w2 = [t + " zz" for t in s1_texts[:25]] + txts(15)
    got = sorted(
        incremental_near_dedupe_indexed(rd.from_arrow(tab(w2, 3000)), p, cfg)
        .to_pandas()["doc_id"]
        .tolist()
    )
    p2 = str(tmp_path / "bix2")
    build_band_index(
        rd.from_arrow(tab(corpus_texts + s1_texts, 0)), p2, cfg, num_partitions=8
    )
    want = sorted(
        incremental_near_dedupe_indexed(rd.from_arrow(tab(w2, 3000)), p2, cfg)
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert got == want
    assert len(got) < len(w2)  # the near-copies of absorbed docs were dropped

    with pytest.raises(ValueError):
        update_band_index(
            rd.from_arrow(tab(w2, 5000)),
            p,
            cfg.with_overrides(num_perm=128, bands=16, rows=8),
        )


def _image_fixture(seed=41):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(500)]

    def cap():
        return " ".join(rng.choice(vocab, 40))

    def tab(caps, phs, start):
        return pa.table(
            {
                "image_id": pa.array(
                    [f"i{start + j}" for j in range(len(caps))], pa.string()
                ),
                "caption": pa.array(caps, pa.string()),
                "phash": pa.array(np.asarray(phs, dtype=np.int64)),
            }
        )

    return rng, cap, tab


def test_image_band_index_matches_direct(ray_session, tmp_path):
    """incremental_image_near_dedupe_indexed == the direct cogroup form on
    the same corpus: caption-band hits AND Hamming-verified pHash hits."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.incremental import (
        build_image_band_index,
        incremental_image_near_dedupe,
        incremental_image_near_dedupe_indexed,
        update_image_band_index,
    )

    rng, cap, tab = _image_fixture(43)
    n_c = 150
    corpus_caps = [cap() for _ in range(n_c)]
    corpus_ph = rng.integers(0, 2**63, n_c, dtype=np.int64)
    wave_caps, wave_ph = [], []
    for i in range(40):  # pHash near-copies, fresh captions
        flips = rng.choice(64, rng.integers(0, 3), replace=False)
        ph = corpus_ph[i]
        for b in flips:
            ph ^= np.int64(1) << np.int64(b)
        wave_caps.append(cap()); wave_ph.append(ph)
    for i in range(30):  # caption near-copies, fresh phash
        wave_caps.append(corpus_caps[i] + f" tail{i}")
        wave_ph.append(int(rng.integers(0, 2**63)))
    for _ in range(60):  # fresh
        wave_caps.append(cap()); wave_ph.append(int(rng.integers(0, 2**63)))

    cfg = DedupeConfig(index_col="image_id", content_col="caption", phash_col="phash")
    corpus = rd.from_arrow(tab(corpus_caps, corpus_ph, 0)).repartition(3)
    wave = rd.from_arrow(tab(wave_caps, wave_ph, 10_000)).repartition(3)

    p = str(tmp_path / "imgidx")
    meta = build_image_band_index(corpus, p, cfg, num_partitions=8)
    assert meta["kind"] == "image_band"

    via_index = sorted(
        incremental_image_near_dedupe_indexed(wave, p, cfg).to_pandas()["image_id"]
    )
    direct = sorted(
        incremental_image_near_dedupe(wave, corpus, cfg, num_partitions=8)
        .to_pandas()["image_id"]
    )
    assert via_index == direct
    assert len(via_index) < 130  # planted copies were dropped

    # absorb the survivors; re-sending them (and pHash near-copies of them)
    # must now be rejected, matching a from-scratch rebuild
    surv = rd.from_arrow(
        tab(
            [wave_caps[j] for j in range(130) if f"i{10_000 + j}" in set(via_index)][:50],
            [wave_ph[j] for j in range(130) if f"i{10_000 + j}" in set(via_index)][:50],
            20_000,
        )
    )
    update_image_band_index(surv, p, cfg)
    # exact re-sends share every band -> all dropped (count, not to_pandas:
    # ray's to_pandas drops columns when every block is empty)
    assert incremental_image_near_dedupe_indexed(surv, p, cfg).count() == 0

    # config drift refuses the probe and the update
    import pytest as _pt

    with _pt.raises(ValueError):
        incremental_image_near_dedupe_indexed(
            wave, p, cfg.with_overrides(num_perm=128, bands=16, rows=8)
        )


def test_ingest_loop_catches_phash_only_dups(ray_session, tmp_path):
    """The review scenario: wave 2 sends a pHash near-copy of an absorbed
    wave-1 image with a REWRITTEN caption — the image-tier index must drop
    it (a caption-only band index would pass it)."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.pipelines.ingest import IngestCorpus

    rng, cap, tab = _image_fixture(47)
    caps1 = [cap() for _ in range(50)]
    ph1 = rng.integers(0, 2**63, 50, dtype=np.int64)
    cfg = DedupeConfig(index_col="image_id", content_col="caption", phash_col="phash")
    ic = IngestCorpus(str(tmp_path / "ic"), cfg)
    e1 = ic.ingest(rd.from_arrow(tab(caps1, ph1, 0)))
    assert e1["rows_kept"] == 50

    # wave 2: 10 pHash near-copies (1 bit flip, fresh captions) + 10 fresh
    caps2 = [cap() for _ in range(20)]
    ph2 = [int(ph1[i] ^ (np.int64(1) << np.int64(int(rng.integers(0, 64))))) for i in range(10)]
    ph2 += [int(rng.integers(0, 2**63)) for _ in range(10)]
    e2 = ic.ingest(rd.from_arrow(tab(caps2, ph2, 1000)))
    assert e2["rows_kept"] == 10  # every pHash near-copy rejected
    kept2 = set(ic.read_corpus().to_pandas()["image_id"]) - {f"i{j}" for j in range(50)}
    assert kept2 == {f"i{1000 + j}" for j in range(10, 20)}


def test_lsm_absorb_appends_deltas_then_compacts(ray_session, tmp_path):
    """100-TB absorb contract (round-3 advice): update_corpus_index appends
    a wave-sized delta segment — the corpus-sized base file is NOT rewritten
    — and the partition compacts only when the row total outgrows the
    Bloom's sized capacity; the probe and the reported distinct counts stay
    exact through both regimes."""
    import glob
    import os

    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.incremental import (
        build_corpus_index,
        incremental_dedupe_indexed,
        update_corpus_index,
    )

    def tab(texts, start):
        return pa.table(
            {
                "doc_id": pa.array(range(start, start + len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )

    base_texts = [f"base doc {i}" for i in range(600)]
    idx = str(tmp_path / "ix")
    build_corpus_index(rd.from_arrow(tab(base_texts, 0)), idx, num_partitions=2)
    bases = sorted(glob.glob(f"{idx}/part=*/hashes.parquet"))
    stat0 = {f: (os.stat(f).st_size, os.stat(f).st_mtime_ns) for f in bases}

    w1 = [f"wave one {i}" for i in range(100)]
    meta1 = update_corpus_index(rd.from_arrow(tab(w1, 1000)), idx)
    assert sum(meta1["parts"].values()) == 700  # exact distinct, not an upper bound
    for f in bases:  # absorb did not rewrite the corpus-sized base
        assert (os.stat(f).st_size, os.stat(f).st_mtime_ns) == stat0[f]
    assert glob.glob(f"{idx}/part=*/delta-*.parquet")

    # probe is exact across base + delta segments
    wave = base_texts[:20] + w1[:20] + [f"fresh {i}" for i in range(30)]
    got = incremental_dedupe_indexed(
        rd.from_arrow(tab(wave, 5000)), idx, text_col="text", id_col="doc_id"
    )
    assert sorted(got.to_pandas()["text"]) == sorted(f"fresh {i}" for i in range(30))

    # a big wave outgrows the per-partition Bloom capacity -> compaction:
    # deltas fold into the base, counts still exact, probe still exact
    w2 = [f"wave two {i}" for i in range(2500)]
    meta2 = update_corpus_index(rd.from_arrow(tab(w2, 10_000)), idx)
    assert sum(meta2["parts"].values()) == 3200
    assert not glob.glob(f"{idx}/part=*/delta-*.parquet")
    wave = base_texts[:5] + w1[:5] + w2[:5] + ["never seen"]
    got = incremental_dedupe_indexed(
        rd.from_arrow(tab(wave, 50_000)), idx, text_col="text", id_col="doc_id"
    )
    assert got.to_pandas()["text"].tolist() == ["never seen"]


def test_image_lsm_absorb_and_count_idempotency(ray_session, tmp_path):
    """Image-tier LSM absorb: deltas appended (base untouched), re-absorbing
    the same wave leaves the meta counts unchanged (exact pair counting),
    and re-sends of absorbed rows are rejected at probe time."""
    import glob
    import os

    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.incremental import (
        build_image_band_index,
        incremental_image_near_dedupe_indexed,
        update_image_band_index,
    )

    rng, cap, tab = _image_fixture(53)
    cfg = DedupeConfig(index_col="image_id", content_col="caption", phash_col="phash")
    corpus = rd.from_arrow(
        tab([cap() for _ in range(120)], rng.integers(0, 2**63, 120, dtype=np.int64), 0)
    )
    p = str(tmp_path / "imgidx")
    build_image_band_index(corpus, p, cfg, num_partitions=4)
    bases = sorted(glob.glob(f"{p}/part=*/hashes.parquet"))
    stat0 = {f: (os.stat(f).st_size, os.stat(f).st_mtime_ns) for f in bases}

    surv = tab([cap() for _ in range(40)], rng.integers(0, 2**63, 40, dtype=np.int64), 1000)
    meta1 = update_image_band_index(rd.from_arrow(surv), p, cfg)
    for f in bases:
        assert (os.stat(f).st_size, os.stat(f).st_mtime_ns) == stat0[f]
    assert glob.glob(f"{p}/part=*/delta-*.parquet")

    meta2 = update_image_band_index(rd.from_arrow(surv), p, cfg)
    assert meta2["parts"] == meta1["parts"]  # idempotent exact counts

    assert incremental_image_near_dedupe_indexed(rd.from_arrow(surv), p, cfg).count() == 0


def test_text_col_mismatch_guards(ray_session, tmp_path):
    """Absorbing or probing a corpus index with a different text column
    would silently mix hash spaces — both paths must refuse."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.incremental import (
        build_corpus_index,
        incremental_dedupe_indexed,
        update_corpus_index,
    )

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": ["a", "b"], "other": ["c", "d"]})
    idx = str(tmp_path / "ix")
    build_corpus_index(rd.from_arrow(t), idx, text_col="text")
    with pytest.raises(ValueError, match="hash spaces"):
        update_corpus_index(rd.from_arrow(t), idx, text_col="other")
    with pytest.raises(ValueError, match="hash spaces"):
        incremental_dedupe_indexed(rd.from_arrow(t), idx, text_col="other", id_col="doc_id")


def test_bloom_capacity_roundtrip_and_legacy_load(tmp_path):
    bf = BloomFilter.sized(100, 1e-3)
    assert bf.capacity == 100
    p = str(tmp_path / "bf.npz")
    bf.save(p)
    assert BloomFilter.load(p).capacity == 100
    # a pre-capacity 3-field save still loads (capacity unknown -> 0)
    legacy = str(tmp_path / "legacy.npz")
    np.savez(
        legacy,
        words=bf.words,
        meta=np.array([bf.n_bits, bf.n_hashes, bf.seed], np.int64),
    )
    old = BloomFilter.load(legacy)
    assert old.capacity == 0 and old.n_bits == bf.n_bits


def test_near_indexed_accepts_schemaless_empty_wave(ray_session, tmp_path):
    """A fully-empty MATERIALIZED wave (ray 2.49: ds.schema() is None) must
    flow through the indexed near-dedupe as an empty result, not raise."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.incremental import (
        build_band_index,
        incremental_near_dedupe_indexed,
    )

    cfg = DedupeConfig(index_col="doc_id", content_col="text", phash_col=None)
    texts = [f"common phrase repeated {i} times over" for i in range(30)]
    corpus = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(30), pa.int64()), "text": pa.array(texts)})
    )
    p = str(tmp_path / "bix")
    build_band_index(corpus, p, cfg, num_partitions=4)
    wave = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(100, 130), pa.int64()), "text": pa.array(texts)})
    )
    emptied = incremental_near_dedupe_indexed(wave, p, cfg).materialize()
    assert emptied.count() == 0
    # replaying the emptied (possibly schema-less) wave is a no-op, not a crash
    assert incremental_near_dedupe_indexed(emptied, p, cfg).count() == 0


def test_absorb_task_retry_is_idempotent(ray_session, tmp_path):
    """Round-4 review fix: a Ray retry of _update_partition AFTER its delta
    + bloom landed but before the result was consumed must report the
    absorbed count, not prev_n + 0 (the wave's own hashes would otherwise
    all read as 'already present').  Deltas are wave-fingerprint-named so
    the replay is detectable on disk and recounts exactly."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.incremental import (
        _segment_files,
        _shift_for,
        _update_partition,
        build_corpus_index,
    )

    def tab(texts, start):
        return pa.table(
            {
                "doc_id": pa.array(range(start, start + len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )

    idx = str(tmp_path / "ix")
    meta = build_corpus_index(
        rd.from_arrow(tab([f"corpus doc {i}" for i in range(300)], 0)),
        idx,
        num_partitions=1,
    )
    n0 = meta["parts"]["0"]
    shift = _shift_for(1)
    wave = pa.table(
        {"__h__": pa.array([7, 11, 13, 7, 999_999_999_999], pa.uint64())}
    )  # 4 distinct new hashes (values far below any blake2b corpus hash range
    #    would still be fine — exactness is checked, not assumed)

    first = _update_partition(wave, idx, shift, 1e-3, parts_prev={0: n0})
    n_after = first["n_hashes"][0].as_py()
    segs_after = _segment_files(f"{idx}/part={0:05d}")

    # simulate the Ray task retry: same inputs, same pre-wave parts_prev
    retry = _update_partition(wave, idx, shift, 1e-3, parts_prev={0: n0})
    assert retry["n_hashes"][0].as_py() == n_after  # NOT n0
    # and the replay appended no second delta
    assert _segment_files(f"{idx}/part={0:05d}") == segs_after
    assert n_after == n0 + 4


def test_image_absorb_task_retry_is_idempotent(ray_session, tmp_path):
    """Image-tier analogue of the retry fix: replayed _update_image_partition
    recounts distinct (key, kind, payload) pairs from disk."""
    import numpy as np
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.incremental import (
        _segment_files,
        _shift_for,
        _update_image_partition,
        build_image_band_index,
    )

    cfg = DedupeConfig(
        num_perm=16,
        threshold=0.5,
        index_col="doc_id",
        content_col="text",
        phash_col="phash",
    )

    rows = 40
    corpus = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(rows)]),
            "text": pa.array([f"caption text number {i} with words" for i in range(rows)]),
            "phash": pa.array(np.arange(rows, dtype=np.int64) * 7919, pa.int64()),
        }
    )
    idx = str(tmp_path / "imgix")
    meta = build_image_band_index(rd.from_arrow(corpus), idx, cfg, num_partitions=1)
    n0 = meta["parts"]["0"]
    shift = _shift_for(1)
    wave = pa.table(
        {
            "__h__": pa.array([3, 5, 5, 17], pa.uint64()),
            "kind": pa.array([0, 1, 1, 1], pa.uint8()),
            "payload": pa.array([0, 123, 123, 456], pa.uint64()),
        }
    )  # 3 distinct new (key, kind, payload) triples

    first = _update_image_partition(wave, idx, shift, 1e-3, parts_prev={0: n0})
    n_after = first["n_hashes"][0].as_py()
    segs_after = _segment_files(f"{idx}/part={0:05d}")

    retry = _update_image_partition(wave, idx, shift, 1e-3, parts_prev={0: n0})
    assert retry["n_hashes"][0].as_py() == n_after
    assert _segment_files(f"{idx}/part={0:05d}") == segs_after
    assert n_after == n0 + 3
