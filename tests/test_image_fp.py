"""dHash/aHash perceptual-hash tests: invariance to mild noise and
brightness, discrimination of unrelated images, and the dhash-based dedupe
pipeline recall on planted pairs."""

import numpy as np
import pyarrow as pa

from daft_minhash_dedupe_ray.functions.multimodal import (
    FingerprintStage,
    ahash64,
    dhash64,
    image_fingerprint_candidates,
)
from daft_minhash_dedupe_ray.hashing import hamming_distance64
from daft_minhash_dedupe_ray.synth import ppm_encode


def _img(seed, h=32, w=32):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 200, (h, w, 3)).astype(np.uint8)
    # smooth so perceptual structure exists (pure noise defeats any phash)
    k = np.ones((5, 5)) / 25
    sm = np.stack(
        [
            np.convolve(base[:, :, c].ravel().astype(float), k.ravel(), "same").reshape(h, w)
            for c in range(3)
        ],
        axis=2,
    )
    return np.clip(sm * 2, 0, 255).astype(np.uint8)


def _ham(a, b):
    return int(
        hamming_distance64(
            np.array([a], np.uint64), np.array([b], np.uint64)
        )[0]
    )


def test_dhash_noise_and_brightness_invariance():
    px = _img(1)
    noisy = np.clip(
        px.astype(int) + np.random.default_rng(2).integers(-4, 5, px.shape), 0, 255
    ).astype(np.uint8)
    brighter = np.clip(px.astype(int) + 30, 0, 255).astype(np.uint8)
    assert _ham(dhash64(px), dhash64(noisy)) <= 6
    assert _ham(dhash64(px), dhash64(brighter)) <= 8  # gradient signs mostly survive (clipping flattens a few)
    assert _ham(ahash64(px), ahash64(noisy)) <= 8


def test_dhash_discriminates_unrelated():
    dists = [
        _ham(dhash64(_img(s)), dhash64(_img(s + 100))) for s in range(5)
    ]
    assert min(dists) >= 12, dists  # random pairs sit near 32


def test_fingerprint_stage_columns(ray_session):
    rows = []
    for s in range(6):
        rows.append(ppm_encode(_img(s)))
    t = pa.table(
        {
            "image_id": pa.array([f"i{s}" for s in range(6)]),
            "bytes": pa.array(rows, pa.binary()),
            "fmt": pa.array(["ppm"] * 5 + ["jpeg"]),  # unsupported fmt -> 0s
        }
    )
    out = FingerprintStage()(t)
    for col in ("phash", "dhash", "ahash"):
        vals = out[col].to_pylist()
        assert len(set(vals[:5])) == 5  # distinct images -> distinct hashes
        assert vals[5] == 0


def test_dhash_dedupe_recall_planted(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.state.dist_union_find import cluster_edges
    from daft_minhash_dedupe_ray.stages.merge import merge_keep

    rng = np.random.default_rng(3)
    blobs, ids = [], []
    planted = []
    for s in range(40):
        px = _img(s + 500)
        blobs.append(ppm_encode(px))
        ids.append(2 * s)
        # every 4th image gets a noisy near-duplicate
        if s % 4 == 0:
            noisy = np.clip(px.astype(int) + rng.integers(-3, 4, px.shape), 0, 255)
            blobs.append(ppm_encode(noisy.astype(np.uint8)))
            ids.append(2 * s + 1)
            planted.append((2 * s, 2 * s + 1))
    t = pa.table(
        {
            "image_id": pa.array(ids, pa.int64()),
            "bytes": pa.array(blobs, pa.binary()),
            "fmt": pa.array(["ppm"] * len(ids)),
        }
    )
    # 8 sub-bands -> pigeonhole guarantees recall of every pair with
    # Hamming distance < 8; the verify step then enforces <= 6
    cfg = DedupeConfig(
        index_col="image_id",
        content_col="bytes",
        phash_col=None,
        phash_max_hamming=6,
        phash_bands=8,
    )
    ds = rd.from_arrow(t)
    edges = image_fingerprint_candidates(ds, cfg, fingerprint="dhash")
    assign = cluster_edges(edges, num_actors=2)
    out = merge_keep(ds, assign, cfg)
    survivors = set(out.select_columns(["image_id"]).to_pandas()["image_id"])
    # each planted pair collapses to one survivor; distinct images survive
    for u, v in planted:
        assert (u in survivors) != (v in survivors), (u, v)
    assert len(survivors) == len(ids) - len(planted)
