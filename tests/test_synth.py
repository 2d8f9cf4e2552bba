"""Synthetic fixture generator (FIXTURES.md F1): determinism, schema, codec."""

import numpy as np
import pyarrow as pa

from daft_minhash_dedupe_ray.synth import (
    generate_table,
    phash64,
    ppm_decode,
    ppm_encode,
    psnr,
)

EXPECTED_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def test_schema_matches_input_hint():
    t = generate_table(50, seed=1)
    assert t.schema.equals(EXPECTED_SCHEMA)


def test_deterministic():
    assert generate_table(120, seed=42).equals(generate_table(120, seed=42))
    assert not generate_table(120, seed=42).equals(generate_table(120, seed=43))


def test_ppm_roundtrip_lossless():
    t = generate_table(5, seed=7)
    for i in range(5):
        px = ppm_decode(t["bytes"][i].as_py())
        assert px.shape == (32, 32, 3)
        again = ppm_decode(ppm_encode(px))
        assert (px == again).all()
        assert psnr(px, again) == float("inf")


def test_phash_consistent_with_pixels():
    t = generate_table(30, seed=9)
    # rows outside image-near-dup clusters carry the exact phash of their pixels;
    # cluster members have planted bit flips within Hamming 3
    from daft_minhash_dedupe_ray.hashing import hamming_distance64

    n_exact = 0
    for i in range(30):
        px = ppm_decode(t["bytes"][i].as_py())
        actual = phash64(px)
        stored = t["phash"][i].as_py()
        d = hamming_distance64(
            np.array([np.int64(actual)]).astype(np.uint64),
            np.array([np.int64(stored)]).astype(np.uint64),
        )[0]
        assert d <= 3
        n_exact += d == 0
    assert n_exact > 0


def test_planted_structure_present():
    t = generate_table(400, seed=42, with_images=False)
    caps = t["caption"].to_pylist()
    # exact duplicates exist
    assert len(set(caps)) < len(caps)
    # hot caption shared by ~1%
    from collections import Counter

    top = Counter(caps).most_common(1)[0][1]
    assert top >= 3
    # empty/short captions exist
    assert any(c == "" for c in caps)
