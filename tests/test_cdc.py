"""Content-defined chunking tests: reassembly, shift resistance, per-row
independence, dedupe stats vs an exact python oracle."""

import numpy as np
import pyarrow as pa

from daft_minhash_dedupe_ray.functions.cdc import (
    cdc_chunk_batch,
    cdc_dedupe_stats,
    chunk_offsets_for_buffer,
)


def _payload(n, seed):
    return np.random.default_rng(seed).integers(0, 256, n, dtype=np.uint8).tobytes()


def _table(payloads):
    return pa.table(
        {
            "image_id": pa.array([f"im{i}" for i in range(len(payloads))], pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
        }
    )


def _chunks_of(payload, **kw):
    t = cdc_chunk_batch(_table([payload]), **kw)
    return t["chunk_hash"].to_pylist(), t["chunk_len"].to_pylist()


def test_chunks_reassemble_exactly():
    p = _payload(20_000, 1)
    _, lens = _chunks_of(p)
    assert sum(lens) == len(p)
    assert all(l > 0 for l in lens)


def test_average_chunk_size_tracks_mask():
    p = _payload(300_000, 2)
    _, lens = _chunks_of(p, mask_bits=11)
    avg = sum(lens) / len(lens)
    assert 1000 < avg < 4500, avg  # ~2KB target


def test_max_chunk_enforced():
    # constant bytes -> gear hash never hits the mask -> max_chunk splits
    p = bytes(100_000)
    _, lens = _chunks_of(p, max_chunk=8192)
    assert max(lens) <= 8192


def test_shift_resistance():
    """Inserting one byte at the front realigns within O(1) chunks — the
    whole point of CDC vs fixed-size chunking."""
    p = _payload(200_000, 3)
    shifted = b"\x7f" + p
    h1, _ = _chunks_of(p)
    h2, _ = _chunks_of(shifted)
    shared = len(set(h1) & set(h2))
    assert shared >= len(h1) - 3, (len(h1), shared)


def test_per_row_independence():
    """A row chunked inside a multi-row batch gets the same chunks as alone
    (the 64-byte window never crosses a row start)."""
    a, b, c = _payload(30_000, 4), _payload(25_000, 5), _payload(40_000, 6)
    t = cdc_chunk_batch(_table([a, b, c]))
    solo = [_chunks_of(x)[0] for x in (a, b, c)]
    for i in range(3):
        mask = [x == f"im{i}" for x in t["image_id"].to_pylist()]
        got = [h for h, m in zip(t["chunk_hash"].to_pylist(), mask) if m]
        assert got == solo[i]


def test_empty_and_null_rows():
    t = cdc_chunk_batch(_table([b"", _payload(5000, 7), None]))
    ids = set(t["image_id"].to_pylist())
    assert ids == {"im1"}


def test_boundary_determinism_vs_oracle():
    """Vectorised boundaries == sequential gear-hash reference."""
    from daft_minhash_dedupe_ray.functions.cdc import _GEAR

    p = np.frombuffer(_payload(50_000, 8), np.uint8)
    mask = (1 << 11) - 1
    h = 0
    seq_cuts = []
    for j, byte in enumerate(p):
        h = ((h << 1) + int(_GEAR[byte])) & ((1 << 64) - 1)
        if j + 1 >= 64 and (h & mask) == 0:
            seq_cuts.append(j + 1)
    offs = np.array([0, len(p)], dtype=np.int64)
    cuts, _ = chunk_offsets_for_buffer(p, offs, mask_bits=11, max_chunk=1 << 30)
    assert sorted(set(seq_cuts) | {len(p)}) == cuts.tolist()


def test_cdc_dedupe_stats_planted(ray_session):
    import ray.data as rd

    base = _payload(60_000, 9)
    uniq = _payload(30_000, 10)
    # im0 == im1 exactly; im2 unique -> unique_bytes ~= 60k + 30k
    ds = rd.from_arrow(_table([base, base, uniq]))
    out = cdc_dedupe_stats(ds).to_pydict()
    assert out["total_bytes"][0] == 150_000
    assert out["unique_bytes"][0] == 90_000
    assert abs(out["dedup_ratio"][0] - 0.6) < 1e-9
    assert out["unique_chunks"][0] < out["total_chunks"][0]
