"""Video operators: rawv codec roundtrip, frame-sampling stage semantics,
and temporal-shingle near-dup dedupe recall on planted trimmed/noisy dups."""

import numpy as np
import pyarrow as pa
import pytest

from daft_minhash_dedupe_ray.functions.video import (
    FrameSampleStage,
    decode_video,
    rawv_decode,
    rawv_encode,
    synth_video_table,
    synth_video_table_with_dups,
)


def test_rawv_roundtrip():
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (7, 6, 5, 3)).astype(np.uint8)
    back, fps = rawv_decode(rawv_encode(frames, fps=30))
    assert fps == 30
    assert np.array_equal(back, frames)
    with pytest.raises(ValueError):
        rawv_decode(b"nope")
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00", "mp4")


def test_frame_sample_stage_explode():
    t = synth_video_table(30, seed=5)
    stage = FrameSampleStage(every_n=4)
    out = stage(t)
    # every rawv video emits ceil(n_frames/4) rows; mp4/null rows emit none
    nf = {int(v): int(n) for v, n in zip(t["video_id"].to_pylist(), t["n_frames"].to_pylist())}
    fmts = dict(zip(t["video_id"].to_pylist(), t["fmt"].to_pylist()))
    blobs = dict(zip(t["video_id"].to_pylist(), t["bytes"].to_pylist()))
    import collections

    got = collections.Counter(out["video_id"].to_pylist())
    for v in nf:
        want = -(-nf[v] // 4) if fmts[v] == "rawv" and blobs[v] is not None else 0
        assert got.get(v, 0) == want, v
    # frame_idx are the sampled positions
    sub = out.filter(pa.compute.equal(out["video_id"], out["video_id"][0]))
    assert sub["frame_idx"].to_pylist() == list(range(0, nf[sub["video_id"][0].as_py()], 4))
    # emit_bytes produces composable ppm payloads
    withb = FrameSampleStage(every_n=10, emit_bytes=True)(t)
    from daft_minhash_dedupe_ray.synth import ppm_decode

    assert withb["fmt"][0].as_py() == "ppm"
    px = ppm_decode(withb["bytes"][0].as_py())
    assert px.shape == (18, 24, 3)
    # empty batch
    assert len(stage(t.slice(0, 0))) == 0


def test_video_dedupe_planted_recall(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.video import video_dedupe

    t, pairs = synth_video_table_with_dups(40, seed=9, dup_rate=0.4)
    cfg = DedupeConfig(
        index_col="video_id", content_col="bytes", phash_col=None, threshold=0.2
    )
    out = video_dedupe(rd.from_arrow(t), cfg, every_n=1, num_actors=2)
    survivors = set(out.to_pandas()["video_id"].tolist())
    # recall: a planted (base, dup) pair must not BOTH survive
    missed = sum(1 for u, v in pairs if u in survivors and v in survivors)
    recall = 1 - missed / len(pairs)
    assert recall >= 0.95, (recall, len(pairs))
    # false merges: distinct base videos must not collapse (all bases survive)
    base_ok = [
        i
        for i in range(40)
        if t["fmt"][i].as_py() == "rawv" and t["bytes"][i].as_py() is not None
    ]
    kept_bases = sum(1 for i in base_ok if i in survivors)
    assert kept_bases >= len(base_ok) - 1, (kept_bases, len(base_ok))
