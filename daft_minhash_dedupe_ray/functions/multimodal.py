"""Multimodal column operators: decode / feature-extract / resize over opaque
``binary`` payload columns with typed metadata (image_id, w, h, fmt).

The Ray-side plumbing — schema, batch sizing, actor-pool signature, output
layout — is real and tested; only codecs that would need external libraries
(JPEG/PNG/audio/video) are stubbed behind ``NotImplementedError`` per the
build brief (no PIL/ffmpeg in this environment).  The uncompressed ``ppm``
codec (synth.py) is fully implemented, so the whole path is exercised
end-to-end on the synthetic image+caption tables.

Batch-size guidance: payload rows are wide (w*h*3 bytes); callers should use
small ``batch_size`` (256-1024 for 32px, lower for real images) so
``batch_size * concurrency`` fits the worker heap — see the memory-aware
notes in SURVEY.md §4.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..synth import phash64, ppm_decode, ppm_encode

_SUPPORTED = {"ppm"}


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """bytes -> uint8 (h, w, 3).  Lossy formats are stubbed (no codecs in
    this environment); plug a real decoder in here for production."""
    if fmt == "ppm":
        return ppm_decode(data)
    raise NotImplementedError(
        f"decoder for fmt={fmt!r} requires an image library not present in "
        "this environment; only 'ppm' is built in"
    )


class ImageDecodeStage:
    """Actor-pool stage: binary column -> decoded stats columns.

    Emits per-row: decode_ok (false for unsupported fmts rather than
    failing the batch), mean_luma, px_std, plus the exact integer moments
    px_sum / px_sumsq (bit-comparable against a SQL oracle decoding the
    same blob) — the pattern for any feature-extraction head."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt") -> None:
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        ok = np.zeros(len(blobs), bool)
        luma = np.zeros(len(blobs), np.float64)
        std = np.zeros(len(blobs), np.float64)
        psum = np.zeros(len(blobs), np.int64)
        psumsq = np.zeros(len(blobs), np.int64)
        for i, (d, f) in enumerate(zip(blobs, fmts)):
            if f not in _SUPPORTED or d is None:
                continue
            px = decode_image(d, f).astype(np.int64).ravel()
            ok[i] = True
            psum[i] = px.sum()
            psumsq[i] = (px * px).sum()
            n = px.size
            luma[i] = psum[i] / n
            std[i] = np.sqrt(max(0.0, psumsq[i] / n - luma[i] ** 2))
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("mean_luma", pa.array(luma, pa.float64()))
        batch = batch.append_column("px_std", pa.array(std, pa.float64()))
        batch = batch.append_column("px_sum", pa.array(psum, pa.int64()))
        batch = batch.append_column("px_sumsq", pa.array(psumsq, pa.int64()))
        return batch


class ImageResizeStage:
    """Actor-pool stage: nearest-neighbour resize of the payload column to
    (out_w, out_h), re-encoded with the same codec.  Updates w/h columns."""

    def __init__(
        self,
        out_w: int,
        out_h: int,
        bytes_col: str = "bytes",
        fmt_col: str = "fmt",
    ) -> None:
        self.out_w, self.out_h = out_w, out_h
        self.bytes_col, self.fmt_col = bytes_col, fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        out = []
        for d, f in zip(blobs, fmts):
            if f not in _SUPPORTED or d is None:
                out.append(d)  # pass through untouched
                continue
            px = decode_image(d, f)
            yi = (np.arange(self.out_h) * px.shape[0] // self.out_h).astype(int)
            xi = (np.arange(self.out_w) * px.shape[1] // self.out_w).astype(int)
            out.append(ppm_encode(px[yi][:, xi]))
        names = batch.column_names
        batch = batch.set_column(
            names.index(self.bytes_col), self.bytes_col, pa.array(out, pa.binary())
        )
        if "w" in names:
            batch = batch.set_column(
                names.index("w"), "w", pa.array([self.out_w] * len(batch), pa.int32())
            )
        if "h" in names:
            batch = batch.set_column(
                names.index("h"), "h", pa.array([self.out_h] * len(batch), pa.int32())
            )
        return batch


class RequantizeStage:
    """Stateless map_batches stage: drop the low ``bits`` bits of every pixel
    byte and re-encode — a deterministic stand-in for lossy recompression
    (JPEG requant) that needs no external codec.  Max per-channel error is
    ``2**bits - 1``.  At bits=2 an image with ~uniform low bits measures
    PSNR ≈ 42.7 dB (E[d^2] = 3.5) — just above the north-rule's 40 dB
    per-row invariant, making it the natural fixture for
    :func:`..validate.verify_row_invariants` on the synthetic tables.  That
    is an average, NOT a floor: the worst case (every byte ≡ 3 mod 4, e.g.
    saturated 255 regions) is MSE 9 → 38.6 dB, so real thumbnails or a
    different generator can legitimately fail the 40 dB bar at bits=2."""

    def __init__(self, bits: int = 2, bytes_col: str = "bytes", fmt_col: str = "fmt"):
        assert 0 <= bits < 8
        self.mask = np.uint8((0xFF << bits) & 0xFF)
        self.bytes_col, self.fmt_col = bytes_col, fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        out = []
        for d, f in zip(blobs, fmts):
            if f not in _SUPPORTED or d is None:
                out.append(d)  # pass through untouched
                continue
            out.append(ppm_encode(decode_image(d, f) & self.mask))
        names = batch.column_names
        return batch.set_column(
            names.index(self.bytes_col), self.bytes_col, pa.array(out, pa.binary())
        )


class PHashStage:
    """Actor-pool stage: (re)compute the 64-bit DCT pHash from the payload —
    used when the input table lacks a phash column."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt") -> None:
        self.bytes_col, self.fmt_col = bytes_col, fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        out = np.zeros(len(blobs), np.int64)
        for i, (d, f) in enumerate(zip(blobs, fmts)):
            if f in _SUPPORTED and d is not None:
                out[i] = phash64(decode_image(d, f))
        name = "phash"
        if name in batch.column_names:
            batch = batch.set_column(
                batch.column_names.index(name), name, pa.array(out, pa.int64())
            )
        else:
            batch = batch.append_column(name, pa.array(out, pa.int64()))
        return batch


def _gray_block_resize(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Grayscale + block-mean resample to (out_h, out_w) — shared front-end
    of the cheap perceptual hashes (dHash/aHash)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    yi = np.linspace(0, h, out_h + 1).astype(int)
    xi = np.linspace(0, w, out_w + 1).astype(int)
    # 2-pass block means via prefix sums (vectorised, no per-cell loops)
    cs = np.zeros((h + 1, w + 1))
    np.cumsum(np.cumsum(gray, axis=0), axis=1, out=cs[1:, 1:])
    ys, ye = yi[:-1], np.maximum(yi[1:], yi[:-1] + 1)
    xs, xe = xi[:-1], np.maximum(xi[1:], xi[:-1] + 1)
    ye = np.minimum(ye, h)
    xe = np.minimum(xe, w)
    area = (ye - ys)[:, None] * (xe - xs)[None, :]
    out = (
        cs[np.ix_(ye, xe)] - cs[np.ix_(ys, xe)] - cs[np.ix_(ye, xs)] + cs[np.ix_(ys, xs)]
    ) / np.maximum(area, 1)
    return out


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash: 9x8 block means, bit = left block brighter
    than its right neighbour (row-gradient signs — robust to global
    brightness/contrast shifts, cheaper than the DCT pHash).

    The block-mean comparison is done in EXACT integer arithmetic
    (cross-multiplied RGB block sums), not on float means: float cumsum
    noise must never decide a bit on an exact tie — the hash stays
    deterministic under summation-order changes and is bit-reproducible by
    the DuckDB oracle (sql_oracle.dhash_select)."""
    h, w, _ = pixels.shape
    yi = np.linspace(0, h, 9).astype(int)
    xi = np.linspace(0, w, 10).astype(int)
    ys, ye = yi[:-1], np.minimum(np.maximum(yi[1:], yi[:-1] + 1), h)
    xs, xe = xi[:-1], np.minimum(np.maximum(xi[1:], xi[:-1] + 1), w)
    cs = np.zeros((h + 1, w + 1), dtype=np.int64)
    flat = pixels.astype(np.int64).sum(axis=2)  # per-pixel RGB sum, exact
    np.cumsum(np.cumsum(flat, axis=0), axis=1, out=cs[1:, 1:])
    s = cs[np.ix_(ye, xe)] - cs[np.ix_(ys, xe)] - cs[np.ix_(ye, xs)] + cs[np.ix_(ys, xs)]
    area = np.maximum((ye - ys)[:, None] * (xe - xs)[None, :], 1)
    # s_l/a_l > s_r/a_r  <=>  s_l*a_r > s_r*a_l  (exact in int64)
    bits = (s[:, :-1] * area[:, 1:] > s[:, 1:] * area[:, :-1]).reshape(-1)
    return int(np.packbits(bits).view(">u8")[0])


def ahash64(pixels: np.ndarray) -> int:
    """64-bit average hash: 8x8 block means, bit = above the global mean."""
    small = _gray_block_resize(pixels, 8, 8)
    bits = (small > small.mean()).reshape(-1)
    return int(np.packbits(bits).view(">u8")[0])


class FingerprintStage:
    """Actor-pool stage: compute any subset of {phash, dhash, ahash} from the
    payload column in one decode pass per row (decode once, hash many)."""

    def __init__(
        self,
        kinds: tuple[str, ...] = ("phash", "dhash", "ahash"),
        bytes_col: str = "bytes",
        fmt_col: str = "fmt",
    ) -> None:
        self.kinds = kinds
        self.bytes_col, self.fmt_col = bytes_col, fmt_col
        self.fns = {"phash": phash64, "dhash": dhash64, "ahash": ahash64}

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        cols = {k: np.zeros(len(blobs), np.int64) for k in self.kinds}
        for i, (d, f) in enumerate(zip(blobs, fmts)):
            if f not in _SUPPORTED or d is None:
                continue
            px = decode_image(d, f)
            for k in self.kinds:
                v = self.fns[k](px)
                cols[k][i] = v - (1 << 64) if v >= 1 << 63 else v
        for k in self.kinds:
            arr = pa.array(cols[k], pa.int64())
            if k in batch.column_names:
                batch = batch.set_column(batch.column_names.index(k), k, arr)
            else:
                batch = batch.append_column(k, arr)
        return batch


def image_fingerprint_candidates(
    ds,
    cfg,
    fingerprint: str = "dhash",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_col: str = "image_id",
):
    """Image near-dup candidate edges from a cheap perceptual hash
    (dhash/ahash), banded into Hamming buckets and verified — the image-side
    analogue of ``similarity.simhash_candidates`` / audio's spectral
    fingerprint, feeding the same candidate/cluster/merge machinery.
    Undecodable rows emit nothing."""
    from ..hashing import id_hash64_str_array, phash_band_keys
    from ..stages.candidates import KIND_PHASH, candidate_edges

    fp_fn = {"dhash": dhash64, "ahash": ahash64, "phash": phash64}[fingerprint]
    empty = pa.schema(
        [
            ("node_id", pa.uint64()),
            ("band_key", pa.uint64()),
            ("kind", pa.uint8()),
            ("payload", pa.uint64()),
        ]
    )

    def fp_batch(b: pa.Table) -> pa.Table:
        blobs = b[bytes_col].to_pylist()
        fmts = b[fmt_col].to_pylist()
        ids_col = b[id_col]
        if pa.types.is_string(ids_col.type) or pa.types.is_large_string(ids_col.type):
            ids = id_hash64_str_array(ids_col)
        else:
            ids = ids_col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        nodes, fps = [], []
        for i, (d, f) in enumerate(zip(blobs, fmts)):
            if f not in _SUPPORTED or d is None:
                continue
            nodes.append(ids[i])
            fps.append(fp_fn(decode_image(d, f)))
        if not nodes:
            return empty.empty_table()
        nodes_a = np.array(nodes, np.uint64)
        fps_a = np.array(fps, np.uint64)
        nb = cfg.phash_bands
        keys = phash_band_keys(fps_a.view(np.int64), nb)
        return pa.table(
            {
                "node_id": pa.array(np.repeat(nodes_a, nb), pa.uint64()),
                "band_key": pa.array(keys.reshape(-1), pa.uint64()),
                "kind": pa.array(np.full(len(nodes_a) * nb, KIND_PHASH, np.uint8), pa.uint8()),
                "payload": pa.array(np.repeat(fps_a, nb), pa.uint64()),
            }
        )

    cand = ds.map_batches(fp_batch, batch_format="pyarrow", batch_size=cfg.batch_size)
    return candidate_edges(cand, cfg)


# Video frame sampling / temporal dedupe live in functions/video.py
# (FrameSampleStage + video_dedupe over the built-in `rawv` container;
# compressed codecs remain honestly stubbed in video.decode_video).
