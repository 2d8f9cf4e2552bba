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
    failing the batch), mean_luma, px_std — the pattern for any
    feature-extraction head."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt") -> None:
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        ok = np.zeros(len(blobs), bool)
        luma = np.zeros(len(blobs), np.float64)
        std = np.zeros(len(blobs), np.float64)
        for i, (d, f) in enumerate(zip(blobs, fmts)):
            if f not in _SUPPORTED or d is None:
                continue
            px = decode_image(d, f).astype(np.float64)
            ok[i] = True
            luma[i] = px.mean()
            std[i] = px.std()
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("mean_luma", pa.array(luma, pa.float64()))
        batch = batch.append_column("px_std", pa.array(std, pa.float64()))
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


def frame_sample_stub(batch: pa.Table, every_n: int = 30) -> pa.Table:
    """Video frame sampling: stubbed — video codecs are unavailable here.
    The signature documents the intended actor-pool stage shape."""
    raise NotImplementedError(
        "video decode requires ffmpeg/av, not present in this environment"
    )
