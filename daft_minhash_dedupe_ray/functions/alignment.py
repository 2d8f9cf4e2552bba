"""Image-text alignment scoring + filtering — the LAION/DataComp curation
step (CLIP-score filter: embed the image, embed the caption, keep pairs
whose cosine alignment clears a corpus quantile), with a deterministic
stand-in encoder pair so the Ray-side plumbing is real and SQL-checkable.

No neural encoders exist in this sandbox, so:

- the **caption tower** is the feature-hashing embedder
  (``embed.HashingEmbedder`` internals at ``dim`` float64 — signed
  unigram + bigram counts, L2-normalised), and
- the **image tower** is an 8x8 block-mean grayscale summary of the decoded
  payload (exact integer block sums over all channel bytes on the fixed
  linspace grid, divided by block byte-area), centered and L2-normalised
  into the same ``dim=64`` space.

Both towers have the real model-stage shape: constants built once per actor
in ``__init__``, one decode per row, vectorised batch math, no shuffle.
``align_score = round(cos(text_vec, image_vec), 6)`` per pair; the filter
keeps pairs at or above the exact corpus ``q``-quantile of the score
(``stages.util.sparse_quantile_cutoff`` — histogram partials, never a
corpus sort).  Undecodable rows are dropped (scored pairs only).

The DuckDB oracle (``sql_oracle.image_text_alignment_sql``) rebuilds BOTH
towers — caption embedding CTEs and the 8x8 block means decoded from the
raw PPM bytes — and must match the rounded scores; the filter oracle gates
on ``quantile_disc`` like the LM perplexity gate.

Swap either tower for a real model by replacing ``__init__`` (load weights)
and the per-batch vector function (batched inference) — the surrounding
pipeline is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.util import sparse_quantile_cutoff

ALIGN_SCHEMA = pa.schema([("image_id", pa.string()), ("align_score", pa.float64())])


class AlignmentStage:
    """Actor-pool stage: (caption, payload) -> rounded alignment score."""

    def __init__(
        self,
        dim: int = 64,
        caption_col: str = "caption",
        bytes_col: str = "bytes",
        fmt_col: str = "fmt",
        id_col: str = "image_id",
        seed: int = 0x5EED,
    ) -> None:
        from .embed import HashingEmbedder

        if dim != 64:
            raise ValueError("image tower is a fixed 8x8 grid -> dim must be 64")
        self.dim = dim
        self.caption_col, self.bytes_col = caption_col, bytes_col
        self.fmt_col, self.id_col = fmt_col, id_col
        # per-actor setup (the "model load"): hashing-mix constants
        self._emb = HashingEmbedder(dim=dim, text_col=caption_col, seed=seed)

    def _text_vecs(self, texts) -> np.ndarray:
        from ..functions.textops import word_ngram_hashes
        from ..hashing import token_hashes_flat

        n = len(texts)
        vec = np.zeros((n, self.dim), np.float64)
        t_flat, t_counts = token_hashes_flat(texts)
        t_off = np.zeros(n + 1, np.int64)
        np.cumsum(t_counts, out=t_off[1:])
        self._emb._accumulate(t_flat, t_off, 0, vec)
        g_flat, g_off = word_ngram_hashes(texts, 2)
        self._emb._accumulate(g_flat, g_off, 1, vec)
        norm = np.linalg.norm(vec, axis=1)
        return vec / np.maximum(norm, 1e-12)[:, None]

    @staticmethod
    def _image_vec(px: np.ndarray) -> np.ndarray:
        """Centered, unit-norm 64-vector of 8x8 block byte-means (exact
        integer block sums via a 2-D cumsum, then float64 division by the
        block byte-area — the same arithmetic the SQL oracle replays)."""
        h, w = px.shape[0], px.shape[1]
        s2 = px.astype(np.int64).sum(axis=2)  # channel-summed (h, w)
        c = np.zeros((h + 1, w + 1), np.int64)
        np.cumsum(np.cumsum(s2, axis=0), axis=1, out=c[1:, 1:])
        yi = np.linspace(0, h, 9).astype(int)
        xi = np.linspace(0, w, 9).astype(int)
        bs = (
            c[yi[1:], :][:, xi[1:]]
            - c[yi[:-1], :][:, xi[1:]]
            - c[yi[1:], :][:, xi[:-1]]
            + c[yi[:-1], :][:, xi[:-1]]
        )  # (8, 8) int block sums over all channel bytes
        area = np.diff(yi)[:, None] * np.diff(xi)[None, :] * 3
        g = (bs / area).ravel()  # float64, exact int operands
        g = g - g.mean()
        return g / max(np.linalg.norm(g), 1e-12)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .multimodal import _SUPPORTED, decode_image

        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        keep, gvecs = [], []
        for i, (d, f) in enumerate(zip(blobs, fmts)):
            if f not in _SUPPORTED or d is None:
                continue
            keep.append(i)
            gvecs.append(self._image_vec(decode_image(d, f)))
        if not keep:
            return ALIGN_SCHEMA.empty_table()
        sub = batch.take(pa.array(keep, pa.int64()))
        tv = self._text_vecs(sub[self.caption_col].combine_chunks())
        gv = np.stack(gvecs)
        score = np.round(np.einsum("ij,ij->i", tv, gv), 6) + 0.0  # -0.0 -> 0.0
        return pa.table(
            {
                "image_id": sub[self.id_col].cast(pa.string()),
                "align_score": pa.array(score, pa.float64()),
            }
        )


def alignment_scores(ds, concurrency: int = 4, batch_size: int = 64, **kw):
    """(image_id, align_score) for every decodable image+caption pair."""
    return ds.map_batches(
        AlignmentStage,
        fn_constructor_kwargs=kw,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def alignment_filter(ds, q: float = 0.3, concurrency: int = 4, batch_size: int = 64, **kw):
    """Keep pairs whose alignment score is >= the exact corpus
    ``q``-quantile of the rounded scores (drop the misaligned low tail) —
    scores materialize once as a 16 B/row (id, float) table feeding both
    the histogram and the filter."""
    scores = alignment_scores(ds, concurrency, batch_size, **kw).materialize()
    cutoff = sparse_quantile_cutoff(scores, "align_score", q)
    if cutoff is None:
        return scores.select_columns(["image_id"])
    return scores.filter(expr=f"align_score >= {cutoff!r}").select_columns(["image_id"])
