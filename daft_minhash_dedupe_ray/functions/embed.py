"""Deterministic text embedding via the feature-hashing trick — the
batched-"model-inference" stage for this environment (no model weights are
installable here, so the embedder is a real, deterministic computation with
the exact actor-pool shape a neural encoder would use: weight/projection
setup once per actor in ``__init__``, vectorised batch inference in
``__call__``, a ``list<float>`` embedding column out).

Math (public: hashing trick, Weinberger et al. 2009 + signed random
projection): token/2-gram hashes index into a ``dim``-wide signed count
vector (sign from one hash bit), then L2-normalise.  Near-duplicate texts
land at high cosine; unrelated texts near 0 — so the output composes with
every embedding operator here (ann_topk, cosine_dup_pairs, IVF,
embedding_dedupe).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class HashingEmbedder:
    """Actor-pool stage: text column -> L2-normalised ``dim``-float embedding
    column (feature-hashed unigrams + 2-grams, signed)."""

    def __init__(
        self,
        dim: int = 128,
        text_col: str = "text",
        out_col: str = "embedding",
        seed: int = 0x5EED,
    ) -> None:
        from ..hashing import splitmix64

        self.dim = dim
        self.text_col = text_col
        self.out_col = out_col
        # per-actor setup (the "model load"): mixing constants for the two
        # feature families, derived once
        self.mix = splitmix64(np.arange(2, dtype=np.uint64) ^ np.uint64(seed))

    def _accumulate(self, flat: np.ndarray, off: np.ndarray, fam: int, out: np.ndarray):
        if len(flat) == 0:
            return
        from ..hashing import splitmix64

        h = splitmix64(flat ^ self.mix[fam])
        idx = (h % np.uint64(self.dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(63)) & np.uint64(1), -1.0, 1.0)
        row = np.repeat(np.arange(len(off) - 1, dtype=np.int64), np.diff(off))
        # scatter-add via bincount on a flattened (row, dim) index — one
        # pass, no np.add.at (ufunc.at is ~10x slower than bincount here)
        lin = row * self.dim + idx
        acc = np.bincount(lin, weights=sign, minlength=(len(off) - 1) * self.dim)
        out += acc.reshape(len(off) - 1, self.dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.textops import word_ngram_hashes
        from ..hashing import token_hashes_flat

        texts = batch[self.text_col].combine_chunks()
        n = len(batch)
        vec = np.zeros((n, self.dim), np.float64)
        t_flat, t_counts = token_hashes_flat(texts)
        t_off = np.zeros(n + 1, np.int64)
        np.cumsum(t_counts, out=t_off[1:])
        self._accumulate(t_flat, t_off, 0, vec)
        g_flat, g_off = word_ngram_hashes(texts, 2)
        self._accumulate(g_flat, g_off, 1, vec)
        norm = np.linalg.norm(vec, axis=1)
        vec = vec / np.maximum(norm, 1e-12)[:, None]
        emb = pa.array(list(vec.astype(np.float32)), pa.list_(pa.float32()))
        return batch.append_column(self.out_col, emb)


def embed_documents(ds, dim: int = 128, text_col: str = "text", concurrency: int = 4):
    """Embed a document Dataset with the actor-pool inference pattern
    (constructor args ride fn_constructor_args; one embedder per actor)."""
    return ds.map_batches(
        HashingEmbedder,
        fn_constructor_kwargs={"dim": dim, "text_col": text_col},
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def semantic_dedupe(
    ds,
    threshold: float = 0.9,
    dim: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 4,
    force_lsh: bool = False,
):
    """SemDeDup-style semantic near-duplicate removal over raw text: embed
    (actor-pool inference) -> cosine dup pairs (blocked exact, or banded LSH
    at scale) -> union-find clustering -> keep min-id per cluster.  The
    drop-in composition of this engine's embedding front-end with the same
    cluster/merge machinery as the MinHash flagship.  Returns surviving rows
    (original columns, embedding dropped)."""
    from .similarity import embedding_dedupe

    emb = embed_documents(ds, dim=dim, text_col=text_col, concurrency=concurrency)
    out = embedding_dedupe(
        emb, threshold, vec_col="embedding", id_col=id_col, force_lsh=force_lsh
    )
    return out.drop_columns(["embedding"])
