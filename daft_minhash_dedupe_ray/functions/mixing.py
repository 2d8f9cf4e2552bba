"""Weighted corpus mixing (epoch up/down-sampling by source).

Training mixtures assign each source a sampling weight: ``w < 1``
down-samples (keep with probability ``w``), ``w > 1`` up-samples (every row
appears ``floor(w)`` times plus one more with probability ``w - floor(w)``)
— the Pile/LLaMA-style recipe for balancing web/books/code shares.

Everything is deterministic hashing, no RNG state: row ``r`` of source ``s``
appears ``floor(w_s)`` times, plus once more iff the top 53 bits of
``splitmix64(hash(id) ^ seed)`` fall below ``frac(w_s)`` — so a fixed seed
reproduces the exact mixture on any partitioning / cluster size, a different
seed redraws it, and the expected multiplicity of every row is exactly
``w_s``.  One stateless ``map_batches`` pass (weights ride along as a plain
dict in the task closure — they are tiny), no shuffle; output carries an
``epoch_copy`` column so downstream stages can distinguish repeats.

The reference engine has no mixing stage; this extends its prep/projection
surface (``workload/minhash_dedupe.py`` prep ancestry) for training-data
assembly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import splitmix64
from ..stages.util import _hash_key_col


def mix_sources(
    ds,
    weights: dict[str, float],
    seed: int = 0,
    source_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
):
    """Deterministic weighted mixture: every row of source ``s`` appears
    ``floor(w_s)`` times plus a hash-Bernoulli extra with probability
    ``frac(w_s)``.  Returns the input columns plus ``epoch_copy`` (0-based
    repeat index)."""
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for source {s!r}: {w}")
    sd = np.uint64(seed)

    def mix(b: pa.Table) -> pa.Table:
        n = len(b)
        out_schema = b.schema.append(pa.field("epoch_copy", pa.int64()))
        if n == 0:
            return out_schema.empty_table()
        import pyarrow.compute as pc

        # weight lookup on the per-batch distinct sources only, then a
        # vectorised gather — no per-row Python
        enc = pc.dictionary_encode(
            b[source_col].combine_chunks()
            if isinstance(b[source_col], pa.ChunkedArray)
            else b[source_col]
        )
        dict_w = np.array(
            [float(weights.get(s, default_weight)) for s in enc.dictionary.to_pylist()]
            + [default_weight]  # null sources fall back to the default weight
        )
        idx = (
            pc.fill_null(enc.indices, len(dict_w) - 1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        w = dict_w[idx]
        base = np.floor(w).astype(np.int64)
        frac = w - base
        h = splitmix64(_hash_key_col(b[id_col]) ^ sd)
        # uniform in [0, 1) from the top 53 hash bits (a float threshold on
        # the raw u64 risks the frac*2^64 == 2^64 rounding edge)
        u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        copies = base + (u < frac).astype(np.int64)
        total = int(copies.sum())
        row_idx = np.repeat(np.arange(n, dtype=np.int64), copies)
        out = b.take(pa.array(row_idx))
        starts = np.cumsum(copies) - copies
        copy_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, copies)
        return out.append_column("epoch_copy", pa.array(copy_idx, pa.int64()))

    return ds.map_batches(mix, batch_format="pyarrow")
