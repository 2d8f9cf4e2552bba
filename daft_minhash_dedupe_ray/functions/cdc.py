"""Content-defined chunking (CDC) dedupe over binary payload columns —
storage-level dedupe for multimodal corpora (the chunk-store trick behind
image/audio dataset dedup at rest: shared byte regions collapse even when
payloads are concatenated or shifted).

Gear-hash CDC (public algorithm family: Xia et al., FastCDC, USENIX ATC'16):
``h = (h << 1) + gear[byte]``; a chunk boundary falls wherever
``h & mask == 0``.  Because the shift is one bit per byte, a byte's
influence leaves the 64-bit register after 64 bytes — so the rolling hash at
any offset >= 64 into a row depends ONLY on that row's bytes, which makes
the whole computation batch-vectorisable over the concatenated buffer (64
contiguous shifted passes — the same pattern as ``hashing.shingle_hashes``)
with per-row independence for free.  Design choices for parallel
determinism, documented divergences from sequential FastCDC:

  * no minimum-chunk-size regularisation (it makes each cut depend on the
    previous cut — inherently sequential); cuts are purely content-defined,
    so any worker chunks any row identically with no coordination;
  * a maximum chunk size IS enforced by deterministic splitting of oversized
    gaps (stable: measured from the previous content-defined cut).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..hashing import splitmix64

_WINDOW = 64  # bits in the register == bytes of influence


def gear_table(seed: int = 0x9E3779B97F4A7C15) -> np.ndarray:
    """Deterministic 256-entry gear table (splitmix64 of 0..255 ^ seed)."""
    return splitmix64(np.arange(256, dtype=np.uint64) ^ np.uint64(seed))


_GEAR = gear_table()


def rolling_gear(data: np.ndarray) -> np.ndarray:
    """Gear rolling hash at every position of ``data`` (uint8), vectorised:
    h[j] = sum_{t=0}^{63} gear[data[j-t]] << t  (t truncated at j)."""
    g = _GEAR[data]
    h = np.zeros(len(data), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for t in range(_WINDOW):
            if t >= len(data):
                break
            h[t:] += g[: len(data) - t] << np.uint64(t)
    return h


def chunk_offsets_for_buffer(
    data: np.ndarray,
    row_offsets: np.ndarray,
    mask_bits: int = 11,
    max_chunk: int = 8192,
) -> tuple[np.ndarray, np.ndarray]:
    """Chunk boundaries for a concatenated row buffer.

    Returns ``(cuts, row_id_per_chunk)`` where ``cuts`` holds the absolute
    END offset of every chunk (row ends always cut; content cuts only at
    positions >= 64 bytes into their row so the hash window never crosses a
    row start).  Average chunk size ~= 2**mask_bits bytes.
    """
    mask = np.uint64((1 << mask_bits) - 1)
    h = rolling_gear(data)
    cand = np.flatnonzero((h & mask) == 0) + 1  # cut AFTER the matching byte
    # drop candidates whose 64-byte window crosses their row's start
    row_of = np.searchsorted(row_offsets, cand, side="right") - 1
    keep = cand - row_offsets[row_of] >= _WINDOW
    # row ends are unconditional cuts; dedupe & sort
    cuts = np.unique(np.concatenate([cand[keep], row_offsets[1:]]))
    cuts = cuts[cuts > 0]  # leading zero-length rows contribute an empty cut
    # enforce max_chunk by splitting oversized gaps deterministically
    prev = np.concatenate([[row_offsets[0]], cuts[:-1]])
    gaps = cuts - prev
    if (gaps > max_chunk).any():
        extra = []
        for p, c in zip(prev[gaps > max_chunk], cuts[gaps > max_chunk]):
            extra.append(np.arange(p + max_chunk, c, max_chunk, dtype=cuts.dtype))
        cuts = np.unique(np.concatenate([cuts, *extra]))
    # a cut at a row end belongs to the row it closes
    row_id = np.searchsorted(row_offsets[1:], cuts, side="left")
    return cuts, row_id


def cdc_chunk_batch(
    batch: pa.Table,
    bytes_col: str = "bytes",
    id_col: str = "image_id",
    mask_bits: int = 11,
    max_chunk: int = 8192,
) -> pa.Table:
    """Explode a binary column into its CDC chunks:
    (id, chunk_idx, chunk_hash, chunk_len).  Rolling hash + boundary pick are
    fully vectorised over the batch's concatenated buffer; the per-chunk
    strong hash (blake2b-64) runs once per ~2KB chunk, amortised per byte."""
    col = batch[bytes_col].combine_chunks()
    bufs = col.to_pylist()  # list of bytes (payload-sized; batch is small by design)
    lens = np.array([0 if b is None else len(b) for b in bufs], dtype=np.int64)
    row_offsets = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum(lens, out=row_offsets[1:])
    if row_offsets[-1] == 0:
        return pa.table(
            {
                id_col: batch[id_col].slice(0, 0),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk_hash": pa.array([], pa.uint64()),
                "chunk_len": pa.array([], pa.int64()),
            }
        )
    data = np.frombuffer(b"".join(b for b in bufs if b), dtype=np.uint8)
    cuts, row_id = chunk_offsets_for_buffer(data, row_offsets, mask_bits, max_chunk)
    starts = np.concatenate([[0], cuts[:-1]])
    # rows with zero bytes emit no chunks; chunk_idx restarts per row
    first_of_row = np.r_[True, row_id[1:] != row_id[:-1]]
    chunk_idx = np.arange(len(cuts), dtype=np.int64)
    chunk_idx = chunk_idx - np.maximum.accumulate(np.where(first_of_row, chunk_idx, 0))
    mv = memoryview(data)
    hashes = np.empty(len(cuts), dtype=np.uint64)
    for i, (s, e) in enumerate(zip(starts, cuts)):
        hashes[i] = int.from_bytes(
            hashlib.blake2b(mv[s:e], digest_size=8).digest(), "little"
        )
    ids = batch[id_col].take(pa.array(row_id))
    return pa.table(
        {
            id_col: ids,
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "chunk_hash": pa.array(hashes, pa.uint64()),
            "chunk_len": pa.array(cuts - starts, pa.int64()),
        }
    )


def cdc_dedupe_stats(
    ds,
    bytes_col: str = "bytes",
    id_col: str = "image_id",
    mask_bits: int = 11,
    max_chunk: int = 8192,
    num_partitions: int = 16,
) -> pa.Table:
    """Corpus-level CDC dedupe report: total vs unique chunk bytes and the
    dedup ratio.  Scale shape: chunking is embarrassingly parallel
    (map_batches); each batch pre-collapses repeated chunk hashes BEFORE the
    shuffle; the chunk-hash-keyed exchange counts/first-sizes each distinct
    chunk; per-partition partials sum to one row on the driver."""
    import functools

    import pyarrow.compute as pc

    from ..stages.util import partition_groupby

    chunks = ds.map_batches(
        functools.partial(
            cdc_chunk_batch,
            bytes_col=bytes_col,
            id_col=id_col,
            mask_bits=mask_bits,
            max_chunk=max_chunk,
        ),
        batch_format="pyarrow",
    )

    def _partial(b: pa.Table) -> pa.Table:
        g = b.group_by("chunk_hash").aggregate(
            [("chunk_len", "sum"), ("chunk_len", "count"), ("chunk_len", "min")]
        )
        return pa.table(
            {
                "chunk_hash": g["chunk_hash"],
                "bytes": pc.cast(g["chunk_len_sum"], pa.int64()),
                "n": pc.cast(g["chunk_len_count"], pa.int64()),
                "clen": pc.cast(g["chunk_len_min"], pa.int64()),
            }
        )

    schema = pa.schema(
        [
            ("total_bytes", pa.int64()),
            ("total_chunks", pa.int64()),
            ("unique_chunks", pa.int64()),
            ("unique_bytes", pa.int64()),
        ]
    )

    def _reduce(b: pa.Table) -> pa.Table:
        g = b.group_by("chunk_hash").aggregate(
            [("bytes", "sum"), ("n", "sum"), ("clen", "min")]
        )
        return pa.table(
            {
                "total_bytes": pa.array([int(pc.sum(g["bytes_sum"]).as_py() or 0)]),
                "total_chunks": pa.array([int(pc.sum(g["n_sum"]).as_py() or 0)]),
                "unique_chunks": pa.array([len(g)], pa.int64()),
                "unique_bytes": pa.array([int(pc.sum(g["clen_min"]).as_py() or 0)]),
            }
        )

    parts = partition_groupby(
        chunks.map_batches(_partial, batch_format="pyarrow"),
        ["chunk_hash"],
        _reduce,
        schema,
        num_partitions=num_partitions,
    ).to_pandas()
    tot = parts.sum()
    out = pa.table(
        {
            "total_bytes": pa.array([int(tot.total_bytes)]),
            "total_chunks": pa.array([int(tot.total_chunks)]),
            "unique_chunks": pa.array([int(tot.unique_chunks)]),
            "unique_bytes": pa.array([int(tot.unique_bytes)]),
            "dedup_ratio": pa.array(
                [round(float(tot.unique_bytes) / max(int(tot.total_bytes), 1), 6)]
            ),
        }
    )
    return out
