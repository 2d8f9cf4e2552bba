"""Sequence packing: concat-and-chunk documents into fixed-token training
sequences (the standard LM pretraining layout — tokens concatenated in order,
cut into ``max_tokens`` blocks, documents allowed to span block boundaries).

The reference engine has no packing stage; this is part of the
training-data surface this repo adds on top of the reference's operator set
(document-level analogue of its explode/projection stages,
``workload/minhash_dedupe.py`` prep ancestry).

Distributed shape: docs are hash-partitioned by id
(``stages/util.partition_groupby``), each partition packs *its own* token
stream independently (doc_id order within the partition), and sequence ids
are 64-bit hashes of ``(partition min doc_id, local sequence index)`` so they
are globally unique and deterministic for a fixed ``num_partitions``.  No
stage is sequential in the corpus — the per-partition kernel is pure
prefix-sum arithmetic:

* ``cum[i]`` = exclusive cumsum of token counts in doc_id order;
* doc ``i`` occupies token interval ``[cum[i], cum[i] + n[i])``;
* sequence ``k`` owns ``[k * max_tokens, (k+1) * max_tokens)``;
* the emitted rows are the interval overlaps — ``(seq_id, doc_id,
  tok_start, tok_end)`` with ``tok_*`` offsets *within the doc* — computed
  with ``//`` + ``repeat`` + segment aranges, no Python loop.

Invariants (oracle-tested): every token of every doc appears in exactly one
output row; every sequence holds exactly ``max_tokens`` tokens except the
final sequence of each partition; zero-token docs still appear (empty
range) so no document is silently dropped.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from ..hashing import _segment_aranges, splitmix64
from ..stages.util import partition_groupby

PACK_SCHEMA = pa.schema(
    [
        ("seq_id", pa.uint64()),
        ("doc_id", pa.int64()),
        ("tok_start", pa.int64()),
        ("tok_end", pa.int64()),
    ]
)


def _token_counts(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """``str.split()``-semantics token counts (empty tokens dropped — Arrow's
    split emits an empty token for ""/whitespace rows)."""
    from ..hashing import token_hashes_flat

    return token_hashes_flat(texts)[1]


def _pack_partition(tab: pa.Table, max_tokens: int, id_col: str) -> pa.Table:
    if tab is None or len(tab) == 0:
        return PACK_SCHEMA.empty_table()
    doc = tab[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(doc)  # ids are unique; stability not needed
    doc = doc[order]
    n = tab["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    cum = np.zeros(len(n), dtype=np.int64)
    np.cumsum(n[:-1], out=cum[1:]) if len(n) > 1 else None
    first = cum // max_tokens
    last = np.where(n > 0, (cum + n - 1) // max_tokens, first)
    count = last - first + 1
    k = np.repeat(first, count) + _segment_aranges(count)  # seq index per emitted row
    row = np.repeat(np.arange(len(n), dtype=np.int64), count)
    lo = np.maximum(k * max_tokens - cum[row], 0)
    hi = np.minimum((k + 1) * max_tokens - cum[row], n[row])
    hi = np.maximum(hi, lo)  # zero-token docs: empty [0, 0) range
    base = splitmix64(np.array([doc.min()], dtype=np.uint64))[0]
    seq_id = splitmix64(base ^ k.astype(np.uint64))
    return pa.table(
        {
            "seq_id": pa.array(seq_id, pa.uint64()),
            "doc_id": pa.array(doc[row], pa.int64()),
            "tok_start": pa.array(lo, pa.int64()),
            "tok_end": pa.array(hi, pa.int64()),
        }
    )


def pack_sequences(
    ds,
    max_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 16,
):
    """Assign every whitespace token of every doc to exactly one fixed-size
    training sequence.  Returns PACK_SCHEMA rows (one per doc-sequence
    overlap); a downstream gather keyed on ``seq_id`` materialises the actual
    token blocks.

    Token counting happens map-side so the exchange moves 16 bytes per doc
    — ``(doc_id, n_tokens)`` — never the text."""

    def count(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b[id_col],
                "n_tokens": pa.array(_token_counts(b[text_col]), pa.int64()),
            }
        )

    counted = ds.map_batches(count, batch_format="pyarrow")
    fn = functools.partial(_pack_partition, max_tokens=max_tokens, id_col=id_col)
    return partition_groupby(counted, [id_col], fn, PACK_SCHEMA, num_partitions)


SEQ_SCHEMA = pa.schema(
    [("seq_id", pa.uint64()), ("text", pa.string()), ("n_tokens", pa.int64())]
)
_FRAG_SCHEMA = pa.schema(
    [
        ("seq_id", pa.uint64()),
        ("doc_id", pa.int64()),
        ("frag", pa.string()),
        ("n_toks", pa.int64()),
    ]
)


def materialize_sequences(
    ds,
    max_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 16,
):
    """Turn the :func:`pack_sequences` layout into actual token blocks:
    ``(seq_id, text, n_tokens)`` with ``text`` = the whitespace-joined token
    slice of every contributing doc, in packing order.

    Two exchanges, both thin: (1) the pack rows cogroup back onto the docs by
    id — each doc slices out its fragments (token-index ranges -> substrings);
    (2) fragments regroup by ``seq_id`` and concatenate (a sequence's docs
    are ascending ids within one partition, so sorting fragments by
    ``(seq_id, doc_id)`` restores packing order).  Only fragment text moves —
    total bytes ≈ corpus size, the unavoidable minimum for this output."""
    from ..stages.util import partition_groupby, raw_cogroup_exchange

    pack = pack_sequences(ds, max_tokens, id_col, text_col, num_partitions)

    def frag(docs: pa.Table | None, rows: pa.Table | None) -> pa.Table | None:
        if docs is None or rows is None or len(docs) == 0 or len(rows) == 0:
            return None
        ids = docs[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        texts = docs[text_col].take(pa.array(order)).to_pylist()
        toks = [t.split() if isinstance(t, str) else [] for t in texts]
        rd_ = rows["doc_id"].to_numpy(zero_copy_only=False)
        lo = rows["tok_start"].to_numpy(zero_copy_only=False)
        hi = rows["tok_end"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ids, rd_)
        ok = (pos < len(ids)) & (ids[np.minimum(pos, len(ids) - 1)] == rd_)
        out_frag = [
            " ".join(toks[p][s:e]) if k else ""
            for p, s, e, k in zip(pos, lo, hi, ok)
        ]
        return pa.table(
            {
                "seq_id": rows["seq_id"],
                "doc_id": rows["doc_id"],
                "frag": pa.array(out_frag, pa.string()),
                "n_toks": pa.array((hi - lo) * ok.astype(np.int64), pa.int64()),
            }
        )

    frags = raw_cogroup_exchange(
        ds, pack, [id_col], ["doc_id"], frag, _FRAG_SCHEMA, num_partitions
    )

    def assemble(tab: pa.Table) -> pa.Table:
        if tab is None or len(tab) == 0:
            return SEQ_SCHEMA.empty_table()
        sid = tab["seq_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        did = tab["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, sid))
        sid = sid[order]
        fr = tab["frag"].take(pa.array(order)).to_pylist()
        nt = tab["n_toks"].to_numpy(zero_copy_only=False)[order]
        seg = np.flatnonzero(np.concatenate(([True], sid[1:] != sid[:-1])))
        ends = np.concatenate((seg[1:], [len(sid)]))
        texts = [
            " ".join(f for f in fr[s:e] if f) for s, e in zip(seg, ends)
        ]
        csum = np.concatenate(([0], np.cumsum(nt)))
        return pa.table(
            {
                "seq_id": pa.array(sid[seg], pa.uint64()),
                "text": pa.array(texts, pa.string()),
                "n_tokens": pa.array(csum[ends] - csum[seg], pa.int64()),
            }
        )

    return partition_groupby(frags, ["seq_id"], assemble, SEQ_SCHEMA, num_partitions)
