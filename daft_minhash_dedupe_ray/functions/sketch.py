"""Mergeable cardinality sketches (HyperLogLog) — the at-scale companion to
the exact grouped distinct counts in ``functions.textops``.

Why a sketch: exact COUNT(DISTINCT) must move every distinct key through a
shuffle (bounded but real traffic).  An HLL register array is a fixed
``2**p``-byte summary with a lossless merge (elementwise max), so the
per-batch combiner collapses a batch to ONE row of ``m`` bytes per group and
the exchange moves O(groups x m) regardless of corpus size — the canonical
Ray Data partial-aggregation shape (map_batches partial -> small keyed
reduce).  Standard estimator per Flajolet et al. 2007 (public algorithm);
the exact variant in ``textops.distinct_tokens_per_group`` is its test
oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorised bit_length for uint64 (no float tricks — exact at 2^k
    boundaries where a float64 round-trip overstates the exponent)."""
    x = x.astype(np.uint64, copy=True)
    n = np.zeros(x.shape, np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        y = x >> np.uint64(s)
        m = y != 0
        n[m] += np.uint64(s)
        x[m] = y[m]
    return n + (x != 0)


def hll_ranks(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash: idx = top ``p`` bits, rank = leading
    zeros of the remaining 64-p bits + 1 (capped at 64-p+1 when zero)."""
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # low bits shift in as zeros
    clz = np.uint64(64) - _bit_length_u64(rest)
    rank = np.minimum(clz + np.uint64(1), np.uint64(64 - p + 1)).astype(np.uint8)
    return idx, rank


def registers_from_hashes(hashes: np.ndarray, p: int) -> np.ndarray:
    """Dense ``2**p`` uint8 register array for one key group."""
    m = 1 << p
    reg = np.zeros(m, np.uint8)
    if len(hashes) == 0:
        return reg
    idx, rank = hll_ranks(hashes, p)
    # max per register without maximum.at (~10x slower than sort+reduceat here):
    # sort by (idx, rank); the last entry of each idx-run is its max
    order = np.lexsort((rank, idx))
    i_s, r_s = idx[order], rank[order]
    last = np.r_[i_s[1:] != i_s[:-1], True]
    reg[i_s[last]] = r_s[last]
    return reg


def merge_registers(regs: np.ndarray) -> np.ndarray:
    """Lossless HLL merge: elementwise max over a (k, m) stack."""
    return np.max(regs, axis=0)


def estimate(reg: np.ndarray) -> float:
    """Flajolet bias-corrected estimate with the small-range (linear
    counting) correction; 64-bit hashes need no large-range correction.

    The indicator sum ``sum_j 2^-M_j`` is computed as an EXACT integer
    rational ``S / 2^Rmax`` (Python bigints) and rounded to float64 once —
    bit-identical to any other evaluation order, which is what lets the
    DuckDB oracle (``sql_oracle.hll_distinct_sql``) reproduce the estimate
    exactly (numpy's pairwise float summation would not be)."""
    m = len(reg)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    r_max = int(reg.max()) if m else 0
    # S = sum 2^(Rmax - M_j) fits in ~Rmax + log2(m) bits; counting registers
    # by value keeps it O(distinct values) Python-int ops
    vals, counts = np.unique(reg, return_counts=True)
    s_int = sum(int(c) << (r_max - int(v)) for v, c in zip(vals, counts))
    inv_sum = s_int / (1 << r_max)  # one correctly-rounded float64 division
    e = alpha * m * m / inv_sum
    if e <= 2.5 * m:
        v = int((reg == 0).sum())
        if v:
            e = m * np.log(m / v)
    return float(e)


def approx_distinct_per_group(
    ds,
    group_col: str,
    text_col: str = "text",
    p: int = 12,
    num_partitions: int = 16,
) -> pa.Table:
    """Approximate COUNT(DISTINCT token) per group via per-batch HLL partial
    sketches: each batch emits one (group, m-byte register blob) row, the
    keyed exchange max-merges blobs, and the driver receives one sketch per
    group.  Relative error ~1.04/sqrt(2**p) (1.6% at p=12)."""
    from ..hashing import token_hashes_flat
    from ..stages.util import partition_groupby

    m = 1 << p

    def _partial(b: pa.Table) -> pa.Table:
        texts = b[text_col].combine_chunks()
        tok_h, counts = token_hashes_flat(texts)
        gidx = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        grp = pc.take(b[group_col].combine_chunks(), pa.array(gidx))
        enc = pc.dictionary_encode(grp)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        names = enc.dictionary.to_pylist()
        blobs, out_names = [], []
        for c, name in enumerate(names):
            blobs.append(registers_from_hashes(tok_h[codes == c], p).tobytes())
            out_names.append(name)
        return pa.table(
            {"grp": pa.array(out_names, pa.string()), "reg": pa.array(blobs, pa.binary())}
        )

    schema = pa.schema([("grp", pa.string()), ("reg", pa.binary())])

    def _reduce(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(b["grp"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        names = enc.dictionary.to_pylist()
        stack = np.frombuffer(b"".join(b["reg"].to_pylist()), np.uint8).reshape(len(b), m)
        blobs = [merge_registers(stack[codes == c]).tobytes() for c in range(len(names))]
        return pa.table(
            {"grp": pa.array(names, pa.string()), "reg": pa.array(blobs, pa.binary())}
        )

    out = partition_groupby(
        ds.select_columns([group_col, text_col]).map_batches(
            _partial, batch_format="pyarrow"
        ),
        ["grp"],
        _reduce,
        schema,
        num_partitions=num_partitions,
    )
    rows = out.take_all()  # one row per group
    rows.sort(key=lambda r: r["grp"])
    ests = [
        int(round(estimate(np.frombuffer(r["reg"], np.uint8)))) for r in rows
    ]
    return pa.table(
        {
            group_col: pa.array([r["grp"] for r in rows], pa.string()),
            "n_distinct_approx": pa.array(ests, pa.int64()),
        }
    )
