"""Signature stage: fused normalize -> node_id -> MinHash -> band keys.

One stateful ``map_batches`` stage (callable class = Ray actor pool; the
seeded permutation matrices are built once per actor in ``__init__``) that
turns the input table into the flattened candidate-key table

    node_id: uint64, band_key: uint64

with up to ``B + phash_bands`` rows per input row.  This fuses the
reference's ``normalize`` (workload/minhash_dedupe.py:197-215), ``minhash``
(:218-239), ``prep_node_id_index_map`` (:241-246) and the per-row half of
``lsh_banding`` (:249-262) into a single pass, so no list-typed signature
column ever hits the object store and the only wide exchange left is the
band-key groupby.

Documents whose normalised text has zero shingles emit no caption band keys
(they can only cluster via pHash / exact duplicates) — see
``hashing.minhash_signatures`` for the rationale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupeConfig
from ..hashing import (
    band_keys,  # noqa: F401  (re-export: unfused-path consumers import it from here)
    id_hash64_str_array,
    make_permutations,
    minhash_band_keys,
    minhash_signatures,
    phash_band_keys,
    phash_subset_keys,
    shingle_hashes,
)
from ..text import normalize_array

CANDIDATE_SCHEMA = pa.schema(
    [
        ("node_id", pa.uint64()),
        ("band_key", pa.uint64()),
        ("kind", pa.uint8()),  # 0 = caption LSH band, 1 = pHash sub-band
        ("payload", pa.uint64()),  # full 64-bit phash for kind=1 (Hamming verify); 0 otherwise
    ]
)


def node_ids_for(batch: pa.Table, cfg: DedupeConfig) -> np.ndarray:
    """Deterministic surrogate node ids: SQL-expressible id-hash of the index
    column (string — ``hashing.id_hash64_str_array``, reproduced in DuckDB by
    ``sql_oracle.node_hash_select`` so survivor-set oracles can rank cluster
    members) or the values themselves reinterpreted as uint64 (integer index
    columns)."""
    col = batch[cfg.index_col]
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return id_hash64_str_array(col)
    return col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)


class SignatureStage:
    """Callable class for ``ds.map_batches(SignatureStage, fn_constructor_args=(cfg,),
    batch_format="pyarrow", ...)``."""

    def __init__(self, cfg: DedupeConfig) -> None:
        self.cfg = cfg
        self.bands, self.rows = cfg.resolved_bands_rows()
        self.a, self.b = make_permutations(cfg.num_perm, cfg.seed)

    def signatures(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(node_ids, sig_matrix, has_sig) for a pyarrow batch."""
        cfg = self.cfg
        nodes = node_ids_for(batch, cfg)
        norm = normalize_array(batch[cfg.content_col], cfg.normalize)
        # normalize_array returns an Arrow array; shingle_hashes consumes it
        # zero-copy (no to_pylist round-trip)
        flat, offsets = shingle_hashes(norm, cfg.ngram_size, cfg.min_length)
        sig, has_sig = minhash_signatures(flat, offsets, self.a, self.b)
        return nodes, sig, has_sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        if batch.num_rows == 0:
            # empty blocks out of ray 2.49's filter/map_groups can arrive
            # ZERO-COLUMN (schema stripped), so column access would KeyError
            return CANDIDATE_SCHEMA.empty_table()
        nodes = node_ids_for(batch, cfg)
        norm = normalize_array(batch[cfg.content_col], cfg.normalize)
        flat, offsets = shingle_hashes(norm, cfg.ngram_size, cfg.min_length)
        # fused minhash+banding: the (n, num_perm) signature matrix never
        # materializes (identical keys to band_keys(sig[has_sig]) — pinned
        # by tests/test_hashing.py)
        bk, has_sig = minhash_band_keys(
            flat, offsets, self.a, self.b, self.bands, self.rows
        )
        keyparts: list[np.ndarray] = []
        nodeparts: list[np.ndarray] = []
        kindparts: list[np.ndarray] = []
        payloadparts: list[np.ndarray] = []
        if has_sig.any():
            m = int(has_sig.sum())
            nodeparts.append(np.repeat(nodes[has_sig], self.bands))
            keyparts.append(bk.reshape(-1))
            kindparts.append(np.zeros(m * self.bands, np.uint8))
            payloadparts.append(np.zeros(m * self.bands, np.uint64))
        if cfg.phash_col is not None and cfg.phash_col in batch.column_names:
            ph = batch[cfg.phash_col].to_numpy(zero_copy_only=False).astype(np.int64)
            chunks = cfg.resolve_phash_chunks()  # "auto" w/o row count -> subset keys
            if chunks:
                # multi-index subset keys: same exact pigeonhole recall,
                # bucket sizes that don't grow quadratic-verify hot at scale
                pk = phash_subset_keys(ph, chunks, cfg.phash_max_hamming)
            else:
                pk = phash_band_keys(ph, cfg.phash_bands)
            n_keys = pk.shape[1]
            nodeparts.append(np.repeat(nodes, n_keys))
            keyparts.append(pk.reshape(-1))
            kindparts.append(np.ones(len(ph) * n_keys, np.uint8))
            payloadparts.append(np.repeat(ph.view(np.uint64), n_keys))
        if not keyparts:
            return CANDIDATE_SCHEMA.empty_table()
        return pa.table(
            {
                "node_id": pa.array(np.concatenate(nodeparts), pa.uint64()),
                "band_key": pa.array(np.concatenate(keyparts), pa.uint64()),
                "kind": pa.array(np.concatenate(kindparts), pa.uint8()),
                "payload": pa.array(np.concatenate(payloadparts), pa.uint64()),
            }
        )


class NodeIdStage:
    """Tiny stateless stage: append the deterministic ``node_id`` column to the
    input (used on the merge side; obviates the reference's id_map joins,
    ``workload/minhash_dedupe.py:616-624``)."""

    def __init__(self, cfg: DedupeConfig) -> None:
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 and self.cfg.index_col not in batch.column_names:
            # zero-column empty block (ray 2.49 filter landmine): synthesize
            # nothing — downstream cogroup treats it as an empty partition
            return batch.append_column("node_id", pa.array([], pa.uint64()))
        nodes = node_ids_for(batch, self.cfg)
        return batch.append_column("node_id", pa.array(nodes, pa.uint64()))
