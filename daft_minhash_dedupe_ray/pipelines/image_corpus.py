"""LAION-style image corpus assembly: CLIP-score-style alignment gate ->
pixel-side near-dup dedupe -> deterministic shard placement — the whole
image+caption curation chain as ONE composition, checking the stage
hand-offs, not just each operator (the text-side analogue is
``pipelines.corpus.assemble_corpus``).

Scale shape (the part that matters at 10^12 pairs):

- **One decode per row.** A single feature pass emits
  ``(image_id, align_score, dh)`` — the alignment cosine AND the dHash
  fingerprint from the same decoded pixels.  Payload bytes never move
  again: everything downstream runs on this 24 B/row narrow table
  (materialized once; it has three consumers — histogram, gate, banding).
- **Gate without a sort.** The keep cutoff is the exact corpus
  ``q``-quantile of the rounded scores via the sparse-histogram exchange
  (``stages.util.sparse_quantile_cutoff``).
- **Dedupe without all-pairs.** Survivor fingerprints band into Hamming
  buckets (pigeonhole-complete for Hamming < ``phash_bands``), candidate
  edges contract through the salted combiner exchange, components form in
  the union-find actor pool, and keep-semantics are the flagship's
  ``merge_keep`` (min-node-hash representative survives).
- **Placement is hash arithmetic** — ``splitmix64(node_hash(id) ^ seed) %
  n_shards`` — partitioning-independent and SQL-expressible.

The DuckDB oracle (``sql_oracle.image_corpus_assembly_sql``) replays the
full chain — both alignment towers AND the dHashes decoded from the raw
PPM bytes, the quantile gate, the Hamming component survivor choice, and
the shard placement — end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupeConfig
from ..stages.util import sparse_quantile_cutoff

FEATURE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("align_score", pa.float64()),
        ("dh", pa.int64()),
    ]
)


class ImageCorpusFeatureStage:
    """Actor-pool stage: one decode -> alignment score + dHash per row.
    Undecodable rows are dropped (they carry no pixels to align or dedupe;
    route them to a quarantine sink upstream if they must be kept)."""

    def __init__(
        self,
        caption_col: str = "caption",
        bytes_col: str = "bytes",
        fmt_col: str = "fmt",
        id_col: str = "image_id",
        seed: int = 0x5EED,
    ) -> None:
        from ..functions.alignment import AlignmentStage

        self._align = AlignmentStage(
            caption_col=caption_col,
            bytes_col=bytes_col,
            fmt_col=fmt_col,
            id_col=id_col,
            seed=seed,
        )
        self.caption_col, self.bytes_col = caption_col, bytes_col
        self.fmt_col, self.id_col = fmt_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.multimodal import _SUPPORTED, decode_image, dhash64

        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        keep, gvecs, dhs = [], [], []
        for i, (d, f) in enumerate(zip(blobs, fmts)):
            if f not in _SUPPORTED or d is None:
                continue
            px = decode_image(d, f)
            keep.append(i)
            gvecs.append(self._align._image_vec(px))
            v = dhash64(px)
            dhs.append(v - (1 << 64) if v >= 1 << 63 else v)
        if not keep:
            return FEATURE_SCHEMA.empty_table()
        sub = batch.take(pa.array(keep, pa.int64()))
        tv = self._align._text_vecs(sub[self.caption_col].combine_chunks())
        gv = np.stack(gvecs)
        score = np.round(np.einsum("ij,ij->i", tv, gv), 6) + 0.0
        return pa.table(
            {
                "image_id": sub[self.id_col].cast(pa.string()),
                "align_score": pa.array(score, pa.float64()),
                "dh": pa.array(np.asarray(dhs, np.int64), pa.int64()),
            }
        )


def assemble_image_corpus(
    ds,
    q: float = 0.3,
    max_hamming: int = 6,
    bands: int = 8,
    n_shards: int = 8,
    shard_seed: int = 13,
    num_actors: int = 4,
    concurrency: int = 4,
    batch_size: int = 64,
    **stage_kw,
):
    """(image_id, shard) for every pair that clears the alignment gate and
    survives pixel-side near-dup dedupe."""
    from ..hashing import id_hash64_str_array, phash_band_keys, splitmix64
    from ..stages.candidates import KIND_PHASH, candidate_edges
    from ..stages.merge import merge_keep
    from ..state.dist_union_find import cluster_edges

    cfg = DedupeConfig(
        index_col="image_id",
        content_col="image_id",  # narrow table: id is the only content
        phash_col=None,
        phash_max_hamming=max_hamming,
        phash_bands=bands,
    )

    feat = ds.map_batches(
        ImageCorpusFeatureStage,
        fn_constructor_kwargs=stage_kw,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    ).materialize()  # 24 B/row; three consumers below

    cutoff = sparse_quantile_cutoff(feat, "align_score", q)
    if cutoff is None:  # empty input
        import ray.data as rd

        return rd.from_arrow(
            pa.schema([("image_id", pa.string()), ("shard", pa.int64())]).empty_table()
        )
    gated = feat.filter(expr=f"align_score >= {cutoff!r}")

    def band_batch(b: pa.Table) -> pa.Table:
        nodes = id_hash64_str_array(b["image_id"])
        dh = b["dh"].to_numpy(zero_copy_only=False)
        keys = phash_band_keys(dh, bands)
        fps = dh.view(np.uint64)
        return pa.table(
            {
                "node_id": pa.array(np.repeat(nodes, bands), pa.uint64()),
                "band_key": pa.array(keys.reshape(-1), pa.uint64()),
                "kind": pa.array(
                    np.full(len(nodes) * bands, KIND_PHASH, np.uint8), pa.uint8()
                ),
                "payload": pa.array(np.repeat(fps, bands), pa.uint64()),
            }
        )

    cand = gated.map_batches(band_batch, batch_format="pyarrow")
    edges = candidate_edges(cand, cfg)
    assign = cluster_edges(edges, num_actors=num_actors)
    kept = merge_keep(gated.select_columns(["image_id"]), assign, cfg)

    def place(b: pa.Table) -> pa.Table:
        ids = b["image_id"]
        nh = id_hash64_str_array(ids)
        ph = splitmix64(nh ^ np.uint64(shard_seed))
        return pa.table(
            {
                "image_id": ids,
                "shard": pa.array(
                    (ph % np.uint64(n_shards)).astype(np.int64), pa.int64()
                ),
            }
        )

    return kept.map_batches(place, batch_format="pyarrow")
