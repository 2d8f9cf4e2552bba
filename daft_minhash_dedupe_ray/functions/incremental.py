"""Persisted corpus hash index + Bloom-pruned incremental ingest dedupe.

The 100 TB ingest contract: the already-ingested corpus is hashed ONCE into
a hash-range-partitioned parquet index (amortised across every later ingest
wave), each partition carrying a Bloom sketch of its hashes.  Deduping a new
wave then costs only wave-sized work:

  1. wave rows are content-hashed and exchanged by the SAME hash-range key
     as the index (one wave-sized shuffle; the corpus never moves again);
  2. each partition first resolves intra-wave duplicates (min-id wins),
     then probes its partition's Bloom sketch map-side — rows the sketch
     rejects are *exactly* new (no false negatives) and skip the index read
     entirely;
  3. only partitions with Bloom-positive rows open their ``hashes.parquet``
     (further pruned by row-group statistics on the sorted hash column) and
     confirm membership exactly via ``searchsorted`` — so a false positive
     costs a pruned read, never a wrong answer.

Result: exact semantics (identical to ``incremental_exact_dedupe``'s
NOT-EXISTS anti-join, SQL-checked in CORRECTNESS), with corpus-side I/O
proportional to the wave's hash-range footprint instead of the corpus size.

Beyond-reference surface: the reference notebook
(`workload/minhash_dedupe.py`) reprocesses its whole corpus per run and has
no incremental/index contract.
"""

from __future__ import annotations

import functools
import json
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..hashing import hash64_str_array
from ..stages.util import partition_groupby_prekeyed

_STATS_SCHEMA = pa.schema([("part", pa.int64()), ("n_hashes", pa.int64())])

# LSM absorb knobs: a wave appends a sorted delta segment (wave-sized I/O)
# and incrementally ORs into the partition Bloom; the partition is compacted
# (full union-rewrite, Bloom re-sized with headroom) only when the segment
# count exceeds _MAX_SEGMENTS or the row total outgrows the Bloom's sized
# capacity — so per-wave absorb cost is amortised O(wave), not O(corpus).
_MAX_SEGMENTS = 16
_BLOOM_HEADROOM = 2
_DELTA_RE = re.compile(r"delta-\d{8}(-[0-9a-f]{16})?\.parquet")


def _wave_fp(*arrays) -> str:
    """Deterministic 16-hex content fingerprint of a wave's (sorted,
    deduped) partition payload — names the delta segment so a REPLAYED
    absorb task (Ray retry after the delta landed) or a deliberate
    re-absorb of the same wave is detectable on disk and the partition
    count can be recounted exactly instead of double- or under-counted."""
    from ..hashing import splitmix64

    acc = np.uint64(0)
    with np.errstate(over="ignore"):
        for a in arrays:
            a = np.asarray(a)
            if a.dtype.kind not in "ui":
                a = np.frombuffer(a.tobytes(), dtype=np.uint8)
            v = splitmix64(a.astype(np.uint64, copy=False))
            acc = splitmix64(
                np.array([acc ^ np.bitwise_xor.reduce(v) ^ np.uint64(len(v))])
            )[0]
    return f"{int(acc):016x}"


def _own_delta(d: str, fp: str) -> str | None:
    """Path of an existing delta carrying this wave fingerprint, if any."""
    if not os.path.isdir(d):
        return None
    suffix = f"-{fp}.parquet"
    for f in sorted(os.listdir(d)):
        if f.endswith(suffix) and _DELTA_RE.fullmatch(f):
            return os.path.join(d, f)
    return None


def _segment_files(d: str) -> list[str]:
    """Base + delta segment paths for one partition dir, base first."""
    if not os.path.isdir(d):
        return []
    out = []
    if os.path.exists(f"{d}/hashes.parquet"):
        out.append(f"{d}/hashes.parquet")
    out += [
        os.path.join(d, f)
        for f in sorted(os.listdir(d))
        if _DELTA_RE.fullmatch(f)
    ]
    return out


def _next_delta_path(d: str, fp: str | None = None) -> str:
    seqs = [
        int(f[6:14]) for f in os.listdir(d) if _DELTA_RE.fullmatch(f)
    ] if os.path.isdir(d) else []
    tag = f"-{fp}" if fp else ""
    return f"{d}/delta-{(max(seqs) + 1 if seqs else 0):08d}{tag}.parquet"


def _read_segments(d: str, lo=None, hi=None) -> list[pa.Table]:
    """Read every segment of a partition (optionally range-filtered on the
    sorted ``__h__`` column — row-group stats prune within each file)."""
    filters = None
    if lo is not None:
        filters = (pc.field("__h__") >= lo) & (pc.field("__h__") <= hi)
    return [pq.read_table(f, filters=filters) for f in _segment_files(d)]


def _read_part_hashes(d: str, lo=None, hi=None) -> np.ndarray:
    """Sorted distinct hashes across base + delta segments (range-filtered)."""
    tabs = _read_segments(d, lo, hi)
    if not tabs:
        return np.zeros(0, np.uint64)
    arrs = [t["__h__"].to_numpy(zero_copy_only=False) for t in tabs]
    return np.unique(np.concatenate(arrs))


def _shift_for(num_partitions: int) -> int:
    lg = num_partitions.bit_length() - 1
    if 1 << lg != num_partitions:
        raise ValueError("num_partitions must be a power of two (hash-range layout)")
    return 64 - lg


def _part_dir(path: str, part: int) -> str:
    return f"{path}/part={part:05d}"


def _hash_and_key(b: pa.Table, text_col: str, id_col: str, shift: int) -> pa.Table:
    """Wave-side combiner: content-hash + partition key, and intra-batch
    first-wins dedupe (sort by (hash, id), keep first) so a dup-heavy wave
    sheds most of its duplicate rows before the exchange."""
    h = hash64_str_array(b[text_col].to_pylist())
    t = b.append_column("__h__", pa.array(h, pa.uint64()))
    idx = pc.sort_indices(t, sort_keys=[("__h__", "ascending"), (id_col, "ascending")])
    t = t.take(idx)
    hh = t["__h__"].to_numpy(zero_copy_only=False)
    first = np.r_[True, hh[1:] != hh[:-1]] if len(t) else np.zeros(0, bool)
    t = t.filter(pa.array(first))
    hh = hh[first]
    return t.append_column("__p__", pa.array(hh >> np.uint64(shift), pa.uint64()))


def _corpus_hash_batch(b: pa.Table, text_col: str, shift: int) -> pa.Table:
    """Map-side combiner: corpus text reduces to per-batch DISTINCT hashes
    before the exchange — the corpus payload never moves."""
    h = np.unique(hash64_str_array(b[text_col].to_pylist()))
    return pa.table(
        {
            "__h__": pa.array(h, pa.uint64()),
            "__p__": pa.array(h >> np.uint64(shift), pa.uint64()),
        }
    )


def _build_partition(tab: pa.Table, path: str, shift: int, fp_rate: float) -> pa.Table:
    from ..state.bloom import BloomFilter

    h = np.unique(tab["__h__"].to_numpy(zero_copy_only=False))
    part = int(h[0] >> np.uint64(shift))
    d = _part_dir(path, part)
    os.makedirs(d, exist_ok=True)
    # sorted hashes -> row-group statistics allow range pruning at read time
    pq.write_table(
        pa.table({"__h__": pa.array(h, pa.uint64())}),
        f"{d}/hashes.parquet",
        row_group_size=16384,
    )
    # headroom-sized: later LSM delta absorbs OR into this same sketch
    # until the row total outgrows the capacity, deferring compaction
    bloom = BloomFilter.sized(max(len(h) * _BLOOM_HEADROOM, 1024), fp_rate)
    bloom.add_hashes(h)
    bloom.save(f"{d}/_bloom.npz")
    return pa.table({"part": [part], "n_hashes": [len(h)]})


def _count_new_hashes(d: str, h: np.ndarray, bloom) -> int:
    """Exact count of ``h`` entries NOT already in the partition's segments.
    Cheap in the steady state: absorbed rows already survived the dedupe
    probe, so their keys are new and the Bloom rejects them without any
    file read — only FP-rate × wave candidates open the (range-filtered)
    segments.  An idempotent retry re-finds everything (full-range read,
    rare by construction)."""
    maybe = bloom.contains(h)
    new = int((~maybe).sum())
    if maybe.any():
        pos = h[maybe]
        seen = _read_part_hashes(
            d, pa.scalar(int(pos.min()), pa.uint64()), pa.scalar(int(pos.max()), pa.uint64())
        )
        if len(seen):
            at = np.searchsorted(seen, pos)
            at[at == len(seen)] = 0
            new += int((seen[at] != pos).sum())
        else:
            new += len(pos)
    return new


def _update_partition(
    tab: pa.Table, path: str, shift: int, fp_rate: float, parts_prev=None
) -> pa.Table:
    """Absorb a wave's hashes into one existing hash-range partition at
    WAVE-sized cost (LSM-style): append the wave's sorted distinct hashes
    as a new immutable delta segment and OR them into the partition's Bloom
    sketch — nothing corpus-sized is read or rewritten.  The partition
    compacts (full union into the base file, Bloom re-sized with headroom)
    only when the segment count exceeds ``_MAX_SEGMENTS`` or the row total
    outgrows the Bloom's sized capacity, so absorb cost is amortised
    O(wave) per wave, never O(corpus).

    Idempotent: a retried torn update appends a duplicate delta whose
    hashes union away at probe/compaction time.  Swap order is segment
    first, bloom second: a probe racing the swap sees either the old
    snapshot (valid for the pre-update corpus) or new hashes under the old
    bloom — the bloom's misses then concern only not-yet-blessed wave
    hashes, never the already-indexed corpus, so probes stay exact for
    blessed data throughout.  Compaction writes the union base and a
    superset bloom before removing deltas, so every crash window leaves a
    consistent (possibly duplicated) hash set under a no-false-negative
    sketch."""
    from ..state.bloom import BloomFilter

    h = np.unique(tab["__h__"].to_numpy(zero_copy_only=False))
    part = int(h[0] >> np.uint64(shift))
    d = _part_dir(path, part)
    os.makedirs(d, exist_ok=True)
    f_h = f"{d}/hashes.parquet"
    f_b = f"{d}/_bloom.npz"
    btmp = f"{d}/_bloom.tmp.npz"  # np.savez appends .npz to other suffixes
    segs = _segment_files(d)
    n_existing = sum(pq.read_metadata(f).num_rows for f in segs)
    n_deltas = sum(1 for f in segs if not f.endswith("hashes.parquet"))
    total = n_existing + len(h)
    bloom = BloomFilter.load(f_b) if os.path.exists(f_b) else None
    prev_n = parts_prev.get(part) if parts_prev else None
    compact = (
        bloom is None
        or prev_n is None  # count unknown (torn meta): recount exactly
        or n_deltas + 1 > _MAX_SEGMENTS
        or (bloom.capacity and total > bloom.capacity)
    )
    if compact:
        h = np.union1d(_read_part_hashes(d), h)
        tmp = f_h + ".tmp"
        pq.write_table(
            pa.table({"__h__": pa.array(h, pa.uint64())}), tmp, row_group_size=16384
        )
        bloom = BloomFilter.sized(max(len(h) * _BLOOM_HEADROOM, 1024), fp_rate)
        bloom.add_hashes(h)
        bloom.save(btmp)
        os.replace(tmp, f_h)
        os.replace(btmp, f_b)
        for f in segs:
            if not f.endswith("hashes.parquet"):
                os.remove(f)
        n = len(h)
    else:
        fp = _wave_fp(h)
        if _own_delta(d, fp) is not None:
            # This exact wave's delta already landed (Ray task retry after
            # the os.replace, or a deliberate re-absorb of the same wave):
            # a pre-append count would return 0 new and report prev_n —
            # undercounting on retry (prev_n never absorbed the wave) or
            # staying flat on re-absorb.  Recount exactly from disk, which
            # is right in both cases (rare by construction).
            n = len(_read_part_hashes(d))
            bloom.add_hashes(h)  # idempotent OR (covers a pre-bloom crash)
            bloom.save(btmp)
            os.replace(btmp, f_b)
        else:
            n = prev_n + _count_new_hashes(d, h, bloom)  # exact, pre-append
            tmp = f"{d}/_delta.tmp.parquet"
            pq.write_table(
                pa.table({"__h__": pa.array(h, pa.uint64())}), tmp, row_group_size=16384
            )
            bloom.add_hashes(h)
            bloom.save(btmp)
            os.replace(tmp, _next_delta_path(d, fp))
            os.replace(btmp, f_b)
    return pa.table({"part": [part], "n_hashes": [n]})


def _write_meta(path: str, meta: dict) -> None:
    tmp = f"{path}/_META.json.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, f"{path}/_META.json")
    open(f"{path}/_SUCCESS", "w").close()


def build_corpus_index(
    corpus_ds,
    path: str,
    text_col: str = "text",
    fp_rate: float = 1e-3,
    num_partitions: int = 16,
) -> dict:
    """Hash-range-partition the corpus's distinct content hashes into a
    persisted parquet index with per-partition Bloom sketches.  Returns the
    index metadata (also written to ``_META.json`` + ``_SUCCESS``)."""
    shift = _shift_for(num_partitions)
    os.makedirs(path, exist_ok=True)
    keyed = corpus_ds.select_columns([text_col]).map_batches(
        functools.partial(_corpus_hash_batch, text_col=text_col, shift=shift),
        batch_format="pyarrow",
    )
    stats = partition_groupby_prekeyed(
        keyed,
        functools.partial(_build_partition, path=path, shift=shift, fp_rate=fp_rate),
        _STATS_SCHEMA,
        num_partitions,
    ).take_all()
    meta = {
        "num_partitions": num_partitions,
        "fp_rate": fp_rate,
        "text_col": text_col,
        "parts": {str(r["part"]): r["n_hashes"] for r in stats},
    }
    _write_meta(path, meta)
    return meta


def update_corpus_index(new_ds, index_path: str, text_col: str | None = None) -> dict:
    """Absorb an ingest wave into an existing :func:`build_corpus_index`
    snapshot WITHOUT rebuilding it — the ingest-loop contract at corpus
    scale (dedupe the wave against the index, append the survivors, absorb
    them here; a 100 TB index must never be re-hashed per wave).  Only the
    hash-range partitions the wave actually touches are rewritten
    (union-merge + Bloom rebuild sized to the merged count, atomic swaps);
    untouched partitions are not even opened.  Idempotent: re-absorbing the
    same rows is a no-op, so a failed update is safely retried."""
    if not os.path.exists(f"{index_path}/_SUCCESS"):
        raise FileNotFoundError(f"no completed corpus index at {index_path}")
    with open(f"{index_path}/_META.json") as f:
        meta = json.load(f)
    if meta.get("kind") == "band":
        raise ValueError(f"{index_path!r} is a band index — use update_band_index")
    if text_col is not None and text_col != meta["text_col"]:
        raise ValueError(
            f"corpus index at {index_path!r} was built over column "
            f"{meta['text_col']!r}; absorbing {text_col!r} would silently mix "
            "hash spaces — rebuild the index for the new column"
        )
    text_col = meta["text_col"]
    num_partitions = meta["num_partitions"]
    shift = _shift_for(num_partitions)
    keyed = new_ds.select_columns([text_col]).map_batches(
        functools.partial(_corpus_hash_batch, text_col=text_col, shift=shift),
        batch_format="pyarrow",
    )
    stats = partition_groupby_prekeyed(
        keyed,
        functools.partial(
            _update_partition,
            path=index_path,
            shift=shift,
            fp_rate=meta["fp_rate"],
            parts_prev={int(p): v for p, v in meta["parts"].items()},
        ),
        _STATS_SCHEMA,
        num_partitions,
    ).take_all()
    meta["parts"].update({str(r["part"]): r["n_hashes"] for r in stats})
    _write_meta(index_path, meta)
    return meta


def _require_part_visible(d: str, part: int, known_parts: frozenset | None) -> bool:
    """True iff this hash-range partition holds corpus hashes.  A partition
    listed in _META.json but not visible on THIS worker's filesystem is an
    error, not 'no duplicates': on a multi-node cluster a non-shared
    index_path would otherwise silently pass every probe (the index must
    live on a filesystem all Ray workers mount — NFS/FUSE/object-store)."""
    visible = os.path.exists(f"{d}/_bloom.npz")
    if not visible and known_parts is not None and part in known_parts:
        raise FileNotFoundError(
            f"index partition {part} is recorded in _META.json but {d} is not "
            "visible on this worker — the index path must be on a shared "
            "filesystem reachable from every Ray node"
        )
    return visible


def _dedupe_partition(
    tab: pa.Table, index_path: str, shift: int, id_col: str, known_parts=None
) -> pa.Table:
    from ..state.bloom import BloomFilter

    # intra-wave min-id-wins: sort by (hash, id), keep first per hash
    idx = pc.sort_indices(tab, sort_keys=[("__h__", "ascending"), (id_col, "ascending")])
    tab = tab.take(idx)
    hh = tab["__h__"].to_numpy(zero_copy_only=False)
    keep = np.r_[True, hh[1:] != hh[:-1]]
    part = int(hh[0] >> np.uint64(shift))
    d = _part_dir(index_path, part)
    if _require_part_visible(d, part, known_parts):
        cand = hh[keep]
        maybe = BloomFilter.load(f"{d}/_bloom.npz").contains(cand)
        if maybe.any():
            pos = cand[maybe]
            lo = pa.scalar(int(pos.min()), pa.uint64())
            hi = pa.scalar(int(pos.max()), pa.uint64())
            seen = _read_part_hashes(d, lo, hi)
            confirmed = np.zeros(len(cand), bool)
            if len(seen):
                at = np.searchsorted(seen, pos)
                at[at == len(seen)] = 0
                confirmed[maybe] = seen[at] == pos
            keep[keep] = ~confirmed
    return tab.filter(pa.array(keep)).drop_columns(["__h__"])


def incremental_dedupe_indexed(new_ds, index_path: str, text_col: str, id_col: str):
    """Dedupe an ingest wave against a :func:`build_corpus_index` snapshot
    (exact; Bloom sketches only prune index reads).  Returns the surviving
    rows of ``new_ds`` with the wave's own duplicates resolved min-id-wins."""
    if not os.path.exists(f"{index_path}/_SUCCESS"):
        raise FileNotFoundError(f"no completed corpus index at {index_path}")
    with open(f"{index_path}/_META.json") as f:
        meta = json.load(f)
    if text_col != meta.get("text_col", text_col):
        raise ValueError(
            f"corpus index at {index_path!r} was built over column "
            f"{meta['text_col']!r}; probing {text_col!r} compares disjoint "
            "hash spaces and would pass every duplicate — rebuild the index"
        )
    num_partitions = int(meta["num_partitions"])
    shift = _shift_for(num_partitions)
    schema = pa.schema(list(zip(new_ds.schema().names, new_ds.schema().types)))
    keyed = new_ds.map_batches(
        functools.partial(_hash_and_key, text_col=text_col, id_col=id_col, shift=shift),
        batch_format="pyarrow",
    )
    return partition_groupby_prekeyed(
        keyed,
        functools.partial(
            _dedupe_partition,
            index_path=index_path,
            shift=shift,
            id_col=id_col,
            known_parts=frozenset(int(p) for p in meta.get("parts", {})),
        ),
        schema,
        num_partitions,
    )


def incremental_near_dedupe(
    new_ds,
    corpus_ds,
    cfg,
    num_partitions: int = 16,
):
    """Near-duplicate ingest-wave dedupe: drop every wave doc whose MinHash
    signature shares >= 1 LSH band with ANY corpus doc (the crawl-vs-corpus
    companion of the exact :func:`incremental_exact_dedupe`; same banding
    semantics as the flagship pipeline, so the drop probability follows the
    (b, r) S-curve of ``cfg``).

    Shape: both sides emit ``(band_key, node_id)`` via the shared signature
    kernel (stateless — warm Ray workers, no actor cold-start), meet in ONE
    cogroup exchange keyed on the band hash, and the matched *wave* node ids
    (bounded by the wave size, never the corpus) broadcast back as an
    anti-filter.  The corpus side is re-signed per wave here; persisting its
    band keys as a hash-partitioned index (exactly like
    :func:`build_corpus_index`) amortises that across waves — the exchange
    itself is the same either way.

    Wave-internal duplicates are NOT touched (run the regular pipeline for
    that); this operator answers only "is it already in the corpus?".
    """
    import ray

    from ..stages.signature import SignatureStage, node_ids_for
    from ..stages.util import raw_cogroup_exchange

    BAND_SCHEMA = pa.schema([("band_key", pa.uint64()), ("node_id", pa.uint64())])
    HIT_SCHEMA = pa.schema([("node_id", pa.uint64())])

    # constructed ONCE on the driver (permutation tables ride the closure);
    # per-batch construction would rebuild them for every block
    stage = SignatureStage(cfg)

    def bands_of(batch: pa.Table) -> pa.Table:
        nodes, sig, has_sig = stage.signatures(batch)
        if not has_sig.any():
            return BAND_SCHEMA.empty_table()
        from ..hashing import band_keys

        bk = band_keys(sig[has_sig], stage.bands, stage.rows)
        return pa.table(
            {
                "band_key": pa.array(bk.reshape(-1), pa.uint64()),
                "node_id": pa.array(np.repeat(nodes[has_sig], stage.bands), pa.uint64()),
            }
        )

    wave_bands = new_ds.map_batches(bands_of, batch_format="pyarrow")
    corpus_bands = corpus_ds.map_batches(bands_of, batch_format="pyarrow")

    def match(wave: pa.Table | None, corpus: pa.Table | None) -> pa.Table | None:
        if wave is None or corpus is None or len(wave) == 0 or len(corpus) == 0:
            return None
        ck = np.sort(corpus["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64))
        wk = wave["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        idx = np.minimum(np.searchsorted(ck, wk), len(ck) - 1)
        hit = ck[idx] == wk
        if not hit.any():
            return None
        nodes = wave["node_id"].to_numpy(zero_copy_only=False).astype(np.uint64)[hit]
        return pa.table({"node_id": pa.array(np.unique(nodes), pa.uint64())})

    hits = raw_cogroup_exchange(
        wave_bands, corpus_bands, ["band_key"], ["band_key"], match,
        HIT_SCHEMA, num_partitions,
    )
    parts = [t for t in ray.get(hits.to_arrow_refs()) if t is not None and len(t)]
    dup_nodes = (
        np.unique(
            np.concatenate(
                [t["node_id"].to_numpy(zero_copy_only=False).astype(np.uint64) for t in parts]
            )
        )
        if parts
        else np.zeros(0, np.uint64)
    )
    dup_ref = ray.put(dup_nodes)

    def keep(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        nodes = node_ids_for(batch, cfg)
        if len(dups) == 0 or len(batch) == 0:
            return batch
        idx = np.minimum(np.searchsorted(dups, nodes), len(dups) - 1)
        fresh = dups[idx] != nodes
        return batch.filter(pa.array(fresh))

    return new_ds.map_batches(keep, batch_format="pyarrow")


def _sig_fingerprint(cfg) -> str:
    """Hash of the signature-relevant config — a band index probed with a
    different shingle/permutation/banding setup would silently miss."""
    from ..sources.io import config_hash

    bands, rows = cfg.resolved_bands_rows()
    return config_hash(
        {
            "num_perm": cfg.num_perm,
            "ngram_size": cfg.ngram_size,
            "seed": cfg.seed,
            "bands": bands,
            "rows": rows,
            "min_length": cfg.min_length,
            "normalize": str(cfg.normalize),
            "content_col": cfg.content_col,
        }
    )


def _collect_hit_nodes(hits_ds):
    import ray

    parts = [t for t in ray.get(hits_ds.to_arrow_refs()) if t is not None and len(t)]
    if not parts:
        return np.zeros(0, np.uint64)
    return np.unique(
        np.concatenate(
            [t["node_id"].to_numpy(zero_copy_only=False).astype(np.uint64) for t in parts]
        )
    )


def _anti_filter_wave(new_ds, dup_nodes: np.ndarray, cfg):
    """Broadcast the matched wave node ids (wave-bounded, never corpus-sized)
    and drop those rows from the wave."""
    import ray

    from ..stages.signature import node_ids_for
    from ..stages.util import ensure_schema

    dup_ref = ray.put(np.sort(dup_nodes))

    def keep(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        if len(dups) == 0 or len(batch) == 0:
            return batch
        nodes = node_ids_for(batch, cfg)
        idx = np.minimum(np.searchsorted(dups, nodes), len(dups) - 1)
        return batch.filter(pa.array(dups[idx] != nodes))

    s = new_ds.schema()
    if s is None:  # fully-empty materialized wave: nothing to filter or pin
        return new_ds
    # pin the schema so an all-duplicates wave still yields typed columns
    # downstream (to_pandas of all-empty blocks otherwise drops them)
    return ensure_schema(
        new_ds.map_batches(keep, batch_format="pyarrow"),
        pa.schema(list(zip(s.names, s.types))),
    )


def _sig_columns(ds, cfg):
    """Prune to the signature inputs before a band pass — on an image
    corpus the ``bytes`` payload dominates row mass and must not stream
    through a key-extraction map (pushes the pruning into the parquet
    read, like :func:`build_corpus_index`)."""
    want = [c for c in (cfg.index_col, cfg.content_col, cfg.phash_col) if c]
    schema = ds.schema(fetch_if_missing=False) or ds.schema()
    if schema is None:  # fully-empty dataset (e.g. an all-duplicates wave)
        return ds
    return ds.select_columns([c for c in want if c in schema.names])


def _corpus_band_batch(b: pa.Table, stage, shift: int) -> pa.Table:
    """Map-side combiner for the band index: per-batch DISTINCT band keys
    only — document ids and payloads never reach the exchange."""
    from ..hashing import band_keys

    _, sig, has = stage.signatures(b)
    if not has.any():
        return pa.table(
            {"__h__": pa.array([], pa.uint64()), "__p__": pa.array([], pa.uint64())}
        )
    k = np.unique(band_keys(sig[has], stage.bands, stage.rows).reshape(-1))
    return pa.table(
        {
            "__h__": pa.array(k, pa.uint64()),
            "__p__": pa.array(k >> np.uint64(shift), pa.uint64()),
        }
    )


def build_band_index(
    corpus_ds,
    path: str,
    cfg,
    fp_rate: float = 1e-3,
    num_partitions: int = 16,
) -> dict:
    """Persist the corpus's LSH band keys as a hash-range-partitioned sorted
    parquet index with per-partition Bloom sketches — the amortised form of
    :func:`incremental_near_dedupe`: the corpus is signed ONCE, every later
    ingest wave probes at wave-sized cost (same layout and pruning story as
    :func:`build_corpus_index`, band keys instead of content hashes)."""
    shift = _shift_for(num_partitions)
    os.makedirs(path, exist_ok=True)

    from ..stages.signature import SignatureStage

    stage = SignatureStage(cfg)  # once; permutation tables ride the closure
    keyed = _sig_columns(corpus_ds, cfg).map_batches(
        functools.partial(_corpus_band_batch, stage=stage, shift=shift),
        batch_format="pyarrow",
    )
    stats = partition_groupby_prekeyed(
        keyed,
        functools.partial(_build_partition, path=path, shift=shift, fp_rate=fp_rate),
        _STATS_SCHEMA,
        num_partitions,
    ).take_all()
    meta = {
        "kind": "band",
        "num_partitions": num_partitions,
        "fp_rate": fp_rate,
        "sig_fingerprint": _sig_fingerprint(cfg),
        "parts": {str(r["part"]): r["n_hashes"] for r in stats},
    }
    _write_meta(path, meta)
    return meta


def update_band_index(new_ds, index_path: str, cfg) -> dict:
    """Absorb an ingest wave's LSH band keys into an existing
    :func:`build_band_index` snapshot — the near-dup analogue of
    :func:`update_corpus_index` (same touched-partitions-only union-merge,
    atomic swaps, idempotent retry).  The wave must be signed with the SAME
    config the index was built with (fingerprint-guarded, like the probe
    path)."""
    if not os.path.exists(f"{index_path}/_SUCCESS"):
        raise FileNotFoundError(f"no completed band index at {index_path}")
    with open(f"{index_path}/_META.json") as f:
        meta = json.load(f)
    if meta.get("kind") != "band":
        raise ValueError(f"{index_path!r} is not a band index — use update_corpus_index")
    if meta["sig_fingerprint"] != _sig_fingerprint(cfg):
        raise ValueError(
            "band index was built with a different signature config "
            "(num_perm/ngram/seed/banding/normalize) — rebuild it"
        )
    num_partitions = meta["num_partitions"]
    shift = _shift_for(num_partitions)

    from ..stages.signature import SignatureStage

    stage = SignatureStage(cfg)
    keyed = _sig_columns(new_ds, cfg).map_batches(
        functools.partial(_corpus_band_batch, stage=stage, shift=shift),
        batch_format="pyarrow",
    )
    stats = partition_groupby_prekeyed(
        keyed,
        functools.partial(
            _update_partition,
            path=index_path,
            shift=shift,
            fp_rate=meta["fp_rate"],
            parts_prev={int(p): v for p, v in meta["parts"].items()},
        ),
        _STATS_SCHEMA,
        num_partitions,
    ).take_all()
    meta["parts"].update({str(r["part"]): r["n_hashes"] for r in stats})
    _write_meta(index_path, meta)
    return meta


def incremental_near_dedupe_indexed(new_ds, index_path: str, cfg):
    """Wave-vs-persisted-band-index near-dup dedupe: drop every wave doc
    sharing >= 1 LSH band with the indexed corpus.  Wave-sized work only —
    the wave's band keys route to their hash-range partitions, each
    partition probes its Bloom sketch map-side, and only Bloom-positive
    partitions open their (sorted, row-group-pruned) band file for exact
    confirmation.  Semantics identical to :func:`incremental_near_dedupe`
    against the same corpus (asserted in tests/test_incremental.py)."""
    if not os.path.exists(f"{index_path}/_SUCCESS"):
        raise FileNotFoundError(f"no completed band index at {index_path}")
    with open(f"{index_path}/_META.json") as f:
        meta = json.load(f)
    if meta.get("kind") != "band":
        raise ValueError(f"{index_path!r} is not a band index")
    if meta["sig_fingerprint"] != _sig_fingerprint(cfg):
        raise ValueError(
            "band index was built with a different signature config "
            "(num_perm/ngram/seed/banding/normalize) — rebuild it"
        )
    num_partitions = meta["num_partitions"]
    shift = _shift_for(num_partitions)
    HIT_SCHEMA = pa.schema([("node_id", pa.uint64())])

    from ..hashing import band_keys
    from ..stages.signature import SignatureStage

    stage = SignatureStage(cfg)  # once; permutation tables ride the closure

    def wave_bands(b: pa.Table) -> pa.Table:
        nodes, sig, has = stage.signatures(b)
        if not has.any():
            return pa.table(
                {
                    "node_id": pa.array([], pa.uint64()),
                    "__h__": pa.array([], pa.uint64()),
                    "__p__": pa.array([], pa.uint64()),
                }
            )
        bk = band_keys(sig[has], stage.bands, stage.rows)
        k = bk.reshape(-1)
        return pa.table(
            {
                "node_id": pa.array(np.repeat(nodes[has], stage.bands), pa.uint64()),
                "__h__": pa.array(k, pa.uint64()),
                "__p__": pa.array(k >> np.uint64(shift), pa.uint64()),
            }
        )

    known_parts = frozenset(int(p) for p in meta.get("parts", {}))

    def probe(tab: pa.Table) -> pa.Table:
        from ..state.bloom import BloomFilter

        if tab is None or len(tab) == 0:
            return HIT_SCHEMA.empty_table()
        hh = tab["__h__"].to_numpy(zero_copy_only=False)
        part = int(hh[0] >> np.uint64(shift))
        d = _part_dir(index_path, part)
        if not _require_part_visible(d, part, known_parts):
            return HIT_SCHEMA.empty_table()
        maybe = BloomFilter.load(f"{d}/_bloom.npz").contains(hh)
        if not maybe.any():
            return HIT_SCHEMA.empty_table()
        pos = hh[maybe]
        lo = pa.scalar(int(pos.min()), pa.uint64())
        hi = pa.scalar(int(pos.max()), pa.uint64())
        seen = _read_part_hashes(d, lo, hi)
        if not len(seen):
            return HIT_SCHEMA.empty_table()
        at = np.searchsorted(seen, pos)
        at[at == len(seen)] = 0
        confirmed = seen[at] == pos
        if not confirmed.any():
            return HIT_SCHEMA.empty_table()
        nodes = tab["node_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hit_nodes = nodes[maybe][confirmed]
        return pa.table({"node_id": pa.array(np.unique(hit_nodes), pa.uint64())})

    keyed = _sig_columns(new_ds, cfg).map_batches(wave_bands, batch_format="pyarrow")
    hits = partition_groupby_prekeyed(keyed, probe, HIT_SCHEMA, num_partitions)
    return _anti_filter_wave(new_ds, _collect_hit_nodes(hits), cfg)


def incremental_image_near_dedupe(new_ds, corpus_ds, cfg, num_partitions: int = 16):
    """Image-tier wave-vs-corpus near-dup dedupe: a wave row is dropped if it
    shares a caption LSH band with any corpus row OR its pHash lands in a
    corpus Hamming bucket AND verifies within ``cfg.phash_max_hamming`` bits
    — the exact candidate semantics of the flagship pipeline
    (``stages/candidates.py``: banded caption MinHash, pHash sub-band buckets
    with exact Hamming confirmation), applied across the wave/corpus
    boundary instead of within one table.

    Both sides run the shared :class:`SignatureStage` kernel (caption bands
    and pHash bands in one pass), meet in ONE band-key cogroup exchange, and
    the matched wave node ids broadcast back as the anti-filter."""
    from ..hashing import hamming_distance64
    from ..stages.signature import SignatureStage
    from ..stages.util import raw_cogroup_exchange

    HIT_SCHEMA = pa.schema([("node_id", pa.uint64())])

    stage = SignatureStage(cfg)  # once; permutation tables ride the closure

    def bands_of(batch: pa.Table) -> pa.Table:
        return stage(batch)

    wave_bands = new_ds.map_batches(bands_of, batch_format="pyarrow")
    corpus_bands = corpus_ds.map_batches(bands_of, batch_format="pyarrow")

    def match(wave: pa.Table | None, corpus: pa.Table | None) -> pa.Table | None:
        if wave is None or corpus is None or len(wave) == 0 or len(corpus) == 0:
            return None
        ck = corpus["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        cp = corpus["payload"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ckind = corpus["kind"].to_numpy(zero_copy_only=False)
        order = np.argsort(ck)
        ck, cp, ckind = ck[order], cp[order], ckind[order]
        wk = wave["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        wp = wave["payload"].to_numpy(zero_copy_only=False).astype(np.uint64)
        wkind = wave["kind"].to_numpy(zero_copy_only=False)
        wn = wave["node_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lo = np.searchsorted(ck, wk, side="left")
        hi = np.searchsorted(ck, wk, side="right")
        present = hi > lo
        # caption bands (kind 0): bucket membership alone is a hit
        hit = present & (wkind == 0)
        # pHash bands (kind 1): expand each wave row against its (small)
        # bucket and confirm Hamming <= budget
        pm = present & (wkind == 1)
        if pm.any():
            sizes = (hi[pm] - lo[pm]).astype(np.int64)
            from ..hashing import _segment_aranges

            idx = np.repeat(lo[pm], sizes) + _segment_aranges(sizes)
            dist = hamming_distance64(np.repeat(wp[pm], sizes), cp[idx])
            ok = (dist <= cfg.phash_max_hamming) & (ckind[idx] == 1)
            csum = np.concatenate(([0], np.cumsum(ok.astype(np.int64))))
            bounds = np.concatenate(([0], np.cumsum(sizes)))
            any_ok = (csum[bounds[1:]] - csum[bounds[:-1]]) > 0
            sub = np.flatnonzero(pm)
            hit[sub[any_ok]] = True
        if not hit.any():
            return None
        return pa.table({"node_id": pa.array(np.unique(wn[hit]), pa.uint64())})

    hits = raw_cogroup_exchange(
        wave_bands, corpus_bands, ["band_key"], ["band_key"], match,
        HIT_SCHEMA, num_partitions,
    )
    return _anti_filter_wave(new_ds, _collect_hit_nodes(hits), cfg)


# ------------------------------------------------------- image-tier band index
# The indexed form of :func:`incremental_image_near_dedupe`: persists the
# corpus' caption LSH band keys AND pHash Hamming keys (with the phash
# payload, so the probe can confirm Hamming <= budget exactly) in the same
# Bloom-sketched hash-range layout.  The pHash keys follow
# ``cfg.resolve_phash_chunks()`` (SignatureStage — sub-band or multi-index
# subset scheme); the resolved scheme is bound into the index fingerprint
# below so build and probe can never silently disagree.  Key spaces are
# disjoint by construction (both schemes mix a kind seed), so one sorted
# file serves both tiers.


def _image_sig_fingerprint(cfg) -> str:
    from ..sources.io import config_hash

    return config_hash(
        {
            "sig": _sig_fingerprint(cfg),
            "phash_col": cfg.phash_col,
            "phash_bands": cfg.phash_bands,
            # the RESOLVED keying scheme is part of the on-disk key layout:
            # an index probed under a different scheme would silently miss
            # every pHash hit — bind it into the fingerprint so mismatches
            # fail loudly with the rebuild message instead
            "phash_scheme": cfg.resolve_phash_chunks(),
        }
    )


def _dedupe_pairs(k: np.ndarray, kind: np.ndarray, pay: np.ndarray):
    """Distinct (key, payload) pairs, sorted by (key, payload) — caption
    payloads are zeroed first so identical caption bands collapse."""
    from ..stages.candidates import KIND_CAPTION

    pay = np.where(kind == KIND_CAPTION, np.uint64(0), pay)
    order = np.lexsort((pay, k))
    k, kind, pay = k[order], kind[order], pay[order]
    first = np.r_[True, (k[1:] != k[:-1]) | (pay[1:] != pay[:-1])] if len(k) else np.zeros(0, bool)
    return k[first], kind[first], pay[first]


def _image_band_batch(b: pa.Table, stage, shift: int) -> pa.Table:
    """Map-side combiner: distinct (band_key, kind, payload) triples per
    batch — node ids and image bytes never reach the exchange."""
    t = stage(b)
    k, kind, pay = _dedupe_pairs(
        t["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64),
        t["kind"].to_numpy(zero_copy_only=False),
        t["payload"].to_numpy(zero_copy_only=False).astype(np.uint64),
    )
    return pa.table(
        {
            "__h__": pa.array(k, pa.uint64()),
            "kind": pa.array(kind.astype(np.uint8), pa.uint8()),
            "payload": pa.array(pay, pa.uint64()),
            "__p__": pa.array(k >> np.uint64(shift), pa.uint64()),
        }
    )


def _triple_table(k, kind, pay) -> pa.Table:
    return pa.table(
        {
            "__h__": pa.array(k, pa.uint64()),
            "kind": pa.array(kind.astype(np.uint8), pa.uint8()),
            "payload": pa.array(pay, pa.uint64()),
        }
    )


def _read_image_part(d: str, lo=None, hi=None):
    """(keys, kinds, payloads) across base + delta segments, sorted by key
    (the probe's searchsorted contract; intra-key order is irrelevant)."""
    tabs = _read_segments(d, lo, hi)
    if not tabs:
        z = np.zeros(0, np.uint64)
        return z, np.zeros(0, np.uint8), z
    t = pa.concat_tables(tabs)
    k = t["__h__"].to_numpy(zero_copy_only=False).astype(np.uint64)
    kind = t["kind"].to_numpy(zero_copy_only=False)
    pay = t["payload"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.argsort(k, kind="stable")
    return k[order], kind[order], pay[order]


def _write_image_partition(d: str, k, kind, pay, fp_rate: float) -> int:
    """Sorted (key, kind, payload) triples + headroom-sized Bloom over
    distinct keys, written with the same atomic-swap discipline as
    :func:`_update_partition`."""
    from ..state.bloom import BloomFilter

    os.makedirs(d, exist_ok=True)
    f_h = f"{d}/hashes.parquet"
    tmp = f_h + ".tmp"
    pq.write_table(_triple_table(k, kind, pay), tmp, row_group_size=16384)
    distinct_k = np.unique(k)
    bloom = BloomFilter.sized(max(len(distinct_k) * _BLOOM_HEADROOM, 1024), fp_rate)
    bloom.add_hashes(distinct_k)
    btmp = f"{d}/_bloom.tmp.npz"
    bloom.save(btmp)
    os.replace(tmp, f_h)
    os.replace(btmp, f"{d}/_bloom.npz")
    return len(k)


def _build_image_partition(tab: pa.Table, path: str, shift: int, fp_rate: float) -> pa.Table:
    k, kind, pay = _dedupe_pairs(
        tab["__h__"].to_numpy(zero_copy_only=False),
        tab["kind"].to_numpy(zero_copy_only=False),
        tab["payload"].to_numpy(zero_copy_only=False),
    )
    part = int(k[0] >> np.uint64(shift))
    n = _write_image_partition(_part_dir(path, part), k, kind, pay, fp_rate)
    return pa.table({"part": [part], "n_hashes": [n]})


def _count_new_pairs(d: str, k: np.ndarray, pay: np.ndarray, bloom) -> int:
    """Exact count of (key, payload) pairs NOT already in the partition's
    segments — the pair-membership analogue of :func:`_count_new_hashes`
    (caption payloads are already zeroed by :func:`_dedupe_pairs` on both
    the wave and the stored sides)."""
    maybe = bloom.contains(k)
    new = int((~maybe).sum())
    if maybe.any():
        pos, wp = k[maybe], pay[maybe]
        sk, _, sp = _read_image_part(
            d, pa.scalar(int(pos.min()), pa.uint64()), pa.scalar(int(pos.max()), pa.uint64())
        )
        if not len(sk):
            return new + len(pos)
        from ..hashing import _segment_aranges

        lo = np.searchsorted(sk, pos, side="left")
        hi = np.searchsorted(sk, pos, side="right")
        sizes = (hi - lo).astype(np.int64)
        nz = sizes > 0
        found = np.zeros(len(pos), bool)
        if nz.any():
            idx = np.repeat(lo[nz], sizes[nz]) + _segment_aranges(sizes[nz])
            eq = (sp[idx] == np.repeat(wp[nz], sizes[nz])).astype(np.int64)
            csum = np.concatenate(([0], np.cumsum(eq)))
            bounds = np.concatenate(([0], np.cumsum(sizes[nz])))
            found[nz] = (csum[bounds[1:]] - csum[bounds[:-1]]) > 0
        new += int((~found).sum())
    return new


def _update_image_partition(
    tab: pa.Table, path: str, shift: int, fp_rate: float, parts_prev=None
) -> pa.Table:
    """Image-tier absorb with the same LSM contract as
    :func:`_update_partition`: a wave appends its distinct (key, kind,
    payload) triples as a delta segment and ORs the keys into the Bloom;
    compaction (pair-union rewrite + re-sized Bloom) runs only past the
    segment/capacity bounds — amortised O(wave) per wave."""
    from ..state.bloom import BloomFilter

    k = tab["__h__"].to_numpy(zero_copy_only=False)
    kind = tab["kind"].to_numpy(zero_copy_only=False)
    pay = tab["payload"].to_numpy(zero_copy_only=False)
    k, kind, pay = _dedupe_pairs(k, kind, pay)
    part = int(k[0] >> np.uint64(shift))
    d = _part_dir(path, part)
    os.makedirs(d, exist_ok=True)
    f_b = f"{d}/_bloom.npz"
    segs = _segment_files(d)
    n_existing = sum(pq.read_metadata(f).num_rows for f in segs)
    n_deltas = sum(1 for f in segs if not f.endswith("hashes.parquet"))
    total = n_existing + len(k)
    bloom = BloomFilter.load(f_b) if os.path.exists(f_b) else None
    prev_n = parts_prev.get(part) if parts_prev else None
    compact = (
        bloom is None
        or prev_n is None
        or n_deltas + 1 > _MAX_SEGMENTS
        or (bloom.capacity and total > bloom.capacity)
    )
    if compact:
        ok, okind, opay = _read_image_part(d)
        k, kind, pay = _dedupe_pairs(
            np.concatenate([ok, k]),
            np.concatenate([okind, kind]),
            np.concatenate([opay, pay]),
        )
        n = _write_image_partition(d, k, kind, pay, fp_rate)
        for f in segs:
            if not f.endswith("hashes.parquet"):
                os.remove(f)
    else:
        fp = _wave_fp(k, kind, pay)
        btmp = f"{d}/_bloom.tmp.npz"
        if _own_delta(d, fp) is not None:
            # replayed task / re-absorbed wave (see _update_partition):
            # recount the distinct pairs exactly from disk.
            n = len(_dedupe_pairs(*_read_image_part(d))[0])
            bloom.add_hashes(np.unique(k))
            bloom.save(btmp)
            os.replace(btmp, f_b)
        else:
            n = prev_n + _count_new_pairs(d, k, pay, bloom)  # exact, pre-append
            tmp = f"{d}/_delta.tmp.parquet"
            pq.write_table(_triple_table(k, kind, pay), tmp, row_group_size=16384)
            bloom.add_hashes(np.unique(k))
            bloom.save(btmp)
            os.replace(tmp, _next_delta_path(d, fp))
            os.replace(btmp, f_b)
    return pa.table({"part": [part], "n_hashes": [n]})


def build_image_band_index(
    corpus_ds, path: str, cfg, fp_rate: float = 1e-3, num_partitions: int = 16
) -> dict:
    """Persist the corpus' two-tier candidate keys (caption LSH bands +
    pHash Hamming sub-bands with payload) for wave-sized image ingest
    dedupe — the amortised form of :func:`incremental_image_near_dedupe`."""
    shift = _shift_for(num_partitions)
    os.makedirs(path, exist_ok=True)

    from ..stages.signature import SignatureStage

    stage = SignatureStage(cfg)
    keyed = _sig_columns(corpus_ds, cfg).map_batches(
        functools.partial(_image_band_batch, stage=stage, shift=shift),
        batch_format="pyarrow",
    )
    stats = partition_groupby_prekeyed(
        keyed,
        functools.partial(_build_image_partition, path=path, shift=shift, fp_rate=fp_rate),
        _STATS_SCHEMA,
        num_partitions,
    ).take_all()
    meta = {
        "kind": "image_band",
        "num_partitions": num_partitions,
        "fp_rate": fp_rate,
        "sig_fingerprint": _image_sig_fingerprint(cfg),
        "parts": {str(r["part"]): r["n_hashes"] for r in stats},
    }
    _write_meta(path, meta)
    return meta


def _check_image_index(index_path: str, cfg) -> dict:
    if not os.path.exists(f"{index_path}/_SUCCESS"):
        raise FileNotFoundError(f"no completed image band index at {index_path}")
    with open(f"{index_path}/_META.json") as f:
        meta = json.load(f)
    if meta.get("kind") != "image_band":
        raise ValueError(f"{index_path!r} is not an image band index")
    if meta["sig_fingerprint"] != _image_sig_fingerprint(cfg):
        raise ValueError(
            "image band index was built with a different signature/pHash "
            "config — rebuild it"
        )
    return meta


def update_image_band_index(new_ds, index_path: str, cfg) -> dict:
    """Absorb a wave into an existing :func:`build_image_band_index`
    snapshot (touched-partitions-only pair union-merge, atomic swaps,
    idempotent — same contract as :func:`update_band_index`)."""
    meta = _check_image_index(index_path, cfg)
    num_partitions = meta["num_partitions"]
    shift = _shift_for(num_partitions)

    from ..stages.signature import SignatureStage

    stage = SignatureStage(cfg)
    keyed = _sig_columns(new_ds, cfg).map_batches(
        functools.partial(_image_band_batch, stage=stage, shift=shift),
        batch_format="pyarrow",
    )
    stats = partition_groupby_prekeyed(
        keyed,
        functools.partial(
            _update_image_partition,
            path=index_path,
            shift=shift,
            fp_rate=meta["fp_rate"],
            parts_prev={int(p): v for p, v in meta["parts"].items()},
        ),
        _STATS_SCHEMA,
        num_partitions,
    ).take_all()
    meta["parts"].update({str(r["part"]): r["n_hashes"] for r in stats})
    _write_meta(index_path, meta)
    return meta


def incremental_image_near_dedupe_indexed(new_ds, index_path: str, cfg):
    """Wave-vs-persisted-image-index near-dup dedupe: drop a wave row if it
    shares a caption LSH band with the indexed corpus OR its pHash lands in
    an indexed Hamming sub-band AND verifies within
    ``cfg.phash_max_hamming`` bits — the flagship's two-tier candidate
    semantics at wave-sized cost (semantics equal to
    :func:`incremental_image_near_dedupe` against the same corpus,
    asserted in tests)."""
    from ..hashing import _segment_aranges, hamming_distance64
    from ..stages.candidates import KIND_PHASH
    from ..stages.signature import SignatureStage

    meta = _check_image_index(index_path, cfg)
    num_partitions = meta["num_partitions"]
    shift = _shift_for(num_partitions)
    HIT_SCHEMA = pa.schema([("node_id", pa.uint64())])

    stage = SignatureStage(cfg)

    def wave_batch(b: pa.Table) -> pa.Table:
        t = stage(b)
        k = t["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("__p__", pa.array(k >> np.uint64(shift), pa.uint64()))

    known_parts = frozenset(int(p) for p in meta.get("parts", {}))

    def probe(tab: pa.Table) -> pa.Table:
        from ..state.bloom import BloomFilter

        if tab is None or len(tab) == 0:
            return HIT_SCHEMA.empty_table()
        wk = tab["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = int(wk[0] >> np.uint64(shift))
        d = _part_dir(index_path, part)
        if not _require_part_visible(d, part, known_parts):
            return HIT_SCHEMA.empty_table()
        maybe = BloomFilter.load(f"{d}/_bloom.npz").contains(wk)
        if not maybe.any():
            return HIT_SCHEMA.empty_table()
        pos = wk[maybe]
        lo_s = pa.scalar(int(pos.min()), pa.uint64())
        hi_s = pa.scalar(int(pos.max()), pa.uint64())
        sk, skind, sp = _read_image_part(d, lo_s, hi_s)
        if not len(sk):
            return HIT_SCHEMA.empty_table()
        wkind = tab["kind"].to_numpy(zero_copy_only=False)[maybe]
        wp = tab["payload"].to_numpy(zero_copy_only=False).astype(np.uint64)[maybe]
        wn = tab["node_id"].to_numpy(zero_copy_only=False).astype(np.uint64)[maybe]
        lo = np.searchsorted(sk, pos, side="left")
        hi = np.searchsorted(sk, pos, side="right")
        present = hi > lo
        hit = present & (wkind != KIND_PHASH)  # caption tier: membership
        pm = present & (wkind == KIND_PHASH)  # pHash tier: Hamming verify
        if pm.any():
            sizes = (hi[pm] - lo[pm]).astype(np.int64)
            idx = np.repeat(lo[pm], sizes) + _segment_aranges(sizes)
            dist = hamming_distance64(np.repeat(wp[pm], sizes), sp[idx])
            # stored-kind guard mirrors the direct form (ckind[idx]==1): a
            # 64-bit key collision with a caption entry must not Hamming-
            # compare against its zeroed payload
            ok = (dist <= cfg.phash_max_hamming) & (skind[idx] == KIND_PHASH)
            csum = np.concatenate(([0], np.cumsum(ok.astype(np.int64))))
            bounds = np.concatenate(([0], np.cumsum(sizes)))
            any_ok = (csum[bounds[1:]] - csum[bounds[:-1]]) > 0
            sub = np.flatnonzero(pm)
            hit[sub[any_ok]] = True
        if not hit.any():
            return HIT_SCHEMA.empty_table()
        return pa.table({"node_id": pa.array(np.unique(wn[hit]), pa.uint64())})

    keyed = _sig_columns(new_ds, cfg).map_batches(wave_batch, batch_format="pyarrow")
    hits = partition_groupby_prekeyed(keyed, probe, HIT_SCHEMA, num_partitions)
    return _anti_filter_wave(new_ds, _collect_hit_nodes(hits), cfg)
