"""Sources & sinks: Lance-or-Parquet format adapter, partitioned resumable
save, stage checkpoints with manifests.

The north_rule input is a Lance table; the ``lance`` wheel is not available
in this sandbox, so the adapter uses ``ray.data.read_lance``/``write_lance``
when importable and falls back to Parquet with the identical Arrow schema
(SURVEY.md §1.3).

``partitioned_save`` keeps the reference's row-count-targeted partition
formula (``workload/minhash_dedupe.py:650-674``:
``max(256, min(ceil(rows/chunk), max_partitions))``) but writes through Ray
Data's parquet sink, which already emits one file per block — resumable,
listable output, never one giant file.

Checkpoints (reference template: ``references/daft_minhash.py:258-323`` —
every wide stage lands in parquet and is re-read) are formalised with a
manifest: config hash, row count, schema, per-partition lineage + metrics,
and a ``_SUCCESS`` marker.  ``maybe_restore`` skips any stage whose manifest
matches the current config hash — that is checkpoint-resume per north_rule.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import math
import os
import time

import pyarrow as pa

try:  # pragma: no cover - lance is absent in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def resolve_filesystem(path: str, filesystem=None):
    """(filesystem, path) for a possibly-URI path (VERDICT r4 item 8 / A6).

    An explicitly injected pyarrow/fsspec filesystem wins (constructor
    injection — credentialed S3/GCS clients are built by the caller and
    passed through).  Otherwise a ``scheme://`` path resolves through
    ``pyarrow.fs.FileSystem.from_uri`` (S3/GCS/HDFS via pyarrow's bundled
    filesystems, env-credentialed; untestable-but-wired in this no-network
    sandbox), and a bare path stays on the default local filesystem
    (``filesystem=None`` — Ray resolves it)."""
    if filesystem is not None:
        return filesystem, path
    if "://" in path:
        from pyarrow import fs as pafs

        return pafs.FileSystem.from_uri(path)
    return None, path


def read_table(path: str, columns=None, filesystem=None):
    """Read a Lance dataset or Parquet file/dir into a ray Dataset."""
    import ray.data as rd

    if path.endswith(".lance") and HAVE_LANCE:
        if filesystem is not None:
            # ray.data.read_lance has no filesystem parameter (lance carries
            # its own storage-options mechanism) — silently ignoring the
            # injected FS would read from the wrong place; fail loudly
            raise ValueError(
                "filesystem injection is not supported for .lance paths; "
                "use lance storage_options / a URI path instead"
            )
        return rd.read_lance(path, columns=columns)
    filesystem, path = resolve_filesystem(path, filesystem)
    return rd.read_parquet(path, columns=columns, filesystem=filesystem)


def write_table(ds, path: str, filesystem=None):
    if path.endswith(".lance") and HAVE_LANCE:
        if filesystem is not None:
            raise ValueError(
                "filesystem injection is not supported for .lance paths; "
                "use lance storage_options / a URI path instead"
            )
        return ds.write_lance(path)
    filesystem, path = resolve_filesystem(path, filesystem)
    return ds.write_parquet(path, compression="snappy", filesystem=filesystem)


def target_partitions(n_rows: int, chunk_size: int = 200_000, max_partitions: int = 2048) -> int:
    """The reference's partition formula (workload/minhash_dedupe.py:663-667)."""
    return max(256, min(math.ceil(n_rows / max(1, chunk_size)), max_partitions))


def partitioned_save(
    ds, path: str, chunk_size: int = 200_000, max_partitions: int = 2048
) -> dict:
    """Row-count-targeted partitioned snappy parquet save (reference A4).
    Returns the written manifest."""
    n_rows = ds.count()
    n_parts = target_partitions(n_rows, chunk_size, max_partitions)
    if os.path.exists(path) and any(f.endswith(".parquet") for f in os.listdir(path)):
        raise FileExistsError(
            f"partitioned_save target {path!r} already contains parquet files — "
            "stale files would be blessed into the manifest; remove them first"
        )
    os.makedirs(path, exist_ok=True)
    ds.repartition(min(n_parts, max(1, n_rows))).write_parquet(path, compression="snappy")
    manifest = {
        "rows": n_rows,
        "target_partitions": n_parts,
        "written_at": time.time(),
        "files": sorted(f for f in os.listdir(path) if f.endswith(".parquet")),
    }
    with open(os.path.join(path, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        f.write("")
    return manifest


def config_hash(cfg) -> str:
    """Stable hash of a DedupeConfig (or any dataclass/dict) — the resume key."""
    if dataclasses.is_dataclass(cfg):
        payload = dataclasses.asdict(cfg)
    else:
        payload = dict(cfg)
    s = json.dumps(payload, sort_keys=True, default=str)
    return hashlib.sha256(s.encode()).hexdigest()[:16]


class CheckpointManager:
    """Per-stage parquet checkpoints with config-hash manifests.

    Layout: ``<root>/<stage>/`` holds the stage's parquet blocks plus
    ``_MANIFEST.json`` (config hash, rows, schema, per-file row counts =
    per-partition lineage/metrics) and ``_SUCCESS``.

    ``run(stage, cfg, fn)`` restores the stage if a matching manifest exists,
    else executes ``fn()``, persists its Dataset, and records the manifest —
    the formalisation of the reference's write-then-reread stage template
    (references/daft_minhash.py:258-260, 301-303, 322-323).
    """

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def manifest(self, stage: str) -> dict | None:
        p = os.path.join(self._dir(stage), "_MANIFEST.json")
        if not os.path.exists(p) or not os.path.exists(
            os.path.join(self._dir(stage), "_SUCCESS")
        ):
            return None
        with open(p) as f:
            return json.load(f)

    def is_complete(self, stage: str, cfg) -> bool:
        m = self.manifest(stage)
        return m is not None and m.get("config_hash") == config_hash(cfg)

    def restore(self, stage: str):
        import ray.data as rd

        return rd.read_parquet(self._dir(stage))

    def save(self, stage: str, ds, cfg) -> None:
        import shutil

        import pyarrow.parquet as pq

        d = self._dir(stage)
        # atomic-ish: write to tmp dir then rename
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp, compression="snappy")
        files = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        if not files:
            # an empty stage (e.g. a dup-free corpus's assignments) must
            # still restore: pin one empty typed file so read_parquet works
            import pyarrow as _pa

            s = ds.schema()
            if s is None:
                # schema-less fully-empty Dataset (ray 2.49 gotcha): there is
                # nothing restore() could read back.  Marking the stage
                # complete anyway would poison every future run under this
                # config (is_complete True, restore() crashes on a fileless
                # dir) — leave it incomplete so the stage recomputes.
                shutil.rmtree(tmp, ignore_errors=True)
                return
            empty = _pa.schema(list(zip(s.names, s.types))).empty_table()
            pq.write_table(empty, os.path.join(tmp, "empty-0.parquet"))
            files = ["empty-0.parquet"]
        per_partition = []
        total = 0
        for fname in files:
            md = pq.ParquetFile(os.path.join(tmp, fname)).metadata
            per_partition.append({"file": fname, "rows": md.num_rows})
            total += md.num_rows
        manifest = {
            "stage": stage,
            "config_hash": config_hash(cfg),
            "rows": total,
            "partitions": per_partition,  # per-partition lineage + metrics
            "written_at": time.time(),
        }
        with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("")
        shutil.rmtree(d, ignore_errors=True)
        os.rename(tmp, d)

    def run(self, stage: str, cfg, fn):
        """Restore ``stage`` if checkpointed under the same config, else
        compute via ``fn()``, persist, and return a re-read Dataset (which
        also cuts lineage, like the reference's checkpoint-then-reread)."""
        if self.is_complete(stage, cfg):
            return self.restore(stage)
        ds = fn()
        self.save(stage, ds, cfg)
        if not self.is_complete(stage, cfg):
            # save declined to checkpoint (schema-less empty stage) — hand
            # the computed Dataset through; next run recomputes.
            return ds
        return self.restore(stage)


def shuffle_export(
    ds,
    path: str,
    n_shards: int = 8,
    seed: int = 0,
    id_col: str = "doc_id",
    sub_shards: int = 1,
) -> dict:
    """Deterministic seeded global shuffle + sharded parquet export — the
    training-data layout step (every epoch reader needs the corpus in a
    fixed pseudo-random order, split into resumable shards).

    Row placement is pure hashing, no ``random_shuffle`` all-to-all: shard
    and within-shard rank both derive from ``splitmix64(hash(id) ^ seed)``,
    so the layout is reproducible for a fixed seed, changes completely with
    the seed, and is independent of input partitioning.  Shards are written
    as ``shard=<k>/`` parquet directories via one partition-granular
    exchange (rows move once); a ``_MANIFEST.json`` + ``_SUCCESS`` marker
    makes the export resumable/skippable like :func:`partitioned_save`.

    ``sub_shards`` bounds per-task memory at scale: each shard's rank space
    is range-split into that many contiguous sub-shards, so no reduce task
    ever sorts more than ``corpus / (n_shards * sub_shards)`` rows.
    Sub-shard directories are zero-padded (``sub=000…``), so walking them
    lexicographically streams the shard in global rank order — the sort
    parallelises without losing the epoch-reader contract.  Size it so one
    sub-shard fits a worker heap (100 TB / 1024 shards / 128 sub-shards
    ≈ 800 MB per reduce task).
    """
    import numpy as np

    from ..hashing import splitmix64
    from ..stages.util import _hash_key_col, partition_groupby_prekeyed

    base_schema = ds.schema()
    names = list(base_schema.names)
    arrow_schema = pa.schema(
        [base_schema.base_schema.field(n) for n in names]
        if hasattr(base_schema, "base_schema")
        else [(n, t) for n, t in zip(names, base_schema.types)]
    )
    width = len(str(max(sub_shards - 1, 0)))
    out_schema = (
        arrow_schema.append(pa.field("shard", pa.int64()))
        .append(pa.field("sub", pa.string()))
        .append(pa.field("rank", pa.uint64()))
    )

    sd = np.uint64(seed)
    # contiguous rank-range split of the u64 space (sub_shards == 1 -> all 0)
    divisor = np.uint64((1 << 64) // sub_shards - 1) if sub_shards > 1 else None
    sub_names = np.array([str(i).zfill(width) for i in range(max(sub_shards, 1))])

    def key(b: pa.Table) -> pa.Table:
        h = splitmix64(_hash_key_col(b[id_col]) ^ sd)
        shard = (h % np.uint64(n_shards)).astype(np.int64)
        rank = splitmix64(h)
        if divisor is not None:
            sub = np.minimum(rank // divisor, np.uint64(sub_shards - 1)).astype(np.int64)
        else:
            sub = np.zeros(len(b), dtype=np.int64)
        b = b.append_column("shard", pa.array(shard, pa.int64()))
        b = b.append_column("sub", pa.array(sub_names[sub], pa.string()))
        b = b.append_column("rank", pa.array(rank, pa.uint64()))
        return b.append_column(
            "__p__",
            pa.array((shard * sub_shards + sub).astype(np.uint64), pa.uint64()),
        )

    def order_shard(tab: pa.Table) -> pa.Table:
        return tab.sort_by("rank")

    keyed = ds.map_batches(key, batch_format="pyarrow")
    shards = partition_groupby_prekeyed(
        keyed, order_shard, out_schema, n_shards * sub_shards
    )
    # refuse a dirty target: stale parquet from a previous export (different
    # seed / shard count) would be blessed into the layout by _SUCCESS and
    # streamed back mixed with the new rows.  Write into a tmp sibling and
    # atomically rename, mirroring CheckpointManager.save.
    import glob as _glob
    import shutil as _shutil

    if os.path.exists(path) and os.listdir(path):
        raise FileExistsError(
            f"shuffle_export target {path!r} is not empty — remove it (or "
            "export to a fresh directory) first"
        )
    tmp = path.rstrip("/") + ".inprogress"
    _shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    shards.write_parquet(tmp, partition_cols=["shard", "sub"])
    # row count from the written files' parquet footers — the dataset was
    # just consumed by write_parquet; a ds.count() here would re-execute the
    # whole upstream pipeline a second time
    import pyarrow.parquet as _pq

    rows = sum(
        _pq.ParquetFile(f).metadata.num_rows
        for f in _glob.glob(os.path.join(tmp, "**", "*.parquet"), recursive=True)
    )
    manifest = {
        "n_shards": n_shards,
        "sub_shards": sub_shards,
        "seed": seed,
        "rows": rows,
        "written_at": time.time(),
    }
    with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("")
    if os.path.exists(path):
        os.rmdir(path)  # empty (checked above for parquet; rmdir errors otherwise)
    os.replace(tmp, path)
    return manifest


def read_shuffled(path: str, shards: list[int] | None = None, columns=None):
    """Epoch reader for a :func:`shuffle_export` layout: stream the chosen
    shards (default: all) as one Dataset whose block order follows the
    shuffled rank — ``shard=<k>/sub=<j>/`` directories are walked in
    zero-padded lexicographic order, so a sequential consumer sees the same
    pseudo-random document order every epoch.  Pass ``shards`` to give each
    trainer rank its own disjoint slice (the file listing is cheap; data is
    only read as blocks stream)."""
    import glob

    import ray.data as rd

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise FileNotFoundError(f"no _SUCCESS marker under {path!r} — incomplete export")
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    want = set(range(manifest["n_shards"])) if shards is None else set(shards)
    files = []
    for k in sorted(want):
        subs = sorted(glob.glob(os.path.join(path, f"shard={k}", "sub=*")))
        for sub in subs:
            files.extend(sorted(glob.glob(os.path.join(sub, "*.parquet"))))
    if not files:
        raise FileNotFoundError(f"no parquet files for shards {sorted(want)} under {path!r}")
    return rd.read_parquet(files, columns=columns)
