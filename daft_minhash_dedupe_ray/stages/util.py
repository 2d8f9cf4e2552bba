"""Shared keyed-exchange utilities — the engine's canonical wide-op shape.

All grouped kernels here are *partition-granular*: rows are hashed to a
partition id, every row of a given key lands in exactly one partition, and
the (numpy-vectorised, multi-key) kernel runs once per partition.  This
avoids both failure modes of naive grouped processing at scale:

  * ``Dataset.groupby(key).map_groups(fn)`` invokes the UDF once per group —
    ruinous with millions of keys (the LSH band table has one key per band
    bucket);
  * Ray Data's groupby backend is a sort-based all-to-all whose sampled
    boundaries skew badly on low-cardinality partition columns, and whose
    reduce phase straggles.

The exchange itself is explicit MapReduce in raw Ray tasks (the documented
escape hatch for what the Dataset API can't express efficiently): one map
task per block splits rows by partition id (``num_returns=P`` object refs),
one reduce task per partition concatenates its shards and applies the
kernel.  Deterministic, no sort, no sampling; parallelism = blocks on the
map side, partitions on the reduce side.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray

from ..hashing import splitmix64

# static fallback partition count for keyed exchanges whose partition key is
# baked upstream before the stream size is knowable; prefer the input-sized
# forms (``sized_partitions`` from a row estimate, or ``num_partitions=None``
# on :func:`partition_groupby`, which measures the materialized blocks) —
# a fixed 64 is simultaneously too many tasks for a 4-edge graph and
# multi-GB reduce tasks at 100x scale.  ``DedupeConfig.num_partitions``
# overrides everywhere.
DEFAULT_PARTITIONS = 64

# exchange sizing rule: ~rows/P of a few hundred thousand keeps reduce tasks
# in tens of MB; the cap bounds scheduler pressure but must grow with the
# cluster — a fixed 1024 on a 256-node x 64-core cluster would both starve
# the reduce wave (16k cores, 1024 tasks) and inflate each task to
# corpus/1024 rows.  ``DedupeConfig.num_partitions`` overrides everywhere.
ROWS_PER_PARTITION = 250_000
MAX_PARTITIONS = 1024  # single-node floor for the cap


def _cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 0))
    except Exception:  # Ray not initialised (pure-driver sizing)
        return 0


def _partition_cap() -> int:
    """max(MAX_PARTITIONS, 8 x cluster CPUs): enough reduce tasks to feed
    every core several waves on any cluster size, without unbounded
    scheduler pressure when the row formula asks for millions."""
    return max(MAX_PARTITIONS, 8 * _cluster_cpus())


def sized_partitions(total_rows: int, rows_per_partition: int = ROWS_PER_PARTITION) -> int:
    """Input-sized exchange partition count (reference's own save formula
    shape, workload/minhash_dedupe.py:663: ceil(rows/chunk) clamped)."""
    return max(1, min(_partition_cap(), -(-int(total_rows) // rows_per_partition)))


# fused band exchange: ~48 MB of narrow (32 B) band rows per reduce task
BAND_ROWS_PER_PARTITION = 1_500_000


def band_sized_partitions(band_rows: int) -> int:
    """Partition count for the fused band exchange.  Every map task ships a
    shard to every partition (``num_returns=P``), so the exchange creates
    M x P objects — at 250k band rows per partition a 16M-doc input pays
    ~200 map tasks x 1024 partitions of ~375-row shards and the reduce wave
    is fetch-overhead-dominated (measured ~11% of ingest wall; P=256 was
    the knee).  The band stream is narrow (~32 B/row), so coarse
    ``BAND_ROWS_PER_PARTITION`` reduce tasks stay comfortably in memory;
    the floor keeps enough partitions to feed the cluster (2 tasks/CPU)
    whenever the stream is large enough to split that far at the generic
    ``ROWS_PER_PARTITION`` granularity (small inputs keep few partitions —
    the round-2 near-empty-task lesson)."""
    coarse = sized_partitions(band_rows, BAND_ROWS_PER_PARTITION)
    par_floor = min(2 * _cluster_cpus(), sized_partitions(band_rows))
    return max(coarse, par_floor)


def _restore(b: pa.Table, schema: pa.Schema) -> pa.Table:
    if b.num_columns == 0:
        return schema.empty_table()
    return b.select([f.name for f in schema]).cast(schema)


def ensure_schema(ds, schema: pa.Schema):
    """Pin a Dataset's schema (zero-column blocks from empty partitions poison
    schema unification and break downstream join planning)."""
    return ds.map_batches(functools.partial(_restore, schema=schema), batch_format="pyarrow")


def _hash_key_col(col: pa.ChunkedArray) -> np.ndarray:
    """Stable uint64 hash of one key column.  String/binary keys are
    dictionary-encoded so only the per-block distinct values are hashed —
    via the vectorised byte-polynomial fold (``hashing.poly_hash64_array``,
    no per-unique Python) for ordinary keys; kilobyte-scale values fall back
    to the blake2b C core, which wins once values are long (its per-unique
    Python overhead is amortised by the value length).  The poly/blake2b
    choice is a function of EACH VALUE's own length — never of the block it
    happens to share (a block-level max-length switch would hash the same
    key differently across blocks, splitting one key over two partitions
    and making hash-derived placement depend on block composition)."""
    t = col.type
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        import pyarrow.compute as pc

        from ..hashing import hash64_bytes, hash64_str, poly_hash64_array

        enc = pc.dictionary_encode(col.combine_chunks())
        idx = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        vals = enc.dictionary
        dh = np.empty(len(vals) + 1, dtype=np.uint64)
        dh[0] = 0  # nulls
        if len(vals):
            lens = pc.binary_length(vals).to_numpy(zero_copy_only=False)
            long_mask = lens > 512
            if long_mask.any():
                short = np.flatnonzero(~long_mask)
                if len(short):
                    dh[short + 1] = poly_hash64_array(vals.take(pa.array(short)))
                for i in np.flatnonzero(long_mask):
                    v = vals[int(i)].as_py()
                    dh[i + 1] = hash64_bytes(v) if isinstance(v, bytes) else hash64_str(v)
            else:
                dh[1:] = poly_hash64_array(vals)
        return dh[idx + 1]
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype == object or np.issubdtype(arr.dtype, np.floating):
        # nullable ints surface as object/float — null → 0
        arr = np.nan_to_num(arr.astype(np.float64), nan=0.0)
    return arr.astype(np.uint64)


def _key_partition(b: pa.Table, key_cols: list[str], num_partitions: int) -> pa.Table:
    h = np.zeros(len(b), dtype=np.uint64)
    for c in key_cols:
        h = splitmix64(h ^ splitmix64(_hash_key_col(b[c])))
    return b.append_column("__p__", pa.array(h % np.uint64(num_partitions), pa.uint64()))


@ray.remote
def _reduce_apply(fn, schema_ser: bytes, *tables) -> pa.Table:
    schema = pa.ipc.read_schema(pa.BufferReader(schema_ser))
    tabs = [t for t in tables if t is not None and len(t)]
    if not tabs:
        return schema.empty_table()
    merged = pa.concat_tables(tabs, promote_options="default")
    if "__p__" in merged.column_names:
        merged = merged.drop_columns(["__p__"])
    out = fn(merged)
    if out.num_columns == 0:
        return schema.empty_table()
    return out.select([f.name for f in schema]).cast(schema)


def _split_block(block: pa.Table, num_partitions: int):
    if len(block) == 0 or block.num_columns == 0:
        out = [None] * num_partitions
        return out if num_partitions > 1 else out[0]
    p = block["__p__"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(p, kind="stable")
    ps = p[order]
    sorted_block = block.take(pa.array(order))
    bounds = np.searchsorted(ps, np.arange(num_partitions + 1))
    out = []
    for i in range(num_partitions):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        out.append(sorted_block.slice(lo, hi - lo) if hi > lo else None)
    return out if num_partitions > 1 else out[0]


_split_block_remote = ray.remote(_split_block)


def _split_block_keyed(block: pa.Table, key_cols: list[str], num_partitions: int):
    """Key-then-split fused into one task — lets the partition count be
    chosen AFTER the stream is materialized (no extra pass: the hash rides
    the split that happens anyway)."""
    if len(block) == 0 or block.num_columns == 0:
        out = [None] * num_partitions
        return out if num_partitions > 1 else out[0]
    return _split_block(_key_partition(block, key_cols, num_partitions), num_partitions)


_split_block_keyed_remote = ray.remote(_split_block_keyed)


def _materialized_blocks(ds):
    """Materialize and return ``(total_rows, block_refs)`` — the row count
    comes from block METADATA (zero tasks, zero transfer), not a remote
    ``len()`` wave; the blocks materialize anyway because the exchange
    operates on object refs."""
    mat = ds.materialize()
    return mat.count(), mat.to_arrow_refs()


def _assemble_exchange(parts, fn, schema: pa.Schema, num_partitions: int):
    import ray.data as rd

    schema_ser = schema.serialize().to_pybytes()
    if num_partitions == 1:
        parts = [[p] for p in parts]
    out_refs = [
        _reduce_apply.remote(fn, schema_ser, *[pb[p] for pb in parts])
        for p in range(num_partitions)
    ]
    return rd.from_arrow_refs(out_refs)


def raw_partition_exchange(ds, fn, schema: pa.Schema, num_partitions: int):
    """``__p__``-keyed explicit hash exchange; see module docstring.

    ``ds`` must carry a ``__p__`` column in [0, num_partitions).  Returns a
    Dataset of ``fn``-outputs, one block per partition, cast to ``schema``.
    """
    blocks = ds.to_arrow_refs()
    splitter = _split_block_remote.options(num_returns=num_partitions)
    parts = [splitter.remote(b, num_partitions) for b in blocks]
    return _assemble_exchange(parts, fn, schema, num_partitions)


@ray.remote
def _reduce_cogroup(fn, schema_ser: bytes, n_left: int, *tables) -> pa.Table:
    schema = pa.ipc.read_schema(pa.BufferReader(schema_ser))

    def _merge(tabs):
        tabs = [t for t in tabs if t is not None and len(t)]
        if not tabs:
            return None
        m = pa.concat_tables(tabs, promote_options="default")
        return m.drop_columns(["__p__"]) if "__p__" in m.column_names else m

    left = _merge(tables[:n_left])
    right = _merge(tables[n_left:])
    out = fn(left, right)
    if out is None or out.num_columns == 0:
        return schema.empty_table()
    return out.select([f.name for f in schema]).cast(schema)


def raw_cogroup_exchange(
    ds_a, ds_b, key_cols_a, key_cols_b, fn, schema, num_partitions: int | None = None
):
    """Two-sided keyed exchange: both datasets are hash-partitioned on their
    key columns; ``fn(left_table_or_None, right_table_or_None)`` runs once per
    partition with the co-located shards — the building block for exact
    distributed joins/anti-joins without Ray Data's join operator (whose hash
    backend mishandles empty partitions in 2.49).

    ``num_partitions=None`` sizes the exchange from the two streams' summed
    block rows (see :func:`partition_groupby`)."""
    import functools as _ft

    import ray.data as rd

    if num_partitions is not None:
        keyed_a = ds_a.map_batches(
            _ft.partial(_key_partition, key_cols=key_cols_a, num_partitions=num_partitions),
            batch_format="pyarrow",
        )
        keyed_b = ds_b.map_batches(
            _ft.partial(_key_partition, key_cols=key_cols_b, num_partitions=num_partitions),
            batch_format="pyarrow",
        )
        blocks_a = keyed_a.to_arrow_refs()
        blocks_b = keyed_b.to_arrow_refs()
        P = num_partitions
        splitter = _split_block_remote.options(num_returns=P)
        parts_a = [splitter.remote(b, P) for b in blocks_a]
        parts_b = [splitter.remote(b, P) for b in blocks_b]
    else:
        n_a, blocks_a = _materialized_blocks(ds_a)
        n_b, blocks_b = _materialized_blocks(ds_b)
        P = sized_partitions(n_a + n_b)
        splitter = _split_block_keyed_remote.options(num_returns=P)
        parts_a = [splitter.remote(b, key_cols_a, P) for b in blocks_a]
        parts_b = [splitter.remote(b, key_cols_b, P) for b in blocks_b]
    schema_ser = schema.serialize().to_pybytes()
    if P == 1:
        parts_a = [[p] for p in parts_a]
        parts_b = [[p] for p in parts_b]
    out_refs = [
        _reduce_cogroup.remote(
            fn,
            schema_ser,
            len(parts_a),
            *[pb[p] for pb in parts_a],
            *[pb[p] for pb in parts_b],
        )
        for p in range(P)
    ]
    return rd.from_arrow_refs(out_refs)


def partition_groupby(
    ds, key_cols: list[str], fn, schema: pa.Schema, num_partitions: int | None = None
):
    """Hash the key columns to ``__p__`` and run the partition-granular
    exchange.  ``fn`` must handle multiple keys per call (sort/segment
    internally); every row of a given key lands in exactly one partition, so
    per-key semantics are preserved while UDF invocations drop from O(keys)
    to O(num_partitions).

    ``num_partitions=None`` (default) sizes the exchange from the stream
    itself: the input blocks materialize (they would anyway — the exchange
    operates on object refs), their row counts are summed block-locally,
    and P = :func:`sized_partitions` of the total — so a 4-edge graph gets
    1 reduce task and a 10^9-row stream gets :data:`MAX_PARTITIONS`, instead
    of a fixed 64 either way."""
    if num_partitions is not None:
        keyed = ds.map_batches(
            functools.partial(
                _key_partition, key_cols=key_cols, num_partitions=num_partitions
            ),
            batch_format="pyarrow",
        )
        return raw_partition_exchange(keyed, fn, schema, num_partitions)
    total, blocks = _materialized_blocks(ds)
    P = sized_partitions(total)
    splitter = _split_block_keyed_remote.options(num_returns=P)
    parts = [splitter.remote(b, key_cols, P) for b in blocks]
    return _assemble_exchange(parts, fn, schema, P)


def partition_groupby_prekeyed(
    ds, fn, schema: pa.Schema, num_partitions: int = DEFAULT_PARTITIONS
):
    """Like :func:`partition_groupby` but the dataset already carries a
    ``__p__`` partition column (fused into an upstream pass to save a full
    map over the data)."""
    return raw_partition_exchange(ds, fn, schema, num_partitions)


def sparse_quantile_cutoff(
    scores_ds,
    col: str,
    q: float,
    num_partitions: int = 16,
) -> float | None:
    """Exact corpus ``q``-quantile (``quantile_disc`` semantics: the sorted
    value at 1-based rank ``ceil(q*n)``) of a float score column, without
    ever sorting the corpus: per-batch ``(value, count)`` partials reduce
    through one hash exchange into the global sparse histogram (bounded by
    DISTINCT values — scores are pre-rounded by their producers), whose
    cumulative counts locate the cutoff on the driver.  Returns ``None``
    on an empty input.  Shared by the LM perplexity gate and the
    image-text alignment gate."""
    import ray as _ray

    HIST_SCHEMA = pa.schema([("v", pa.float64()), ("c", pa.int64())])

    def hist_partial(b: pa.Table) -> pa.Table:
        s = b[col].to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(s, return_counts=True)
        return pa.table(
            {"v": pa.array(vals, pa.float64()), "c": pa.array(cnt.astype(np.int64))}
        )

    def hist_reduce(tab: pa.Table) -> pa.Table:
        if tab is None or len(tab) == 0:
            return HIST_SCHEMA.empty_table()
        v = tab["v"].to_numpy(zero_copy_only=False)
        c = tab["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(v)
        v, c = v[order], c[order]
        seg = np.flatnonzero(np.concatenate(([True], v[1:] != v[:-1])))
        csum = np.concatenate(([0], np.cumsum(c)))
        ends = np.concatenate((seg[1:], [len(v)]))
        return pa.table(
            {
                "v": pa.array(v[seg], pa.float64()),
                "c": pa.array(csum[ends] - csum[seg], pa.int64()),
            }
        )

    hist = partition_groupby(
        scores_ds.map_batches(hist_partial, batch_format="pyarrow"),
        ["v"],
        hist_reduce,
        HIST_SCHEMA,
        num_partitions,
    )
    parts = [t for t in _ray.get(hist.to_arrow_refs()) if t is not None and len(t)]
    if not parts:
        return None
    tab = pa.concat_tables(parts)
    v = tab["v"].to_numpy(zero_copy_only=False)
    c = tab["c"].to_numpy(zero_copy_only=False)
    order = np.argsort(v)
    v, c = v[order], c[order]
    n = int(c.sum())
    target = int(np.ceil(q * n))  # 1-based rank of the quantile_disc value
    return float(v[np.searchsorted(np.cumsum(c), target)])
