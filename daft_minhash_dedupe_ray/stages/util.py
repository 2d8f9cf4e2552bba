"""Small shared Dataset utilities."""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from ..hashing import splitmix64


def _restore(b: pa.Table, schema: pa.Schema) -> pa.Table:
    if b.num_columns == 0:
        return schema.empty_table()
    return b.select([f.name for f in schema]).cast(schema)


def ensure_schema(ds, schema: pa.Schema):
    """Pin a Dataset's schema after ``groupby(...).map_groups``.

    Ray's hash-shuffle map_groups emits zero-column blocks for empty hash
    partitions; those poison schema unification (``ds.schema()`` becomes
    empty) and break downstream ``Dataset.join`` planning.  This pass rebuilds
    empty blocks with the right schema and fixes column order on the rest.
    """
    return ds.map_batches(functools.partial(_restore, schema=schema), batch_format="pyarrow")


def _key_partition(b: pa.Table, key_cols: list[str], num_partitions: int) -> pa.Table:
    h = np.zeros(len(b), dtype=np.uint64)
    for c in key_cols:
        col = b[c].to_numpy(zero_copy_only=False)
        h = splitmix64(h ^ splitmix64(col.astype(np.uint64)))
    return b.append_column("__p__", pa.array(h % np.uint64(num_partitions), pa.uint64()))


def _strip_and_apply(b: pa.Table, fn) -> pa.Table:
    if b.num_columns == 0:
        return b
    if "__p__" in b.column_names:
        b = b.drop_columns(["__p__"])
    return fn(b)


def partition_groupby(ds, key_cols: list[str], fn, schema: pa.Schema, num_partitions: int = 64):
    """Vectorised grouped processing at PARTITION granularity.

    ``Dataset.groupby(key).map_groups(fn)`` invokes the UDF once per group —
    ruinous when there are millions of keys (the LSH band table has one key
    per band bucket).  Instead: hash the key columns to a partition id
    (``% num_partitions``), shuffle on that, and call ``fn`` once per
    partition.  ``fn`` must handle multiple keys per call (sort/segment
    internally); every row of a given key lands in exactly one partition, so
    per-key semantics are preserved while UDF invocations drop from O(keys)
    to O(num_partitions).

    This is the engine's canonical wide-op shape: all the star/contract/
    dedup kernels are numpy-vectorised over sorted key runs.
    """
    keyed = ds.map_batches(
        functools.partial(_key_partition, key_cols=key_cols, num_partitions=num_partitions),
        batch_format="pyarrow",
    )
    grouped = keyed.groupby("__p__").map_groups(
        functools.partial(_strip_and_apply, fn=fn), batch_format="pyarrow"
    )
    return ensure_schema(grouped, schema)
