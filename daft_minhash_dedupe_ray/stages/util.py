"""Small shared Dataset utilities."""

from __future__ import annotations

import functools

import pyarrow as pa


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
