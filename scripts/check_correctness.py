"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 and compare row-count + order-insensitive value-hash against
oracle_sql() via DuckDB.  Usage: python scripts/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])  # optional: restrict to these query names
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(x):
    import pyarrow as pa

    if isinstance(x, pd.DataFrame):
        return x
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()[:16]


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(SF_DIR))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(mine)} rows ({dt:.1f}s) [rows-only]")
            continue
        want = con.sql(oracles[name]).df()
        # normalize dtypes for hashing
        mine2 = mine.copy()
        for c in mine2.columns:
            if pd.api.types.is_unsigned_integer_dtype(mine2[c]):
                mine2[c] = mine2[c].astype("int64")
        ok_rows = len(mine2) == len(want)
        ok_cols = sorted(mine2.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(mine2) == value_hash(want)
        status = "OK   " if ok_hash else "FAIL "
        if not ok_hash:
            failures += 1
        print(
            f"{status} {name}: rows {len(mine2)}/{len(want)} cols "
            f"{'=' if ok_cols else sorted(mine2.columns)} hash "
            f"{'=' if ok_hash else 'MISMATCH'} ({dt:.1f}s)"
        )
    print("FAILURES:", failures)
    return failures


if __name__ == "__main__":
    import ray

    rc = main()
    ray.shutdown()
    sys.exit(1 if rc else 0)
