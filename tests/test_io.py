"""Sources/sinks: partitioned save, checkpoint manifests, resume skip."""

import json
import os

import pyarrow as pa
import pytest

from daft_minhash_dedupe_ray.config import DedupeConfig
from daft_minhash_dedupe_ray.sources.io import (
    CheckpointManager,
    config_hash,
    partitioned_save,
    read_table,
    target_partitions,
)


def test_target_partitions_formula():
    # reference formula: max(256, min(ceil(rows/chunk), max_partitions))
    assert target_partitions(100) == 256
    assert target_partitions(200_000 * 300) == 300
    assert target_partitions(200_000 * 5000) == 2048


def test_partitioned_save_and_read(ray_session, tmp_path):
    import ray.data as rd

    ds = rd.range(1000).map_batches(
        lambda b: pa.table({"x": b["id"]}), batch_format="pyarrow"
    )
    path = str(tmp_path / "out")
    manifest = partitioned_save(ds, path)
    assert manifest["rows"] == 1000
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert os.path.exists(os.path.join(path, "_MANIFEST.json"))
    back = read_table(path)
    assert back.count() == 1000


def test_checkpoint_run_restore_and_invalidate(ray_session, tmp_path):
    import ray.data as rd

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    cfg = DedupeConfig()
    calls = []

    def compute():
        calls.append(1)
        return rd.from_arrow(pa.table({"u": pa.array([1, 2, 3], pa.uint64())}))

    out1 = ckpt.run("stage1", cfg, compute)
    assert out1.count() == 3 and len(calls) == 1
    # same config: restored, not recomputed
    out2 = ckpt.run("stage1", cfg, compute)
    assert out2.count() == 3 and len(calls) == 1
    # manifest carries per-partition lineage
    m = ckpt.manifest("stage1")
    assert m["config_hash"] == config_hash(cfg)
    assert sum(p["rows"] for p in m["partitions"]) == 3
    # changed config: stage recomputed
    ckpt.run("stage1", cfg.with_overrides(num_perm=128, bands=16, rows=8), compute)
    assert len(calls) == 2


def test_checkpointed_pipeline_resume(ray_session, tmp_path):
    import ray.data as rd

    from daft_minhash_dedupe_ray.pipelines.dedupe import MinHashDedupePipeline
    from daft_minhash_dedupe_ray.synth import generate_table

    t = generate_table(200, seed=3, with_images=False)
    cfg = DedupeConfig()
    pipe = MinHashDedupePipeline(cfg)
    root = str(tmp_path / "ck")
    out1, _ = pipe.run_with_checkpoints(rd.from_arrow(t), root, num_actors=2)
    n1 = out1.count()
    # second run restores both stages from the manifests
    out2, _ = pipe.run_with_checkpoints(rd.from_arrow(t), root, num_actors=2)
    assert out2.count() == n1
    assert os.path.exists(os.path.join(root, "edges", "_SUCCESS"))
    assert os.path.exists(os.path.join(root, "assignments", "_SUCCESS"))


def test_cli_job_entry(ray_session, tmp_path, capsys):
    """The ray-job-submit surface: read -> dedupe -> partitioned save ->
    one-line JSON report (reference __main__ lifecycle)."""
    import json

    import pyarrow.parquet as pq

    from daft_minhash_dedupe_ray.cli import main
    from daft_minhash_dedupe_ray.synth import generate_table

    inp = str(tmp_path / "in.parquet")
    pq.write_table(generate_table(400, seed=9, with_images=False), inp)
    out_dir = str(tmp_path / "out")
    rc = main(
        [
            "--input", inp, "--output", out_dir,
            "--num-perm", "128", "--bands", "16", "--rows", "8",
            "--num-actors", "2", "--chunk-size", "100",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["rows_before"] == 400
    assert 0 < report["rows_after"] <= 400
    assert os.path.exists(os.path.join(out_dir, "_SUCCESS"))
    assert os.path.exists(os.path.join(out_dir, "_MANIFEST.json"))
    # saved rows match the report
    import ray.data as rd

    assert rd.read_parquet(out_dir).count() == report["rows_after"]


def test_shuffle_export_permutation_determinism_balance(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from daft_minhash_dedupe_ray.sources.io import shuffle_export

    n = 3000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([f"doc number {i}" for i in range(n)], pa.string()),
        }
    )
    p1, p2, p3 = str(tmp_path / "s1"), str(tmp_path / "s2"), str(tmp_path / "s3")
    shuffle_export(rd.from_arrow(t).repartition(5), p1, n_shards=6, seed=1)
    shuffle_export(rd.from_arrow(t).repartition(2), p2, n_shards=6, seed=1)  # diff partitioning
    shuffle_export(rd.from_arrow(t).repartition(5), p3, n_shards=6, seed=2)  # diff seed

    import pyarrow.parquet as pq

    def load(p):
        ds = pq.ParquetDataset(p).read()
        return ds.to_pandas()

    a, b, c = load(p1), load(p2), load(p3)
    # permutation: nothing lost, nothing duplicated, payload intact
    assert sorted(a["doc_id"].tolist()) == list(range(n))
    assert a.set_index("doc_id")["text"].to_dict() == {i: f"doc number {i}" for i in range(n)}
    # deterministic placement independent of input partitioning
    ka = a.set_index("doc_id")[["shard", "rank"]].sort_index()
    kb = b.set_index("doc_id")[["shard", "rank"]].sort_index()
    assert ka.equals(kb)
    # a different seed relocates nearly everything
    kc = c.set_index("doc_id")[["shard"]].sort_index()
    assert (ka["shard"] != kc["shard"]).mean() > 0.5
    # shards are hash-balanced
    sizes = a.groupby("shard").size()
    assert len(sizes) == 6 and sizes.min() > n / 6 * 0.7
    # within-shard files are rank-ordered (epoch readers stream in order)
    import glob

    f = sorted(glob.glob(f"{p1}/shard=0/sub=*/*.parquet"))[0]
    r = pq.read_table(f)["rank"].to_numpy()
    assert (np.diff(r.astype(np.uint64)) >= 0).all()


def test_shuffle_export_sub_shards_preserve_global_rank_order(ray_session, tmp_path):
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from daft_minhash_dedupe_ray.sources.io import shuffle_export

    n = 4000
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    p = str(tmp_path / "subs")
    shuffle_export(rd.from_arrow(t).repartition(4), p, n_shards=3, seed=5, sub_shards=4)
    total = 0
    for shard_dir in sorted(glob.glob(f"{p}/shard=*")):
        ranks = []
        # lexicographic sub-dir walk == numeric order (zero-padded)
        for f in sorted(glob.glob(f"{shard_dir}/sub=*/*.parquet")):
            ranks.append(pq.read_table(f)["rank"].to_numpy().astype(np.uint64))
        r = np.concatenate(ranks)
        total += len(r)
        assert (np.diff(r) >= 0).all()  # global rank order across sub-shards
    assert total == n
    # placement matches the sub_shards=1 layout (same shard/rank hashes)
    p1 = str(tmp_path / "flat")
    shuffle_export(rd.from_arrow(t).repartition(4), p1, n_shards=3, seed=5)
    a = pq.ParquetDataset(p).read().to_pandas().set_index("doc_id")[["shard", "rank"]].sort_index()
    b = pq.ParquetDataset(p1).read().to_pandas().set_index("doc_id")[["shard", "rank"]].sort_index()
    assert a.equals(b)


def test_read_shuffled_round_trip_and_shard_slicing(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from daft_minhash_dedupe_ray.sources.io import read_shuffled, shuffle_export

    n = 2000
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    p = str(tmp_path / "epoch")
    shuffle_export(rd.from_arrow(t).repartition(3), p, n_shards=4, seed=3, sub_shards=2)
    full = read_shuffled(p).to_pandas()
    assert sorted(full["doc_id"]) == list(range(n))
    # disjoint per-trainer slices cover everything exactly once
    parts = [set(read_shuffled(p, shards=[k]).to_pandas()["doc_id"]) for k in range(4)]
    assert set().union(*parts) == set(range(n))
    assert sum(len(s) for s in parts) == n
    # column pruning works
    cols = read_shuffled(p, shards=[0], columns=["doc_id"]).schema().names
    assert cols == ["doc_id"]
    import pytest

    with pytest.raises(FileNotFoundError):
        read_shuffled(str(tmp_path / "missing"))


def test_checkpoint_schema_less_empty_stage_not_poisoned(ray_session, tmp_path):
    """Round-4 review fix: a stage yielding a fully-empty SCHEMA-LESS
    Dataset (ray 2.49: ds.schema() is None) must not be marked complete —
    a _SUCCESS over a fileless dir would make every future restore()
    crash under that config.  save() declines, run() hands the computed
    dataset through, and a later run recomputes instead of crashing."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.sources.io import CheckpointManager

    cfg = {"x": 1}
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    calls = []

    def fn():
        calls.append(1)
        return rd.from_items([{"a": 1}]).filter(lambda r: False).materialize()

    out = ckpt.run("empty_stage", cfg, fn)
    assert out.count() == 0
    assert not ckpt.is_complete("empty_stage", cfg)
    # second run recomputes (no poisoned checkpoint, no restore crash)
    out2 = ckpt.run("empty_stage", cfg, fn)
    assert out2.count() == 0 and len(calls) == 2

    # contrast: an empty-but-TYPED stage still checkpoints and restores
    def fn_typed():
        import pyarrow as pa

        return rd.from_arrow(pa.table({"a": pa.array([], pa.int64())}))

    out3 = ckpt.run("typed_empty", cfg, fn_typed)
    assert ckpt.is_complete("typed_empty", cfg)
    assert out3.count() == 0


def test_filesystem_passthrough(ray_session, tmp_path):
    """VERDICT r4 item 8 (A6): read_table/write_table accept an injected
    pyarrow filesystem, and scheme:// paths resolve via FileSystem.from_uri.
    Tested with the local FS and a SubTreeFileSystem (the mock: paths are
    RELATIVE to the subtree root, so success proves the injected FS is the
    one actually used)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from pyarrow import fs as pafs

    from daft_minhash_dedupe_ray.sources.io import (
        read_table,
        resolve_filesystem,
        write_table,
    )

    t = pa.table({"a": pa.array(np.arange(100, dtype=np.int64))})
    pq.write_table(t, tmp_path / "t.parquet")

    # explicit local FS injection
    local = pafs.LocalFileSystem()
    assert read_table(str(tmp_path / "t.parquet"), filesystem=local).count() == 100

    # subtree FS: relative path only resolvable through the injected FS
    sub = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    assert read_table("t.parquet", filesystem=sub).count() == 100
    write_table(rd.from_arrow(t), "out_dir", filesystem=sub)
    assert read_table("out_dir", filesystem=sub).count() == 100
    assert (tmp_path / "out_dir").is_dir()  # really landed under the subtree

    # scheme URI resolution (file:// is the sandbox-testable scheme)
    fs, p = resolve_filesystem(f"file://{tmp_path}/t.parquet")
    assert isinstance(fs, pafs.LocalFileSystem) and p.endswith("t.parquet")
    assert read_table(f"file://{tmp_path}/t.parquet").count() == 100

    # bare paths keep the default behavior
    fs, p = resolve_filesystem(str(tmp_path / "t.parquet"))
    assert fs is None
