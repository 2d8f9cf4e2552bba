"""End-to-end pipeline tests.

1. Reference E2E pin (tests/test_minhash_dedupe_unit.py:440-448): three docs
   ["hello world", "hello world", "unique text"] -> 2 survivors with the
   exact surviving texts.
2. Synthetic image+caption table (FIXTURES.md F1): survivors + assignments
   must match the exact brute-force oracle; dup-pair recall >= 0.99 at the
   north-star 128-perm/16-band config; per-row invariants (caption equality,
   decoded-pixel equality) hold on survivors.
"""

import numpy as np
import pyarrow as pa
import pytest

from daft_minhash_dedupe_ray.config import DedupeConfig, NORTH_STAR_CONFIG
from daft_minhash_dedupe_ray.oracle import (
    dup_pair_recall,
    oracle_dup_pairs,
    oracle_survivors,
)
from daft_minhash_dedupe_ray.pipelines.dedupe import MinHashDedupePipeline
from daft_minhash_dedupe_ray.stages.signature import node_ids_for
from daft_minhash_dedupe_ray.synth import generate_table, ppm_decode


def test_reference_three_doc_pin(ray_session):
    import ray.data as rd

    cfg = DedupeConfig(
        index_col="block_id", content_col="block_text", phash_col=None, ngram_size=1
    )
    t = pa.table(
        {
            "block_id": pa.array(["d1", "d2", "d3"], pa.string()),
            "block_text": pa.array(["hello world", "hello world", "unique text"], pa.string()),
        }
    )
    pipe = MinHashDedupePipeline(cfg)
    out = pipe(rd.from_arrow(t), num_actors=2).to_pandas()
    assert len(out) == 2
    assert set(out["block_text"]) == {"hello world", "unique text"}


@pytest.mark.parametrize("cfg", [DedupeConfig(), NORTH_STAR_CONFIG], ids=["ref-64x8", "north-128x16"])
def test_synthetic_matches_oracle(ray_session, cfg):
    import ray.data as rd

    t = generate_table(600, seed=42, with_images=False)
    pipe = MinHashDedupePipeline(cfg)
    out, assign, report = pipe.run_with_report(rd.from_arrow(t), num_actors=3)

    nodes = node_ids_for(t, cfg)
    pairs = oracle_dup_pairs(
        nodes.tolist(), t["caption"].to_pylist(), cfg, t["phash"].to_pylist()
    )
    ap = assign.to_pandas()
    pred = dict(zip(ap["u"].astype(np.uint64), ap["rep"].astype(np.uint64)))
    assert dup_pair_recall(pred, pairs) >= 0.99

    surv = oracle_survivors(nodes.tolist(), pairs)
    # phash verification makes false-positive merges rare; allow a tiny slack
    # from caption LSH false positives (unverified, like the reference)
    assert abs(report.rows_after - len(surv)) <= max(2, 0.01 * len(surv))
    assert report.rows_before == 600
    assert report.rows_after == report.rows_before - report.n_duplicates


def test_per_row_invariants_with_images(ray_session):
    """input_hint invariants: surviving rows match input rows exactly by
    image_id — caption equality, decoded-pixel equality (PSNR inf for the
    lossless ppm fmt), w/h/fmt/phash unchanged."""
    import ray.data as rd

    t = generate_table(150, seed=5, with_images=True)
    cfg = DedupeConfig()
    pipe = MinHashDedupePipeline(cfg)
    out = pipe(rd.from_arrow(t), num_actors=2).to_pandas()
    assert 0 < len(out) < 150

    by_id = {t["image_id"][i].as_py(): i for i in range(len(t))}
    for _, row in out.iterrows():
        i = by_id[row["image_id"]]
        assert row["caption"] == t["caption"][i].as_py()
        assert row["phash"] == t["phash"][i].as_py()
        assert row["w"] == t["w"][i].as_py() and row["h"] == t["h"][i].as_py()
        assert row["fmt"] == t["fmt"][i].as_py()
        a = ppm_decode(row["bytes"])
        b = ppm_decode(t["bytes"][i].as_py())
        assert (a == b).all()


def test_empty_and_short_captions_survive(ray_session):
    import ray.data as rd

    cfg = DedupeConfig(phash_col=None)
    t = pa.table(
        {
            "image_id": pa.array([f"i{k}" for k in range(4)], pa.string()),
            "caption": pa.array(["", "", "one", "two words here"], pa.string()),
        }
    )
    out = MinHashDedupePipeline(cfg)(rd.from_arrow(t), num_actors=2).to_pandas()
    # no shingles -> no candidates -> everything survives (incl. both empties:
    # divergence from the Spark ancestor's MAX_HASH pad, documented in hashing.py)
    assert len(out) == 4


def test_filtered_to_empty_input_both_paths(ray_session):
    """ray 2.49's filter can emit ZERO-COLUMN empty blocks (schema stripped);
    the signature kernel must not KeyError on them — bit the verify probe
    this round through run_fused on a filtered-to-empty read."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import NORTH_STAR_CONFIG

    t = pa.table(
        {
            "image_id": pa.array(["a", "b"], pa.string()),
            "caption": pa.array(["one caption here", "another caption"], pa.string()),
            "phash": pa.array([1, 2], pa.int64()),
        }
    )
    empty = rd.from_arrow(t).filter(expr="image_id == 'nope'")
    pipe = MinHashDedupePipeline(NORTH_STAR_CONFIG)
    out, assign, rep = pipe.run_fused(empty, num_actors=2, materialize_output=False)
    assert rep.rows_before == 0 and rep.rows_after == 0
    out2 = pipe(rd.from_arrow(t).filter(expr="image_id == 'nope'"), num_actors=2)
    assert out2.count() == 0


def test_cc_algorithms_agree_end_to_end(ray_session):
    import ray.data as rd

    t = generate_table(250, seed=11, with_images=False)
    base = DedupeConfig()
    ds = rd.from_arrow(t)
    pipe_uf = MinHashDedupePipeline(base)
    out_uf = pipe_uf(ds, num_actors=2).to_pandas()
    pipe_df = MinHashDedupePipeline(base.with_overrides(cc_algorithm="alternating"))
    out_df = pipe_df(ds, num_actors=2).to_pandas()
    assert sorted(out_uf["image_id"]) == sorted(out_df["image_id"])


def test_oracle_match_at_5k(ray_session):
    """FIXTURES.md sf-s scale: exact oracle on 5k rows, north-star config."""
    import ray.data as rd

    cfg = NORTH_STAR_CONFIG
    t = generate_table(5000, seed=42, with_images=False)
    pipe = MinHashDedupePipeline(cfg)
    out, assign, report = pipe.run_with_report(rd.from_arrow(t), num_actors=4)

    nodes = node_ids_for(t, cfg)
    pairs = oracle_dup_pairs(
        nodes.tolist(), t["caption"].to_pylist(), cfg, t["phash"].to_pylist()
    )
    ap = assign.to_pandas()
    pred = dict(zip(ap["u"].astype(np.uint64), ap["rep"].astype(np.uint64)))
    assert dup_pair_recall(pred, pairs) >= 0.99
    surv = oracle_survivors(nodes.tolist(), pairs)
    assert abs(report.rows_after - len(surv)) <= max(2, 0.005 * len(surv))


def test_min_length_filter(ray_session):
    """B11 variant (references/daft_minhash.py:252): docs below min_length
    tokens produce no signature and therefore never cluster."""
    import ray.data as rd

    cfg = DedupeConfig(phash_col=None, min_length=5, ngram_size=3)
    t = pa.table(
        {
            "image_id": pa.array(["a", "b", "c", "d"], pa.string()),
            "caption": pa.array(
                ["one two three", "one two three", "w1 w2 w3 w4 w5 w6", "w1 w2 w3 w4 w5 w6"],
            ),
        }
    )
    out = MinHashDedupePipeline(cfg)(rd.from_arrow(t), num_actors=2).to_pandas()
    # short identical captions both survive (below min_length); long identical
    # pair dedups to its min-node-hash member (the engine's keeper rule)
    from daft_minhash_dedupe_ray.hashing import id_hash64_str_array

    nh = id_hash64_str_array(["c", "d"])
    keeper = "c" if nh[0] < nh[1] else "d"
    assert sorted(out["image_id"]) == sorted(["a", "b", keeper])


def test_substring_pass_in_pipeline(ray_session):
    """cfg.substring_pass unions suffix-array edges into the dedupe stream."""
    import ray.data as rd

    caps = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon",  # prefix truncation, J < threshold
        "unrelated caption with entirely different words here",
    ]
    t = pa.table(
        {
            "image_id": pa.array(["x", "y", "z"], pa.string()),
            "caption": pa.array(caps, pa.string()),
        }
    )
    base = DedupeConfig(phash_col=None, threshold=0.9)
    without = MinHashDedupePipeline(base)(rd.from_arrow(t), num_actors=2).to_pandas()
    with_sub = MinHashDedupePipeline(base.with_overrides(substring_pass=True))(
        rd.from_arrow(t), num_actors=2
    ).to_pandas()
    assert len(without) == 3  # 5-gram Jaccard below threshold: no dedupe
    assert len(with_sub) == 2  # substring edge merges the truncation pair


def test_documents_table_matches_oracle_sf001(ray_session):
    """Driver-data anchor: the docs-table dedupe at sf0.01 must match the
    exact Jaccard oracle (same check the driver's rows-only gate can't do)."""
    import ray.data as rd

    sf = "/root/testdata/sf0.01"
    cfg = DedupeConfig(index_col="doc_id", content_col="text", phash_col=None)
    ds = rd.read_parquet(f"{sf}/documents.parquet")
    pipe = MinHashDedupePipeline(cfg)
    out, assign, report = pipe.run_with_report(ds, num_actors=3)

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/documents.parquet")
    nodes = node_ids_for(t, cfg)
    pairs = oracle_dup_pairs(nodes.tolist(), t["text"].to_pylist(), cfg)
    assert len(pairs) > 0  # sf0.01 documents do contain near-dups
    ap = assign.to_pandas()
    pred = dict(zip(ap["u"].astype(np.uint64), ap["rep"].astype(np.uint64)))
    assert dup_pair_recall(pred, pairs) >= 0.99
    surv = oracle_survivors(nodes.tolist(), pairs)
    assert abs(report.rows_after - len(surv)) <= max(2, 0.01 * len(surv))


def test_run_fused_checkpoint_resume(ray_session, tmp_path):
    """Crash-resume for the throughput path (round-3 verdict item 5): the
    converged assignments land as a config-hash checkpoint; a rerun under
    the same config restores them (skipping signature/ingest/converge) and
    yields the identical survivor set; a config change recomputes."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.pipelines.dedupe import MinHashDedupePipeline

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(400)]
    base = [" ".join(rng.choice(vocab, 40)) for _ in range(120)]
    texts = base + [base[i] + " tail" for i in range(40)]  # planted near-dups
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
    ).repartition(3)
    cfg = DedupeConfig(index_col="doc_id", content_col="text", phash_col=None)
    ck = str(tmp_path / "ck")

    pipe = MinHashDedupePipeline(cfg)
    out1, assign1, rep1 = pipe.run_fused(ds, num_actors=2, ckpt_root=ck)
    import os

    assert os.path.exists(os.path.join(ck, "assignments", "_SUCCESS"))
    assert "ingest" in rep1.phase_walls
    kept1 = sorted(out1.to_pandas()["doc_id"])
    assert len(kept1) < len(texts)  # planted dups dropped

    # crash-after-converge: a FRESH pipeline restores, never re-ingests
    out2, assign2, rep2 = MinHashDedupePipeline(cfg).run_fused(
        ds, num_actors=2, ckpt_root=ck
    )
    assert "restored_assignments" in rep2.phase_walls
    assert "ingest" not in rep2.phase_walls
    assert sorted(out2.to_pandas()["doc_id"]) == kept1
    assert assign2.count() == assign1.count()

    # a config change invalidates the checkpoint (no stale restore)
    cfg2 = cfg.with_overrides(num_perm=64, bands=8, rows=8)
    out3, _, rep3 = MinHashDedupePipeline(cfg2).run_fused(ds, num_actors=2, ckpt_root=ck)
    assert "ingest" in rep3.phase_walls


def test_phash_scheme_change_preserves_clusters(ray_session):
    """The multi-index subset keys and the legacy sub-band keys must yield
    the IDENTICAL final assignment set: both guarantee co-location within
    phash_max_hamming and every candidate pair is exactly verified, so the
    verified edge graph is scheme-independent (the round-5 scale fix cannot
    change results by construction)."""
    from dataclasses import replace

    import numpy as np
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import NORTH_STAR_CONFIG
    from daft_minhash_dedupe_ray.pipelines.dedupe import MinHashDedupePipeline
    from daft_minhash_dedupe_ray.synth import generate_table

    t = generate_table(6000, seed=29, with_images=False)

    def assigns(cfg):
        pipe = MinHashDedupePipeline(cfg)
        _, assign, _ = pipe.run_fused(rd.from_arrow(t), num_actors=2)
        pdf = assign.to_pandas().astype({"u": "uint64", "rep": "uint64"})
        return set(zip(pdf["u"], pdf["rep"]))

    new = assigns(replace(NORTH_STAR_CONFIG, phash_chunks=5))
    legacy = assigns(replace(NORTH_STAR_CONFIG, phash_chunks=None))
    assert new == legacy and len(new) > 0

    # "auto" (the default) resolves by input size, scale-safe when unknown
    cfg = NORTH_STAR_CONFIG
    assert cfg.phash_chunks == "auto"
    assert cfg.resolve_phash_chunks(500_000) is None  # legacy below crossover
    assert cfg.resolve_phash_chunks(16_000_000) == 5
    assert cfg.resolve_phash_chunks(None) == 5  # unknown size -> scale-safe
    assert replace(cfg, phash_chunks=8).resolve_phash_chunks(100) == 8
