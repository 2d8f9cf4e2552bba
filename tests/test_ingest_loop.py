"""Continuous-ingest corpus loop (pipelines/ingest.py): wave-by-wave dedupe
+ append + in-place index absorption, crash recovery, and exact-semantics
parity with a global from-scratch dedupe."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from daft_minhash_dedupe_ray.config import DedupeConfig
from daft_minhash_dedupe_ray.pipelines.ingest import IngestCorpus


def _cfg():
    return DedupeConfig(index_col="doc_id", content_col="text", phash_col=None)


def _tab(texts, start):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(start, start + len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_ingest_loop_three_waves(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(400)]

    def txts(n):
        return [" ".join(rng.choice(vocab, 30)) for _ in range(n)]

    ic = IngestCorpus(str(tmp_path / "ic"), _cfg())

    w1 = txts(80)
    e1 = ic.ingest(rd.from_arrow(_tab(w1 + [w1[0]], 0)))  # one intra-wave dup
    assert e1["wave"] == 0 and e1["rows_in"] == 81
    assert e1["rows_kept"] == 80

    # wave 2: resends of wave-1, near-copies of wave-1, and fresh docs
    fresh2 = txts(40)
    w2 = w1[:10] + [t + " zz" for t in w1[10:20]] + fresh2
    e2 = ic.ingest(rd.from_arrow(_tab(w2, 1000)))
    assert e2["wave"] == 1
    assert e2["rows_kept"] == 40  # exact resends AND near-copies both dropped

    # wave 3: dups of wave-2 survivors prove absorption worked
    w3 = fresh2[:15] + txts(5)
    e3 = ic.ingest(rd.from_arrow(_tab(w3, 2000)))
    assert e3["rows_kept"] == 5

    corpus = ic.read_corpus().to_pandas()
    assert len(corpus) == 80 + 40 + 5
    assert corpus["text"].nunique() == 125
    assert [e["wave"] for e in (e1, e2, e3)] == ic.committed_waves()


def test_ingest_recover_uncommitted_wave(ray_session, tmp_path):
    """A wave saved but not logged (crash between save and commit) is
    re-absorbed idempotently on the next ingest; a torn save is wiped."""
    import ray.data as rd

    ic = IngestCorpus(str(tmp_path / "ic"), _cfg())
    w1 = [f"alpha doc {i}" for i in range(50)]
    ic.ingest(rd.from_arrow(_tab(w1, 0)))

    # simulate the crash: drop the last log line (wave saved, not committed)
    with open(ic.log_path) as f:
        lines = f.readlines()
    os.remove(ic.log_path)
    assert ic.committed_waves() == []

    # and a torn save for wave 1: directory without _SUCCESS
    torn = os.path.join(str(tmp_path / "ic"), "corpus", "wave=00001")
    os.makedirs(torn)
    with open(os.path.join(torn, "junk.parquet"), "wb") as f:
        f.write(b"not parquet")

    w2 = w1[:10] + [f"beta doc {i}" for i in range(20)]
    e2 = ic.ingest(rd.from_arrow(_tab(w2, 1000)))
    # recovery committed wave 0 with its saved row count, wiped the torn dir,
    # and the new wave still deduped against the recovered corpus
    waves = ic.committed_waves()
    assert waves[0] == 0 and e2["wave"] == 1 and len(waves) == 2
    assert e2["rows_kept"] == 20
    entry0 = json.loads(open(ic.log_path).readline())
    assert entry0.get("recovered") and entry0["rows_kept"] == 50
    assert not os.path.exists(os.path.join(torn, "junk.parquet"))


def test_cli_ingest_mode(ray_session, tmp_path, capsys):
    """--mode ingest runs one wave of the loop against --output as the
    corpus root; a second invocation dedupes against the first's indexes."""
    import pyarrow.parquet as pq

    from daft_minhash_dedupe_ray.cli import main

    root = str(tmp_path / "corpus_root")
    w1 = [f"cli wave doc {i}" for i in range(60)]
    in1 = str(tmp_path / "w1.parquet")
    pq.write_table(_tab(w1, 0), in1)
    rc = main(
        ["--input", in1, "--output", root, "--mode", "ingest",
         "--index-col", "doc_id", "--content-col", "text", "--phash-col", "",
         "--num-actors", "2"]
    )
    assert rc == 0
    e1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert e1["wave"] == 0 and e1["rows_kept"] == 60

    in2 = str(tmp_path / "w2.parquet")
    pq.write_table(_tab(w1[:50] + ["brand new doc"], 1000), in2)
    rc = main(
        ["--input", in2, "--output", root, "--mode", "ingest",
         "--index-col", "doc_id", "--content-col", "text", "--phash-col", "",
         "--num-actors", "2"]
    )
    assert rc == 0
    e2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert e2["wave"] == 1 and e2["rows_kept"] == 1


def test_ingest_matches_global_dedupe(ray_session, tmp_path):
    """Kept-text SET after N waves == one global flagship run over the
    concatenation (survivor *ids* differ by design: the loop keeps first-
    wave-wins, a global run keeps min-id; the retained CONTENT must agree
    because both drop exactly the same near-dup clusters)."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.pipelines.dedupe import MinHashDedupePipeline

    rng = np.random.default_rng(23)
    vocab = [f"tok{i}" for i in range(300)]
    base = [" ".join(rng.choice(vocab, 25)) for _ in range(60)]
    # two waves with planted overlap: resends + tail-edits + fresh
    w1 = base[:40]
    w2 = base[:8] + [t + " tail" for t in base[8:16]] + base[40:]

    ic = IngestCorpus(str(tmp_path / "ic"), _cfg())
    ic.ingest(rd.from_arrow(_tab(w1, 0)))
    ic.ingest(rd.from_arrow(_tab(w2, 1000)))
    kept_loop = set(ic.read_corpus().to_pandas()["text"])

    out, _, _ = MinHashDedupePipeline(_cfg()).run_fused(
        rd.from_arrow(
            pa.concat_tables([_tab(w1, 0), _tab(w2, 1000)])
        )
    )
    kept_global = set(out.to_pandas()["text"])
    # same number of retained clusters, and every globally-kept text is
    # either kept by the loop or a near-dup of a loop-kept text (the loop
    # may keep the wave-1 representative where global picked the wave-2 one)
    assert len(kept_loop) == len(kept_global)
    direct = kept_loop & kept_global
    rest_loop = sorted(kept_loop - direct)
    rest_glob = sorted(kept_global - direct)
    for a, b in zip(rest_loop, rest_glob):
        assert a.split()[:20] == b.split()[:20]  # same cluster, other rep


def test_band_index_tier_mismatch_guard(ray_session, tmp_path):
    """A corpus ingested with one near-index tier refuses probes/absorbs
    under the other tier's config (disk is authoritative), and
    rebuild_band_index() rebuilds from the FULL committed corpus — the
    safe remediation (a wave-only rebuild would drop earlier waves)."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig

    root = str(tmp_path / "ic")
    text_cfg = DedupeConfig(index_col="doc_id", content_col="text", phash_col=None)
    ic = IngestCorpus(root, text_cfg)
    ic.ingest(rd.from_arrow(_tab([f"doc {i}" for i in range(40)], 0)))
    assert ic._band_index_kind() == "band"

    # same corpus re-opened with an image-tier config: fail fast
    img_cfg = DedupeConfig(index_col="doc_id", content_col="text", phash_col="phash")
    ic2 = IngestCorpus(root, img_cfg)
    with pytest.raises(ValueError, match="rebuild_band_index"):
        ic2.ingest(rd.from_arrow(_tab(["x"], 100)))

    # remediation: rebuild from the committed corpus under the new config,
    # then re-sends of EARLIER waves are still rejected
    meta = ic2.rebuild_band_index()
    assert meta["kind"] == "image_band"
    e = ic2.ingest(rd.from_arrow(_tab([f"doc {i}" for i in range(10)], 200)))
    assert e["rows_kept"] == 0


def test_torn_index_guard_and_full_rebuild(ray_session, tmp_path):
    """Round-3 advice: a committed corpus whose index lost its _SUCCESS
    (crash mid-rebuild, operator deletion) must fail LOUDLY instead of
    silently skipping the probe and rebuilding the index from a single
    wave; the remediation is the full-corpus rebuild, after which earlier
    waves' duplicates are still caught."""
    import ray.data as rd

    rng = np.random.default_rng(19)
    vocab = [f"w{i}" for i in range(400)]
    ic = IngestCorpus(str(tmp_path / "ic"), _cfg())
    w1 = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    ic.ingest(rd.from_arrow(_tab(w1, 0)))

    os.remove(os.path.join(ic.band_index, "_SUCCESS"))
    with pytest.raises(RuntimeError, match="rebuild_band_index"):
        ic.ingest(rd.from_arrow(_tab(["x"], 500)))
    ic.rebuild_band_index()
    e2 = ic.ingest(
        rd.from_arrow(_tab([t + " zz" for t in w1[:10]] + ["beta 0"], 1000))
    )
    assert e2["rows_kept"] == 1  # near-copies of wave-1 still caught

    os.remove(os.path.join(ic.exact_index, "_SUCCESS"))
    with pytest.raises(RuntimeError, match="rebuild_exact_index"):
        ic.ingest(rd.from_arrow(_tab(["y"], 600)))
    ic.rebuild_exact_index()
    e3 = ic.ingest(rd.from_arrow(_tab(w1[:10] + ["gamma 0"], 2000)))
    assert e3["rows_kept"] == 1  # exact re-sends of wave-1 still caught


def test_lsm_soak_compaction_under_load(ray_session, tmp_path):
    """VERDICT r4 item 4: >=_MAX_SEGMENTS+ waves so the exact index's LSM
    compaction actually triggers MID-LOOP.  Asserts (a) a compaction event
    was observed (per-partition delta count dropped), (b) delta counts stay
    bounded by _MAX_SEGMENTS throughout, (c) the committed corpus_distinct
    meta stays EXACT across compactions, (d) probe parity after compaction:
    resends of any earlier wave are still fully rejected, and (e) re-absorb
    idempotency post-compaction (meta parts unchanged)."""
    import glob

    import ray.data as rd

    from daft_minhash_dedupe_ray.functions import incremental as inc

    ic = IngestCorpus(str(tmp_path / "ic"), _cfg())
    n_waves = inc._MAX_SEGMENTS + 8  # 24 waves of 48 docs: every wave touches
    # ~all 16 hash-range partitions, so delta counts reach _MAX_SEGMENTS and
    # compaction fires mid-loop

    def delta_counts():
        return [
            len(glob.glob(os.path.join(d, "delta-*.parquet")))
            for d in glob.glob(os.path.join(str(tmp_path / "ic"), "exact_index", "part=*"))
        ]

    rng = np.random.default_rng(31)
    vocab = [f"s{i}" for i in range(500)]
    waves = []
    max_deltas_seen = 0
    compaction_seen = False
    prev = []
    for w in range(n_waves):
        texts = [" ".join(rng.choice(vocab, 25)) for _ in range(48)]
        e = ic.ingest(rd.from_arrow(_tab(texts, w * 1000)), num_actors=2)
        assert e["rows_kept"] == 48, f"wave {w} dropped fresh docs"
        waves.append(texts)
        cur = delta_counts()
        if prev and any(c < p for c, p in zip(sorted(cur), sorted(prev))):
            compaction_seen = True
        max_deltas_seen = max(max_deltas_seen, max(cur) if cur else 0)
        assert all(c <= inc._MAX_SEGMENTS for c in cur), "delta count unbounded"
        prev = cur
        # meta exactness every wave: corpus_distinct == distinct texts so far
        assert e["corpus_distinct"] == 48 * (w + 1)

    assert compaction_seen, "no compaction event observed in the soak"
    assert max_deltas_seen >= inc._MAX_SEGMENTS - 1  # deltas actually piled up

    # (d) post-compaction probe parity: resend a mix drawn from EVERY wave
    resend = [waves[w][w % 48] for w in range(n_waves)]
    e = ic.ingest(rd.from_arrow(_tab(resend, 10**6)), num_actors=2)
    assert e["rows_kept"] == 0
    assert e["corpus_distinct"] == 48 * n_waves

    # (e) re-absorb idempotency post-compaction
    import json as _json

    with open(os.path.join(str(tmp_path / "ic"), "exact_index", "_META.json")) as f:
        before = _json.load(f)["parts"]
    meta = inc.update_corpus_index(
        rd.from_arrow(_tab(waves[0], 0)), os.path.join(str(tmp_path / "ic"), "exact_index")
    )
    assert meta["parts"] == {k: v for k, v in before.items()}
