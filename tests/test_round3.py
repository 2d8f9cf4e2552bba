"""Round-3 additions: per-run cluster validation, robustness guards from
the round-2 advice (dirty export targets, shared-filesystem index probes,
empty dimension tables), the span-removal broadcast size gate, and the
consolidated driver queries."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pytest


def _docs_table(n=60, seed=3):
    rng = np.random.RandomState(seed)
    words = np.array([f"w{i}" for i in range(50)])
    texts = [" ".join(words[rng.choice(50, 12)]) for _ in range(n)]
    # plant near-dups
    for i in range(0, n // 3, 3):
        texts[i + 1] = texts[i]
    return pa.table(
        {"doc_id": pa.array(np.arange(n), pa.int64()), "text": pa.array(texts)}
    )


# ------------------------------------------------------------ validation


def test_validate_clusters_passes_on_real_run(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.pipelines.dedupe import (
        MinHashDedupePipeline,
        validate_clusters,
    )

    cfg = DedupeConfig(index_col="doc_id", content_col="text", phash_col=None)
    pipe = MinHashDedupePipeline(cfg)
    ds = rd.from_arrow(_docs_table(90))
    prepped = pipe.prep(ds)
    edges = pipe.edges(prepped).materialize()
    assign = pipe.assignments(edges, num_actors=2)
    v = validate_clusters(edges, assign)
    assert v["validated"] and v["passed"], v
    assert v["n_clustered_nodes"] > 0


def test_validate_clusters_detects_corruption(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.pipelines.dedupe import (
        MinHashDedupePipeline,
        validate_clusters,
    )

    cfg = DedupeConfig(index_col="doc_id", content_col="text", phash_col=None)
    pipe = MinHashDedupePipeline(cfg)
    ds = rd.from_arrow(_docs_table(90))
    edges = pipe.edges(pipe.prep(ds)).materialize()
    assign = pipe.assignments(edges, num_actors=2)

    def corrupt(b: pa.Table) -> pa.Table:
        reps = b["rep"].to_numpy(zero_copy_only=False).copy()
        if len(reps):
            reps[0] += 1  # break one representative
        return pa.table({"u": b["u"], "rep": pa.array(reps, b["rep"].type)})

    bad = assign.map_batches(corrupt, batch_format="pyarrow")
    v = validate_clusters(edges, bad)
    assert v["validated"] and not v["passed"]


def test_validate_clusters_skips_above_cap(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.pipelines.dedupe import validate_clusters

    edges = rd.from_arrow(
        pa.table({"u": pa.array([1, 2], pa.uint64()), "v": pa.array([2, 3], pa.uint64())})
    )
    assign = rd.from_arrow(
        pa.table({"u": pa.array([], pa.uint64()), "rep": pa.array([], pa.uint64())})
    )
    v = validate_clusters(edges, assign, max_edges=1)
    assert not v["validated"] and "max_edges" in v["reason"]


def test_cli_validate_flag(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from daft_minhash_dedupe_ray.cli import main
    from daft_minhash_dedupe_ray.synth import generate_table

    t = generate_table(400, seed=11, with_images=False)
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src, row_group_size=4096)
    out_dir = str(tmp_path / "out")
    rc = main(
        [
            "--input", src,
            "--output", out_dir,
            "--index-col", "image_id",
            "--content-col", "caption",
            "--phash-col", "phash",
            "--num-perm", "64",
            "--validate",
        ]
    )
    assert rc == 0
    assert os.path.exists(f"{out_dir}/_SUCCESS")


# ------------------------------------------------------------ io guards


def test_shuffle_export_refuses_dirty_target(ray_session, tmp_path):
    import ray.data as rd

    from daft_minhash_dedupe_ray.sources.io import shuffle_export

    ds = rd.from_arrow(_docs_table(40))
    target = str(tmp_path / "exp")
    m = shuffle_export(ds, target, n_shards=2, seed=1)
    assert m["rows"] == 40
    assert os.path.exists(f"{target}/_SUCCESS")
    with pytest.raises(FileExistsError):
        shuffle_export(ds, target, n_shards=4, seed=2)


def test_shuffle_export_manifest_rows_from_footers(ray_session, tmp_path):
    import ray.data as rd

    from daft_minhash_dedupe_ray.sources.io import read_shuffled, shuffle_export

    ds = rd.from_arrow(_docs_table(64))
    target = str(tmp_path / "exp2")
    m = shuffle_export(ds, target, n_shards=4, seed=7, sub_shards=2)
    assert m["rows"] == 64
    assert read_shuffled(target).count() == 64


def test_partitioned_save_refuses_dirty_target(ray_session, tmp_path):
    import ray.data as rd

    from daft_minhash_dedupe_ray.sources.io import partitioned_save

    ds = rd.from_arrow(_docs_table(20))
    target = str(tmp_path / "psave")
    partitioned_save(ds, target)
    with pytest.raises(FileExistsError):
        partitioned_save(ds, target)


# ------------------------------------------------- incremental index guards


def test_indexed_dedupe_raises_on_missing_partition(ray_session, tmp_path):
    import shutil

    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.incremental import (
        build_corpus_index,
        incremental_dedupe_indexed,
    )

    t = _docs_table(80)
    corpus = rd.from_arrow(t.slice(0, 40))
    wave = rd.from_arrow(t.slice(40))
    idx = str(tmp_path / "cidx")
    meta = build_corpus_index(corpus, idx, num_partitions=4)
    # simulate a worker that cannot see one recorded partition (non-shared fs)
    victim = next(iter(meta["parts"]))
    shutil.rmtree(os.path.join(idx, f"part={int(victim):05d}"))
    with pytest.raises(Exception) as ei:
        incremental_dedupe_indexed(wave, idx, text_col="text", id_col="doc_id").count()
    assert "shared filesystem" in str(ei.value) or "FileNotFoundError" in str(ei.value)


def test_band_index_requires_success_marker(ray_session, tmp_path):
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.incremental import (
        build_band_index,
        incremental_near_dedupe_indexed,
    )

    cfg = DedupeConfig(index_col="doc_id", content_col="text", phash_col=None)
    t = _docs_table(60)
    idx = str(tmp_path / "bidx")
    build_band_index(rd.from_arrow(t.slice(0, 30)), idx, cfg)
    os.remove(os.path.join(idx, "_SUCCESS"))
    with pytest.raises(FileNotFoundError):
        incremental_near_dedupe_indexed(rd.from_arrow(t.slice(30)), idx, cfg)


# ------------------------------------------------- empty dimension guards


def test_broadcast_joins_with_empty_dimension(ray_session, tmp_path, monkeypatch):
    """segment_revenue / top_orders_per_segment / revenue_by_nation return
    clean empty inner-join results when a dimension table is empty."""
    import pyarrow.parquet as pq

    from daft_minhash_dedupe_ray.pipelines import relational as R

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "c_mktsegment": pa.array([], pa.string()),
                "c_nationkey": pa.array([], pa.int64()),
            }
        ),
        f"{sf}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([], pa.int64()),
                "n_name": pa.array([], pa.string()),
            }
        ),
        f"{sf}/nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([10, 20, 30], pa.int64()),
                "o_totalprice": pa.array([1.0, 2.0, 3.0], pa.float64()),
            }
        ),
        f"{sf}/orders.parquet",
    )
    assert len(R.segment_revenue(sf)) == 0
    assert len(R.top_orders_per_segment(sf)) == 0
    assert len(R.revenue_by_nation(sf)) == 0


# ------------------------------------------------- span broadcast gate


def test_remove_dup_spans_auto_gate_cogroup(ray_session, monkeypatch):
    """Force the directory over the gate: auto mode must take the cogroup
    path and still produce the broadcast path's exact output."""
    import ray.data as rd

    import daft_minhash_dedupe_ray.functions.span_dedupe as sd

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta " * 3,
        "alpha beta gamma delta epsilon zeta eta theta " * 3 + "unique tail one",
        "completely different content with no long repeats at all here",
    ]
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()), "text": pa.array(texts)})
    want = (
        sd.remove_dup_spans(rd.from_arrow(t), min_len=30, broadcast=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(sd, "DIRECTORY_BROADCAST_LIMIT", 0)
    got = (
        sd.remove_dup_spans(rd.from_arrow(t), min_len=30)  # auto -> cogroup
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)


# ------------------------------------------------- crawl-text ingest


def test_ingest_extracts_blocks(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.ingest import preprocess_crawl_text

    payloads = [
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        "<html><head><title>T</title><script>var x;</script>"
        "<style>p{}</style></head><body><h1>H</h1><p>one &amp; two</p>"
        "<!-- no --><noscript>skip</noscript><div>tail</div></body></html>",
        "no header split at all",  # -> no blocks
        "HTTP/1.1 200 OK\r\n\r\n<p>solo</p>",
    ]
    t = pa.table(
        {
            "record_id": pa.array([10, 11, 12], pa.int64()),
            "payload": pa.array(payloads),
        }
    )
    out = (
        preprocess_crawl_text(rd.from_arrow(t))
        .to_pandas()
        .sort_values(["record_id", "block_idx"])
    )
    by_rec = {r: g["block_text"].tolist() for r, g in out.groupby("record_id")}
    assert by_rec[10] == ["T", "H", "one & two", "tail"]
    assert 11 not in by_rec  # header-less payload contributes nothing
    assert by_rec[12] == ["solo"]
    assert out[out.record_id == 10]["block_id"].tolist() == [
        "10-0", "10-1", "10-2", "10-3",
    ]


def test_ingest_payload_type_filter_and_binary(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.ingest import preprocess_crawl_text

    t = pa.table(
        {
            "record_id": pa.array([1, 2], pa.int64()),
            "ptype": pa.array(["text/html", "application/pdf"]),
            "payload": pa.array(
                [b"HTTP/1.1 200 OK\r\n\r\n<p>kept</p>", b"HTTP/1.1 200 OK\r\n\r\n<p>dropped</p>"],
                pa.binary(),
            ),
        }
    )
    out = preprocess_crawl_text(
        rd.from_arrow(t), payload_type_col="ptype"
    ).to_pandas()
    assert out["block_text"].tolist() == ["kept"]


def test_ingest_sql_parity_duckdb(ray_session):
    """The registered extract_text_blocks query hash-matches its DuckDB
    oracle locally (pyarrow RE2 chain == DuckDB RE2 chain)."""
    import duckdb
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    sf = "/root/testdata/sf0.001"
    mine = m.queries()["extract_text_blocks"](sf).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    want = con.sql(m.oracle_sql()["extract_text_blocks"]).df()
    mine = mine.sort_values(["record_id", "block_idx"]).reset_index(drop=True)
    want = want.sort_values(["record_id", "block_idx"]).reset_index(drop=True)
    assert len(mine) == len(want) and len(mine) > 0
    assert (mine["block_text"].to_numpy() == want["block_text"].to_numpy()).all()
    assert (mine["block_id"].to_numpy() == want["block_id"].to_numpy()).all()


# ------------------------------------------------- consolidated queries


def test_token_count_profile_matches_parts(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    sf = "/root/testdata/sf0.001"
    prof = m.queries()["token_count_profile"](sf).to_pandas().sort_values("doc_id")
    tc = m._token_counts(sf).to_pandas().sort_values("doc_id")
    bc = m._bpe_token_counts(sf).to_pandas().sort_values("doc_id")
    dc = m._distinct_token_counts(sf).to_pandas().sort_values("doc_id")
    assert (prof["n_tokens"].to_numpy() == tc["n_tokens"].to_numpy()).all()
    assert (prof["n_bpe_tokens"].to_numpy() == bc["n_bpe_tokens"].to_numpy()).all()
    assert (
        prof["n_distinct_tokens"].to_numpy() == dc["n_distinct_tokens"].to_numpy()
    ).all()


# ---------------------------------------------------------------- recall est


def _recall_fixture(n=120, seed=3):
    """Synth caption table + its exact oracle truth."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.stages.signature import node_ids_for
    from daft_minhash_dedupe_ray.synth import generate_table

    t = generate_table(n, seed=seed).select(["image_id", "caption"])
    cfg = DedupeConfig(phash_col=None)
    nodes = node_ids_for(t, cfg).tolist()
    return rd.from_arrow(t), t, cfg, nodes


def test_estimate_recall_k1_matches_exact_oracle(ray_session):
    """k_buckets=1 samples every shingle, so the estimate must equal the
    exact dup-pair recall of the pipeline's assignments (weights all 1)."""
    from daft_minhash_dedupe_ray.functions.recall import estimate_pair_recall
    from daft_minhash_dedupe_ray.oracle import (
        dup_pair_recall,
        oracle_dup_pairs,
    )
    from daft_minhash_dedupe_ray.pipelines.dedupe import MinHashDedupePipeline

    ds, t, cfg, nodes = _recall_fixture()
    pipe = MinHashDedupePipeline(cfg)
    out, assign, _ = pipe.run_with_report(ds, num_actors=2)
    r = estimate_pair_recall(pipe.prep(ds), assign, cfg, k_buckets=1)
    truth = oracle_dup_pairs(nodes, t["caption"].to_pylist(), cfg)
    apdf = assign.to_pandas()
    pred = dict(
        zip(
            apdf["u"].to_numpy(dtype="uint64").tolist(),
            apdf["rep"].to_numpy(dtype="uint64").tolist(),
        )
    )
    exact = dup_pair_recall(pred, truth)
    assert r["n_sampled_pairs"] >= 1
    assert abs(r["recall"] - exact) < 1e-12
    assert r["recall_unweighted"] == r["recall"]  # K=1 -> all weights 1


def test_estimate_recall_detects_missing_clusters(ray_session):
    """Feeding EMPTY assignments (nothing clustered) must drive the estimate
    to 0 over the sampled true pairs — the estimator actually measures."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.recall import estimate_pair_recall

    ds, t, cfg, nodes = _recall_fixture()
    empty_assign = rd.from_arrow(
        pa.table({"u": pa.array([], pa.uint64()), "rep": pa.array([], pa.uint64())})
    )
    r = estimate_pair_recall(ds, empty_assign, cfg, k_buckets=1)
    assert r["n_sampled_pairs"] >= 1 and r["recall"] == 0.0


def test_estimate_recall_sampled_weights(ray_session):
    """At K>1 the estimator still reports 1.0 when every true pair is
    clustered (weights scale, ratio does not), on a planted-dup fixture."""
    from daft_minhash_dedupe_ray.functions.recall import estimate_pair_recall
    from daft_minhash_dedupe_ray.pipelines.dedupe import MinHashDedupePipeline

    ds, t, cfg, nodes = _recall_fixture(n=300, seed=11)
    pipe = MinHashDedupePipeline(cfg)
    out, assign, _ = pipe.run_with_report(ds, num_actors=2)
    r = estimate_pair_recall(pipe.prep(ds), assign, cfg, k_buckets=4, seed=0xAB)
    # recall 1.0 was proven vs the exact oracle (test above / e2e suite);
    # the sampled estimate must agree on its subset
    if r["n_sampled_pairs"]:
        assert r["recall"] == 1.0


def test_estimate_precision_pure_clusters(ray_session):
    """Exact-duplicate clusters must report pair purity 1.0 at K=1."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.recall import estimate_cluster_precision
    from daft_minhash_dedupe_ray.pipelines.dedupe import MinHashDedupePipeline

    caps = ["alpha beta gamma delta epsilon zeta"] * 3 + [
        "one two three four five six"
    ] * 2 + ["totally unrelated words appear here now"]
    t = pa.table(
        {
            "image_id": pa.array([f"p{i}" for i in range(len(caps))], pa.string()),
            "caption": pa.array(caps),
        }
    )
    cfg = DedupeConfig(phash_col=None)
    pipe = MinHashDedupePipeline(cfg)
    out, assign, _ = pipe.run_with_report(rd.from_arrow(t), num_actors=2)
    r = estimate_cluster_precision(pipe.prep(rd.from_arrow(t)), assign, cfg, k_clusters=1)
    assert r["n_sampled_clusters"] == 2
    assert r["pair_purity"] == 1.0 and r["mean_cluster_purity"] == 1.0


def test_estimate_precision_detects_false_merge(ray_session):
    """Injecting a bogus assignment that merges two unrelated docs must pull
    pair purity below 1.0 — the estimator measures, not decorates."""
    import ray.data as rd

    from daft_minhash_dedupe_ray.config import DedupeConfig
    from daft_minhash_dedupe_ray.functions.recall import estimate_cluster_precision
    from daft_minhash_dedupe_ray.stages.signature import node_ids_for

    caps = [
        "alpha beta gamma delta epsilon zeta",
        "completely different caption text entirely",
        "yet another unrelated string of words",
    ]
    t = pa.table(
        {
            "image_id": pa.array(["x0", "x1", "x2"], pa.string()),
            "caption": pa.array(caps),
        }
    )
    cfg = DedupeConfig(phash_col=None)
    nodes = node_ids_for(t, cfg)
    rep = min(int(nodes[0]), int(nodes[1]))
    bogus = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([int(nodes[0]), int(nodes[1])], pa.uint64()),
                "rep": pa.array([rep, rep], pa.uint64()),
            }
        )
    )
    r = estimate_cluster_precision(rd.from_arrow(t), bogus, cfg, k_clusters=1)
    assert r["n_sampled_clusters"] == 1
    assert r["pair_purity"] == 0.0


def test_extract_blocks_attribute_selectors_golden():
    """Round-5 fidelity pass (VERDICT r4 item 6): the attribute-text
    selectors from the reference's css list — img[alt],
    meta[name=description], meta[property=og:title|og:description] —
    extract the ATTRIBUTE value as its own block, in document order
    (goldens shaped like the reference's tag-coverage test,
    tests/test_minhash_dedupe_unit.py:101-116)."""
    import pyarrow as pa

    from daft_minhash_dedupe_ray.functions.ingest import extract_blocks_array

    html = (
        "<html><head>"
        '<meta name="description" content="desc text">'
        '<meta property="og:title" content="ogt text">'
        '<meta content="ogd text" property="og:description">'  # content-first order
        '<meta name="keywords" content="not extracted">'       # unselected meta
        "<style>.x{color:red}</style><script>var a=1;</script></head>"
        "<body>"
        '<img src="p.png" alt="pic alt" />'
        "<figure><figcaption>caption text</figcaption></figure>"
        "<noscript>nope</noscript><p>ok body</p>"
        "</body></html>"
    )
    out = extract_blocks_array(pa.array([html], pa.string()))
    blocks = out[0].as_py().split("\n")
    # document order: head metas first, then body blocks
    assert blocks == [
        "desc text",
        "ogt text",
        "ogd text",
        "pic alt",
        "caption text",
        "ok body",
    ]

    # reference's basic shape: script/style/noscript stripped, empty gone
    html2 = (
        "<html><head><style>.x{}</style><script>var a=1</script></head>"
        "<body><h1>Title</h1><p>Hello <b>world</b>.</p>"
        "<noscript>ignore me</noscript></body></html>"
    )
    blocks2 = extract_blocks_array(pa.array([html2], pa.string()))[0].as_py().split("\n")
    assert blocks2 == ["Title", "Hello world ."]
