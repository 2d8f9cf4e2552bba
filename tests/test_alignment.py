"""Image-text alignment scoring (CLIP-score stand-in) + quantile gate.

Brute python oracle for the score math, DuckDB parity for both generated
oracles (the towers rebuilt in SQL from raw PPM bytes), and a regression
check that the refactored shared quantile helper preserves the LM gate.
"""

import numpy as np
import pandas as pd
import pytest


def _brute_score(blob, fmt, caption, dim=64, seed=0x5EED):
    from daft_minhash_dedupe_ray.functions.alignment import AlignmentStage
    from daft_minhash_dedupe_ray.functions.multimodal import decode_image

    st = AlignmentStage.__new__(AlignmentStage)
    from daft_minhash_dedupe_ray.functions.embed import HashingEmbedder

    st.dim = dim
    st._emb = HashingEmbedder(dim=dim, text_col="caption", seed=seed)
    tv = st._text_vecs([caption])[0]
    gv = AlignmentStage._image_vec(decode_image(blob, fmt))
    return np.round(float(tv @ gv), 6) + 0.0


def test_alignment_scores_match_brute(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.alignment import alignment_scores
    from daft_minhash_dedupe_ray.synth import cached_table_path

    path = cached_table_path(120, seed=7, with_images=True)
    mine = (
        alignment_scores(rd.read_parquet(path), concurrency=2)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(path)
    rows = sorted(
        (i, _brute_score(d, f, c))
        for i, d, f, c in zip(
            t["image_id"].to_pylist(),
            t["bytes"].to_pylist(),
            t["fmt"].to_pylist(),
            t["caption"].to_pylist(),
        )
    )
    want = pd.DataFrame(rows, columns=["image_id", "align_score"])
    pd.testing.assert_frame_equal(mine, want)
    # scores are non-degenerate: some spread, both signs present
    assert mine["align_score"].nunique() > 50
    assert (mine["align_score"] > 0).any() and (mine["align_score"] < 0).any()


def test_alignment_sql_parity(ray_session):
    import duckdb
    import ray.data as rd

    import daft_minhash_dedupe_ray.sql_oracle as so
    from daft_minhash_dedupe_ray.functions.alignment import (
        alignment_filter,
        alignment_scores,
    )
    from daft_minhash_dedupe_ray.synth import cached_table_path

    path = cached_table_path(120, seed=7, with_images=True)
    ds = rd.read_parquet(path)
    con = duckdb.connect()

    mine = (
        alignment_scores(ds, concurrency=2)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    want = con.sql(so.image_text_alignment_sql(path)).df()
    pd.testing.assert_frame_equal(mine, want.astype(mine.dtypes.to_dict()))

    kept = (
        alignment_filter(ds, q=0.3, concurrency=2)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    wantf = con.sql(so.alignment_filter_sql(path, q=0.3)).df()
    assert 0 < len(kept) < 120
    pd.testing.assert_frame_equal(kept, wantf.astype(kept.dtypes.to_dict()))


def test_alignment_empty_and_undecodable(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.alignment import alignment_scores

    t = pa.table(
        {
            "image_id": pa.array(["a", "b"], pa.string()),
            "bytes": pa.array([None, b"\x00\x01"], pa.binary()),
            "fmt": pa.array(["ppm", "jpeg"], pa.string()),
            "caption": pa.array(["x", "y"], pa.string()),
        }
    )
    out = alignment_scores(rd.from_arrow(t), concurrency=1).to_pandas()
    assert len(out) == 0  # null payload and unsupported codec both dropped


def test_lm_gate_unchanged_by_refactor(ray_session):
    """lm_quality_filter now routes through stages.util.sparse_quantile_cutoff;
    its quantile_disc semantics must be unchanged."""
    import duckdb
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.lm_quality import (
        lm_quality_filter,
        lm_quality_scores,
    )

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    kept = (
        lm_quality_filter(ds, q=0.9)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    scores = lm_quality_scores(ds).to_pandas()
    n = len(scores)
    cutoff = np.sort(scores["lm_score"].to_numpy())[int(np.ceil(0.9 * n)) - 1]
    want = (
        scores[scores["lm_score"] <= cutoff][["doc_id"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(kept, want)


def test_image_corpus_assembly_end_to_end(ray_session):
    """Composition parity: gate -> dedupe -> shard matches the single-shot
    DuckDB replay, and the planted near-dup structure actually contracts."""
    import duckdb
    import ray.data as rd

    import daft_minhash_dedupe_ray.sql_oracle as so
    from daft_minhash_dedupe_ray.pipelines.image_corpus import assemble_image_corpus
    from daft_minhash_dedupe_ray.synth import cached_table_path

    path = cached_table_path(150, seed=11, with_images=True)
    mine = (
        assemble_image_corpus(rd.read_parquet(path), concurrency=2, num_actors=2)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(so.image_corpus_assembly_sql(path)).df()
    pd.testing.assert_frame_equal(mine, want.astype(mine.dtypes.to_dict()))
    assert 0 < len(mine) < 150  # survivors exist; gate/dedupe dropped rows
    assert mine["shard"].between(0, 7).all()
    assert mine["shard"].nunique() > 1
