"""Retrieval operators: BM25 text top-k and dHash Hamming image top-k.

Each gets (a) an exact brute-force python oracle on a hand-sized corpus and
(b) DuckDB parity for the generated SQL oracle on the same input — the same
two-sided check the driver's correctness gate runs at sf0.01.
"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_bm25(docs, n_queries, query_len, k, k1=1.2, b=0.75):
    """Reference BM25 in plain python, mirroring the engine's term order."""
    from daft_minhash_dedupe_ray.hashing import token_hashes_flat

    ids = sorted(d[0] for d in docs)[:n_queries]
    by_id = dict(docs)
    tokhs = {}
    for did, text in docs:
        h, _ = token_hashes_flat([text])
        tokhs[did] = h
    n = len(docs)
    avgdl = sum(len(v) for v in tokhs.values()) / float(n)
    out = []
    for qid in ids:
        h = tokhs[qid][:query_len]
        _, first = np.unique(h, return_index=True)
        qterms = h[np.sort(first)]
        scored = []
        for did, _ in docs:
            if did == qid:
                continue
            dl = float(len(tokhs[did]))
            score = 0.0
            matched = False
            for t in qterms:
                tf = float((tokhs[did] == t).sum())
                if tf > 0:
                    matched = True
                df = sum(1 for v in tokhs.values() if (v == t).any())
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                score = score + idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * dl / avgdl)
                )
            if matched:
                scored.append((qid, did, round(score, 6)))
        scored.sort(key=lambda r: (-r[2], r[1]))
        out.extend(scored[:k])
    return pd.DataFrame(out, columns=["query_id", "doc_id", "score"])


DOCS = [
    (3, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (7, "the lazy dog sleeps in the quick shade"),
    (2, "five boxing wizards jump quickly over the fence"),
    (9, "a quick brown dog jumps over a lazy fox"),
    (4, "dozen lazy wizards pack the brown box"),
    (8, "he sleeps"),
    (5, "the the the quick quick fox"),
]


def test_bm25_matches_brute_force(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.retrieval import bm25_topk

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
                "text": pa.array([d[1] for d in DOCS], pa.string()),
            }
        )
    )
    mine = bm25_topk(ds, n_queries=3, query_len=5, k=4).to_pandas()
    want = _brute_bm25(DOCS, n_queries=3, query_len=5, k=4)
    m = mine.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    w = want.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(m, w, check_dtype=False)


def test_bm25_sql_parity_sf0001(ray_session, tmp_path):
    import duckdb
    import ray.data as rd

    import daft_minhash_dedupe_ray.sql_oracle as so
    from daft_minhash_dedupe_ray.functions.retrieval import bm25_topk

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    mine = bm25_topk(ds).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.sql(so.bm25_topk_sql()).df()
    m = mine.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    w = want.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    assert len(m) == len(w) > 0
    pd.testing.assert_frame_equal(m, w.astype(m.dtypes.to_dict()))


def test_bm25_empty_and_self_exclusion(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.retrieval import bm25_topk

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert len(bm25_topk(ds)) == 0
    # a query doc never retrieves itself
    ds2 = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["same words here", "same words here"], pa.string()),
            }
        )
    )
    out = bm25_topk(ds2, n_queries=1, k=5).to_pandas()
    assert (out["doc_id"] != out["query_id"]).all()
    assert set(out["doc_id"]) == {2}


def test_image_hamming_topk_brute_and_sql(ray_session):
    import duckdb
    import ray.data as rd

    import daft_minhash_dedupe_ray.sql_oracle as so
    from daft_minhash_dedupe_ray.functions.multimodal import decode_image, dhash64
    from daft_minhash_dedupe_ray.functions.retrieval import image_hamming_topk
    from daft_minhash_dedupe_ray.synth import cached_table_path

    path = cached_table_path(120, seed=7, with_images=True)
    ds = rd.read_parquet(path)
    mine = image_hamming_topk(ds, n_queries=4, k=3).to_pandas()

    # brute python oracle
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    dh = {
        i: dhash64(decode_image(d, f))
        for i, d, f in zip(
            t["image_id"].to_pylist(), t["bytes"].to_pylist(), t["fmt"].to_pylist()
        )
    }
    qids = sorted(dh)[:4]
    rows = []
    for q in qids:
        cand = sorted(
            (bin(dh[q] ^ dh[i]).count("1"), i) for i in dh if i != q
        )[:3]
        rows.extend((q, i, h) for h, i in cand)
    want = pd.DataFrame(rows, columns=["query_id", "image_id", "hamming"])
    m = mine.sort_values(["query_id", "image_id"]).reset_index(drop=True)
    w = want.sort_values(["query_id", "image_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(m, w, check_dtype=False)

    # DuckDB decodes the PPM payloads itself
    con = duckdb.connect()
    got = con.sql(so.image_hamming_topk_sql(path, n_queries=4, k=3)).df()
    g = got.sort_values(["query_id", "image_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(m, g.astype(m.dtypes.to_dict()))
