"""Corpus retrieval operators: BM25 text top-k and perceptual-hash image
top-k — the text- and pixel-side "similarity search" entries next to the
embedding ANN family (``similarity.ann_topk`` / IVF).

Both are expressed as broadcast-query scans: the query side is tiny by
definition, so it is collected once on the driver, shipped via ``ray.put``,
and every corpus batch scores itself against the broadcast queries and emits
only its local top-k candidates — O(queries * k * partitions) ever reaches
the driver; the corpus streams.  No shuffle, no join.

BM25 (Robertson/Sparck-Jones probabilistic ranking; the classic
``k1``/``b`` form, public formula) runs in three corpus passes:

1. id pass (column-pruned): the ``n_queries`` smallest doc ids,
2. stats pass: corpus size N / total token count (-> avgdl) and per-term
   document frequencies, reduced from per-batch partials (O(|terms|) each),
3. score pass: vectorised tf counting per broadcast term, contributions
   summed in first-occurrence term order (the order the SQL oracle mirrors
   term by term), rounded to 6 decimals, local top-k per query.

Float parity with the DuckDB oracle (``sql_oracle.bm25_topk_sql``) follows
the lm_quality precedent: every arithmetic step is float64 with identical
association order on both sides, constants are emitted as ``repr`` so both
runtimes parse the same doubles, scores are rounded to 6 decimals and ties
broken by doc id.

The image variant ranks by exact integer Hamming distance between dHash
fingerprints (decode once per row, XOR + popcount against the broadcast
query hashes) — integer-exact end to end, so the oracle
(``sql_oracle.image_hamming_topk_sql``) recomputes the dHashes from the raw
PPM bytes in DuckDB and must match bit for bit.

Reference parity anchor: the reference repo has no retrieval surface; this
extends the engine along SURVEY.md's "similarity search" axis (cf.
workload/minhash_dedupe.py's banding machinery, reused here for nothing —
retrieval is a broadcast scan, not a shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..hashing import hamming_distance64, token_hashes_flat

BM25_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("doc_id", pa.int64()), ("score", pa.float64())]
)


def _smallest_ids(ds, id_col: str, n: int, mask_fn=None) -> list:
    """The n smallest ids: per-batch local min-n, tiny driver merge."""

    def local_min(b: pa.Table) -> pa.Table:
        if mask_fn is not None:
            b = mask_fn(b)
        if len(b) == 0:
            return pa.schema([(id_col, b.schema.field(id_col).type)]).empty_table()
        import pyarrow.compute as pc

        idx = pc.sort_indices(b, sort_keys=[(id_col, "ascending")])[: min(n, len(b))]
        return b.select([id_col]).take(idx)

    cand = ds.map_batches(local_min, batch_format="pyarrow").to_pandas()
    if id_col not in cand.columns:  # empty input -> zero-column frame
        return []
    return sorted(cand[id_col].tolist())[:n]


def _query_terms(texts: list[str], query_len: int) -> list[np.ndarray]:
    """Per query: first ``query_len`` token hashes, deduped preserving
    first-occurrence order (the summation order the oracle reproduces)."""
    out = []
    for t in texts:
        h, _ = token_hashes_flat([t])
        h = h[:query_len]
        _, first = np.unique(h, return_index=True)
        out.append(h[np.sort(first)])
    return out


def bm25_topk(
    ds,
    n_queries: int = 4,
    query_len: int = 6,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """BM25 top-k retrieval of every corpus doc against ``n_queries`` query
    strings (the texts of the ``n_queries`` smallest doc ids, truncated to
    their first ``query_len`` distinct tokens).  Self-hits are excluded.

    Returns (query_id, doc_id, score) sorted by (query_id, -score, doc_id);
    ``score`` is rounded to 6 decimals and is the ranking key (doc id breaks
    ties), so the result is deterministic and SQL-checkable.
    """
    # pass 0+1: query docs (tiny side) ------------------------------------
    qids = _smallest_ids(ds.select_columns([id_col]), id_col, n_queries)
    if not qids:
        return BM25_SCHEMA.empty_table()
    qid_arr = pa.array(qids, pa.int64())

    def pick_queries(bt: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return bt.filter(pc.is_in(bt[id_col], value_set=qid_arr))

    qdf = (
        ds.select_columns([id_col, text_col])
        .map_batches(pick_queries, batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_col)
    )
    terms_per_q = _query_terms(qdf[text_col].tolist(), query_len)
    all_terms = np.unique(np.concatenate([t for t in terms_per_q] or [np.zeros(0, np.uint64)]))
    if len(all_terms) == 0:
        return BM25_SCHEMA.empty_table()
    terms_ref = ray.put(all_terms)  # sorted u64

    # pass 2: corpus stats — N, sum dl, df per term (per-batch partials) --
    def stats_partial(bt: pa.Table) -> pa.Table:
        terms = ray.get(terms_ref)
        tokh, lens = token_hashes_flat(bt[text_col])
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pos = np.searchsorted(terms, tokh)
        pos_c = np.minimum(pos, len(terms) - 1)
        hit = terms[pos_c] == tokh
        # distinct (doc, term) pairs -> df partials
        key = doc_idx[hit] * np.int64(len(terms)) + pos_c[hit].astype(np.int64)
        uniq = np.unique(key)
        df = np.bincount((uniq % len(terms)).astype(np.int64), minlength=len(terms))
        return pa.table(
            {
                "n_docs": pa.array([len(lens)], pa.int64()),
                "sum_dl": pa.array([int(lens.sum())], pa.int64()),
                "df": pa.array([df.astype(np.int64)], pa.list_(pa.int64())),
            }
        )

    parts = ds.select_columns([text_col]).map_batches(
        stats_partial, batch_format="pyarrow"
    ).to_pandas()
    n_corpus = int(parts["n_docs"].sum())
    sum_dl = int(parts["sum_dl"].sum())
    df = np.sum(np.stack(parts["df"].to_numpy()), axis=0).astype(np.float64)
    avgdl = sum_dl / float(n_corpus)
    # idf: identical association order to the SQL (double casts, then ln)
    idf = np.log((n_corpus - df + 0.5) / (df + 0.5) + 1.0)
    bundle_ref = ray.put(
        {
            "terms": all_terms,
            "idf": idf,
            "avgdl": avgdl,
            "terms_per_q": terms_per_q,
            "qids": np.asarray(qids, np.int64),
            "k1": float(k1),
            "b": float(b),
        }
    )

    # pass 3: score + local top-k -----------------------------------------
    def score_topk(bt: pa.Table) -> pa.Table:
        bu = ray.get(bundle_ref)
        terms, idf_v, avgdl_v = bu["terms"], bu["idf"], bu["avgdl"]
        k1_v, b_v = bu["k1"], bu["b"]
        ids = bt[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tokh, lens = token_hashes_flat(bt[text_col])
        n = len(ids)
        if n == 0:
            return BM25_SCHEMA.empty_table()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        pos = np.searchsorted(terms, tokh)
        pos_c = np.minimum(pos, len(terms) - 1)
        hit = terms[pos_c] == tokh
        # tf matrix (n_docs x n_terms) — |terms| is tiny (<= n_q*query_len)
        tf = np.zeros((n, len(terms)), np.float64)
        np.add.at(tf, (doc_idx[hit], pos_c[hit]), 1.0)
        dl = lens.astype(np.float64)
        den_norm = k1_v * (1.0 - b_v + b_v * dl / avgdl_v)  # (n,)
        out_q, out_d, out_s = [], [], []
        for qi, qterms in enumerate(bu["terms_per_q"]):
            ti = np.searchsorted(terms, qterms)
            score = np.zeros(n, np.float64)
            for t in ti:  # first-occurrence order == SQL term-rank order
                tf_t = tf[:, t]
                score = score + idf_v[t] * (tf_t * (k1_v + 1.0)) / (tf_t + den_norm)
            matched = tf[:, ti].sum(axis=1) > 0
            matched &= ids != bu["qids"][qi]  # exclude self-hit
            if not matched.any():
                continue
            sc = np.round(score[matched], 6)
            mid = ids[matched]
            order = np.lexsort((mid, -sc))[: min(k, len(mid))]
            out_q.append(np.full(len(order), bu["qids"][qi], np.int64))
            out_d.append(mid[order])
            out_s.append(sc[order])
        if not out_q:
            return BM25_SCHEMA.empty_table()
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    cand = (
        ds.select_columns([id_col, text_col])
        .map_batches(score_topk, batch_format="pyarrow")
        .to_pandas()
    )
    if len(cand) == 0:
        return BM25_SCHEMA.empty_table()
    out = []
    for _, grp in cand.groupby("query_id"):
        grp = grp.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        out.append(grp)
    import pandas as pd

    merged = (
        pd.concat(out)
        .sort_values(["query_id", "score", "doc_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(merged, preserve_index=False)


# --------------------------------------------------- image Hamming top-k


HAMMING_SCHEMA = pa.schema(
    [("query_id", pa.string()), ("image_id", pa.string()), ("hamming", pa.int64())]
)


def image_hamming_topk(
    ds,
    n_queries: int = 6,
    k: int = 5,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_col: str = "image_id",
) -> pa.Table:
    """Pixel-side similarity search: for each of the ``n_queries``
    lexicographically-smallest decodable images, the ``k`` nearest corpus
    images by dHash Hamming distance (self excluded), ties broken by image
    id.  Integer-exact, so the DuckDB oracle recomputes every dHash from
    the raw PPM payloads and must match exactly.

    Decode happens once per corpus row (in the scoring scan); the query
    side decodes only its own ``n_queries`` rows.
    """
    from .multimodal import _SUPPORTED, decode_image, dhash64

    def decodable(bt: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(
            pc.is_in(bt[fmt_col], value_set=pa.array(sorted(_SUPPORTED))),
            pc.is_valid(bt[bytes_col]),
        )
        return bt.filter(m)

    qids = _smallest_ids(
        ds.select_columns([id_col, fmt_col, bytes_col]),
        id_col,
        n_queries,
        mask_fn=decodable,
    )
    if not qids:
        return HAMMING_SCHEMA.empty_table()
    qid_arr = pa.array(qids, pa.string())

    def pick_queries(bt: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return bt.filter(pc.is_in(bt[id_col], value_set=qid_arr))

    qdf = (
        ds.select_columns([id_col, fmt_col, bytes_col])
        .map_batches(pick_queries, batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_col)
    )
    q_dh = np.array(
        [dhash64(decode_image(d, f)) for d, f in zip(qdf[bytes_col], qdf[fmt_col])],
        np.uint64,
    )
    q_ref = ray.put((np.asarray(qids, object), q_dh))

    def score_topk(bt: pa.Table) -> pa.Table:
        qids_v, qdh = ray.get(q_ref)
        bt = decodable(bt)
        if len(bt) == 0:
            return HAMMING_SCHEMA.empty_table()
        ids = np.asarray(bt[id_col].to_pylist(), object)
        dh = np.array(
            [
                dhash64(decode_image(d, f))
                for d, f in zip(bt[bytes_col].to_pylist(), bt[fmt_col].to_pylist())
            ],
            np.uint64,
        )
        dist = hamming_distance64(qdh[:, None], dh[None, :])  # (Q, n)
        out_q, out_i, out_h = [], [], []
        for qi in range(len(qids_v)):
            mask = ids != qids_v[qi]
            mid, md = ids[mask], dist[qi][mask]
            if len(mid) == 0:
                continue
            order = np.lexsort((mid, md))[: min(k, len(mid))]
            out_q.extend([qids_v[qi]] * len(order))
            out_i.extend(mid[order].tolist())
            out_h.extend(md[order].tolist())
        if not out_q:
            return HAMMING_SCHEMA.empty_table()
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.string()),
                "image_id": pa.array(out_i, pa.string()),
                "hamming": pa.array(out_h, pa.int64()),
            }
        )

    cand = (
        ds.select_columns([id_col, fmt_col, bytes_col])
        .map_batches(score_topk, batch_format="pyarrow", batch_size=256)
        .to_pandas()
    )
    if len(cand) == 0:
        return HAMMING_SCHEMA.empty_table()
    out = []
    for _, grp in cand.groupby("query_id"):
        grp = grp.sort_values(["hamming", "image_id"]).head(k)
        out.append(grp)
    import pandas as pd

    merged = (
        pd.concat(out)
        .sort_values(["query_id", "hamming", "image_id"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(merged, preserve_index=False)
