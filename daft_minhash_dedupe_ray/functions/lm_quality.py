"""Statistical-LM quality scoring (CCNet-style perplexity filtering).

CCNet / Gopher pipelines rank documents by language-model perplexity and
drop the worst tail.  With no pretrained LM installable here, the model is
an add-k-smoothed **bigram LM trained on the corpus itself** — the same
filtering shape (train on reference text, score every doc, gate on the
score) with fully deterministic, SQL-reproducible math:

    p(w2 | w1) = (c(w1, w2) + k) / (c(w1) + k * V)
    score(doc) = -mean(log p) over the doc's bigrams   (0 for < 2 tokens)

Ray-Data shape:

1. **Count pass** — per batch, token hashes via the shared Arrow-split
   kernel (``hashing.token_hashes_flat``), bigram hashes via the ordered
   pair hash, sort+``reduceat`` batch combiners, then ONE hash-partitioned
   exchange reduces to global (hash, count) tables.  The exchange moves one
   row per distinct gram per batch — vocabulary-sized, not corpus-sized.
2. **Broadcast** — the count tables ship once via ``ray.put`` (sorted
   arrays + ``searchsorted`` probes).  Contract: vocabulary must fit the
   object store; at open-web scale cap it with a count floor (``min_count``)
   — unseen/rare grams then fall through to the smoothing term, which is
   exactly what add-k smoothing is for.
3. **Score pass** — stateless ``map_batches``: probe both tables, one
   vectorised log, segment means per doc.

64-bit gram hashing stands in for the strings (collision ~2^-64 per pair —
the engine-wide convention); the DuckDB oracle recomputes the same model
from the raw strings and matches to 6 decimals.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray

from ..hashing import hash64_int_pairs, token_hashes_flat
from ..stages.util import partition_groupby, sparse_quantile_cutoff

COUNT_SCHEMA = pa.schema([("h", pa.uint64()), ("c", pa.int64()), ("uni", pa.bool_())])
SCORE_SCHEMA_NAME = "lm_score"


def _doc_grams(texts):
    """(unigram hashes flat, bigram hashes flat, per-doc token counts,
    per-doc bigram counts)."""
    toks, per_doc = token_hashes_flat(texts)
    n_bi = np.maximum(per_doc - 1, 0)
    if len(toks) == 0:
        return toks, np.zeros(0, np.uint64), per_doc, n_bi
    # bigrams never cross doc boundaries: positions where the NEXT token is
    # in the same doc
    ends = np.cumsum(per_doc)
    valid = np.ones(len(toks), bool)
    valid[ends[ends > 0] - 1] = False  # last token of each doc starts no bigram
    bi = hash64_int_pairs(toks[:-1][valid[:-1]], toks[1:][valid[:-1]])
    return toks, bi, per_doc, n_bi


def _count_partial(batch: pa.Table, text_col: str) -> pa.Table:
    toks, bi, _, _ = _doc_grams(batch[text_col])
    hs, cs, uni = [], [], []
    for arr, is_uni in ((toks, True), (bi, False)):
        if len(arr):
            s = np.sort(arr)
            seg = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))
            cnt = np.diff(np.concatenate((seg, [len(s)])))
            hs.append(s[seg])
            cs.append(cnt)
            uni.append(np.full(len(seg), is_uni))
    if not hs:
        return COUNT_SCHEMA.empty_table()
    return pa.table(
        {
            "h": pa.array(np.concatenate(hs), pa.uint64()),
            "c": pa.array(np.concatenate(cs).astype(np.int64), pa.int64()),
            "uni": pa.array(np.concatenate(uni), pa.bool_()),
        }
    )


def _count_reduce(tab: pa.Table) -> pa.Table:
    if tab is None or len(tab) == 0:
        return COUNT_SCHEMA.empty_table()
    h = tab["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = tab["c"].to_numpy(zero_copy_only=False)
    u = tab["uni"].to_numpy(zero_copy_only=False).astype(np.uint8)
    order = np.lexsort((h, u))  # group within (uni, h)
    h, c, u = h[order], c[order], u[order]
    key_change = np.concatenate(([True], (h[1:] != h[:-1]) | (u[1:] != u[:-1])))
    seg = np.flatnonzero(key_change)
    csum = np.concatenate(([0], np.cumsum(c)))
    ends = np.concatenate((seg[1:], [len(h)]))
    return pa.table(
        {
            "h": pa.array(h[seg], pa.uint64()),
            "c": pa.array(csum[ends] - csum[seg], pa.int64()),
            "uni": pa.array(u[seg] > 0, pa.bool_()),
        }
    )


def train_bigram_counts(
    ds, text_col: str = "text", num_partitions: int = 16, min_count: int = 2
):
    """Global (hash -> count) tables for unigrams and bigrams, plus the
    exact vocabulary size V.  Returns (uni_h, uni_c, bi_h, bi_c, V) sorted
    numpy arrays (driver-side).

    CCNet-style pruning: BIGRAM entries with count < ``min_count`` are
    dropped from the broadcast table (they score as unseen, cb = 0 — the
    add-k smoothing math is unchanged).  Hapax bigrams are the bulk of the
    table at corpus scale (5.9M entries at sf0.01 -> multi-GB broadcast at
    100 TB), while unigrams and the exact V stay intact, so the context
    denominators are exact.  ``min_count=1`` disables pruning."""
    partials = ds.map_batches(
        functools.partial(_count_partial, text_col=text_col), batch_format="pyarrow"
    )
    counts = partition_groupby(partials, ["h", "uni"], _count_reduce, COUNT_SCHEMA, num_partitions)
    parts = [t for t in ray.get(counts.to_arrow_refs()) if t is not None and len(t)]
    if not parts:
        z64, zi = np.zeros(0, np.uint64), np.zeros(0, np.int64)
        return z64, zi, z64.copy(), zi.copy(), 0
    tab = pa.concat_tables(parts)
    h = tab["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = tab["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    u = tab["uni"].to_numpy(zero_copy_only=False)
    uh, uc = h[u], c[u]
    bh, bc = h[~u], c[~u]
    if min_count > 1:
        keep = bc >= min_count
        bh, bc = bh[keep], bc[keep]
    ou, ob = np.argsort(uh), np.argsort(bh)
    return uh[ou], uc[ou], bh[ob], bc[ob], int(len(uh))


def lm_quality_scores(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
    num_partitions: int = 16,
    min_count: int = 2,
):
    """Per-doc mean negative log-likelihood under the corpus bigram LM.
    Returns ``(id_col, lm_score)`` — higher = more surprising text (the
    filtering gate drops the high tail)."""
    model = train_bigram_counts(ds, text_col, num_partitions, min_count)
    model_ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        uh, uc, bh, bc, V = ray.get(model_ref)
        toks, bi, per_doc, n_bi = _doc_grams(batch[text_col])
        out = np.zeros(len(batch), np.float64)
        if len(bi) and V:
            # context counts: the FIRST token of each bigram
            ends = np.cumsum(per_doc)
            valid = np.ones(len(toks), bool)
            valid[ends[ends > 0] - 1] = False
            ctx = toks[valid]
            iu = np.minimum(np.searchsorted(uh, ctx), max(len(uh) - 1, 0))
            cu = np.where((len(uh) > 0) & (uh[iu] == ctx), uc[iu], 0).astype(np.float64)
            ib = np.minimum(np.searchsorted(bh, bi), max(len(bh) - 1, 0))
            cb = np.where((len(bh) > 0) & (bh[ib] == bi), bc[ib], 0).astype(np.float64)
            ll = -np.log((cb + k) / (cu + k * V))
            csum = np.concatenate(([0.0], np.cumsum(ll)))
            starts = np.concatenate(([0], np.cumsum(n_bi)))[:-1]
            sums = csum[starts + n_bi] - csum[starts]
            out = np.where(n_bi > 0, sums / np.maximum(n_bi, 1), 0.0)
        return pa.table(
            {
                id_col: batch[id_col],
                "lm_score": pa.array(np.round(out, 6), pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def lm_quality_filter(
    ds,
    q: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
    num_partitions: int = 16,
    min_count: int = 2,
):
    """Perplexity-tail gate: keep docs whose LM score is <= the exact corpus
    ``q``-quantile (``quantile_disc`` semantics: sorted value at index
    ``ceil(q*n) - 1``) — the CCNet filtering step.

    The quantile is exact and never sorts the corpus: per-batch
    ``(score, count)`` partials reduce through one hash exchange to the
    global sparse histogram (bounded by DISTINCT rounded scores, not rows),
    whose cumulative counts give the cutoff on the driver.  Scores
    materialize once (two consumers: the histogram and the filter) as an
    ``(id, float)`` table — 16 bytes/row."""
    scores = lm_quality_scores(ds, id_col, text_col, k, num_partitions, min_count).materialize()
    cutoff = sparse_quantile_cutoff(scores, "lm_score", q, num_partitions)
    if cutoff is None:
        return scores.select_columns([id_col])
    return scores.filter(expr=f"lm_score <= {cutoff!r}").select_columns([id_col])
