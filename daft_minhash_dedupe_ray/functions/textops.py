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


# GPT-2-style pre-tokenizer shape, restricted to RE2 syntax (no lookahead,
# ASCII classes) so pyarrow's count_substring_regex and DuckDB's
# regexp_extract_all (both RE2) agree exactly: contraction suffixes, then
# space-prefixed letter/digit/punct runs, then whitespace runs.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-ish token count per row: one vectorised RE2 scan, no Python
    tokenizer loop (the whitespace counter's sibling for byte-pair-style
    budgeting)."""
    n = pc.count_substring_regex(batch[text_col], pattern=BPE_TOKEN_RE)
    return batch.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


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
    """64-bit content fingerprint of the text (``hashing.content_keys``:
    order-sensitive position-mixed token-hash key — whitespace-normalised,
    fully vectorised, SQL-checkable) — the basis for exact dedup and for
    per-partition lineage metrics."""
    from ..hashing import content_keys

    h = content_keys(batch[text_col], seed=0)
    return batch.append_column("fingerprint", pa.array(h, pa.uint64()))


# ---------------------------------------------------------------------------
# corpus-cleaning operators (boilerplate pruning, PII redaction,
# benchmark-contamination flagging, grouped distinct counts)
# ---------------------------------------------------------------------------

# (pattern, replacement) pairs — RE2 syntax so Arrow's replace_substring_regex
# and DuckDB's regexp_replace(..., 'g') apply them identically.  Order
# matters (emails contain dots that would otherwise look like IPs).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d[\d ]{5,}\d", "<PHONE>"),
]


class PIIRedactor:
    """Vectorised PII scrubbing: sequential RE2 global replaces over the text
    column (emails, IPv4s, international phone numbers), plus a redaction
    count per row.  Callable class so running it as an actor pool keeps any
    future pattern-compilation cost in ``__init__``; with Arrow kernels the
    patterns are passed as strings, so the stateless path is equally fine."""

    def __init__(self, text_col: str = "text", out_col: str = "clean_text") -> None:
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch[self.text_col]
        n_red = pa.nulls(len(batch), pa.int64())
        total = np.zeros(len(batch), dtype=np.int64)
        for pat, repl in PII_PATTERNS:
            total += pc.count_substring_regex(s, pattern=pat).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
        n_red = pa.array(total, pa.int64())
        batch = batch.append_column(self.out_col, s)
        return batch.append_column("n_redactions", n_red)


def _split_nonempty(texts: pa.ChunkedArray):
    """(list-of-token array, flat nonempty tokens, row_id per nonempty token).

    Matches ``hashing.token_hashes_flat`` exactly: Arrow unicode whitespace
    split (str.split semantics) with empty tokens dropped, so the flat token
    hashes from that helper align 1:1 with the strings returned here."""
    splits = pc.utf8_split_whitespace(texts)
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    lens = pc.fill_null(pc.list_value_length(splits), 0).to_numpy(zero_copy_only=False)
    lens = lens.astype(np.int64)
    flat = pc.list_flatten(splits)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    row_id = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    nonempty = np.asarray(
        pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False), dtype=bool
    )
    if not nonempty.all():
        flat = flat.filter(pa.array(nonempty))
        row_id = row_id[nonempty]
    return flat, row_id


def remove_boilerplate_tokens(
    ds,
    max_df_frac: float = 0.79,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
):
    """Corpus-level boilerplate pruning (the C4/RefinedWeb 'remove lines that
    repeat across the corpus' step, at token granularity for this newline-free
    payload): drop every token whose document frequency is >= ceil(max_df_frac
    * n_docs), rebuilding each document from its surviving tokens.

    Scale shape (two streaming passes, nothing corpus-sized on the driver):

      1. document frequency: per-batch (token, doc) dedup collapses each
         batch to one row per distinct (doc, token) BEFORE counting, then a
         token-keyed partition exchange sums partial dfs; each partition
         emits only its over-threshold tokens, so the driver collects the
         boilerplate VOCABULARY (tiny by construction), never the corpus.
      2. filter: the boilerplate token-hash set is broadcast once
         (``ray.put``); each batch drops members with a vectorised
         searchsorted and reassembles documents with Arrow ``binary_join``.

    Returns a Dataset of (id_col, clean_text).
    """
    import ray
    import ray.data  # noqa: F401  (ds is already a Dataset)

    from ..hashing import token_hashes_flat
    from ..stages.util import partition_groupby

    n_docs = ds.count()
    import math

    thresh = int(math.ceil(max_df_frac * n_docs))

    def _df_partial(b: pa.Table) -> pa.Table:
        toks, row_id = _split_nonempty(b[text_col].combine_chunks())
        if len(toks) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        t = pa.table({"token": toks, "row": pa.array(row_id)})
        # distinct (doc, token) inside the batch — a doc never spans batches
        g = t.group_by(["token", "row"]).aggregate([]).group_by("token").aggregate(
            [("token", "count")]
        )
        return pa.table(
            {"token": g["token"], "df": pc.cast(g["token_count"], pa.int64())}
        )

    boiler_schema = pa.schema([("token", pa.string())])

    def _df_reduce(b: pa.Table) -> pa.Table:
        g = b.group_by("token").aggregate([("df", "sum")])
        keep = pc.greater_equal(g["df_sum"], thresh)
        return pa.table({"token": g.filter(keep)["token"]})

    boiler = partition_groupby(
        ds.select_columns([text_col]).map_batches(_df_partial, batch_format="pyarrow"),
        ["token"],
        _df_reduce,
        boiler_schema,
        num_partitions=num_partitions,
    )
    boiler_tokens = [r["token"] for r in boiler.take_all()]  # vocabulary-sized: tiny
    # hash with the SAME scheme as the filter pass (token_hashes_flat's
    # byte-poly hash); a token is whitespace-free so text == token
    bh, _ = token_hashes_flat(pa.array(boiler_tokens, pa.string()))
    boiler_ref = ray.put(np.sort(bh))

    def _filter(b: pa.Table) -> pa.Table:
        boiler_sorted = ray.get(boiler_ref)
        texts = b[text_col].combine_chunks()
        toks, row_id = _split_nonempty(texts)
        tok_h, _counts = token_hashes_flat(texts)
        if len(boiler_sorted) and len(tok_h):
            pos = np.searchsorted(boiler_sorted, tok_h)
            pos[pos == len(boiler_sorted)] = 0
            keep = boiler_sorted[pos] != tok_h
        else:
            keep = np.ones(len(tok_h), dtype=bool)
        kept = toks.filter(pa.array(keep)) if not keep.all() else toks
        new_lens = np.bincount(row_id[keep], minlength=len(b)).astype(np.int64)
        offsets = np.zeros(len(b) + 1, dtype=np.int64)
        np.cumsum(new_lens, out=offsets[1:])
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept)
        clean = pc.binary_join(lists, " ")
        return pa.table({id_col: b[id_col], "clean_text": clean})

    return ds.select_columns([id_col, text_col]).map_batches(
        _filter, batch_format="pyarrow"
    )


def word_ngram_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Full-64-bit word n-gram hashes (no whole-doc fallback for short docs —
    docs with < n tokens yield zero grams, matching the SQL lead-window
    construction).  Returns (flat_hashes, offsets); fully vectorised via the
    contiguous shifted-pass fold (see ``hashing.shingle_hashes``)."""
    from ..hashing import _POLY_P, _segment_aranges, token_hashes_flat

    tok_h, counts = token_hashes_flat(texts)
    n_docs = len(counts)
    n_grams = np.maximum(counts - n + 1, 0)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_grams, out=offsets[1:])
    if offsets[-1] == 0 or len(tok_h) < n:
        return np.zeros(0, np.uint64), np.zeros(n_docs + 1, dtype=np.int64)
    tok_starts = np.zeros(n_docs, dtype=np.int64)
    if n_docs > 1:
        np.cumsum(counts[:-1], out=tok_starts[1:])
    n_win = len(tok_h) - n + 1
    acc = np.zeros(n_win, dtype=np.uint64)
    p_pow = np.uint64(1)
    with np.errstate(over="ignore"):  # u64 wraparound is the hash semantics
        for j in range(n - 1, -1, -1):
            acc += tok_h[j : j + n_win] * p_pow
            p_pow = p_pow * _POLY_P
    has = n_grams > 0
    w_starts = np.repeat(tok_starts[has], n_grams[has]) + _segment_aranges(n_grams[has])
    return splitmix64(acc[w_starts]), offsets


def contamination_flags(
    ds,
    bench_ds,
    ngram_size: int = 5,
    min_overlap: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Benchmark-contamination detection: flag corpus documents sharing >=
    ``min_overlap`` distinct word ``ngram_size``-grams with a (small)
    benchmark set — the standard eval-decontamination step for training data.

    Scale shape: the benchmark's distinct gram hashes are collected once
    (benchmarks are small by definition) and broadcast via ``ray.put``; the
    corpus pass is a single ``map_batches`` doing a vectorised searchsorted
    membership test plus a per-row distinct count (sort + segment).  The
    corpus is never shuffled.  Returns a Dataset of
    (id_col, n_overlap, contaminated).
    """
    import ray

    def _gram_partial(b: pa.Table) -> pa.Table:
        flat, _off = word_ngram_hashes(b[text_col].combine_chunks(), ngram_size)
        return pa.table({"g": pa.array(np.unique(flat), pa.uint64())})

    # collect benchmark grams (small side) — one pass, driver holds only grams
    grams = []
    for t in (
        bench_ds.select_columns([text_col])
        .map_batches(_gram_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        grams.append(t["g"].to_numpy(zero_copy_only=False))
    bench_sorted = np.unique(np.concatenate(grams)) if grams else np.zeros(0, np.uint64)
    bench_ref = ray.put(bench_sorted)

    def _flag(b: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        flat, off = word_ngram_hashes(b[text_col].combine_chunks(), ngram_size)
        n = len(b)
        counts = np.zeros(n, dtype=np.int64)
        if len(flat) and len(bench):
            row_id = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
            pos = np.searchsorted(bench, flat)
            pos[pos == len(bench)] = 0
            hit = bench[pos] == flat
            rh, gh = row_id[hit], flat[hit]
            order = np.lexsort((gh, rh))
            rs, gs = rh[order], gh[order]
            first = (
                np.r_[True, (rs[1:] != rs[:-1]) | (gs[1:] != gs[:-1])]
                if len(rs)
                else np.zeros(0, bool)
            )
            counts = np.bincount(rs[first], minlength=n).astype(np.int64)
        return pa.table(
            {
                id_col: b[id_col],
                "n_overlap": pa.array(counts, pa.int64()),
                "contaminated": pa.array(counts >= min_overlap),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _flag, batch_format="pyarrow"
    )


def distinct_tokens_per_group(
    ds, group_col: str = "lang", text_col: str = "text", num_partitions: int = 64
) -> pa.Table:
    """Exact COUNT(DISTINCT token) per group, at corpus scale: per-batch
    (group, token-hash) dedup collapses each batch before the shuffle, the
    token-keyed exchange dedups globally, and per-partition distinct counts
    sum to the exact answer (a token lives in exactly one partition).
    Token hashing is 64-bit (collision odds ~2^-64 per pair)."""
    from ..hashing import token_hashes_flat
    from ..stages.util import partition_groupby

    def _partial(b: pa.Table) -> pa.Table:
        texts = b[text_col].combine_chunks()
        tok_h, counts = token_hashes_flat(texts)
        gidx = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        t = pa.table(
            {
                "grp": pc.take(b[group_col].combine_chunks(), pa.array(gidx)),
                "th": pa.array(tok_h, pa.uint64()),
            }
        )
        return t.group_by(["grp", "th"]).aggregate([])

    schema = pa.schema([("grp", pa.string()), ("n_distinct", pa.int64())])

    def _reduce(b: pa.Table) -> pa.Table:
        d = b.group_by(["grp", "th"]).aggregate([])
        g = d.group_by("grp").aggregate([("th", "count")])
        return pa.table({"grp": g["grp"], "n_distinct": pc.cast(g["th_count"], pa.int64())})

    out = partition_groupby(
        ds.select_columns([group_col, text_col]).map_batches(
            _partial, batch_format="pyarrow"
        ),
        ["th"],
        _reduce,
        schema,
        num_partitions=num_partitions,
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    g = t.group_by("grp").aggregate([("n_distinct", "sum")])
    g = g.rename_columns([group_col, "n_distinct"])
    idx = pc.sort_indices(g, sort_keys=[(group_col, "ascending")])
    return g.take(idx)


def repetition_scores_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Gopher/MassiveText-style repetition quality signals per document:

      * ``n_grams`` / ``n_dup_grams`` — word-2-gram total and the count
        belonging to a 2-gram that repeats within the doc;
      * ``dup_gram_ppm`` — that fraction in parts-per-million (integer, so
        the value is bit-identical to the SQL oracle: float round-half
        modes differ between numpy and DuckDB);
      * ``top_token_ppm`` — most-frequent-token share of all tokens, ppm.

    Fully vectorised: per-row duplicate counting is one lexsort + run-length
    pass over the batch's flattened gram/token hashes."""
    from ..hashing import token_hashes_flat

    texts = batch[text_col].combine_chunks()
    n = len(batch)

    def _run_stats(flat: np.ndarray, off: np.ndarray):
        """per-row (total, members-of-runs>1, max run length) via one sort."""
        total = np.diff(off).astype(np.int64)
        dup = np.zeros(n, np.int64)
        mx = np.zeros(n, np.int64)
        if len(flat):
            row_id = np.repeat(np.arange(n, dtype=np.int64), total)
            order = np.lexsort((flat, row_id))
            rs, fs = row_id[order], flat[order]
            new = np.r_[True, (rs[1:] != rs[:-1]) | (fs[1:] != fs[:-1])]
            starts = np.flatnonzero(new)
            runs = np.diff(np.r_[starts, len(rs)])
            run_rows = rs[starts]
            dup = np.bincount(run_rows, weights=runs * (runs > 1), minlength=n).astype(np.int64)
            # max run per row: runs are already grouped by row, so one reduceat
            # (maximum.at is ~10x slower than reduceat on this box)
            row_first = np.flatnonzero(np.r_[True, run_rows[1:] != run_rows[:-1]])
            mx[run_rows[row_first]] = np.maximum.reduceat(runs, row_first)
        return total, dup, mx

    g_flat, g_off = word_ngram_hashes(texts, 2)
    n_grams, n_dup, _ = _run_stats(g_flat, g_off)
    t_flat, t_counts = token_hashes_flat(texts)
    t_off = np.zeros(n + 1, np.int64)
    np.cumsum(t_counts, out=t_off[1:])
    n_toks, _, t_mx = _run_stats(t_flat, t_off)

    dup_ppm = np.floor(n_dup * 1e6 / np.maximum(n_grams, 1)).astype(np.int64)
    top_ppm = np.floor(t_mx * 1e6 / np.maximum(n_toks, 1)).astype(np.int64)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_dup_grams": pa.array(n_dup, pa.int64()),
            "dup_gram_ppm": pa.array(dup_ppm, pa.int64()),
            "top_token_ppm": pa.array(top_ppm, pa.int64()),
        }
    )


def rolling_fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 16
) -> pa.Table:
    """Min-hash document fingerprint: the minimum of the mixed 1-gram token
    hashes — robust to small edits anywhere in the doc (unchanged iff the
    minimising token survives).  Equivalent to the min over rolling-window
    minima for ANY window size (every element lies in some window), so the
    windowed formulation reduces to one ``np.minimum.reduceat`` per batch;
    ``window`` is kept for API compatibility.  SQL-checked
    (sql_oracle.doc_fingerprints_sql)."""
    from ..hashing import shingle_hashes

    flat, offsets = shingle_hashes(batch[text_col].to_pylist(), 1)
    mixed = splitmix64(flat)
    counts = np.diff(offsets)
    out = np.zeros(len(batch), dtype=np.uint64)
    nz = counts > 0
    if mixed.size:
        out[nz] = np.minimum.reduceat(mixed, offsets[:-1][nz])
    return batch.append_column("doc_fingerprint", pa.array(out, pa.uint64()))


def corpus_token_count_quantile(ds, q: float, text_col: str = "text") -> float:
    """EXACT global q-quantile of per-doc whitespace token counts, computed
    without a sort or shuffle: token counts are small integers, so each batch
    reduces to a bincount histogram partial (hundreds of bytes), the driver
    sums the tiny partials, and the quantile is read off the exact CDF with
    SQL ``quantile_cont`` linear interpolation.  One streaming pass over the
    corpus, O(max_tokens) driver state — the scale-correct way to get an
    exact percentile of a discrete statistic at 100 TB."""
    hist_schema = pa.schema([("n_tokens", pa.int64()), ("cnt", pa.int64())])

    def hist_batch(b: pa.Table) -> pa.Table:
        t = token_count_batch(b.select([text_col]), text_col)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        cnt = np.bincount(n)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"n_tokens": pa.array(nz, pa.int64()), "cnt": pa.array(cnt[nz], pa.int64())}
        )

    parts = ds.map_batches(hist_batch, batch_format="pyarrow").take_all()
    if not parts:
        return 0.0
    hi = max(int(r["n_tokens"]) for r in parts)
    hist = np.zeros(hi + 1, np.int64)
    for r in parts:
        hist[int(r["n_tokens"])] += int(r["cnt"])
    total = int(hist.sum())
    if total == 0:
        return 0.0
    # quantile_cont: value at fractional rank (n-1)*q of the sorted sequence
    rank = (total - 1) * q
    lo_i, hi_i = int(np.floor(rank)), int(np.ceil(rank))
    cdf = np.cumsum(hist)
    lo_v = int(np.searchsorted(cdf, lo_i + 1))
    hi_v = int(np.searchsorted(cdf, hi_i + 1))
    return float(lo_v + (rank - lo_i) * (hi_v - lo_v))


def quality_quantile_filter(ds, q: float = 0.25, text_col: str = "text"):
    """Percentile-gated quality filter: drop docs whose token count falls
    below the exact corpus q-quantile.  Pass 1 computes the global threshold
    from histogram partials (see :func:`corpus_token_count_quantile`);
    pass 2 is a stateless broadcast-scalar filter — no shuffle anywhere."""
    thresh = corpus_token_count_quantile(ds, q, text_col)

    def keep(b: pa.Table) -> pa.Table:
        t = token_count_batch(b, text_col)
        return b.filter(pc.greater_equal(t["n_tokens"], pa.scalar(thresh, pa.float64())))

    return ds.map_batches(keep, batch_format="pyarrow")


def assign_splits(
    ds,
    fractions: dict[str, float] | None = None,
    by: str = "text",
    seed: int = 0x5917,
):
    """Leakage-safe deterministic train/val/test split: the split key is a
    hash of the CONTENT column (not the row id), so byte-identical documents
    always land in the same split — an exact duplicate can never leak from
    train into eval.  Pure map stage (no shuffle, no state); fractions are
    hit in expectation with binomial concentration (exact at 100 TB for any
    practical tolerance).

    Returns ``ds`` with an added ``split`` string column.  For near-dup
    leakage control, dedupe first (the engine's dedupe family) or split by a
    cluster representative column instead of raw text."""
    import functools

    from ..hashing import content_keys

    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    names = list(fractions)
    tot = sum(fractions.values())
    if not 0.999 <= tot <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {tot}")
    bounds = np.cumsum([fractions[n] for n in names])
    # map [0, 2^64) hash space onto the cumulative fraction boundaries
    edges = (bounds * float(2**64)).astype(np.float64)

    def tag(b: pa.Table, names, edges, seed) -> pa.Table:
        h = content_keys(b[by], seed)
        idx = np.searchsorted(edges, h.astype(np.float64), side="right")
        idx = np.minimum(idx, len(names) - 1)
        lab = pa.DictionaryArray.from_arrays(
            pa.array(idx.astype(np.int32)), pa.array(names, pa.string())
        )
        return b.append_column("split", pc.cast(lab, pa.string()))

    return ds.map_batches(
        functools.partial(tag, names=names, edges=edges, seed=seed),
        batch_format="pyarrow",
    )
