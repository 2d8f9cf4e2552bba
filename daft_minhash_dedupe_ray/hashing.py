"""Deterministic, vectorised hashing kernels (numpy; no native deps).

All identifiers in the engine are content-derived (``node_id = hash64(image_id)``)
instead of the reference's nondeterministic ``monotonically_increasing_id()``
(``workload/minhash_dedupe.py:244``) — the reference author flags that as a defect
("my id's couldn't be deterministically generated across sessions",
``FRICTION_LOG.md:89``); determinism is what makes checkpoint-resume coherent.

The MinHash math follows the reference's explicit Spark ancestor
(``references/chengmao_minhash_spark.py:171-226``): shingle hashes are 32-bit,
permuted with ``(a*h + b) mod MOD_PRIME & MAX_HASH`` where ``a, b`` come from a
seeded RNG, min-reduced per document.  Bit-identity with Daft's Rust xxhash
kernel is not required (acceptance is cluster recall vs an exact Jaccard
oracle, see BASELINE.md); the string hash here is blake2b-based (stdlib) with a
splitmix64 finaliser for the vectorised combines.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np

from .config import MAX_HASH, MOD_PRIME

# splitmix64 constants (public domain, Steele et al. / xorshift family)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)
_POLY_P = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier for polynomial combines

_U64 = np.uint64


def hash64_bytes(data: bytes) -> int:
    """Stable 64-bit hash of bytes (blake2b-8)."""
    return int.from_bytes(blake2b(data, digest_size=8).digest(), "little")


def hash64_str(s: str) -> int:
    return hash64_bytes(s.encode("utf-8", "surrogatepass"))


def hash64_str_array(strings) -> np.ndarray:
    """Vector of stable 64-bit hashes for an iterable of str/None."""
    out = np.empty(len(strings), dtype=np.uint64)
    cache: dict[str, int] = {}
    for i, s in enumerate(strings):
        if s is None:
            out[i] = 0
        else:
            h = cache.get(s)
            if h is None:
                h = hash64_bytes(s.encode("utf-8", "surrogatepass"))
                cache[s] = h
            out[i] = h
    return out


def id_hash64_str_array(strings) -> np.ndarray:
    """Vector of surrogate-NODE-ID hashes for short id strings:
    ``splitmix64(byte_poly(utf8_bytes))`` — the same byte-polynomial fold the
    token hasher uses, so it is both fully vectorised (one masked pass per
    byte position; id strings are ~12 bytes) and SQL-expressible
    (``sql_oracle.poly_fold_expr`` + ``sm64_steps`` reproduce it in DuckDB,
    which is what lets survivor-set oracles rank cluster members by node id).
    ASCII ids only (the SQL side folds code points); ``None`` -> 0.

    Content/equality hashing stays on ``hash64_str_array`` (blake2b): for
    kilobyte texts the per-byte masked fold loses to blake2b's C core ~100x,
    and equality semantics don't need SQL-rankable values.
    """
    import pyarrow as pa

    if isinstance(strings, (pa.Array, pa.ChunkedArray)):
        arr = strings
    else:
        arr = pa.array(
            [s if isinstance(s, str) else None for s in strings], pa.string()
        )
    h, _L, arr = _byte_poly_fold(arr)
    out = splitmix64(h)
    if arr is not None and arr.null_count:
        out[np.asarray(arr.is_null())] = 0
    return out


def _byte_poly_fold(arr):
    """Shared masked byte-polynomial fold over an Arrow string/binary
    value buffer (one numpy pass per byte POSITION).  Returns
    ``(fold_state, lengths, combined_array)`` so callers apply their own
    finaliser (plain splitmix64 for node-id hashing; length-mixed for
    partition-key hashing) and null-zeroing.  ``combined_array`` is None
    when the input is empty."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        z = np.zeros(0, dtype=np.uint64)
        return z, np.zeros(0, dtype=np.int64), None
    t = arr.type
    if pa.types.is_large_string(t):
        arr = arr.cast(pa.string())
    elif pa.types.is_large_binary(t):
        arr = arr.cast(pa.binary())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.zeros(0, np.uint8)
    )
    starts, L = offs[:-1], np.diff(offs)
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(int(L.max())):
            m = L > j
            h[m] = h[m] * _POLY_P + data[starts[m] + j]
    return h, L, arr


def id_hash64_str(s: str) -> int:
    """Scalar form of ``id_hash64_str_array``."""
    return int(id_hash64_str_array([s])[0])


def poly_hash64_array(arr) -> np.ndarray:
    """Vectorised stable 64-bit hash of an Arrow string/binary array — the
    masked byte-polynomial fold over the value buffer (one numpy pass per
    byte POSITION, no per-value Python), length mixed in so nested-prefix
    values don't share a fold state.  ``None`` -> 0.  Built for partition-key
    hashing (`stages/util._hash_key_col`): cost scales with the LONGEST
    value, so callers with kilobyte values should pre-hash upstream
    (blake2b's C core wins ~100x there — see ``id_hash64_str_array``)."""
    h, L, arr = _byte_poly_fold(arr)
    if arr is None:
        return h
    with np.errstate(over="ignore"):
        out = splitmix64(h ^ (L.astype(np.uint64) * _POLY_P))
    if arr.null_count:
        out[np.asarray(arr.is_null())] = 0
    return out


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorised splitmix64 finaliser — good avalanche, uint64 in/out."""
    z = (x + _SM_GAMMA).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * _SM_M1
    z = (z ^ (z >> np.uint64(27))) * _SM_M2
    return z ^ (z >> np.uint64(31))


def hash64_int_pairs(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Stable 64-bit hash of int64/uint64 pairs (edge fingerprints)."""
    return splitmix64(splitmix64(u.astype(np.uint64)) ^ (v.astype(np.uint64) * _POLY_P))


def make_permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded universal-hash coefficients, exactly the Spark ancestor's scheme
    (``references/chengmao_minhash_spark.py:408-412``): ``a, b`` uniform under
    ``MOD_PRIME`` from a seeded RNG, applied as ``(a*h + b) mod MOD_PRIME``.

    (A multiply-shift ``(a*h + b) >> 32`` variant was measured ~1.7x faster
    but produced measurably worse min-wise behaviour — dup-pair recall at the
    64-perm/8-band config dropped from 1.0 to 0.96 on the synthetic oracle —
    so the prime-modulus family stays.)"""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MOD_PRIME, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, MOD_PRIME, size=num_perm, dtype=np.uint64)
    return a, b


def _poly_fold_windows(windows: np.ndarray) -> np.ndarray:
    """Polynomial fold of each row of a (n, k) uint64 matrix into one uint64."""
    h = np.zeros(len(windows), dtype=np.uint64)
    for j in range(windows.shape[1]):
        h = h * _POLY_P + windows[:, j]
    return splitmix64(h)


def token_hashes_flat(texts) -> tuple[np.ndarray, np.ndarray]:
    """(flat 64-bit token hashes in doc order, tokens per doc) — fully
    vectorised: Arrow unicode-whitespace split (``str.split()`` semantics:
    empty tokens dropped, None -> no tokens), then a masked byte-level
    polynomial hash over the flattened token buffer — no per-token Python.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = texts
    else:
        arr = pa.array([t if isinstance(t, str) else None for t in texts], pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_docs = len(arr)
    splits = pc.utf8_split_whitespace(arr)
    lens = pc.fill_null(pc.list_value_length(splits), 0).to_numpy(zero_copy_only=False)
    lens = lens.astype(np.int64)
    flat_all = pc.list_flatten(splits)
    if isinstance(flat_all, pa.ChunkedArray):
        flat_all = flat_all.combine_chunks()
    n_tok_all = len(flat_all)
    if n_tok_all == 0:
        return np.zeros(0, np.uint64), np.zeros(n_docs, np.int64)
    offs = np.frombuffer(flat_all.buffers()[1], dtype=np.int32)[
        flat_all.offset : flat_all.offset + n_tok_all + 1
    ].astype(np.int64)
    data_buf = flat_all.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.zeros(0, np.uint8)
    )
    starts, L = offs[:-1], np.diff(offs)
    nonempty = L > 0
    row_id = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    counts = np.bincount(row_id[nonempty], minlength=n_docs).astype(np.int64)
    starts, L = starts[nonempty], L[nonempty]
    h = np.zeros(len(starts), dtype=np.uint64)
    for j in range(int(L.max()) if len(L) else 0):
        m = L > j
        h[m] = h[m] * _POLY_P + data[starts[m] + j]
    return splitmix64(h), counts


def shingle_hashes(
    texts, ngram_size: int, min_length: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Word-``ngram_size``-gram shingle hashes for a batch of documents.

    Tokenisation is whitespace ``str.split()`` over the (already normalised)
    text — the reference shingles *word* n-grams ("hashed each word token",
    workload notebook cell 27).  Documents with fewer than ``ngram_size`` but at
    least one token yield a single whole-document shingle
    (``references/chengmao_minhash_spark.py:95-100``); documents below
    ``min_length`` tokens (or with zero tokens) yield none.

    Returns ``(flat_hashes_uint32_in_uint64, offsets)`` where document ``i``'s
    shingle hashes are ``flat[offsets[i]:offsets[i+1]]``.  Shingle hashes are
    32-bit values stored in uint64 (ready for the permutation product).
    Fully vectorised end to end (tokenise, hash, window, fold).
    """
    tok_h, counts = token_hashes_flat(texts)
    n_docs = len(counts)
    eligible = counts >= max(min_length, 1)
    is_short = eligible & (counts < ngram_size)
    is_long = eligible & (counts >= ngram_size)
    sh_counts = np.where(is_short, 1, np.where(is_long, counts - ngram_size + 1, 0))
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(sh_counts, out=offsets[1:])
    flat = np.zeros(int(offsets[-1]), dtype=np.uint64)
    tok_starts = np.zeros(n_docs, dtype=np.int64)
    if n_docs > 1:
        np.cumsum(counts[:-1], out=tok_starts[1:])

    # long docs: window folds computed as ngram_size CONTIGUOUS shifted
    # passes over the flat token-hash array (fold(i) = sum_j P^(k-1-j) *
    # tok[i+j] mod 2^64) followed by one gather at the per-doc window starts
    # — no strided sliding-window fancy-indexing (scattered gathers cost
    # 100-200ns/element on this box)
    if is_long.any():
        n_sh = counts[is_long] - ngram_size + 1
        w_starts = np.repeat(tok_starts[is_long], n_sh) + _segment_aranges(n_sh)
        n_win = len(tok_h) - ngram_size + 1
        acc = np.zeros(n_win, dtype=np.uint64)
        p_pow = _U64(1)
        with np.errstate(over="ignore"):  # u64 wraparound is the hash semantics
            for j in range(ngram_size - 1, -1, -1):
                acc += tok_h[j : j + n_win] * p_pow
                p_pow = p_pow * _POLY_P
        folded = splitmix64(acc[w_starts]) & _U64(MAX_HASH)
        out_pos = np.repeat(offsets[:-1][is_long], n_sh) + _segment_aranges(n_sh)
        flat[out_pos] = folded
    # short docs: one whole-document fold each (masked variable-length fold)
    if is_short.any():
        ss, sl = tok_starts[is_short], counts[is_short]
        h = np.zeros(len(ss), dtype=np.uint64)
        for j in range(int(sl.max())):
            m = sl > j
            h[m] = h[m] * _POLY_P + tok_h[ss[m] + j]
        flat[offsets[:-1][is_short]] = splitmix64(h) & _U64(MAX_HASH)
    return flat, offsets


def _segment_aranges(lengths: np.ndarray) -> np.ndarray:
    """Concatenated ``arange(l)`` for each l in lengths, vectorised."""
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(lengths)
    out = np.arange(total, dtype=np.int64)
    resets = np.zeros(total, dtype=np.int64)
    resets[ends[:-1]] = lengths[:-1]
    return out - np.cumsum(resets)


def content_keys(texts, seed: int = 0) -> np.ndarray:
    """Order-sensitive 64-bit content key per document, fully vectorised and
    SQL-expressible (``sql_oracle.split_docs_sql``)::

        key = splitmix64(seed ^ (sum_i splitmix64(tok_hash_i ^ i) mod 2**64))

    where ``tok_hash_i`` are ``token_hashes_flat`` values and ``i`` the
    0-based token position.  Identical texts always collide (the property
    leakage-safe splitting needs); tokenisation follows ``str.split()``
    semantics, so keys are whitespace-normalised.  Empty/None docs key to
    ``splitmix64(seed)``.  Replaces the per-row blake2b loop that predated
    it (not vectorisable, not SQL-checkable)."""
    flat, counts = token_hashes_flat(texts)
    nz = counts > 0
    idx = _segment_aranges(counts[nz])  # zero-length segments break aranges
    with np.errstate(over="ignore"):
        mixed = splitmix64(flat ^ idx.astype(np.uint64))
        sums = np.zeros(len(counts), dtype=np.uint64)
        if mixed.size:
            starts = np.concatenate(([0], np.cumsum(counts[nz])[:-1]))
            sums[nz] = np.add.reduceat(mixed, starts)
        return splitmix64(sums ^ np.uint64(seed))


def minhash_signatures(
    flat_shingles: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    chunk_shingles: int = 1024,  # keeps the (chunk x num_perm) u64 temporaries L2-resident
    # even with neighbours on the socket: measured 1p 12 vs 9 iters/6s against
    # chunk=2048 AND 1->4-process efficiency 0.96-1.08 vs 0.94 (the shared-L3
    # footprint is what a single-process sweep can't see — 2048 was tuned
    # single-process in round 1)
) -> tuple[np.ndarray, np.ndarray]:
    """MinHash signatures from flattened shingle hashes.

    Returns ``(sig, has_sig)`` where ``sig`` is (n_docs, num_perm) uint64 (values
    <= MAX_HASH) and ``has_sig`` marks documents with >= 1 shingle.  Documents
    without shingles get all-MAX_HASH sentinel rows but ``has_sig=False`` — the
    pipeline emits no band keys for them, so empty/short documents never
    spuriously cluster (divergence from the Spark ancestor's MAX_HASH pad,
    ``references/chengmao_minhash_spark.py:224``, which would cluster all empty
    docs together; see FIXTURES.md "empty/short captions").
    """
    n_docs = len(offsets) - 1
    num_perm = len(a)
    sig = np.full((n_docs, num_perm), MAX_HASH, dtype=np.uint32)
    counts = np.diff(offsets)
    has_sig = counts > 0
    nz = np.flatnonzero(has_sig)
    if len(nz) == 0:
        return sig, has_sig
    for doc_pos, doc_end, mins in _chunked_minhash(
        flat_shingles, offsets, nz, a, b, chunk_shingles
    ):
        sig[nz[doc_pos:doc_end]] = mins
    return sig, has_sig


def _chunked_minhash(flat_shingles, offsets, nz, a, b, chunk_shingles):
    """Shared chunk loop: yields ``(doc_pos, doc_end, mins)`` where ``mins``
    is the (doc_end-doc_pos, num_perm) uint32 signature block for
    ``nz[doc_pos:doc_end]``.  The permutation product buffer is allocated
    ONCE and reused across chunks (in-place multiply/add/mod) — the
    allocate-per-chunk version paid ~2x in allocator + page traffic on the
    microbench and keeps the working set genuinely L2-resident under
    multi-process concurrency."""
    num_perm = len(a)
    buf = np.empty((chunk_shingles, num_perm), dtype=np.uint64)
    aT, bT = a[None, :], b[None, :]
    mod = _U64(MOD_PRIME)
    u32_off = 0 if np.little_endian else 1
    doc_pos = 0
    while doc_pos < len(nz):
        doc_end = doc_pos
        start = int(offsets[nz[doc_pos]])
        while doc_end < len(nz) and int(offsets[nz[doc_end] + 1]) - start <= chunk_shingles:
            doc_end += 1
        if doc_end == doc_pos:  # single huge doc
            doc_end = doc_pos + 1
        end = int(offsets[nz[doc_end - 1] + 1])
        h = flat_shingles[start:end]
        m = len(h)
        # (a*h + b) mod p — h, a < 2^32 so the uint64 product never wraps;
        # reduced values < 2^32, so the little-endian low words ARE the u32
        # matrix: a strided view instead of an astype copy (astype is ~14ns/
        # element on this box).  (A float-division Barrett-style fold was
        # tried and measured 40x SLOWER than numpy's u64 % here; a 2^32-5
        # shift-add fold likewise lost to the in-place %.)
        prod = buf[:m] if m <= chunk_shingles else np.empty((m, num_perm), np.uint64)
        np.multiply(h[:, None], aT, out=prod)
        np.add(prod, bT, out=prod)
        np.mod(prod, mod, out=prod)
        ph = prod.view(np.uint32)[:, u32_off::2]
        seg_offsets = (offsets[nz[doc_pos:doc_end]] - start).astype(np.int64)
        yield doc_pos, doc_end, np.minimum.reduceat(ph, seg_offsets, axis=0)
        doc_pos = doc_end


def minhash_band_keys(
    flat_shingles: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    bands: int,
    rows: int,
    chunk_shingles: int = 1024,
) -> tuple[np.ndarray, np.ndarray]:
    """Fused minhash + LSH banding: ``band_keys(minhash_signatures(...)[0]
    [has_sig], bands, rows)`` WITHOUT materializing the (n_docs, num_perm)
    signature matrix (VERDICT r4 item 3).  The band fold runs per chunk on
    the L2-resident min block, so per batch the DRAM traffic drops from
    sig-write + sig-read + u64-astype (~64 MB at 32k docs x 128 perms) to
    just the (m, bands) key matrix (~4 MB).  Bit-identical to the unfused
    pair by construction (same math on the same values; pinned by test).

    Returns ``(keys, has_sig)`` where ``keys`` is (sum(has_sig), bands)
    uint64 in document order of the has_sig subset.
    """
    n_docs = len(offsets) - 1
    counts = np.diff(offsets)
    has_sig = counts > 0
    nz = np.flatnonzero(has_sig)
    keys = np.empty((len(nz), bands), dtype=np.uint64)
    if len(nz) == 0:
        return keys, has_sig
    seeds = np.arange(bands, dtype=np.uint64) * _SM_GAMMA + _KIND_CAPTION
    for doc_pos, doc_end, mins in _chunked_minhash(
        flat_shingles, offsets, nz, a, b, chunk_shingles
    ):
        d = doc_end - doc_pos
        arr = mins[:, : bands * rows].reshape(d, bands, rows)
        h = np.broadcast_to(seeds, (d, bands)).copy()
        for j in range(rows):
            h = h * _POLY_P + arr[:, :, j]  # u32 slice upcasts; values == band_keys'
        keys[doc_pos:doc_end] = splitmix64(h)
    return keys, has_sig


# distinct mixing constants so caption LSH bands, pHash sub-bands and salt
# chains can never collide in the single shared `band_key` column
_KIND_CAPTION = np.uint64(0x5CA1AB1EC0FFEE01)
_KIND_PHASH = np.uint64(0x9AD50F0C0C0A0001)


def band_keys(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """LSH band keys from a (n_docs, bands*rows) signature matrix.

    Returns (n_docs, bands) uint64 where key[i, b] is a 64-bit hash of
    ``(b, sig[i, b*rows:(b+1)*rows])``.  The reference groups on the exact
    band value list (``workload/minhash_dedupe.py:249-262``); Ray Data groupby
    needs a scalar key, so we hash the R-tuple — the Spark ancestor's
    ``tobytes()`` (``references/chengmao_minhash_spark.py:226``) does the same
    thing.  64-bit collisions (~2^-64 per pair) only add candidate edges.
    """
    n = len(sig)
    sig64 = sig.astype(np.uint64) if sig.dtype != np.uint64 else sig
    # optimal_param may pick bands*rows < num_perm; trailing perms are unused
    arr = sig64[:, : bands * rows].reshape(n, bands, rows)
    # fold all bands at once: rows iterations over (n, bands) slices instead
    # of bands*rows per-column passes
    seeds = np.arange(bands, dtype=np.uint64) * _SM_GAMMA + _KIND_CAPTION
    h = np.broadcast_to(seeds, (n, bands)).copy()
    for j in range(rows):
        h = h * _POLY_P + arr[:, :, j]
    return splitmix64(h)


def phash_band_keys(phash: np.ndarray, n_bands: int) -> np.ndarray:
    """pHash Hamming-bucket keys: split each 64-bit phash into ``n_bands``
    sub-bands; rows sharing any sub-band value are candidates.  By pigeonhole
    this recalls every pair within Hamming distance < n_bands (SURVEY.md §2.C4).

    Returns (n, n_bands) uint64 keys, mixed so they never collide with caption
    band keys.
    """
    ph = phash.astype(np.int64).view(np.uint64)
    width = 64 // n_bands
    mask = _U64((1 << width) - 1) if width < 64 else _U64(0xFFFFFFFFFFFFFFFF)
    out = np.empty((len(ph), n_bands), dtype=np.uint64)
    for b in range(n_bands):
        sub = (ph >> _U64(b * width)) & mask
        seed = (b * int(_SM_GAMMA) + int(_KIND_PHASH)) & 0xFFFFFFFFFFFFFFFF
        out[:, b] = splitmix64(sub * _POLY_P + _U64(seed))
    return out


def phash_subset_keys(phash: np.ndarray, n_chunks: int, max_hamming: int) -> np.ndarray:
    """Multi-index Hamming keys (Norouzi et al., "Fast Search in Hamming
    Space with Multi-Index Hashing"): split the 64-bit phash into
    ``n_chunks`` chunks; a pair within Hamming distance ``max_hamming``
    differs in at most ``max_hamming`` chunks, so at least
    ``n_chunks - max_hamming`` chunks are EQUAL — keying every
    (n_chunks - max_hamming)-subset of chunks guarantees one shared key
    (exact pigeonhole recall, like the contiguous sub-band scheme, but
    with ``(n_chunks - max_hamming) * chunk_width``-bit buckets instead of
    ``64 / bands``-bit ones).

    Why it exists (round-5 64M-row stress): the legacy 4 x 16-bit sub-band
    buckets hold ``corpus / 2^16`` distinct payloads each, so the exact
    pairwise verify inside a bucket grows QUADRATICALLY with corpus size
    (10.8k reduce core-seconds at 64M rows).  With n_chunks=5 /
    max_hamming=3 the keys are ~26-bit 2-chunk subsets (C(5,2)=10 keys per
    row) and buckets stay O(corpus / 2^26); size ``n_chunks`` so that
    ``(n_chunks - max_hamming) * (64 / n_chunks) >~ log2(corpus)`` — e.g.
    8 chunks (5-of-8, 40-bit keys, 56 keys/row) at 10^12 images.

    Because every candidate pair is exactly Hamming-verified downstream,
    ANY keying scheme with the pigeonhole guarantee yields the IDENTICAL
    final edge set — switching schemes provably cannot change clusters
    (pinned by test against the legacy scheme).

    Returns (n, C(n_chunks, n_chunks - max_hamming)) uint64, mixed to never
    collide with caption band keys.
    """
    import itertools

    ph = phash.astype(np.int64).view(np.uint64)
    k = n_chunks - max_hamming
    if k < 1:
        raise ValueError(
            f"n_chunks={n_chunks} must exceed max_hamming={max_hamming} "
            "(pigeonhole needs at least one guaranteed-equal chunk subset)"
        )
    base, rem = divmod(64, n_chunks)
    widths = [base + (1 if i < rem else 0) for i in range(n_chunks)]
    shifts = np.cumsum([0] + widths[:-1])
    chunks = [
        (ph >> _U64(int(s))) & _U64((1 << w) - 1) for s, w in zip(shifts, widths)
    ]
    combos = list(itertools.combinations(range(n_chunks), k))
    out = np.empty((len(ph), len(combos)), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for ci, combo in enumerate(combos):
            h = np.full(
                len(ph),
                (_U64(ci + 1) * _SM_GAMMA + _KIND_PHASH),
                dtype=np.uint64,
            )
            for i in combo:
                h = h * _POLY_P + chunks[i]
            out[:, ci] = splitmix64(h)
    return out


def simhash64(texts, ngram_size: int = 1) -> np.ndarray:
    """64-bit SimHash per document over word n-gram shingles (Charikar 2002):
    sum ±1 per bit position across shingle hashes, sign → bit."""
    flat, offsets = shingle_hashes(texts, ngram_size)
    # widen shingle hashes back to 64-bit spread before taking bits
    wide = splitmix64(flat)
    bits = ((wide[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & _U64(1)).astype(np.int32)
    contrib = bits * 2 - 1  # ±1
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    counts = np.diff(offsets)
    nz = np.flatnonzero(counts > 0)
    if len(nz):
        sums = np.add.reduceat(contrib, offsets[nz].astype(np.int64), axis=0)
        sig_bits = (sums > 0).astype(np.uint64)
        out[nz] = (sig_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    return out


_SWAR_M1 = np.uint64(0x5555555555555555)
_SWAR_M2 = np.uint64(0x3333333333333333)
_SWAR_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_SWAR_H01 = np.uint64(0x0101010101010101)


def _popcount64_consume(x: np.ndarray) -> np.ndarray:
    """SWAR popcount over a uint64 array the CALLER owns — mutates ``x``."""
    with np.errstate(over="ignore"):  # the *0x0101.. fold wraps by design
        x -= (x >> np.uint64(1)) & _SWAR_M1
        x = (x & _SWAR_M2) + ((x >> np.uint64(2)) & _SWAR_M2)
        x = (x + (x >> np.uint64(4))) & _SWAR_M4
        return ((x * _SWAR_H01) >> np.uint64(56)).astype(np.int64)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorised SWAR popcount (Hacker's Delight 5-2) — pure streaming
    arithmetic.  Replaced the 8-pass 256-entry table-gather version: the
    per-element indirect loads made the reduce-side pHash Hamming verify the
    single hottest kernel in the 16M-row ingest (2019 of ~2200 reduce
    core-seconds); SWAR is gather-free and ~8x faster there."""
    return _popcount64_consume(x.astype(np.uint64, copy=True))


def hamming_distance64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorised popcount of xor for uint64 arrays (int64 inputs wrap to
    the same bit pattern).  ``asarray`` avoids copying already-uint64
    inputs; the xor result is fresh, so the SWAR fold consumes it in
    place — no redundant temporaries on this hot kernel."""
    return _popcount64_consume(
        np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)
    )
