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
    """
    tok_hashes: list[np.ndarray] = []
    long_docs: list[int] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    cache: dict[str, int] = {}
    short_docs: list[tuple[int, np.ndarray]] = []  # (doc_idx, token hashes)
    for i, t in enumerate(texts):
        toks = t.split() if isinstance(t, str) else []
        n = len(toks)
        if n == 0 or n < max(min_length, 1):
            continue
        h = np.empty(n, dtype=np.uint64)
        for j, tok in enumerate(toks):
            v = cache.get(tok)
            if v is None:
                v = hash64_bytes(tok.encode("utf-8", "surrogatepass"))
                cache[tok] = v
            h[j] = v
        if n < ngram_size:
            short_docs.append((i, h))
            counts[i] = 1
        else:
            tok_hashes.append(h)
            long_docs.append(i)
            counts[i] = n - ngram_size + 1
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat = np.zeros(int(offsets[-1]), dtype=np.uint64)

    # long docs: vectorised sliding windows over one concatenated token array
    if tok_hashes:
        cat = np.concatenate(tok_hashes)
        doc_lens = np.array([len(h) for h in tok_hashes], dtype=np.int64)
        doc_starts = np.zeros(len(doc_lens), dtype=np.int64)
        np.cumsum(doc_lens[:-1], out=doc_starts[1:])
        n_sh = doc_lens - ngram_size + 1
        # valid window start positions in `cat` (windows never cross doc bounds)
        starts = np.repeat(doc_starts, n_sh) + _segment_aranges(n_sh)
        win = np.lib.stride_tricks.sliding_window_view(cat, ngram_size)[starts]
        folded = _poly_fold_windows(win) & _U64(MAX_HASH)
        pos = 0
        for i in long_docs:
            c = int(counts[i])
            flat[offsets[i] : offsets[i] + c] = folded[pos : pos + c]
            pos += c
    for i, h in short_docs:
        flat[offsets[i]] = int(_poly_fold_windows(h[None, :])[0]) & MAX_HASH
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


def minhash_signatures(
    flat_shingles: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    chunk_shingles: int = 2048,  # keeps the (chunk x num_perm) uint32 matrix in L2 — ~7x faster than 128k
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
    # process contiguous runs of shingles in chunks aligned to doc boundaries
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
        # (a*h + b) mod p — h, a < 2^32 so the uint64 product never wraps;
        # stored uint32 to halve reduceat memory bandwidth
        ph = ((h[:, None] * a[None, :] + b[None, :]) % _U64(MOD_PRIME)).astype(np.uint32)
        seg_offsets = (offsets[nz[doc_pos:doc_end]] - start).astype(np.int64)
        mins = np.minimum.reduceat(ph, seg_offsets, axis=0)
        sig[nz[doc_pos:doc_end]] = mins
        doc_pos = doc_end
    return sig, has_sig


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
    out = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        sl = sig64[:, b * rows : (b + 1) * rows]
        seed = (b * int(_SM_GAMMA) + int(_KIND_CAPTION)) & 0xFFFFFFFFFFFFFFFF
        h = np.full(n, seed, dtype=np.uint64)
        for j in range(rows):
            h = h * _POLY_P + sl[:, j]
        out[:, b] = splitmix64(h)
    return out


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


def hamming_distance64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorised popcount of xor for uint64 arrays."""
    x = a.astype(np.uint64) ^ b.astype(np.uint64)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for shift in range(0, 64, 8):
        cnt += _POPCNT8[(x >> _U64(shift)) & _U64(0xFF)]
    return cnt


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)
