"""Hashing / MinHash / banding kernel properties.

Mirrors the reference's minhash + banding properties
(tests/test_minhash_dedupe_unit.py:219-271): signature length == num_perm,
identical text -> identical signature (colliding in all B bands), banding
row-count bounds; plus the pHash pigeonhole property (SURVEY.md §2.C4).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from daft_minhash_dedupe_ray import hashing as H
from daft_minhash_dedupe_ray.config import MAX_HASH


def _sigs(texts, num_perm=64, ngram=5, seed=42):
    flat, off = H.shingle_hashes(texts, ngram)
    a, b = H.make_permutations(num_perm, seed)
    return H.minhash_signatures(flat, off, a, b)


@given(
    st.lists(st.text(alphabet="abcdef ", min_size=10, max_size=120), min_size=1, max_size=8),
    st.integers(16, 64),
    st.integers(3, 7),
    st.integers(1, 1000),
)
@settings(max_examples=40, deadline=None)
def test_signature_shape_and_determinism(texts, num_perm, ngram, seed):
    flat, off = H.shingle_hashes(texts, ngram)
    a, b = H.make_permutations(num_perm, seed)
    sig1, has1 = H.minhash_signatures(flat, off, a, b)
    sig2, has2 = H.minhash_signatures(flat, off, a, b)
    assert sig1.shape == (len(texts), num_perm)
    assert (sig1 == sig2).all() and (has1 == has2).all()
    assert (sig1 <= MAX_HASH).all()


def test_identical_text_identical_signature_all_bands():
    sig, has = _sigs(["a b c d e f g h", "a b c d e f g h", "z y x w v u t s"])
    assert has.all()
    assert (sig[0] == sig[1]).all()
    bk = H.band_keys(sig, 8, 8)
    assert (bk[0] == bk[1]).all()  # collide in every band
    assert (bk[0] != bk[2]).any()


def test_empty_and_short_docs():
    sig, has = _sigs(["", "a", "a b c", None])
    assert not has[0] and not has[3]
    assert has[1] and has[2]  # short docs get a single whole-doc shingle
    # distinct short docs should (overwhelmingly) differ
    assert (sig[1] != sig[2]).any()
    # empty docs carry the sentinel signature
    assert (sig[0] == MAX_HASH).all()


def test_shingle_count_matches_definition():
    flat, off = H.shingle_hashes(["w1 w2 w3 w4 w5 w6 w7"], 5)
    assert off[1] - off[0] == 3  # 7 - 5 + 1


def test_band_keys_distinct_across_bands():
    sig = np.zeros((1, 64), dtype=np.uint64)  # identical values in every band
    bk = H.band_keys(sig, 8, 8)
    assert len(np.unique(bk)) == 8  # band index is mixed into the key


def test_phash_pigeonhole():
    # any pair within Hamming distance < n_bands shares at least one sub-band
    rng = np.random.RandomState(0)
    base = rng.randint(-(2**62), 2**62, 100).astype(np.int64)
    for flips in (1, 2, 3):
        flipped = base.copy()
        for i in range(len(base)):
            pos = rng.choice(64, flips, replace=False)
            x = np.uint64(flipped[i].astype(np.uint64) if hasattr(flipped[i], 'astype') else np.uint64(flipped[i]))
            for p in pos:
                x = x ^ np.uint64(1 << int(p))
            flipped[i] = np.int64(x)
        k1 = H.phash_band_keys(base, 4)
        k2 = H.phash_band_keys(flipped, 4)
        assert ((k1 == k2).sum(axis=1) >= 1).all()


def test_hamming_distance():
    a = np.array([0b1011, 0], dtype=np.uint64)
    b = np.array([0b0010, np.iinfo(np.uint64).max], dtype=np.uint64)
    assert H.hamming_distance64(a, b).tolist() == [2, 64]


def test_simhash_similar_texts_close():
    t1 = "the quick brown fox jumps over the lazy dog " * 3
    t2 = t1 + "extra"
    t3 = "completely different words entirely unrelated content here now"
    s = H.simhash64([t1, t2, t3])
    d12 = H.hamming_distance64(s[:1], s[1:2])[0]
    d13 = H.hamming_distance64(s[:1], s[2:3])[0]
    assert d12 < d13


def test_hash64_stability():
    # pinned so any accidental change to the hash breaks loudly (determinism
    # across sessions is a core requirement — FRICTION_LOG.md:89)
    assert H.hash64_str("img-00000000") == H.hash64_str("img-00000000")
    a = H.hash64_str_array(["x", "y", "x", None])
    assert a[0] == a[2] and a[0] != a[1] and a[3] == 0


def test_poly_hash64_array_semantics():
    """Vectorised key hash (round-3 verdict item 4): null -> 0, distinct
    values -> distinct hashes (w.h.p.), equal across chunking/offsets and
    string/large_string, prefix-nesting doesn't collide."""
    import pyarrow as pa

    from daft_minhash_dedupe_ray.hashing import poly_hash64_array

    vals = ["", "a", "ab", "abc", "b", None, "abc", "x" * 100]
    h = poly_hash64_array(pa.array(vals, pa.string()))
    assert h[5] == 0  # null
    assert h[3] == h[6]  # equal values agree
    nn = [h[i] for i in (0, 1, 2, 3, 4, 7)]
    assert len(set(nn)) == len(nn)  # distinct values distinct
    # sliced/offset arrays hash identically
    arr = pa.array(vals, pa.string())
    assert list(poly_hash64_array(arr.slice(2, 3))) == list(h[2:5])
    # chunked + large_string agree with the flat small form
    ch = pa.chunked_array([vals[:3], vals[3:]], pa.string())
    assert list(poly_hash64_array(ch)) == list(h)
    ls = pa.array(vals, pa.large_string())
    assert list(poly_hash64_array(ls)) == list(h)
    # binary form hashes the same bytes
    bv = [v.encode() if v is not None else None for v in vals]
    hb = poly_hash64_array(pa.array(bv, pa.binary()))
    assert list(hb) == list(h)
    assert len(poly_hash64_array(pa.array([], pa.string()))) == 0


def test_hash_key_col_per_value_not_per_block():
    """Round-4 review fix: the poly/blake2b switch in _hash_key_col is a
    function of EACH value's length, never of the block's max — the same
    key must hash identically whatever block it shares (a block-level
    switch split one key across two partitions whenever values straddled
    the 512-byte threshold across blocks)."""
    import pyarrow as pa

    from daft_minhash_dedupe_ray.stages.util import _hash_key_col

    long1, long2 = "u" * 600, "v" * 9000
    solo = _hash_key_col(pa.chunked_array([pa.array(["the", "quick"])]))
    mixed = _hash_key_col(pa.chunked_array([pa.array(["the", long1, "quick"])]))
    assert solo[0] == mixed[0] and solo[1] == mixed[2]
    # long values are themselves block-independent (blake2b path)
    a = _hash_key_col(pa.chunked_array([pa.array([long1, long2])]))
    b = _hash_key_col(pa.chunked_array([pa.array([long2, "x"])]))
    c = _hash_key_col(pa.chunked_array([pa.array([long1])]))
    assert a[0] == c[0] and a[1] == b[0] and a[0] != a[1]
    # null and binary forms
    d = _hash_key_col(pa.chunked_array([pa.array([None, "the", long1])]))
    assert d[0] == 0 and d[1] == solo[0] and d[2] == a[0]
    bb = _hash_key_col(
        pa.chunked_array([pa.array([b"ab", b"z" * 1000], pa.binary())])
    )
    bc = _hash_key_col(pa.chunked_array([pa.array([b"z" * 1000], pa.binary())]))
    assert bb[1] == bc[0]


@given(
    st.lists(
        st.one_of(st.text(alphabet="abcdef ", max_size=160), st.none()),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 1000),
)
@settings(max_examples=40, deadline=None)
def test_minhash_band_keys_matches_unfused(texts, seed):
    """The fused minhash+banding path must be bit-identical to
    band_keys(minhash_signatures(...)[0][has_sig]) — includes empty/None
    docs, sub-ngram docs, and docs spanning chunk boundaries."""
    num_perm, bands, rows = 32, 8, 4
    flat, off = H.shingle_hashes(texts, 3)
    a, b = H.make_permutations(num_perm, seed)
    sig, has = H.minhash_signatures(flat, off, a, b)
    expected = H.band_keys(sig[has], bands, rows)
    keys, has2 = H.minhash_band_keys(flat, off, a, b, bands, rows)
    assert np.array_equal(has, has2)
    assert np.array_equal(keys, expected)


def test_minhash_band_keys_chunk_boundaries_and_huge_doc():
    # one doc larger than the chunk (forces the single-huge-doc branch) mixed
    # with many small docs, at a tiny chunk size
    texts = ["tok%d " % i * 40 for i in range(30)]
    texts[7] = " ".join("w%d" % i for i in range(5000))  # ~5k shingles
    flat, off = H.shingle_hashes(texts, 3)
    a, b = H.make_permutations(128, 42)
    sig, has = H.minhash_signatures(flat, off, a, b, chunk_shingles=256)
    expected = H.band_keys(sig[has], 16, 8)
    keys, has2 = H.minhash_band_keys(flat, off, a, b, 16, 8, chunk_shingles=256)
    assert np.array_equal(has, has2)
    assert np.array_equal(keys, expected)


def test_phash_subset_keys_pigeonhole():
    """Multi-index subset keys: every pair within Hamming <= max_hamming
    shares at least one key (exact pigeonhole), for both the default 2-of-5
    and the web-scale 5-of-8 parameterizations."""
    rng = np.random.RandomState(5)
    base = rng.randint(0, 2**63, 300).astype(np.int64)
    for n_chunks in (5, 8):
        maxh = 3
        for d in range(0, maxh + 1):
            flipped = base.copy()
            for i in range(len(flipped)):
                bits = rng.choice(64, d, replace=False)
                v = int(flipped[i])
                for b in bits:
                    v ^= 1 << int(b)
                flipped[i] = np.int64(np.uint64(v % (1 << 64)).astype(np.int64))
            ka = H.phash_subset_keys(base, n_chunks, maxh)
            kb = H.phash_subset_keys(flipped, n_chunks, maxh)
            shares = (ka == kb).any(axis=1)
            assert shares.all(), f"chunks={n_chunks} d={d}: pigeonhole violated"
    # keys/row count matches the config helper
    from math import comb

    assert H.phash_subset_keys(base, 5, 3).shape[1] == comb(5, 2)
    assert H.phash_subset_keys(base, 8, 3).shape[1] == comb(8, 5)


def test_phash_subset_keys_bucket_sizes_beat_legacy():
    """The scale rationale: random (far) phashes collide vastly less under
    2-of-5 ~26-bit keys than under 4x16-bit sub-bands."""
    rng = np.random.RandomState(11)
    ph = rng.randint(0, 2**63, 50_000).astype(np.int64)
    legacy = H.phash_band_keys(ph, 4)
    new = H.phash_subset_keys(ph, 5, 3)
    # max bucket multiplicity across all keys
    def max_bucket(keys):
        _, c = np.unique(keys.ravel(), return_counts=True)
        return c.max()

    # 16-bit buckets already collide at 50k (grow linearly with corpus);
    # ~26-bit subset keys stay near-singleton
    assert max_bucket(new) < 5 <= max_bucket(legacy)
    assert max_bucket(legacy) >= 3 * max_bucket(new)
