"""Deterministic synthetic image+caption table generator (FIXTURES.md F1).

Produces the exact ``BASELINE.json.input_hint`` schema:

    image_id: string, bytes: binary, w: int32, h: int32, fmt: string,
    caption: string, phash: int64

with planted near-dup structure (caption clusters via bounded end-edits,
image clusters via pHash bit flips, exact duplicates, a hot identical-caption
band, empty/short captions, singletons) so cluster membership is known a
priori and the exact oracle (``oracle.py``) stays cheap.

Everything is seeded (``numpy.random.RandomState``) — same seed, same bytes.
Images are a tiny self-contained uncompressed codec (binary PPM / P6) so the
per-row decoded-pixel invariant is testable without PIL; pHash is a real
32x32 DCT perceptual hash implemented in numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_VOCAB_SIZE = 220
_WORDS = None


def _vocab() -> list[str]:
    global _WORDS
    if _WORDS is None:
        rng = np.random.RandomState(1234)
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        words = set()
        while len(words) < _VOCAB_SIZE:
            n = rng.randint(3, 9)
            words.add("".join(letters[rng.randint(0, 26, n)]))
        _WORDS = sorted(words)
    return _WORDS


# ---------------------------------------------------------------- PPM codec


def ppm_encode(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> binary PPM (P6)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def ppm_decode(data: bytes) -> np.ndarray:
    """binary PPM (P6) -> uint8 (h, w, 3)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts = data.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    pixels = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3)
    return pixels.reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# ---------------------------------------------------------------- pHash


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(32)


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash (standard pHash construction): grayscale ->
    32x32 block-mean resize -> 2D DCT-II -> top-left 8x8 low-frequency block
    -> bit i = coeff_i > median(coeffs excluding DC)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # block-mean resample to 32x32 (indices via linspace; works for any w, h)
    yi = np.linspace(0, h, 33).astype(int)
    xi = np.linspace(0, w, 33).astype(int)
    small = np.empty((32, 32))
    for r in range(32):
        rows = gray[yi[r] : max(yi[r + 1], yi[r] + 1)]
        for c in range(32):
            small[r, c] = rows[:, xi[c] : max(xi[c + 1], xi[c] + 1)].mean()
    coeffs = _DCT32 @ small @ _DCT32.T
    low = coeffs[:8, :8].ravel()
    med = np.median(low[1:])
    bits = low > med
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    # int64 column: reinterpret the top bit as sign
    return int(np.uint64(v).astype(np.int64))


def _make_pixels(rng: np.random.RandomState, w: int, h: int) -> np.ndarray:
    """Low-frequency random image: random 8x8 RGB grid upscaled + mild noise
    (so pHash is stable under the perturbations used for near-dup rows)."""
    grid = rng.randint(0, 256, (8, 8, 3)).astype(np.float64)
    ky, kx = int(np.ceil(h / 8)), int(np.ceil(w / 8))
    up = np.kron(grid, np.ones((ky, kx, 1)))[:h, :w]
    noise = rng.randn(h, w, 3) * 2.0
    return np.clip(up + noise, 0, 255).astype(np.uint8)


def _flip_bits(phash: int, rng: np.random.RandomState, n_flips: int) -> int:
    v = np.uint64(np.int64(phash).astype(np.uint64))
    for pos in rng.choice(64, size=n_flips, replace=False):
        v = v ^ np.uint64(1 << int(pos))
    return int(v.astype(np.int64))


def generate_table(
    n_rows: int,
    seed: int = 42,
    img_w: int = 32,
    img_h: int = 32,
    with_images: bool = True,
) -> pa.Table:
    """Deterministic image+caption table with planted duplicate structure.

    Row budget (fractions of n_rows):
      ~30% caption near-dup clusters (2-8 variants each, end-edits so word
           5-gram Jaccard >= ~0.85 within cluster)
      ~10% image near-dup clusters (phash bit flips, Hamming <= 3)
      ~5%  exact duplicates (identical caption/bytes/phash, distinct id)
      ~1%  hot band: identical caption shared by all these rows
      ~2%  empty or < ngram captions
      rest singletons (random captions, distant phashes)

    ``with_images=False`` replaces pixel synthesis with a tiny per-row token
    payload (fast path for large benchmark tables; schema is unchanged).
    """
    rng = np.random.RandomState(seed)
    vocab = np.array(_vocab())

    def rand_caption(lo=8, hi=40) -> str:
        n = rng.randint(lo, hi + 1)
        return " ".join(vocab[rng.randint(0, len(vocab), n)])

    captions: list[str] = []
    phashes: list[int] = []
    pixel_seeds: list[int] = []  # seed used to synthesize this row's pixels
    exact_dup_of: list[int] = []  # index of the row this exactly duplicates, or -1

    def base_row(caption: str) -> int:
        captions.append(caption)
        pixel_seeds.append(int(rng.randint(0, 2**31 - 1)))
        phashes.append(-(2**62) + int(rng.randint(0, 2**62)))  # placeholder, fixed below
        exact_dup_of.append(-1)
        return len(captions) - 1

    n_caption_cluster_rows = int(n_rows * 0.30)
    n_image_cluster_rows = int(n_rows * 0.10)
    n_exact = int(n_rows * 0.05)
    n_hot = max(0, int(n_rows * 0.01))
    n_shorts = max(2, int(n_rows * 0.02))

    # --- caption near-dup clusters
    made = 0
    while made < n_caption_cluster_rows:
        size = int(rng.randint(2, 9))
        seed_words = rand_caption(15, 40).split()
        m = len(seed_words)
        # calibrate the edit budget so within-cluster 5-gram Jaccard stays
        # >= ~0.8 (FIXTURES.md asks >= 0.75): dropping/appending k words from
        # the end changes k shingles out of m-4, J ~= (m-4-k)/(m-4)
        max_edit = max(1, min(3, int(0.2 * (m - 4))))
        for _ in range(size):
            edit = int(rng.randint(0, max_edit + 1))
            words = list(seed_words)
            if edit and rng.rand() < 0.5:
                words = words[: len(words) - edit]  # drop from the end
            elif edit:
                words += list(vocab[rng.randint(0, len(vocab), edit)])  # append
            base_row(" ".join(words))
            made += 1

    # --- image near-dup clusters (caption random-unique, phash Hamming <= 3)
    made = 0
    img_cluster_seeds: list[tuple[int, int]] = []  # (row_idx of seed, flips)
    while made < n_image_cluster_rows:
        size = int(rng.randint(2, 6))
        seed_idx = base_row(rand_caption())
        img_cluster_seeds.append((seed_idx, 0))
        made += 1
        for _ in range(size - 1):
            i = base_row(rand_caption())
            img_cluster_seeds.append((i, int(rng.randint(1, 4))))
            # near-dup pixels: same pixel seed as the cluster seed row
            pixel_seeds[i] = pixel_seeds[seed_idx]
            made += 1

    # --- hot band: one identical caption on ~1% of rows
    hot_caption = rand_caption(20, 30)
    for _ in range(n_hot):
        base_row(hot_caption)

    # --- empty/short captions
    for k in range(n_shorts):
        base_row("" if k % 2 == 0 else " ".join(vocab[rng.randint(0, len(vocab), 1 + k % 3)]))

    # --- singletons up to (n_rows - n_exact)
    while len(captions) < n_rows - n_exact:
        base_row(rand_caption())

    # --- exact duplicates of random earlier rows
    n_before = len(captions)
    for _ in range(max(0, n_rows - n_before)):
        src = int(rng.randint(0, n_before))
        i = base_row(captions[src])
        pixel_seeds[i] = pixel_seeds[src]
        exact_dup_of[i] = src

    # --- materialize pixels + phashes
    n = len(captions)
    image_ids = [f"img-{i:08d}" for i in range(n)]
    blobs: list[bytes] = []
    phash_cache: dict[int, int] = {}
    for i in range(n):
        ps = pixel_seeds[i]
        if with_images:
            px = _make_pixels(np.random.RandomState(ps), img_w, img_h)
            blobs.append(ppm_encode(px))
            if ps not in phash_cache:
                phash_cache[ps] = phash64(px)
        else:
            blobs.append(b"P6-stub:%d" % ps)
            if ps not in phash_cache:
                phash_cache[ps] = int(
                    np.uint64((ps * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF).astype(np.int64)
                )
        phashes[i] = phash_cache[ps]
    # apply planted bit flips for image near-dup cluster members
    for row_idx, flips in img_cluster_seeds:
        if flips:
            phashes[row_idx] = _flip_bits(phashes[row_idx], np.random.RandomState(row_idx), flips)

    return pa.table(
        {
            "image_id": pa.array(image_ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array([img_w] * n, pa.int32()),
            "h": pa.array([img_h] * n, pa.int32()),
            "fmt": pa.array(["ppm"] * n, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
        }
    )


def write_table(
    path: str,
    n_rows: int,
    seed: int = 42,
    with_images: bool = True,
    row_group_size: int = 16384,
) -> str:
    """Write the synthetic table as a parquet file; returns the path.

    Small row groups matter: Ray Data can only split a parquet file into
    read tasks at row-group boundaries, so a single-row-group file serialises
    the whole downstream map chain onto one task.
    """
    import pyarrow.parquet as pq

    t = generate_table(n_rows, seed=seed, with_images=with_images)
    pq.write_table(t, path, compression="snappy", row_group_size=row_group_size)
    return path


def cached_table_path(
    n_rows: int,
    seed: int = 42,
    with_images: bool = False,
    cache_dir: str = "/tmp/graft_synth_cache",
) -> str:
    """Idempotently persist the deterministic synthetic table and return its
    path.  Registered queries AND their DuckDB oracles read this same file,
    so the correctness gate compares the engine and SQL over byte-identical
    input (write-then-rename keeps concurrent callers safe)."""
    import os

    os.makedirs(cache_dir, exist_ok=True)
    p = os.path.join(
        cache_dir, f"oracle_ns_{n_rows}_{seed}{'_img' if with_images else ''}.parquet"
    )
    if not os.path.exists(p):
        tmp = f"{p}.tmp.{os.getpid()}"
        write_table(tmp, n_rows, seed=seed, with_images=with_images)
        os.replace(tmp, p)
    return p
