"""Audio column operators: decode / feature-extract / resample over opaque
``binary`` payload columns with typed metadata (audio_id, fmt, sample_rate).

Mirrors the image stages in :mod:`.multimodal` (reference pattern:
`workload/minhash_dedupe.py` payload-column preprocessing, adapted per
SURVEY §1.4): the Ray-side plumbing — schema, actor-pool signature, small
payload batches, per-row ``decode_ok`` instead of batch failure — is real
and tested.  WAV/PCM16 is an uncompressed RIFF container, so the codec is
fully implemented in numpy (no external libraries); compressed codecs
(mp3/flac/ogg) are stubbed behind ``NotImplementedError`` per the build
brief.

Batch-size guidance: one second of 16 kHz PCM16 is 32 KB, so payload rows
are ~100x wider than text rows — callers should use ``batch_size`` in the
low hundreds so ``batch_size * concurrency`` stays inside the worker heap.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_SUPPORTED = {"wav"}


def wav_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Mono PCM16 numpy array -> RIFF/WAVE bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(pcm),
        b"WAVE",
        b"fmt ",
        16,  # PCM fmt chunk size
        1,  # audio format: PCM
        1,  # channels
        sample_rate,
        sample_rate * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
        b"data",
        len(pcm),
    )
    return hdr + pcm


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (mono int16 samples, sample_rate).  Walks the chunk
    list properly (fmt chunks can be >16 bytes, extra chunks may precede
    data)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, bits, channels = 12, None, None, None
    samples = None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV is built in")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if samples is None or sample_rate is None:
        raise ValueError("missing fmt/data chunk")
    if channels and channels > 1:  # downmix interleaved channels
        samples = samples[: len(samples) - len(samples) % channels]
        samples = (
            samples.reshape(-1, channels).mean(axis=1).round().astype(np.int16)
        )
    return samples, sample_rate


def decode_audio(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """bytes -> (samples, sample_rate).  Compressed codecs are stubbed (no
    audio libraries in this environment); plug a real decoder in here for
    production."""
    if fmt == "wav":
        return wav_decode(data)
    raise NotImplementedError(
        f"decoder for fmt={fmt!r} requires an audio library not present in "
        "this environment; only 'wav' (PCM16) is built in"
    )


class AudioFeatureStage:
    """Actor-pool stage: binary audio column -> per-row feature columns
    (decode_ok, duration_s, rms, zero-crossing rate, spectral centroid).

    The per-row loop is inherent (variable-length blobs); the per-row work is
    numpy-vectorised (one rfft per clip).  Unsupported formats set
    ``decode_ok=false`` rather than failing the batch."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt") -> None:
        self.bytes_col, self.fmt_col = bytes_col, fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(blobs)
        ok = np.zeros(n, bool)
        dur = np.zeros(n, np.float64)
        rms = np.zeros(n, np.float64)
        zcr = np.zeros(n, np.float64)
        cent = np.zeros(n, np.float64)
        nsamp = np.zeros(n, np.int64)
        ssum = np.zeros(n, np.int64)
        ssumsq = np.zeros(n, np.int64)
        for i, (d, f) in enumerate(zip(blobs, fmts)):
            if f not in _SUPPORTED or d is None:
                continue
            s, sr = decode_audio(d, f)
            if len(s) == 0:
                continue
            s64 = s.astype(np.int64)
            nsamp[i] = s64.size
            ssum[i] = s64.sum()
            ssumsq[i] = (s64 * s64).sum()
            x = s.astype(np.float64) / 32768.0
            ok[i] = True
            dur[i] = len(x) / sr
            rms[i] = float(np.sqrt(np.mean(x * x)))
            zcr[i] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            mag = np.abs(np.fft.rfft(x))
            tot = mag.sum()
            if tot > 0:
                freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
                cent[i] = float((freqs * mag).sum() / tot)
        for name, arr, typ in (
            ("decode_ok", ok, pa.bool_()),
            ("duration_s", np.round(dur, 6), pa.float64()),
            ("rms", np.round(rms, 6), pa.float64()),
            ("zcr", np.round(zcr, 6), pa.float64()),
            ("spectral_centroid_hz", np.round(cent, 3), pa.float64()),
            # exact integer sample moments — bit-comparable against a SQL
            # oracle decoding the same RIFF/PCM16 payload (sql_oracle
            # .audio_stats_sql)
            ("n_samples", nsamp, pa.int64()),
            ("sample_sum", ssum, pa.int64()),
            ("sample_sumsq", ssumsq, pa.int64()),
        ):
            batch = batch.append_column(name, pa.array(arr, typ))
        return batch


class AudioResampleStage:
    """Actor-pool stage: linear-interpolation resample of the payload to
    ``out_rate``, re-encoded as WAV PCM16.  Updates the sample_rate column
    (mirror of :class:`..multimodal.ImageResizeStage`)."""

    def __init__(
        self, out_rate: int, bytes_col: str = "bytes", fmt_col: str = "fmt"
    ) -> None:
        self.out_rate = out_rate
        self.bytes_col, self.fmt_col = bytes_col, fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        out = []
        for d, f in zip(blobs, fmts):
            if f not in _SUPPORTED or d is None:
                out.append(d)  # pass through untouched
                continue
            s, sr = decode_audio(d, f)
            if sr == self.out_rate or len(s) == 0:
                out.append(wav_encode(s, self.out_rate) if len(s) == 0 else d)
                continue
            n_out = max(1, int(round(len(s) * self.out_rate / sr)))
            t_out = np.arange(n_out) * (len(s) - 1) / max(1, n_out - 1)
            y = np.interp(t_out, np.arange(len(s)), s.astype(np.float64))
            out.append(wav_encode(np.clip(np.round(y), -32768, 32767), self.out_rate))
        names = batch.column_names
        batch = batch.set_column(
            names.index(self.bytes_col), self.bytes_col, pa.array(out, pa.binary())
        )
        if "sample_rate" in names:
            batch = batch.set_column(
                names.index("sample_rate"),
                "sample_rate",
                pa.array([self.out_rate] * len(batch), pa.int32()),
            )
        return batch


def fingerprint_periods(
    n_bands: int = 65, pmin: int = 4, pmax: int = 160
) -> np.ndarray:
    """The integer fingerprint's square-wave periods (in samples):
    ``n_bands`` geometrically spaced integers in [pmin, pmax], forced
    distinct.  Shared verbatim by the engine kernel and the generated DuckDB
    oracle (``sql_oracle.audio_dedupe_keep_sql`` bakes them as literals)."""
    raw = pmin * (pmax / pmin) ** (np.arange(n_bands) / (n_bands - 1))
    ps, last = [], 0
    for r in raw:
        p = max(int(round(r)), last + 1)
        ps.append(p)
        last = p
    return np.array(ps, np.int64)


# fingerprint window: at most this many leading samples feed the integer
# fingerprint (keeps a^2+b^2 inside int64; shared with the SQL oracle)
FP_WINDOW = 32768


def fp_window_start(n_samples: int) -> int:
    """Start sample of the fingerprint window: the centered, 4-sample
    (one 8-byte decode chunk) aligned position — ``4 * (((n - W) // 2) // 4)``
    for clips longer than the window, else 0.  Pure arithmetic on the clip
    length (SQL-expressible from the payload byte count; gain-invariant)."""
    return 4 * ((max(0, n_samples - FP_WINDOW) // 2) // 4)

_SIGN_TABLE: dict[int, np.ndarray] = {}


def _sign_table(maxlen: int) -> np.ndarray:
    """(2 * n_bands, maxlen) float64 square-wave sign matrix — in-phase and
    quadrature (offset p//4) rows per period, cached per actor and grown on
    demand.  float64 is exact here: every partial sum stays far below 2**53,
    so the BLAS matmul reproduces integer arithmetic bit-for-bit."""
    key = 1 << int(np.ceil(np.log2(max(maxlen, 1024))))
    tab = _SIGN_TABLE.get(key)
    if tab is None:
        n = np.arange(key)
        rows = []
        for p in fingerprint_periods():
            rows.append(np.where((n % p) * 2 < p, 1.0, -1.0))
            q = p // 4
            rows.append(np.where(((n + q) % p) * 2 < p, 1.0, -1.0))
        tab = np.array(rows, np.float64)
        _SIGN_TABLE[key] = tab
    return tab


def audio_fingerprints64_int(clips: list[np.ndarray]) -> np.ndarray:
    """Batched integer spectral fingerprints (uint64 per clip).

    Each of 65 geometrically spaced square-wave periods yields an integer
    "energy" a^2 + b^2 (in-phase / quadrature correlations with the raw
    PCM16 samples — pure integer arithmetic, no FFT, no floats); bit j is
    the exact comparison e[j+1] > e[j].  Sign-of-difference bits are
    invariant to amplitude scaling (energies scale by gain^2) and, being
    integer-exact, are bit-reproducible by a SQL oracle decoding the same
    payload (the dHash cross-mult trick, CLAUDE.md round-3).  Clips shorter
    than 4 samples fingerprint to 0.

    Zero-padding to the batch max length is free: padded samples contribute
    0 to every correlation, so per-clip results are length-independent.
    Clips are fingerprinted over a ``FP_WINDOW``-sample window (~4 s at
    8 kHz) — this keeps |correlation| <= 2**30.5 so a^2 + b^2 can never
    overflow int64, and bounds the kernel's work per clip.  The window is
    CENTERED in the clip (chunk-aligned so the SQL oracle's 8-byte decode
    stays chunk-based): a first-window prefix systematically collides any
    two clips sharing ~4 s of leading content (shared intros, and exact
    digital leading silence fingerprints to 0) — the centered window only
    collides clips whose middles match.  The start index derives from the
    clip LENGTH alone, so it is exactly gain-invariant and identical for
    same-length near-dup variants."""
    if not clips:
        return np.zeros(0, np.uint64)
    clips = [c[fp_window_start(len(c)) : fp_window_start(len(c)) + FP_WINDOW] for c in clips]
    lens = np.array([len(c) for c in clips], np.int64)
    L = int(lens.max())
    tab = _sign_table(L)[:, :L]
    x = np.zeros((len(clips), L), np.float64)
    for i, c in enumerate(clips):
        x[i, : lens[i]] = c
    corr = x @ tab.T  # (n, 130), exact integers in float64
    a = corr[:, 0::2].astype(np.int64)
    b = corr[:, 1::2].astype(np.int64)
    e = a * a + b * b  # |corr| <= 32768*maxlen << 2**31.5 -> squares fit i64
    bits = (e[:, 1:] > e[:, :-1]).astype(np.uint64)
    fp = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
    fp[lens < 4] = 0
    return fp.astype(np.uint64)


def audio_fingerprint64_int(samples: np.ndarray) -> np.uint64:
    """Single-clip convenience wrapper over :func:`audio_fingerprints64_int`."""
    return audio_fingerprints64_int([np.asarray(samples)])[0]


def audio_fingerprint64(samples: np.ndarray, sr: int, fmin: float = 50.0) -> np.uint64:
    """64-bit spectral fingerprint (Haitsma-Kalker shape: sign of adjacent
    log-band energy differences over 65 geometrically spaced bands).  The
    sign-of-difference bits are exactly invariant to amplitude scaling and
    robust to light noise / resampling — the audio analogue of the image
    pHash, feeding the same Hamming-banded candidate machinery."""
    if len(samples) < 4:
        return np.uint64(0)
    x = samples.astype(np.float64)
    power = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
    n_bands = 65
    edges = fmin * (sr / 2.0 / fmin) ** (np.arange(n_bands + 1) / n_bands)
    idx = np.searchsorted(freqs, edges)
    cs = np.concatenate(([0.0], np.cumsum(power)))
    e = cs[np.minimum(idx[1:], len(power))] - cs[np.minimum(idx[:-1], len(power))]
    bits = (e[1:] > e[:-1]).astype(np.uint64)
    return np.uint64((bits << np.arange(64, dtype=np.uint64)).sum())


def audio_dedupe_candidates(
    ds,
    cfg,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_col: str = "audio_id",
):
    """Audio near-dup candidate edges: integer spectral fingerprint per clip
    (:func:`audio_fingerprints64_int` — square-wave correlations, so the
    DuckDB oracle can replay it bit-for-bit from the raw payload), banded
    into Hamming buckets and verified — reusing the pHash sub-band + verify
    machinery exactly like SimHash does for text
    (``functions/similarity.simhash_candidates``).  Rows that fail decode
    emit nothing (an undecodable clip cannot be a duplicate)."""
    from ..hashing import phash_band_keys
    from ..stages.candidates import KIND_PHASH, candidate_edges

    empty = pa.schema(
        [
            ("node_id", pa.uint64()),
            ("band_key", pa.uint64()),
            ("kind", pa.uint8()),
            ("payload", pa.uint64()),
        ]
    )

    def fp_batch(b: pa.Table) -> pa.Table:
        blobs = b[bytes_col].to_pylist()
        fmts = b[fmt_col].to_pylist()
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        nodes, clips = [], []
        for i, (d, f) in enumerate(zip(blobs, fmts)):
            if f not in _SUPPORTED or d is None:
                continue
            s, _sr = decode_audio(d, f)
            if len(s) < 4:
                continue
            nodes.append(ids[i])
            clips.append(s)
        if not nodes:
            return empty.empty_table()
        nodes_a = np.array(nodes, np.uint64)
        fps_a = audio_fingerprints64_int(clips)
        nb = cfg.phash_bands
        keys = phash_band_keys(fps_a.view(np.int64), nb)
        return pa.table(
            {
                "node_id": pa.array(np.repeat(nodes_a, nb), pa.uint64()),
                "band_key": pa.array(keys.reshape(-1), pa.uint64()),
                "kind": pa.array(np.full(len(nodes_a) * nb, KIND_PHASH, np.uint8), pa.uint8()),
                "payload": pa.array(np.repeat(fps_a, nb), pa.uint64()),
            }
        )

    cand = ds.map_batches(fp_batch, batch_format="pyarrow", batch_size=cfg.batch_size)
    return candidate_edges(cand, cfg)


def synth_audio_table(n: int, seed: int = 42, sample_rate: int = 8_000) -> pa.Table:
    """Deterministic synthetic audio fixture: short sine+noise clips with
    varied frequency/length, a few rows in an unsupported format and a null
    payload (the empties/unsupported paths must survive the stages)."""
    rng = np.random.RandomState(seed)
    blobs, fmts, rates = [], [], []
    for i in range(n):
        if i % 17 == 13:
            blobs.append(b"\x00\x01compressed")
            fmts.append("mp3")
            rates.append(sample_rate)
            continue
        if i % 29 == 7:
            blobs.append(None)
            fmts.append("wav")
            rates.append(sample_rate)
            continue
        dur = 0.05 + rng.rand() * 0.2
        t = np.arange(int(dur * sample_rate)) / sample_rate
        freq = 100.0 + rng.rand() * 2000.0
        x = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.randn(len(t))
        pcm = np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)
        blobs.append(wav_encode(pcm, sample_rate))
        fmts.append("wav")
        rates.append(sample_rate)
    return pa.table(
        {
            "audio_id": pa.array(np.arange(n, dtype=np.int64)),
            "bytes": pa.array(blobs, pa.binary()),
            "fmt": pa.array(fmts, pa.string()),
            "sample_rate": pa.array(rates, pa.int32()),
        }
    )


def cached_audio_path(
    n: int,
    seed: int = 42,
    sample_rate: int = 8_000,
    cache_dir: str = "/tmp/graft_synth_cache",
) -> str:
    """Idempotently persist ``synth_audio_table`` output and return its path
    — the registered audio queries and their DuckDB oracles read this same
    file so the correctness gate compares byte-identical payloads (mirrors
    ``synth.cached_table_path``; write-then-rename keeps concurrent callers
    safe)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(cache_dir, exist_ok=True)
    p = os.path.join(cache_dir, f"oracle_audio_{n}_{seed}_{sample_rate}.parquet")
    if not os.path.exists(p):
        tmp = f"{p}.tmp.{os.getpid()}"
        pq.write_table(
            synth_audio_table(n, seed=seed, sample_rate=sample_rate),
            tmp,
            row_group_size=16384,
        )
        os.replace(tmp, p)
    return p


def cached_audio_dups_path(
    n: int,
    seed: int = 42,
    dup_rate: float = 0.3,
    sample_rate: int = 8_000,
    cache_dir: str = "/tmp/graft_synth_cache",
) -> str:
    """Idempotently persist ``synth_audio_table_with_dups`` output (table
    only) so the registered ``audio_dedupe_synth`` query and its DuckDB
    oracle read byte-identical payloads (mirror of ``cached_audio_path``)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(cache_dir, exist_ok=True)
    p = os.path.join(
        cache_dir, f"oracle_audio_dups_{n}_{seed}_{dup_rate}_{sample_rate}.parquet"
    )
    if not os.path.exists(p):
        t, _ = synth_audio_table_with_dups(
            n, seed=seed, dup_rate=dup_rate, sample_rate=sample_rate
        )
        tmp = f"{p}.tmp.{os.getpid()}"
        pq.write_table(t, tmp, row_group_size=16384)
        os.replace(tmp, p)
    return p


def synth_audio_table_with_dups(
    n: int, seed: int = 42, dup_rate: float = 0.3, sample_rate: int = 8_000
) -> tuple[pa.Table, list[tuple[int, int]]]:
    """Base synthetic clips plus planted near-duplicates (amplitude-scaled
    with light additive noise — the transformations the spectral fingerprint
    is designed to survive).  Returns (table, ground-truth (base, dup) id
    pairs) for recall tests."""
    base = synth_audio_table(n, seed=seed, sample_rate=sample_rate)
    rng = np.random.RandomState(seed + 1)
    blobs = base["bytes"].to_pylist()
    fmts = base["fmt"].to_pylist()
    ok_ids = [i for i in range(n) if fmts[i] == "wav" and blobs[i] is not None]
    n_dup = int(n * dup_rate)
    dup_blobs, pairs = [], []
    for j in range(n_dup):
        src = int(ok_ids[rng.randint(len(ok_ids))])
        s, sr = wav_decode(blobs[src])
        gain = 0.5 + rng.rand() * 0.9
        x = s.astype(np.float64) * gain
        x = x + rng.randn(len(x)) * 0.001 * max(1.0, np.abs(x).max())
        dup_blobs.append(wav_encode(np.clip(np.round(x), -32768, 32767), sr))
        pairs.append((src, n + j))
    dup = pa.table(
        {
            "audio_id": pa.array(np.arange(n, n + n_dup, dtype=np.int64)),
            "bytes": pa.array(dup_blobs, pa.binary()),
            "fmt": pa.array(["wav"] * n_dup, pa.string()),
            "sample_rate": pa.array([sample_rate] * n_dup, pa.int32()),
        }
    )
    return pa.concat_tables([base, dup]), pairs
