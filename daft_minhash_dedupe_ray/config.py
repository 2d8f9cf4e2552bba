"""Pipeline configuration and LSH parameter optimisation.

Reference parity: ``workload/minhash_dedupe.py:80-117`` (``optimal_param``),
``:133-174`` (config + ``B*R == num_perm`` guard), and the explicit
``--bands/--rows`` override path of ``references/daft_minhash.py:231-233``.

``optimal_param`` reproduces the datasketch formula — minimise
``fp_weight * FP_area + fn_weight * FN_area`` where the areas integrate the
LSH S-curve ``1 - (1 - s^r)^b`` below/above the Jaccard threshold — using a
plain trapezoid rule instead of ``scipy.integrate.quad`` (scipy is not a
dependency).  Pinned values: ``(0.7, 256) -> (25, 10)`` and the reference's
default ``(0.7, 64) -> (8, 8)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


def _false_positive_area(threshold: float, b: int, r: int, steps: int = 256) -> float:
    # integral of P(s) = 1 - (1 - s^r)^b for s in [0, threshold]
    total = 0.0
    prev = 0.0
    for i in range(1, steps + 1):
        s = threshold * i / steps
        cur = 1.0 - (1.0 - s**r) ** b
        total += (prev + cur) / 2.0
        prev = cur
    return total * (threshold / steps)


def _false_negative_area(threshold: float, b: int, r: int, steps: int = 256) -> float:
    # integral of 1 - P(s) for s in [threshold, 1]
    total = 0.0
    prev = 1.0 - (1.0 - (1.0 - threshold**r) ** b)
    for i in range(1, steps + 1):
        s = threshold + (1.0 - threshold) * i / steps
        cur = 1.0 - (1.0 - (1.0 - s**r) ** b)
        total += (prev + cur) / 2.0
        prev = cur
    return total * ((1.0 - threshold) / steps)


def optimal_param(
    threshold: float,
    num_perm: int,
    false_positive_weight: float = 0.5,
    false_negative_weight: float = 0.5,
) -> tuple[int, int]:
    """Exhaustive search over (b, r) with b*r <= num_perm minimising the
    weighted FP/FN S-curve areas.  Returns ``(b, r)``.

    Parity: ``workload/minhash_dedupe.py:80-117``; pinned by the reference
    test ``tests/test_minhash_dedupe_unit.py:163-166`` — (0.7, 256) -> (25, 10).
    """
    min_error = float("inf")
    opt = (1, 1)
    for b in range(1, num_perm + 1):
        max_r = num_perm // b
        for r in range(1, max_r + 1):
            fp = _false_positive_area(threshold, b, r)
            fn = _false_negative_area(threshold, b, r)
            error = false_positive_weight * fp + false_negative_weight * fn
            if error < min_error:
                min_error = error
                opt = (b, r)
    return opt


MAX_HASH = (1 << 32) - 1
MOD_PRIME = 4_294_967_291  # largest prime < 2^32 (references/chengmao_minhash_spark.py:36-37)

# "auto" pHash-scheme crossover: below this many input rows the legacy
# 4 x 16-bit sub-band buckets stay cold (<~128 payloads/bucket) and cost
# fewer keys/row; above it the multi-index subset keys win (see
# DedupeConfig.phash_chunks)
AUTO_PHASH_CHUNK_ROWS = 8_000_000


@dataclass(frozen=True)
class NormalizeFlags:
    """Normalisation toggles; reference ``workload/minhash_dedupe.py:197-215``.

    Reference defaults (``workload/minhash_dedupe.py:710-715``):
    remove_punct=False, lowercase=False, nfd_unicode=True, white_space=True.
    """

    remove_punct: bool = False
    lowercase: bool = False
    nfd_unicode: bool = True
    white_space: bool = True


@dataclass(frozen=True)
class DedupeConfig:
    """Full configuration of the near-dup pipeline.

    Mirrors ``MinHashDedupePipeline.__init__`` (``workload/minhash_dedupe.py:133-174``)
    plus the image-side (pHash Hamming banding) and scale knobs that are new here.
    """

    # --- columns ---
    index_col: str = "image_id"
    content_col: str = "caption"
    phash_col: str | None = "phash"  # None disables the image side

    # --- signature ---
    num_perm: int = 64
    ngram_size: int = 5
    min_length: int = 0  # min token count; 0/1 = keep all (references/daft_minhash.py:252)
    seed: int = 42
    threshold: float = 0.7
    # explicit override of (bands, rows); None -> optimal_param(threshold, num_perm)
    bands: int | None = None
    rows: int | None = None

    normalize: NormalizeFlags = field(default_factory=NormalizeFlags)

    # --- image side ---
    phash_bands: int = 4  # split 64-bit phash into this many sub-bands (Hamming<phash_bands recall)
    # candidate pairs from pHash buckets are verified (sub-bands are narrow, so
    # random collisions are certain at web scale); pairs farther than this
    # Hamming distance are rejected.  Caption LSH bands are NOT verified,
    # matching the reference (band collision == edge).
    phash_max_hamming: int = 3
    # pHash keying scheme for the SIGNATURE path: n_chunks for multi-index
    # subset keys (hashing.phash_subset_keys — exact pigeonhole recall at
    # Hamming <= phash_max_hamming with C(n_chunks, n_chunks-max_hamming)
    # keys/row and ~(n_chunks-max_hamming)*64/n_chunks-bit buckets), None
    # for the legacy contiguous phash_bands sub-band scheme, or "auto"
    # (default): legacy below AUTO_PHASH_CHUNK_ROWS input rows (fewer
    # keys/row; its 16-bit buckets are still cold there), subset keys above
    # — and whenever the row count is unknown (scale-safe).  The final edge
    # set is IDENTICAL under every setting (every pair is exactly
    # Hamming-verified; all schemes guarantee co-location within the
    # radius — pinned by test), so this knob only trades exchange volume
    # against in-bucket verify growth: legacy buckets hold corpus/2^16
    # payloads each and turn quadratic past ~10^7 rows (measured: 10.8k
    # reduce core-s at 64M).  chunks=5 (2-of-5, ~26-bit keys, 10 keys/row)
    # holds to ~10^9; set 8 (5-of-8, 40-bit keys, 56 keys/row) at
    # 10^11-10^12.  The persisted incremental image band index ALSO keys
    # through this resolution (SignatureStage) — its on-disk fingerprint
    # binds the resolved scheme, so a scheme change fails loudly with the
    # rebuild message instead of silently missing probes.
    phash_chunks: int | None | str = "auto"

    # --- optional passes ---
    # exact substring-duplicate edges (suffix-array pass, functions/substring.py)
    # unioned into the candidate edge stream before clustering
    substring_pass: bool = False

    # --- clustering ---
    cc_algorithm: str = "union_find"  # "union_find" | "alternating" | "two_phase"
    max_cc_iterations: int = 100

    # --- scale knobs ---
    # num_salts == 1: single-shuffle candidate generation (default) — the
    # batch-level combiner plus partition-granular contraction bound per-key
    # work, so salting is unnecessary for natural skew.  num_salts > 1
    # activates the salted two-round path (hot band keys spread over up to
    # num_salts partitions, re-linked by a chain round) for adversarial
    # distributions; connectivity is identical (property-tested).
    num_salts: int = 1
    batch_size: int = 8192
    num_partitions: int | None = None  # groupby/join partitions; None = Ray default

    def resolve_phash_chunks(self, n_rows: int | None = None) -> int | None:
        """Concrete chunk count for the signature path ("auto" resolves by
        input size; unknown size resolves scale-safe to subset keys).
        Validates explicit values early — the kernel needs
        ``chunks > max_hamming`` (at least one guaranteed-equal subset);
        failing here beats a ValueError inside every Ray map task."""
        if self.phash_chunks != "auto":
            if self.phash_chunks is not None and self.phash_chunks <= self.phash_max_hamming:
                raise ValueError(
                    f"phash_chunks={self.phash_chunks} must exceed "
                    f"phash_max_hamming={self.phash_max_hamming} (or be None/'auto')"
                )
            return self.phash_chunks
        if n_rows is not None and n_rows < AUTO_PHASH_CHUNK_ROWS:
            return None
        # size from the radius: max_hamming + 2 chunks -> 2-of-(h+2) subset
        # keys, i.e. always >= 2 guaranteed-equal chunks (h=3 -> the measured
        # 2-of-5 default; a hardcoded 5 would crash h>=5 and degrade h=4)
        return self.phash_max_hamming + 2

    def phash_keys_per_doc(self, n_rows: int | None = None) -> int:
        """Signature-path pHash keys emitted per row (0 when the image side
        is disabled)."""
        if self.phash_col is None:
            return 0
        chunks = self.resolve_phash_chunks(n_rows)
        if chunks:
            from math import comb

            return comb(chunks, chunks - self.phash_max_hamming)
        return self.phash_bands

    def resolved_bands_rows(self) -> tuple[int, int]:
        """(B, R) with the reference's ``assert B*R == num_perm`` guard
        (``workload/minhash_dedupe.py:171-174``) applied to explicit overrides;
        computed params are searched under b*r <= num_perm like the reference.
        """
        if (self.bands is None) != (self.rows is None):
            raise ValueError("bands and rows must be overridden together")
        if self.bands is not None and self.rows is not None:
            if self.bands * self.rows != self.num_perm:
                raise ValueError(
                    f"bands*rows ({self.bands}*{self.rows}) must equal num_perm ({self.num_perm})"
                )
            return self.bands, self.rows
        b, r = optimal_param(self.threshold, self.num_perm)
        return b, r

    def with_overrides(self, **kwargs) -> "DedupeConfig":
        return replace(self, **kwargs)


# The north-star signature config: 128 perms in 16 bands of 8 rows.  Note that
# optimal_param(0.7, 128) == (14, 9) with 14*9 != 128, so this config REQUIRES
# the explicit override path (SURVEY.md §2.C1).
NORTH_STAR_CONFIG = DedupeConfig(num_perm=128, bands=16, rows=8)
