"""optimal_param + DedupeConfig guards.

Mirrors the reference pins: ``optimal_param(0.7, 256) == (25, 10)``
(reference tests/test_minhash_dedupe_unit.py:163-166) and the ``B*R ==
num_perm`` assertion (workload/minhash_dedupe.py:171-174).
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from daft_minhash_dedupe_ray.config import DedupeConfig, NORTH_STAR_CONFIG, optimal_param


def test_optimal_param_pins():
    assert optimal_param(0.7, 256) == (25, 10)
    assert optimal_param(0.7, 64) == (8, 8)  # the reference's default config
    assert optimal_param(0.7, 128) == (14, 9)  # why the 128/16 config needs an override


@given(st.floats(0.1, 0.95), st.integers(16, 256))
@settings(max_examples=40, deadline=None)
def test_optimal_param_bounds(threshold, num_perm):
    b, r = optimal_param(threshold, num_perm)
    assert b >= 1 and r >= 1 and b * r <= num_perm


def test_bands_rows_guard():
    assert DedupeConfig(num_perm=64).resolved_bands_rows() == (8, 8)
    assert NORTH_STAR_CONFIG.resolved_bands_rows() == (16, 8)
    with pytest.raises(ValueError):
        DedupeConfig(num_perm=64, bands=9, rows=8).resolved_bands_rows()
    with pytest.raises(ValueError):
        DedupeConfig(num_perm=64, bands=8).resolved_bands_rows()


def test_phash_chunks_validation_and_radius_sizing():
    """Review r5: 'auto' sizes chunks from the Hamming radius (a hardcoded 5
    crashed max_hamming>=5 and degraded ==4), and invalid explicit pairs
    fail at config time, not inside Ray map tasks."""
    import pytest

    from daft_minhash_dedupe_ray.config import DedupeConfig

    assert DedupeConfig(phash_max_hamming=3).resolve_phash_chunks(None) == 5
    assert DedupeConfig(phash_max_hamming=4).resolve_phash_chunks(None) == 6
    assert DedupeConfig(phash_max_hamming=5).resolve_phash_chunks(None) == 7
    assert DedupeConfig(phash_max_hamming=5).phash_keys_per_doc() == 21  # C(7,2)
    with pytest.raises(ValueError, match="must exceed"):
        DedupeConfig(phash_chunks=5, phash_max_hamming=5).resolve_phash_chunks()
    with pytest.raises(ValueError, match="must exceed"):
        DedupeConfig(phash_chunks=3, phash_max_hamming=3).phash_keys_per_doc()
    # None (legacy) and explicit-valid still pass
    assert DedupeConfig(phash_chunks=None).resolve_phash_chunks() is None
    assert DedupeConfig(phash_chunks=8, phash_max_hamming=3).resolve_phash_chunks() == 8
