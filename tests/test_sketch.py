"""HyperLogLog sketch tests: estimator accuracy, lossless merge, and the
grouped distributed pipeline vs the exact oracle."""

import numpy as np
import pyarrow as pa

from daft_minhash_dedupe_ray.functions.sketch import (
    approx_distinct_per_group,
    estimate,
    merge_registers,
    registers_from_hashes,
)
from daft_minhash_dedupe_ray.hashing import splitmix64


def _hashes(lo, hi):
    return splitmix64(np.arange(lo, hi, dtype=np.uint64))


def test_hll_estimate_accuracy():
    for n in (100, 5_000, 200_000):
        reg = registers_from_hashes(_hashes(0, n), p=12)
        est = estimate(reg)
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_small_range_exactish():
    # linear-counting regime: tiny cardinalities stay very accurate
    reg = registers_from_hashes(_hashes(0, 10), p=12)
    assert abs(estimate(reg) - 10) < 1.0


def test_hll_merge_equals_union():
    a = registers_from_hashes(_hashes(0, 30_000), p=12)
    b = registers_from_hashes(_hashes(20_000, 60_000), p=12)
    u = registers_from_hashes(_hashes(0, 60_000), p=12)
    assert np.array_equal(merge_registers(np.stack([a, b])), u)


def test_hll_duplicates_dont_inflate():
    h = _hashes(0, 1000)
    reg1 = registers_from_hashes(h, p=12)
    reg2 = registers_from_hashes(np.tile(h, 50), p=12)
    assert np.array_equal(reg1, reg2)


def test_approx_distinct_per_group_vs_exact(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.textops import distinct_tokens_per_group

    rng = np.random.default_rng(11)
    langs = rng.choice(["aa", "bb"], size=400).tolist()
    vocab = [f"tok{i}" for i in range(3000)]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(400)]
    ds = rd.from_arrow(pa.table({"lang": pa.array(langs), "text": pa.array(texts)}))
    exact = distinct_tokens_per_group(ds, group_col="lang")
    approx = approx_distinct_per_group(ds, group_col="lang")
    assert approx["lang"].to_pylist() == exact["lang"].to_pylist()
    for e, a in zip(exact["n_distinct"].to_pylist(), approx["n_distinct_approx"].to_pylist()):
        assert abs(a - e) / e < 0.08, (e, a)
