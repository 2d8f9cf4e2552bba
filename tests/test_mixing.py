"""Weighted corpus mixing invariants (functions/mixing.py)."""

import numpy as np
import pyarrow as pa
import pytest

from daft_minhash_dedupe_ray.functions.mixing import mix_sources


def _corpus(n=6000, sources=("web", "books", "code")):
    rng = np.random.default_rng(5)
    src = rng.choice(sources, n)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array(src, pa.string()),
            "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
        }
    )


def _run(t, weights, seed=0, parts=4):
    import ray.data as rd

    return (
        mix_sources(rd.from_arrow(t).repartition(parts), weights, seed=seed)
        .to_pandas()
        .sort_values(["doc_id", "epoch_copy"])
        .reset_index(drop=True)
    )


def test_rates_and_multiplicity(ray_session):
    t = _corpus()
    w = {"web": 0.5, "books": 2.0, "code": 2.25}
    out = _run(t, w)
    df = t.to_pandas()
    per_source_in = df.groupby("source").size()
    per_source_out = out.groupby("source").size()
    for s, wt in w.items():
        rate = per_source_out[s] / per_source_in[s]
        assert abs(rate - wt) < 0.1, (s, rate)
    # integer part is exact: every books row appears exactly 2 or 3 times
    counts = out[out["source"] == "books"].groupby("doc_id").size()
    assert set(counts.unique()) <= {2, 3}
    assert (counts == 2).all()  # frac(2.0) == 0: exactly 2, never 3
    counts = out[out["source"] == "code"].groupby("doc_id").size()
    assert set(counts.unique()) == {2, 3}
    # epoch_copy indexes repeats 0..k-1
    g = out.groupby("doc_id")["epoch_copy"]
    assert (g.min() == 0).all()
    assert (g.max() == g.size() - 1).all()


def test_deterministic_and_partitioning_independent(ray_session):
    t = _corpus(2000)
    w = {"web": 0.3, "books": 1.7, "code": 1.0}
    a = _run(t, w, seed=9, parts=3)
    b = _run(t, w, seed=9, parts=7)
    assert a.equals(b)
    c = _run(t, w, seed=10, parts=3)
    kept_a = set(a[a["source"] == "web"]["doc_id"])
    kept_c = set(c[c["source"] == "web"]["doc_id"])
    assert kept_a != kept_c  # a new seed redraws the sample


def test_unknown_source_and_zero_weight(ray_session):
    t = _corpus(1000, sources=("web", "junk"))
    out = _run(t, {"junk": 0.0})  # web falls back to default_weight=1.0
    assert (out["source"] == "web").all()
    n_web = (t["source"].to_pandas() == "web").sum()
    assert len(out) == n_web and out["doc_id"].nunique() == n_web


def test_negative_weight_rejected(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError):
        mix_sources(rd.from_arrow(_corpus(10)), {"web": -1.0})


def test_null_sources_use_default_weight(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(100, dtype=np.int64)),
            "source": pa.array(["web"] * 50 + [None] * 50, pa.string()),
        }
    )
    out = mix_sources(rd.from_arrow(t), {"web": 0.0}, default_weight=1.0).to_pandas()
    # web dropped entirely; null-source rows kept once each via the default
    assert len(out) == 50 and out["source"].isna().all()
