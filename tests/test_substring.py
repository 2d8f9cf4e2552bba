"""Suffix-array substring-duplicate pass (north_star optional component)."""

import numpy as np
import pyarrow as pa

from daft_minhash_dedupe_ray.config import DedupeConfig, NormalizeFlags
from daft_minhash_dedupe_ray.functions.substring import (
    substring_dup_pairs,
    suffix_array,
)
from daft_minhash_dedupe_ray.stages.signature import node_ids_for


def test_suffix_array_banana():
    # suffixes of "banana" sorted: a, ana, anana, banana, na, nana
    assert suffix_array("banana").tolist() == [5, 3, 1, 0, 4, 2]


def test_suffix_array_empty_and_single():
    assert suffix_array("").tolist() == []
    assert suffix_array("z").tolist() == [0]


def _table(captions):
    return pa.table(
        {
            "image_id": pa.array([f"i{k}" for k in range(len(captions))], pa.string()),
            "caption": pa.array(captions, pa.string()),
        }
    )


CFG = DedupeConfig(phash_col=None, normalize=NormalizeFlags(False, False, False, False))


def _pairs_to_ids(out, t, cfg):
    nodes = node_ids_for(t, cfg)
    idx = {int(n): i for i, n in enumerate(nodes)}
    pdf = out.to_pandas()
    return {
        tuple(sorted((idx[int(u)], idx[int(v)])))
        for u, v in zip(pdf["u"].astype(np.uint64), pdf["v"].astype(np.uint64))
    }


def test_exact_mode_finds_all_containments(ray_session):
    import ray.data as rd

    caps = [
        "alpha beta gamma delta epsilon zeta",   # 0
        "alpha beta gamma",                       # 1: prefix of 0
        "delta epsilon zeta",                     # 2: suffix of 0
        "totally unrelated caption here",         # 3
        "beta gamma delta",                       # 4: interior of 0
    ]
    t = _table(caps)
    out = substring_dup_pairs(rd.from_arrow(t), CFG, exact=True)
    got = _pairs_to_ids(out, t, CFG)
    assert got == {(0, 1), (0, 2), (0, 4)}


def test_exact_mode_row_cap_fires(ray_session, monkeypatch):
    """exact=True is the O(n^2) brute-force tool: above the cap it must fail
    loudly instead of driver-materializing a big corpus (VERDICT r4 #5)."""
    import pytest
    import ray.data as rd

    import daft_minhash_dedupe_ray.functions.substring as sub

    monkeypatch.setattr(sub, "EXACT_MODE_MAX_ROWS", 3)
    t = _table([f"caption number {k}" for k in range(5)])
    with pytest.raises(ValueError, match="exact=True.*capped at 3"):
        sub.substring_dup_pairs(rd.from_arrow(t), CFG, exact=True)
    # at/below the cap it still runs
    monkeypatch.setattr(sub, "EXACT_MODE_MAX_ROWS", 5)
    out = sub.substring_dup_pairs(rd.from_arrow(t), CFG, exact=True)
    assert out.count() == 0


def test_sa_mode_finds_prefix_suffix_truncations(ray_session):
    import ray.data as rd

    caps = [
        "one two three four five six seven eight nine ten",
        "one two three four five six seven eight",  # prefix truncation
        "three four five six seven eight nine ten",  # suffix truncation
        "something else entirely different caption words",
        "one two three four five six seven eight nine ten",  # exact duplicate
    ]
    t = _table(caps)
    out = substring_dup_pairs(rd.from_arrow(t), CFG, exact=False)
    got = _pairs_to_ids(out, t, CFG)
    # connectivity-sufficient subset: all of 0,1,2,4 must land in one component
    from daft_minhash_dedupe_ray.state.union_find import connected_components_oracle

    assign = connected_components_oracle(list(got))
    comp = {assign.get(i, i) for i in (0, 1, 2, 4)}
    assert len(comp) == 1
    assert 3 not in assign  # unrelated caption untouched


def test_sa_mode_on_planted_synthetic(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.synth import generate_table

    t = generate_table(300, seed=21, with_images=False)
    cfg = DedupeConfig()  # default normalize, phash off for this op
    exact = substring_dup_pairs(rd.from_arrow(t), cfg, exact=True).to_pandas()
    sa = substring_dup_pairs(rd.from_arrow(t), cfg, exact=False).to_pandas()
    # SA mode must be a subset of the exact pair set...
    e = set(zip(exact["u"].astype(np.uint64), exact["v"].astype(np.uint64)))
    s = set(zip(sa["u"].astype(np.uint64), sa["v"].astype(np.uint64)))
    assert s <= e
    # ...and must connect every prefix/suffix-containment pair whose contained
    # caption has >= ngram_size words (the documented guarantee classes;
    # interior containments and sub-shingle captions may be missed)
    from daft_minhash_dedupe_ray.state.union_find import connected_components_oracle
    from daft_minhash_dedupe_ray.stages.signature import node_ids_for
    from daft_minhash_dedupe_ray.text import normalize_strings

    nodes = node_ids_for(t, cfg)
    idx = {int(n): i for i, n in enumerate(nodes)}
    norm = normalize_strings(t["caption"].to_pylist(), cfg.normalize)
    a_sa = connected_components_oracle(list(s))
    must = 0
    for u, v in e:
        a, b = norm[idx[int(u)]], norm[idx[int(v)]]
        short, longer = (a, b) if len(a) <= len(b) else (b, a)
        if len(short.split()) >= cfg.ngram_size and (
            longer.startswith(short) or longer.endswith(short) or short == longer
        ):
            must += 1
            assert a_sa.get(int(u), int(u)) == a_sa.get(int(v), int(v)), (u, v)
    assert must > 0  # the generator plants truncation pairs
