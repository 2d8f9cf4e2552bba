"""Sequence-packing invariants (functions/packing.py)."""

import numpy as np
import pyarrow as pa

from daft_minhash_dedupe_ray.functions.packing import pack_sequences


def _mk(ray_session, texts, ids=None):
    import ray.data as rd

    ids = ids if ids is not None else list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})
    return rd.from_arrow(t).repartition(3)


def _toks(s):
    return len(s.split())


def test_every_token_packed_exactly_once(ray_session):
    rng = np.random.default_rng(7)
    texts = [" ".join(f"w{i}" for i in range(rng.integers(0, 40))) for _ in range(200)]
    out = pack_sequences(_mk(ray_session, texts), max_tokens=64, num_partitions=4).to_pandas()
    # per doc: emitted ranges tile [0, n_tokens) without gap or overlap
    for did, grp in out.groupby("doc_id"):
        n = _toks(texts[did])
        grp = grp.sort_values("tok_start")
        assert grp["tok_start"].iloc[0] == 0
        assert grp["tok_end"].iloc[-1] == n or (n == 0 and grp["tok_end"].iloc[-1] == 0)
        assert (grp["tok_start"].values[1:] == grp["tok_end"].values[:-1]).all()
    assert out["doc_id"].nunique() == 200  # zero-token docs still present
    total = sum(_toks(t) for t in texts)
    assert int((out["tok_end"] - out["tok_start"]).sum()) == total


def test_sequences_are_full_except_partition_tails(ray_session):
    texts = [" ".join(["x"] * 10) for _ in range(300)]
    P = 4
    out = pack_sequences(_mk(ray_session, texts), max_tokens=128, num_partitions=P).to_pandas()
    sizes = (out["tok_end"] - out["tok_start"]).groupby(out["seq_id"]).sum()
    assert (sizes <= 128).all()
    assert (sizes < 128).sum() <= P  # at most one ragged tail per partition
    assert sizes.sum() == 3000


def test_deterministic(ray_session):
    texts = [f"doc {i} " + "tok " * (i % 17) for i in range(100)]
    a = pack_sequences(_mk(ray_session, texts), max_tokens=32).to_pandas()
    b = pack_sequences(_mk(ray_session, texts), max_tokens=32).to_pandas()
    key = ["seq_id", "doc_id", "tok_start"]
    assert a.sort_values(key).reset_index(drop=True).equals(b.sort_values(key).reset_index(drop=True))


def test_long_doc_spans_sequences(ray_session):
    texts = [" ".join(["a"] * 500)]  # one doc, 500 tokens, max 128
    out = pack_sequences(_mk(ray_session, texts), max_tokens=128, num_partitions=2).to_pandas()
    assert len(out) == 4  # 128+128+128+116
    sizes = sorted((out["tok_end"] - out["tok_start"]).tolist(), reverse=True)
    assert sizes == [128, 128, 128, 116]
    assert out["seq_id"].nunique() == 4


def test_materialize_sequences_token_conservation(ray_session):
    import collections

    from daft_minhash_dedupe_ray.functions.packing import materialize_sequences

    rng = np.random.default_rng(13)
    texts = [
        " ".join(f"w{rng.integers(0, 50)}" for _ in range(rng.integers(0, 30)))
        for _ in range(150)
    ]
    out = materialize_sequences(
        _mk(ray_session, texts), max_tokens=48, num_partitions=4
    ).to_pandas()
    # every token lands in exactly one sequence (multiset equality)
    got = collections.Counter(tok for t in out["text"] for tok in t.split())
    want = collections.Counter(tok for t in texts for tok in t.split())
    assert got == want
    # n_tokens matches the actual text and fullness bounds hold
    assert (out["n_tokens"] == out["text"].str.split().str.len()).all()
    assert (out["n_tokens"] <= 48).all()
    assert (out["n_tokens"] < 48).sum() <= 4  # <= one ragged tail per partition
    # deterministic
    again = materialize_sequences(
        _mk(ray_session, texts), max_tokens=48, num_partitions=4
    ).to_pandas()
    key = ["seq_id"]
    assert (
        out.sort_values(key).reset_index(drop=True)
        .equals(again.sort_values(key).reset_index(drop=True))
    )


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=60),
    st.integers(1, 64),
)
@settings(max_examples=80, deadline=None)
def test_pack_partition_properties(token_counts, max_tokens):
    """Pure-kernel invariants, no Ray: ranges tile each doc, sequences are
    contiguous chunks of the concatenated stream, only the final sequence of
    the partition is ragged."""
    from daft_minhash_dedupe_ray.functions.packing import _pack_partition

    n = len(token_counts)
    tab = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "n_tokens": pa.array(np.array(token_counts, dtype=np.int64)),
        }
    )
    out = _pack_partition(tab, max_tokens, "doc_id").to_pandas()
    assert out["doc_id"].nunique() == n  # every doc appears
    total = sum(token_counts)
    assert int((out["tok_end"] - out["tok_start"]).sum()) == total
    for did, grp in out.groupby("doc_id"):
        grp = grp.sort_values("tok_start")
        nd = token_counts[did]
        assert grp["tok_start"].iloc[0] == 0
        assert grp["tok_end"].iloc[-1] == (nd if nd else 0)
        assert (grp["tok_start"].values[1:] == grp["tok_end"].values[:-1]).all()
    sizes = (out["tok_end"] - out["tok_start"]).groupby(out["seq_id"]).sum()
    if total:
        assert (sizes <= max_tokens).all()
        nonzero = sizes[sizes > 0]
        # one ragged (non-full) tail max; a zero-size sequence can only be
        # the landing slot of trailing zero-token docs after a full stream
        assert (nonzero < max_tokens).sum() <= 1
        assert len(nonzero) == -(-total // max_tokens)
        assert (sizes == 0).sum() <= 1
