"""Corpus bigram-LM quality scoring (functions/lm_quality.py)."""

import math

import numpy as np
import pyarrow as pa

from daft_minhash_dedupe_ray.functions.lm_quality import (
    lm_quality_scores,
    train_bigram_counts,
)


def _ds(ray_session, texts):
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    return rd.from_arrow(t).repartition(3)


def _oracle(texts, k=1.0, min_count=2):
    """Pure-python add-k bigram LM over the same corpus (bigram entries
    below min_count pruned to unseen, matching train_bigram_counts)."""
    import collections

    uni, bi = collections.Counter(), collections.Counter()
    for t in texts:
        ws = t.split()
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    bi = collections.Counter({g: c for g, c in bi.items() if c >= min_count})
    V = len(uni)
    out = []
    for t in texts:
        ws = t.split()
        pairs = list(zip(ws, ws[1:]))
        if not pairs or not V:
            out.append(0.0)
            continue
        s = sum(-math.log((bi[p] + k) / (uni[p[0]] + k * V)) for p in pairs)
        out.append(round(s / len(pairs), 6))
    return out


def test_matches_python_oracle(ray_session):
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 25))) for _ in range(120)]
    texts += ["", "solo", "a b a b a b"]
    out = (
        lm_quality_scores(_ds(ray_session, texts))
        .to_pandas()
        .sort_values("doc_id")["lm_score"]
        .tolist()
    )
    exp = _oracle(texts)
    np.testing.assert_allclose(out, exp, atol=1e-6)


def test_gibberish_scores_worse_than_common_text(ray_session):
    common = ["the cat sat on the mat today again"] * 50
    rare = ["zqx vbn mkl pqr stu wvy xab cde"]
    texts = common + rare
    out = lm_quality_scores(_ds(ray_session, texts)).to_pandas().set_index("doc_id")
    assert out.loc[50, "lm_score"] > out.loc[0, "lm_score"]  # gibberish more surprising


def test_train_counts_exact(ray_session):
    texts = ["a b a", "b a"]
    uh, uc, bh, bc, V = train_bigram_counts(_ds(ray_session, texts), min_count=1)
    assert V == 2  # {a, b}
    assert sorted(uc.tolist()) == [2, 3]  # a x3, b x2
    # bigrams: (a,b) x1, (b,a) x2
    assert sorted(bc.tolist()) == [1, 2]
    # default pruning drops the hapax bigram (a,b), keeps (b,a) x2
    _, _, bh2, bc2, _ = train_bigram_counts(_ds(ray_session, texts))
    assert bc2.tolist() == [2]


def test_quantile_filter_matches_python(ray_session):
    import math

    from daft_minhash_dedupe_ray.functions.lm_quality import lm_quality_filter

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, 20)) for _ in range(97)]
    kept = (
        lm_quality_filter(_ds(ray_session, texts), q=0.8)
        .to_pandas()["doc_id"]
        .sort_values()
        .tolist()
    )
    scores = _oracle(texts)
    cut = sorted(scores)[math.ceil(0.8 * len(scores)) - 1]  # quantile_disc
    exp = [i for i, s in enumerate(scores) if s <= cut]
    assert kept == exp
