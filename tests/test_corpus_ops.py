"""Corpus-cleaning operator tests: PII redaction, boilerplate pruning,
benchmark-contamination flagging, grouped distinct counts (exact + oracle)."""

import numpy as np
import pyarrow as pa
import pytest

from daft_minhash_dedupe_ray.functions.textops import (
    PIIRedactor,
    contamination_flags,
    distinct_tokens_per_group,
    remove_boilerplate_tokens,
    word_ngram_hashes,
)


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(rows))), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


def test_pii_redactor_goldens(ray_session):
    t = pa.table(
        {
            "text": pa.array(
                [
                    "write to alice.smith+x@mail.example.org today",
                    "server at 192.168.001.5 rebooted",
                    "call +44 20 7946 0958 now",
                    "a@b.co then 10.0.0.1 then +1 555 0100",
                    "nothing to see here",
                    "",
                ]
            )
        }
    )
    out = PIIRedactor()(t)
    assert out["clean_text"].to_pylist() == [
        "write to <EMAIL> today",
        "server at <IP> rebooted",
        "call <PHONE> now",
        "<EMAIL> then <IP> then <PHONE>",
        "nothing to see here",
        "",
    ]
    assert out["n_redactions"].to_pylist() == [1, 1, 1, 3, 0, 0]


def test_remove_boilerplate_tokens(ray_session):
    # "spam" appears in 4/5 docs (df 0.8 >= threshold); every other token is rare
    rows = [
        "spam alpha beta",
        "spam gamma",
        "spam delta epsilon",
        "spam zeta",
        "eta theta",
    ]
    out = (
        remove_boilerplate_tokens(_docs_ds(rows), max_df_frac=0.8)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["clean_text"].tolist() == [
        "alpha beta",
        "gamma",
        "delta epsilon",
        "zeta",
        "eta theta",
    ]


def test_remove_boilerplate_none_removed(ray_session):
    rows = ["a b", "c d", "e f"]
    out = (
        remove_boilerplate_tokens(_docs_ds(rows), max_df_frac=0.9)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["clean_text"].tolist() == rows


def test_word_ngram_hashes_short_docs_yield_none():
    flat, off = word_ngram_hashes(pa.array(["one two", "a b c d", ""]), 3)
    # doc0: 2 tokens < 3 -> 0 grams; doc1: 2 grams; doc2: 0
    assert list(np.diff(off)) == [0, 2, 0]
    assert len(flat) == 2
    # identical token windows hash identically across docs
    f2, _ = word_ngram_hashes(pa.array(["x a b c y"]), 3)
    assert flat[0] in f2


def test_contamination_flags_planted(ray_session):
    bench = _docs_ds(["the quick brown fox jumps over the lazy dog"])
    corpus_rows = [
        "quick brown fox seen downtown",  # shares 'quick brown fox'
        "the lazy dog sleeps; over the lazy dog again",  # shares 2 grams
        "completely unrelated text with no shared windows",
    ]
    out = (
        contamination_flags(_docs_ds(corpus_rows), bench, ngram_size=3, min_overlap=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_overlap"].tolist() == [1, 2, 0]
    assert out["contaminated"].tolist() == [False, True, False]


def test_distinct_tokens_per_group_vs_python(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    langs = rng.choice(["aa", "bb", "cc"], size=200).tolist()
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 15))) for _ in range(200)]
    ds = rd.from_arrow(
        pa.table({"lang": pa.array(langs), "text": pa.array(texts)})
    )
    out = distinct_tokens_per_group(ds, group_col="lang")
    expect = {}
    for lang, text in zip(langs, texts):
        expect.setdefault(lang, set()).update(text.split())
    got = dict(zip(out["lang"].to_pylist(), out["n_distinct"].to_pylist()))
    assert got == {k: len(v) for k, v in expect.items()}


def test_repetition_scores_planted():
    from daft_minhash_dedupe_ray.functions.textops import repetition_scores_batch

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "spam spam spam spam spam",  # all 2-grams identical, one token
                    "a b c d e",  # no repetition
                    "x y x y x y",  # "x y"/"y x" repeat
                    "",  # empty
                ]
            ),
        }
    )
    out = repetition_scores_batch(t)
    assert out["n_grams"].to_pylist() == [4, 4, 5, 0]
    assert out["n_dup_grams"].to_pylist() == [4, 0, 5, 0]
    assert out["dup_gram_ppm"].to_pylist() == [1000000, 0, 1000000, 0]
    # top token: spam 5/5; each 1/5; x 3/6; none
    assert out["top_token_ppm"].to_pylist() == [1000000, 200000, 500000, 0]


def test_hashing_embedder_semantics(ray_session):
    import ray.data as rd

    from daft_minhash_dedupe_ray.functions.embed import HashingEmbedder, embed_documents

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",  # near-dup
        "completely different sentence about databases and shuffles",
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})
    out = HashingEmbedder(dim=64)(t)
    import numpy as np

    vecs = np.array(out["embedding"].to_pylist())
    assert vecs.shape == (4, 64)
    # unit norm (except the empty doc, which is all-zero)
    norms = np.linalg.norm(vecs, axis=1)
    assert np.allclose(norms[:3], 1.0, atol=1e-5)
    assert norms[3] == 0.0
    cos_nd = float(vecs[0] @ vecs[1])
    cos_far = float(vecs[0] @ vecs[2])
    assert cos_nd > 0.7 > cos_far, (cos_nd, cos_far)
    # determinism across actor instances
    out2 = HashingEmbedder(dim=64)(t)
    assert out2["embedding"].to_pylist() == out["embedding"].to_pylist()
    # actor-pool path produces the same embeddings
    ds = embed_documents(rd.from_arrow(t), dim=64, concurrency=2)
    got = {r["doc_id"]: r["embedding"] for r in ds.take_all()}
    for i in range(4):
        assert np.allclose(got[i], vecs[i], atol=1e-6)


def test_corpus_token_count_quantile_exact(ray_session):
    import numpy as np

    from daft_minhash_dedupe_ray.functions.textops import (
        corpus_token_count_quantile,
        quality_quantile_filter,
    )

    rng = np.random.RandomState(3)
    counts = rng.randint(0, 40, 500)
    texts = ["tok " * c if c else "" for c in counts]
    ds = _docs_ds(texts)
    for q in (0.1, 0.25, 0.5, 0.9):
        got = corpus_token_count_quantile(ds, q)
        want = float(np.quantile(counts, q, method="linear"))
        assert abs(got - want) < 1e-9, (q, got, want)
    thresh = np.quantile(counts, 0.25, method="linear")
    kept = quality_quantile_filter(ds, 0.25).to_pandas()
    assert sorted(kept["doc_id"]) == sorted(int(i) for i in np.flatnonzero(counts >= thresh))
    # empty corpus
    empty = _docs_ds([])
    assert corpus_token_count_quantile(empty, 0.5) == 0.0


def test_semantic_dedupe_planted_clusters(ray_session):
    from daft_minhash_dedupe_ray.functions.embed import semantic_dedupe

    base_a = "the quick brown fox jumps over the lazy dog near the river bank today"
    base_b = "distributed shuffles move every block across the network during wide operations"
    texts = [
        base_a,
        base_a + " indeed",          # near-para of a -> clustered with 0
        base_b,
        base_b.replace("every", "each"),  # near-para of b -> clustered with 2
        "completely unrelated short text about cooking pasta with garlic butter sauce",
    ]
    ds = _docs_ds(texts)
    out = semantic_dedupe(ds, threshold=0.8, dim=256).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 2, 4]
    assert "embedding" not in out.columns


def test_assign_splits_leakage_safe(ray_session):
    import numpy as np
    import pytest

    from daft_minhash_dedupe_ray.functions.textops import assign_splits

    texts = [f"document body {i % 300}" for i in range(3000)]  # exact dups across rows
    ds = _docs_ds(texts)
    out = assign_splits(ds, {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    # duplicates co-locate: one split per distinct text
    per_text = out.groupby(out.doc_id % 300)["split"].nunique()
    assert (per_text == 1).all()
    # fractions approximately honoured over the 300 distinct contents
    counts = out.groupby("split")["doc_id"].count() / len(out)
    assert abs(counts.get("train", 0) - 0.8) < 0.08
    assert abs(counts.get("val", 0) - 0.1) < 0.06
    # deterministic across invocations
    out2 = assign_splits(ds, {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    assert (out.sort_values("doc_id")["split"].values == out2.sort_values("doc_id")["split"].values).all()
    with pytest.raises(ValueError):
        assign_splits(ds, {"train": 0.5, "val": 0.1})
