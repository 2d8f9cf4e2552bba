"""ExactSubstr-style duplicated-span removal (functions/span_dedupe.py)."""

import numpy as np
import pyarrow as pa
import pytest

from daft_minhash_dedupe_ray.functions.span_dedupe import (
    _gram_hashes,
    _texts_flat,
    remove_dup_spans,
)


def _oracle(ids, texts, L):
    """Brute-force reference: cut every L-gram also present in a smaller doc."""
    import collections

    docs_with = collections.defaultdict(set)
    for d, x in zip(ids, texts):
        for i in range(len(x) - L + 1):
            docs_with[x[i : i + L]].add(d)
    clean, removed = [], []
    for d, x in zip(ids, texts):
        m = [False] * len(x)
        for i in range(len(x) - L + 1):
            s = docs_with[x[i : i + L]]
            if len(s) > 1 and min(s) < d:
                for j in range(i, i + L):
                    m[j] = True
        clean.append("".join(c for c, b in zip(x, m) if not b))
        removed.append(sum(m))
    return clean, removed


def _run(ray_session, ids, texts, L, **kw):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})
    out = (
        remove_dup_spans(rd.from_arrow(t).repartition(3), min_len=L, num_partitions=4, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out


FIXTURE_TEXTS = [
    "the quick brown fox jumps over the lazy dog while rain falls softly",
    "PREFIX the quick brown fox jumps over the lazy dog SUFFIX",  # interior copy
    "completely unrelated text with no shared content at all here",
    "rain falls softly on the quiet harbor town tonight",  # short shared tail
    "the quick brown fox jumps over the lazy dog while rain falls softly",  # full dup of 0
]


@pytest.mark.parametrize("L", [12, 20])
def test_matches_bruteforce_oracle(ray_session, L):
    ids = [10, 11, 12, 13, 14]
    out = _run(ray_session, ids, FIXTURE_TEXTS, L)
    clean, removed = _oracle(ids, FIXTURE_TEXTS, L)
    assert out["text_clean"].tolist() == clean
    assert out["n_removed"].tolist() == removed
    # the minimal doc keeps its copy intact; the full dup is gutted
    assert out.loc[0, "text_clean"] == FIXTURE_TEXTS[0]
    assert out.loc[4, "n_removed"] == len(FIXTURE_TEXTS[4])


def test_cogroup_fallback_matches_broadcast(ray_session):
    ids = [10, 11, 12, 13, 14]
    a = _run(ray_session, ids, FIXTURE_TEXTS, 12)
    b = _run(ray_session, ids, FIXTURE_TEXTS, 12, broadcast=False)
    assert a.equals(b)


def test_no_duplicates_is_identity(ray_session):
    ids = [1, 2]
    texts = ["alpha beta gamma delta epsilon zeta", "one two three four five six seven"]
    out = _run(ray_session, ids, texts, 10)
    assert out["text_clean"].tolist() == texts
    assert out["n_removed"].tolist() == [0, 0]


def test_short_and_empty_docs_survive(ray_session):
    ids = [1, 2, 3]
    texts = ["tiny", "", "tiny"]  # shorter than min_len: never cut
    out = _run(ray_session, ids, texts, 10)
    assert out["text_clean"].tolist() == texts
    assert out["n_removed"].tolist() == [0, 0, 0]


def test_within_doc_repeats_untouched(ray_session):
    ids = [5]
    texts = ["abcdefghijkl abcdefghijkl abcdefghijkl"]  # repeats only within one doc
    out = _run(ray_session, ids, texts, 12)
    assert out.loc[0, "n_removed"] == 0
    assert out.loc[0, "text_clean"] == texts[0]


def test_gram_hashes_respect_row_boundaries():
    # identical gram content in two rows hashes equal; windows never span rows
    texts = pa.array(["XXhello worldYY", "hello world"], pa.string())
    _, flat, offsets = _texts_flat(texts)
    h, row_idx, pos = _gram_hashes(flat, offsets, 11)
    h0 = h[(row_idx == 0) & (pos == 2)]
    h1 = h[(row_idx == 1) & (pos == 0)]
    assert len(h0) == 1 and len(h1) == 1 and h0[0] == h1[0]
    counts = np.bincount(row_idx, minlength=2)
    assert counts.tolist() == [15 - 11 + 1, 11 - 11 + 1]


def test_string_ids_supported(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "image_id": pa.array(["imgA", "imgB", "imgC"], pa.string()),
            "caption": pa.array(
                [
                    "a shared long caption describing the scene in detail",
                    "PRE a shared long caption describing the scene in detail POST",
                    "totally different words about something else entirely here",
                ],
                pa.string(),
            ),
        }
    )
    out = (
        remove_dup_spans(
            rd.from_arrow(t), min_len=20, id_col="image_id", text_col="caption", num_partitions=2
        )
        .to_pandas()
        .set_index("image_id")
    )
    assert sorted(out.index) == ["imgA", "imgB", "imgC"]
    # exactly one of A/B keeps the shared caption; the other is cut
    cut = {i for i in ("imgA", "imgB") if out.loc[i, "n_removed"] > 0}
    assert len(cut) == 1
    assert out.loc["imgC", "n_removed"] == 0
    b = remove_dup_spans(
        rd.from_arrow(t), min_len=20, id_col="image_id", text_col="caption",
        num_partitions=2, broadcast=False,
    ).to_pandas().set_index("image_id")
    assert out.sort_index().equals(b.sort_index())


def _oracle_any(ids, texts, L):
    """scope="any" reference: keeper is the lexicographically-first (doc,
    pos) occurrence of each gram; every other occurrence is covered."""
    first = {}
    for d, x in sorted(zip(ids, texts)):
        for i in range(len(x) - L + 1):
            first.setdefault(x[i : i + L], (d, i))
    clean, removed = [], []
    for d, x in zip(ids, texts):
        m = [False] * len(x)
        for i in range(len(x) - L + 1):
            if first[x[i : i + L]] != (d, i):
                for j in range(i, i + L):
                    m[j] = True
        clean.append("".join(c for c, b in zip(x, m) if not b))
        removed.append(sum(m))
    return clean, removed


def test_scope_any_cuts_within_doc_repeats(ray_session):
    ids = [10, 11, 12]
    texts = [
        "unique preamble abcdefghijklmno middle abcdefghijklmno end",  # self-repeat
        "other doc sharing abcdefghijklmno too",
        "wholly original content with nothing repeated anywhere",
    ]
    L = 15
    out = _run(ray_session, ids, texts, L, scope="any")
    clean, removed = _oracle_any(ids, texts, L)
    assert out["text_clean"].tolist() == clean
    assert out["n_removed"].tolist() == removed
    assert removed[0] > 0  # the second within-doc occurrence was cut
    # cross_doc mode leaves the self-repeat alone
    cd = _run(ray_session, ids, texts, L)
    assert cd.loc[0, "n_removed"] == 0
    # both execution paths agree
    b = _run(ray_session, ids, texts, L, scope="any", broadcast=False)
    assert out.equals(b)


def test_scope_any_matches_bruteforce_on_fixture(ray_session):
    ids = [10, 11, 12, 13, 14]
    out = _run(ray_session, ids, FIXTURE_TEXTS, 12, scope="any")
    clean, removed = _oracle_any(ids, FIXTURE_TEXTS, 12)
    assert out["text_clean"].tolist() == clean
    assert out["n_removed"].tolist() == removed
