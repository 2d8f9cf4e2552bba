"""Normalize semantics, pinned from the reference
(tests/test_minhash_dedupe_unit.py:194-214)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from daft_minhash_dedupe_ray.config import NormalizeFlags
from daft_minhash_dedupe_ray.text import normalize_strings

GOLDEN_IN = "Hello, World! cafés  \t\n"


def test_normalize_all_flags_golden():
    out = normalize_strings([GOLDEN_IN], NormalizeFlags(True, True, True, True))[0]
    # NFD keeps the combining acute accent as its own codepoint
    assert out == "hello world cafés"


def test_normalize_no_flags_identity():
    out = normalize_strings([GOLDEN_IN], NormalizeFlags(False, False, False, False))[0]
    assert out == GOLDEN_IN


def test_normalize_reference_default_flags():
    # the reference pipeline default: nfd + whitespace only
    out = normalize_strings([GOLDEN_IN], NormalizeFlags())[0]
    assert out == "Hello, World! cafés"


@given(st.text(max_size=80), st.booleans(), st.booleans(), st.booleans(), st.booleans())
@settings(max_examples=100, deadline=None)
def test_normalize_idempotent(text, rp, lc, nfd, ws):
    flags = NormalizeFlags(rp, lc, nfd, ws)
    once = normalize_strings([text], flags)[0]
    twice = normalize_strings([once], flags)[0]
    assert once == twice


def test_normalize_nulls_pass_through():
    import pyarrow as pa

    from daft_minhash_dedupe_ray.text import normalize_array

    arr = pa.array(["A  b", None], pa.string())
    out = normalize_array(arr, NormalizeFlags(True, True, True, True)).to_pylist()
    assert out == ["a b", None]


def test_bpe_token_count_batch():
    import pyarrow as pa

    from daft_minhash_dedupe_ray.functions.textops import bpe_token_count_batch

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["Hello, world! It's 2026.", "", "   ", "don't stop-me now 3.14"]),
        }
    )
    out = bpe_token_count_batch(t)["n_bpe_tokens"].to_pylist()
    # [Hello][,][ world][!][ It]['s][ 2026][.] / [] / [ws-run] / [don]['t][ stop][-][me][ now][ 3][.][14]
    assert out == [8, 0, 1, 9]
