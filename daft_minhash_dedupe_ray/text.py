"""Text normalisation on Arrow arrays.

Parity with the reference's ``normalize`` stage (``workload/minhash_dedupe.py:197-215``,
Daft ``Expression.str.normalize``), whose semantics are pinned by
``tests/test_minhash_dedupe_unit.py:202-214``:

  all flags on:  "Hello, World! cafés  \\t\\n" -> "hello world cafe\\u0301s"
    (lowercase; punctuation stripped; NFD decomposition — the combining accent
    is KEPT as a separate codepoint; whitespace collapsed to single spaces and
    trimmed)
  all flags off: identity
  idempotent under any flag combination.

Implemented with pyarrow.compute kernels only (RE2 regex — note RE2's ``\\w``
is ASCII-only, so punctuation removal uses the unicode classes
``[^\\pL\\pN\\s_]`` to keep accented letters).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .config import NormalizeFlags

# keep letters, combining marks (so NFD accents survive, per the reference
# golden "cafés"), digits, whitespace and underscore
_PUNCT_PATTERN = r"[^\pL\pM\pN\s_]"
_WS_PATTERN = r"\s+"


def normalize_array(
    arr: pa.ChunkedArray | pa.Array, flags: NormalizeFlags
) -> pa.ChunkedArray | pa.Array:
    """Apply the reference's normalisation to a string array.

    Order matters for idempotence: NFD first (stable under repetition), then
    lowercase (NFD-lowercase commutes for the pinned goldens and is idempotent),
    punctuation strip, whitespace collapse + trim.
    """
    out = arr
    if flags.nfd_unicode:
        out = pc.utf8_normalize(out, form="NFD")
    if flags.lowercase:
        out = pc.utf8_lower(out)
    if flags.remove_punct:
        out = pc.replace_substring_regex(out, pattern=_PUNCT_PATTERN, replacement="")
    if flags.white_space:
        out = pc.replace_substring_regex(out, pattern=_WS_PATTERN, replacement=" ")
        out = pc.utf8_trim_whitespace(out)
    return out


def normalize_strings(texts: list[str], flags: NormalizeFlags) -> list[str]:
    """Convenience wrapper for plain Python lists (tests, oracles)."""
    return normalize_array(pa.array(texts, type=pa.string()), flags).to_pylist()
