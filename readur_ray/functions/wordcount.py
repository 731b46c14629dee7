"""Word counting with the reference's exact semantics (operator M17).

Replicates ``count_words_safely`` / ``count_words_in_text``
(/root/reference/src/ocr/enhanced.rs:1487-1558):

- texts > 1 MB (BYTES — Rust ``str::len``): count words in the first
  100 KB (byte slice) and extrapolate ``sample_words * len/100_000``
  truncated to int, capped at 10,000,000;
- otherwise: unicode-whitespace token count; EXCEPT when the text looks
  "continuous" (exactly 1 token and > 15 bytes) or has zero tokens but
  non-empty content, in which case: count camelCase (lower→upper) and
  letter↔digit transitions; if any, words = transitions + 1; else
  ``max(alnum_chars // 5, 1)``; pure punctuation → 0.

The hot path is vectorized with pyarrow.compute; only the rare
continuous-text rows fall back to the per-string Python routine (the
reference unit-tests these exact behaviors:
tests/integration_enhanced_ocr_tests.rs:42-144).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SAMPLE_BYTES = 100_000
_BIG_TEXT_BYTES = 1_000_000
_MAX_WORDS = 10_000_000


def _count_transitions(text: str) -> int:
    """camelCase + letter<->digit transitions (enhanced.rs:1522-1538)."""
    n = 0
    prev = ""
    for curr in text:
        if prev:
            if prev.islower() and curr.isupper():
                n += 1
            elif (prev.isalpha() and curr.isnumeric()) or (
                prev.isnumeric() and curr.isalpha()
            ):
                n += 1
        prev = curr
    return n


def count_words_in_text(text: str) -> int:
    """Exact per-string replica of enhanced.rs:1504-1558."""
    whitespace_words = len(text.split())
    byte_len = len(text.encode("utf-8", errors="surrogatepass"))
    is_continuous = whitespace_words == 1 and byte_len > 15
    is_no_words = whitespace_words == 0 and text.strip() != ""
    if not (is_continuous or is_no_words):
        return whitespace_words

    alnum = sum(1 for c in text if c.isalnum())
    if alnum == 0:
        return 0
    transitions = _count_transitions(text)
    if transitions > 0:
        return transitions + 1
    return max(alnum // 5, 1)


def count_words_safely(text: str) -> int:
    """Exact per-string replica of enhanced.rs:1487-1501 (byte slicing)."""
    raw = text.encode("utf-8", errors="surrogatepass")
    if len(raw) > _BIG_TEXT_BYTES:
        sample = raw[: min(_SAMPLE_BYTES, len(raw))].decode("utf-8", errors="ignore")
        sample_words = count_words_in_text(sample)
        estimated = int(sample_words * (len(raw) / _SAMPLE_BYTES))
        return min(estimated, _MAX_WORDS)
    return count_words_in_text(text)


def count_words_array(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized M17 over a string array.

    Fast path: ``count_substring_regex(\\S+)`` == unicode-whitespace token
    count. Rows needing the continuous-text heuristic or >1 MB sampling
    (rare in practice) are recomputed with the exact Python routine.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    ws_counts = pc.count_substring_regex(texts, pattern=r"\S+").cast(pa.int64())
    byte_len = pc.binary_length(texts).cast(pa.int64())

    needs_slow = pc.or_(
        pc.and_(pc.equal(ws_counts, 1), pc.greater(byte_len, 15)),
        pc.or_(
            pc.and_(pc.equal(ws_counts, 0), pc.greater(byte_len, 0)),
            pc.greater(byte_len, _BIG_TEXT_BYTES),
        ),
    )
    needs_slow = pc.fill_null(needs_slow, False)
    counts = ws_counts.to_numpy(zero_copy_only=False).copy()
    slow_idx = np.flatnonzero(needs_slow.to_numpy(zero_copy_only=False))
    if slow_idx.size:
        for i in slow_idx:
            v = texts[int(i)].as_py()
            counts[i] = count_words_safely(v) if v is not None else 0
    return pa.array(counts, type=pa.int64())
