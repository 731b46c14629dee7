"""Text-analysis kernels for large-scale training-data pipelines.

Language-ID (stopword n-gram heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + BPE-ish
regex) and document fingerprinting. These extend the reference's naive
text analysis (/root/reference/src/metadata_extraction.rs:139-178 — char
/word/line counts + "looks like English" stopword test) into the
operators a 100 TB text pipeline needs.

Every kernel is vectorized over Arrow string arrays with
pyarrow.compute (RE2 regexes — the same engine DuckDB uses, so the
oracle SQL in __ray_entry__ reproduces each result bit-for-bit). All
outputs are integers / strings: no floats cross the comparison
boundary.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
# ASCII classes only so RE2 (Arrow + DuckDB) and Python agree exactly.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WS_TOKEN_PATTERN = r"\S+"
PUNCT_PATTERN = r"[^A-Za-z0-9\s]"
DIGIT_PATTERN = r"[0-9]"
UPPER_PATTERN = r"[A-Z]"

# Stopword regexes per language (non-overlapping scan, word-bounded).
# The lists are tiny on purpose: the contract is deterministic parity
# with the SQL oracle, not linguistic accuracy.
STOPWORD_PATTERNS: dict[str, str] = {
    "en": r"\b(?:the|and|of|to|in|is|was|for|on|as|with|at|by|it|a)\b",
    "de": r"\b(?:der|die|das|und|ist|von|zu|mit|den|im|ein|eine|nicht|auch)\b",
    "fr": r"\b(?:le|la|les|et|des|du|est|une|pour|dans|que|sur|pas|plus)\b",
    "es": r"\b(?:el|los|las|es|un|una|por|para|con|del|no|se|su|como)\b",
}
LANG_PRIORITY = ("en", "de", "fr", "es")  # tie-break order for argmax


def _count_re(texts: pa.Array, pattern: str) -> pa.Array:
    return pc.count_substring_regex(texts, pattern=pattern).cast(pa.int64())


def token_stats(texts: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Whitespace-token and BPE-ish token counts + char/byte lengths."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    return {
        "ws_tokens": _count_re(texts, WS_TOKEN_PATTERN),
        "bpe_tokens": _count_re(texts, BPE_TOKEN_PATTERN),
        "chars": pc.utf8_length(texts).cast(pa.int64()),
        "bytes": pc.binary_length(texts).cast(pa.int64()),
    }


def stopword_hits(texts: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Per-language stopword hit counts (lowercased, word-bounded scan)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lower = pc.utf8_lower(pc.fill_null(texts, ""))
    return {
        f"hits_{lang}": _count_re(lower, pat)
        for lang, pat in STOPWORD_PATTERNS.items()
    }


def predict_lang(hits: dict[str, pa.Array]) -> pa.Array:
    """argmax over per-language hits with LANG_PRIORITY tie-break;
    all-zero → 'unknown'. Matches the CASE chain in the SQL oracle."""
    cols = np.stack(
        [hits[f"hits_{lang}"].to_numpy(zero_copy_only=False) for lang in LANG_PRIORITY]
    )
    best = np.argmax(cols, axis=0)  # first max wins == priority order
    pred = np.array(LANG_PRIORITY, dtype=object)[best]
    pred[cols.max(axis=0) == 0] = "unknown"
    return pa.array(pred, pa.string())


def quality_scores(texts: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Integer quality components + a 0-4 score.

    Components (all integer comparisons so the SQL oracle is exact):
      + ws_tokens >= 20                  (long enough)
      + 10 * hits_en >= ws_tokens        (>=10% English stopwords)
      + 5 * punct <= chars               (<=20% punctuation)
      + 10 * digits <= chars             (<=10% digits)
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    ts = token_stats(texts)
    hits = stopword_hits(texts)
    punct = _count_re(texts, PUNCT_PATTERN)
    digits = _count_re(texts, DIGIT_PATTERN)
    upper = _count_re(texts, UPPER_PATTERN)

    tok = ts["ws_tokens"].to_numpy(zero_copy_only=False)
    ch = ts["chars"].to_numpy(zero_copy_only=False)
    en = hits["hits_en"].to_numpy(zero_copy_only=False)
    pu = punct.to_numpy(zero_copy_only=False)
    dg = digits.to_numpy(zero_copy_only=False)
    score = (
        (tok >= 20).astype(np.int64)
        + (10 * en >= tok).astype(np.int64)
        + (5 * pu <= ch).astype(np.int64)
        + (10 * dg <= ch).astype(np.int64)
    )
    return {
        "ws_tokens": ts["ws_tokens"],
        "chars": ts["chars"],
        "punct": punct,
        "digits": digits,
        "upper_count": upper,
        "hits_en": hits["hits_en"],
        "quality_score": pa.array(score, pa.int64()),
    }


# ---------------------------------------------------------------------------
# fingerprinting / shingling (shared by the dedup suite)
# ---------------------------------------------------------------------------

WORD_PATTERN = r"[A-Za-z0-9]+"


def words_of(text: str) -> list[str]:
    """Lowercased alnum word list — Python mirror of
    regexp_extract_all(lower(text), '[a-z0-9]+')."""
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def shingles_of(text: str, k: int = 3) -> list[str]:
    """Distinct word k-shingles (space-joined), order-preserving-dedup."""
    ws = words_of(text)
    if len(ws) < k:
        return [" ".join(ws)] if ws else []
    seen: dict[str, None] = {}
    for i in range(len(ws) - k + 1):
        seen[" ".join(ws[i : i + k])] = None
    return list(seen)


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def md5_int60(s: str) -> int:
    """First 15 hex chars of md5 as an int (60 bits — fits UBIGINT and
    the DuckDB ('0x'||substr(md5(s),1,15))::UBIGINT cast)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_int64(s: str) -> int:
    """First 16 hex chars of md5 as an unsigned 64-bit int."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)


def fingerprint_batch(texts: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Document fingerprint: md5 over the normalized word sequence, plus
    a 60-bit rolling min-hash of word shingles (the 'winnowing floor')."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    fps, minsh, nsh = [], [], []
    for v in texts.to_pylist():
        t = v or ""
        ws = words_of(t)
        fps.append(md5_hex(" ".join(ws)))
        sh = shingles_of(t, 3)
        nsh.append(len(sh))
        minsh.append(min((md5_int60(s) for s in sh), default=0))
    return {
        "fingerprint": pa.array(fps, pa.string()),
        "min_shingle_hash": pa.array(minsh, pa.int64()),
        "n_shingles": pa.array(nsh, pa.int64()),
    }
