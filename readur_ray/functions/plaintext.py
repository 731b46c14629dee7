"""Plain-text extraction (operator M10).

Replicates the reference's text/plain branch
(/root/reference/src/ocr/enhanced.rs:1441-1480):

- payload > 50 MB → error "Text file too large ..." (→ file_too_large);
- content > 10 MB (BYTES) → first 10 MB + "... [TEXT TRUNCATED DUE TO
  SIZE]" marker, NOT trimmed;
- otherwise the trimmed text;
- confidence 100.0, word_count per M17.

Vectorized over Arrow string arrays; only oversized/truncated rows take
the per-string path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .errors import ExtractionError
from .wordcount import count_words_array

MAX_TEXT_FILE_BYTES = 50 * 1024 * 1024
MAX_TEXT_CONTENT_BYTES = 10 * 1024 * 1024
TRUNCATION_MARKER = "... [TEXT TRUNCATED DUE TO SIZE]"


def extract_plain_text(text: str) -> str:
    """Per-string replica (enhanced.rs:1449-1467). Raises on >50 MB."""
    raw = text.encode("utf-8", errors="surrogatepass")
    if len(raw) > MAX_TEXT_FILE_BYTES:
        raise ExtractionError(
            f"Text file too large: {len(raw) / (1024.0 * 1024.0):.1f} MB "
            f"(max: {MAX_TEXT_FILE_BYTES / (1024.0 * 1024.0):.1f} MB). "
            "Consider splitting the file."
        )
    if len(raw) > MAX_TEXT_CONTENT_BYTES:
        head = raw[:MAX_TEXT_CONTENT_BYTES].decode("utf-8", errors="ignore")
        return head + TRUNCATION_MARKER
    return text.strip()


def extract_plain_text_array(
    texts: pa.Array | pa.ChunkedArray,
) -> tuple[pa.Array, pa.Array, pa.Array]:
    """Vectorized M10: returns (extracted_text, word_count, too_large_mask).

    Rows over the 50 MB cap keep '' text / 0 words and are flagged in the
    mask so the caller can emit file_too_large failure rows.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    byte_len = pc.binary_length(texts).cast(pa.int64())
    too_large = pc.greater(byte_len, MAX_TEXT_FILE_BYTES)
    needs_trunc = pc.and_(
        pc.greater(byte_len, MAX_TEXT_CONTENT_BYTES), pc.invert(too_large)
    )

    out = pc.utf8_trim_whitespace(texts)
    n_special = pc.sum(pc.or_(too_large, needs_trunc)).as_py() or 0
    if n_special:
        py = out.to_pylist()
        tl = too_large.to_numpy(zero_copy_only=False)
        tr = needs_trunc.to_numpy(zero_copy_only=False)
        for i in np.flatnonzero(tl | tr):
            py[int(i)] = "" if tl[i] else extract_plain_text(texts[int(i)].as_py())
        out = pa.array(py, type=pa.string())

    words = count_words_array(out)
    if n_special:
        words = pc.if_else(too_large, pa.scalar(0, pa.int64()), words)
    return out, words, too_large
