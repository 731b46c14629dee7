"""Quality gates (operators M13, M18).

- ``pdf_text_quality_sufficient``: decides text-layer vs OCR path for a
  PDF, replicating /root/reference/src/ocr/enhanced.rs:923-976.
- ``validate_ocr_quality``: post-extraction gate, replicating
  /root/reference/src/ocr/enhanced.rs:1562-1597 (confidence threshold,
  zero words, alphanumeric ratio < 0.3 → reject). NOTE the reference
  divides unicode-alnum CHAR count by BYTE length (Rust ``str::len``);
  we keep that quirk.
"""

from __future__ import annotations

MIN_WORD_DENSITY = 5.0
MIN_WORDS_FOR_LARGE_FILES = 10
SUBSTANTIAL_WORD_COUNT = 50
SMALL_FILE_BYTES = 50_000


def _alnum_ratio(text: str) -> float:
    byte_len = len(text.encode("utf-8", errors="surrogatepass"))
    if byte_len == 0:
        return 0.0
    alnum = sum(1 for c in text if c.isalnum())
    return alnum / byte_len


def pdf_text_quality_sufficient(text: str, word_count: int, file_size: int) -> bool:
    """M13: enhanced.rs:923-976, thresholds bit-for-bit."""
    if word_count == 0:
        return False
    if file_size < SMALL_FILE_BYTES and word_count >= 1:
        return True
    if word_count >= SUBSTANTIAL_WORD_COUNT:
        return True
    density = word_count / (file_size / 1024.0)
    if density < MIN_WORD_DENSITY and word_count < MIN_WORDS_FOR_LARGE_FILES:
        return False
    if _alnum_ratio(text) < 0.3:
        return False
    return True


def validate_ocr_quality(
    text: str, confidence: float, word_count: int, min_confidence: float
) -> tuple[bool, str]:
    """M18: enhanced.rs:1562-1597. Returns (ok, rejection detail)."""
    if confidence < min_confidence:
        return False, f"below confidence threshold: {confidence:.1f} < {min_confidence:.1f}"
    if word_count == 0:
        return False, "OCR result contains no words"
    if len(text) == 0:
        return False, "empty text"
    if _alnum_ratio(text) < 0.3:
        return False, "low alphanumeric ratio"
    return True, ""
