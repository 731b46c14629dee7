"""Unit tests for classification / validation / gating primitives,
porting the reference's own unit cases (SURVEY.md §5)."""

import pytest

from readur_ray.functions.errors import classify_error, failure_for_message
from readur_ray.functions.mime import (
    are_mime_types_compatible,
    detect_mime_from_content,
    is_valid_pdf,
    sniff_magic,
)
from readur_ray.functions.plaintext import (
    TRUNCATION_MARKER,
    extract_plain_text,
)
from readur_ray.functions.quality import (
    pdf_text_quality_sufficient,
    validate_ocr_quality,
)
from readur_ray.functions.cost import calculate_priority


# ---- M7: PDF magic (enhanced.rs:1618-1635; src/tests + watcher dup) ----

def test_pdf_magic_plain():
    assert is_valid_pdf(b"%PDF-1.4\nrest")


def test_pdf_magic_leading_junk():
    assert is_valid_pdf(b"\x00\x00junk%PDF-1.7")


def test_pdf_magic_beyond_1kb_rejected():
    assert not is_valid_pdf(b"x" * 1100 + b"%PDF-1.4")


def test_pdf_magic_too_short():
    assert not is_valid_pdf(b"%PDF")


# ---- M1-M3: mime detection (mime_detection.rs:344-431 test tables) ----

def test_magic_bytes_tables():
    assert sniff_magic(b"%PDF-1.5 x") == "application/pdf"
    assert sniff_magic(b"\x89PNG\r\n\x1a\nxxx") == "image/png"
    assert sniff_magic(b"\xff\xd8\xff\xe0") == "image/jpeg"
    assert sniff_magic(b"PK\x03\x04zip") == "application/zip"
    assert sniff_magic(b"plain text") is None


def test_content_overrides_untrusted_server():
    got = detect_mime_from_content(b"%PDF-1.4", "f.bin", "application/octet-stream")
    assert got == "application/pdf"


def test_trusted_server_used_when_no_magic():
    got = detect_mime_from_content(b"hello world", "f.xyz", "text/markdown")
    assert got == "text/markdown"


def test_extension_fallback():
    got = detect_mime_from_content(b"hello world", "f.txt", "application/octet-stream")
    assert got == "text/plain"


def test_compat_pairs():
    assert are_mime_types_compatible("image/jpeg", "image/jpg")
    assert are_mime_types_compatible("image/png", "image/webp")  # same primary
    assert not are_mime_types_compatible("image/png", "application/pdf")


# ---- M13: PDF extraction-quality gate (enhanced.rs:923-976) ----

def test_gate_zero_words():
    assert not pdf_text_quality_sufficient("", 0, 10_000)


def test_gate_small_file_one_word():
    assert pdf_text_quality_sufficient("word", 1, 10_000)


def test_gate_substantial_words():
    assert pdf_text_quality_sufficient("w " * 50, 50, 10_000_000)


def test_gate_low_density_rejected():
    # 5 words in 100KB -> density 0.05 < 5, words < 10 -> OCR
    assert not pdf_text_quality_sufficient("a b c d e", 5, 100_000)


def test_gate_low_alnum_ratio_rejected():
    text = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))" * 2
    assert not pdf_text_quality_sufficient(text, 20, 60_000)


# ---- M18: OCR quality validator (enhanced.rs:1562-1597) ----

def test_validator_confidence_gate():
    ok, _ = validate_ocr_quality("hello world", 29.9, 2, 30.0)
    assert not ok
    ok, _ = validate_ocr_quality("hello world", 30.0, 2, 30.0)
    assert ok


def test_validator_zero_words():
    ok, _ = validate_ocr_quality("???", 90.0, 0, 30.0)
    assert not ok


def test_validator_alnum_ratio():
    ok, _ = validate_ocr_quality("a!!!!!!!!!", 90.0, 1, 30.0)
    assert not ok  # 1 alnum / 10 bytes = 0.1 < 0.3


# ---- M19: error classifier (queue.rs:1193-1215) ----

@pytest.mark.parametrize(
    "msg,reason,suppress",
    [
        ("bad font encoding in object 12", "pdf_parsing_error", True),
        ("missing unicode map for glyph", "pdf_parsing_error", True),
        ("PDF has corrupted internal structure", "file_corrupted", True),
        ("stream corrupted near xref", "file_corrupted", True),
        ("operation timed out after 300s", "ocr_timeout", False),
        ("out of memory allocating page", "ocr_memory_limit", False),
        ("thread panic while rendering", "pdf_parsing_error", True),
        ("unsupported image colorspace", "unsupported_format", False),
        ("PDF file too large: 120.0 MB", "file_too_large", False),
        ("No extractable text found in document (0 words)", "low_ocr_confidence", False),
        ("document may have been modified concurrently", "other", False),
        ("some unknown failure", "other", False),
    ],
)
def test_classifier_table(msg, reason, suppress):
    assert classify_error(msg) == (reason, suppress)


def test_failure_stage_mapping():
    assert failure_for_message("PDF file too large: 120.0 MB") == (
        "file_too_large", "validation")
    assert failure_for_message("Invalid PDF file: Missing or corrupted PDF header") == (
        "file_corrupted", "validation")
    assert failure_for_message("No extractable text found in document (0 words)") == (
        "low_ocr_confidence", "ocr")


# ---- M10: plain-text extraction (enhanced.rs:1441-1480) ----

def test_plain_trim():
    assert extract_plain_text("  hello world \n") == "hello world"


def test_plain_truncation_marker():
    text = "x" * (10 * 1024 * 1024 + 5)
    out = extract_plain_text(text)
    assert out.endswith(TRUNCATION_MARKER)
    assert len(out) == 10 * 1024 * 1024 + len(TRUNCATION_MARKER)


def test_plain_too_large_raises():
    from readur_ray.functions.errors import ExtractionError

    with pytest.raises(ExtractionError, match="too large"):
        extract_plain_text("y" * (50 * 1024 * 1024 + 1))


# ---- M20: priority (batch_ingest.rs:281-294 + watcher.rs:553-577) ----

@pytest.mark.parametrize(
    "size,mime,prio",
    [
        (500_000, "application/pdf", 10),
        (3 * 1024 * 1024, "application/pdf", 8),
        (8 * 1024 * 1024, "application/pdf", 6),
        (30 * 1024 * 1024, "application/pdf", 4),
        (80 * 1024 * 1024, "application/pdf", 2),
        (500_000, "image/png", 10),        # capped at 10
        (8 * 1024 * 1024, "image/png", 8),  # +2 boost
        (8 * 1024 * 1024, "text/plain", 7),  # +1 boost
    ],
)
def test_priority_buckets(size, mime, prio):
    assert calculate_priority(size, mime) == prio


def test_hll_bit_length_exact():
    """_bit_length must equal int.bit_length everywhere the HLL suffix
    domain reaches — exhaustive near every power of two (the float-log2
    rounding pitfall) plus random 52-bit values."""
    import numpy as np

    from readur_ray.pipelines.analytics import _bit_length

    vals = [0, 1, 2, 3]
    for k in range(1, 53):
        vals += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    rng = np.random.default_rng(5)
    vals += rng.integers(0, 1 << 52, size=10_000).tolist()
    arr = np.array(vals, dtype=np.int64)
    got = _bit_length(arr)
    expect = np.array([int(v).bit_length() for v in vals], dtype=np.int64)
    assert (got == expect).all()
