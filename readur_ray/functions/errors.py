"""Failure taxonomy + error classifier (operator M19).

- ``FAILURE_REASONS`` / ``FAILURE_STAGES`` mirror the reference enums
  (/root/reference/src/models/document.rs:51-103).
- ``classify_error`` replicates ``classify_ocr_error``
  (/root/reference/src/ocr/queue.rs:1193-1215): ordered substring match
  over the error text → (failure_reason, suppress_log).
"""

from __future__ import annotations

FAILURE_REASONS = frozenset(
    {
        "duplicate_content", "duplicate_filename", "unsupported_format",
        "file_too_large", "file_corrupted", "access_denied",
        "low_ocr_confidence", "ocr_timeout", "ocr_memory_limit",
        "pdf_parsing_error", "storage_quota_exceeded", "network_error",
        "permission_denied", "virus_detected", "invalid_structure",
        "policy_violation", "other",
    }
)

FAILURE_STAGES = frozenset(
    {"ingestion", "validation", "ocr", "storage", "processing", "sync"}
)

# Ordered (first match wins) — queue.rs:1193-1215.
_RULES: tuple[tuple[tuple[str, ...], str, bool], ...] = (
    (("font encoding", "missing unicode map"), "pdf_parsing_error", True),
    (("corrupted internal structure", "corrupted"), "file_corrupted", True),
    (("timeout", "timed out"), "ocr_timeout", False),
    (("memory", "out of memory"), "ocr_memory_limit", False),
    (("panic",), "pdf_parsing_error", True),
    (("unsupported",), "unsupported_format", False),
    (("too large", "file size"), "file_too_large", False),
    (("No extractable text", "0 words"), "low_ocr_confidence", False),
    (("validation", "document may have been modified"), "other", False),
)


def classify_error(error_str: str) -> tuple[str, bool]:
    """M19: map an error message to (failure_reason, suppress_log)."""
    for needles, reason, suppress in _RULES:
        if any(n in error_str for n in needles):
            return reason, suppress
    return "other", False


# Recoverable failure reasons (retried up to max_attempts before
# dead-lettering) — mirrors OcrError::is_recoverable
# (/root/reference/src/ocr/error.rs:53-60: InsufficientMemory,
# OcrTimeout, LowConfidence; everything else is terminal).
RECOVERABLE_REASONS = frozenset(
    {"ocr_memory_limit", "ocr_timeout", "low_ocr_confidence"}
)


def is_recoverable_reason(reason: str) -> bool:
    return reason in RECOVERABLE_REASONS


class ExtractionError(Exception):
    """Engine-raised error whose message drives classify_error."""


def failure_for_message(msg: str) -> tuple[str, str]:
    """Map an engine error message to (failure_reason, failure_stage).

    Shared by the Ray pipeline and the oracle so the doc-level contract
    has exactly one definition. Stage rule: header/size/type rejections
    are 'validation'; everything else surfaced during extraction is
    'ocr' (mirroring where the reference raises them,
    enhanced.rs:824-851 vs queue.rs:336-590).
    """
    if msg.startswith("OCR validation failed"):
        reason = "low_ocr_confidence"
    else:
        reason, _suppress = classify_error(msg)
    if "Invalid PDF" in msg or "too large" in msg or msg.startswith("unsupported file type"):
        stage = "validation"
    else:
        stage = "ocr"
    return reason, stage
