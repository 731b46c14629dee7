"""Bounded in-actor retry semantics (queue.rs attempts loop +
OcrError::is_recoverable taxonomy, /root/reference/src/ocr/error.rs:
53-60, src/ocr/tests.rs:115-123)."""

from __future__ import annotations

import pytest

from readur_ray.config import ExtractionConfig
from readur_ray.functions.errors import (
    ExtractionError,
    is_recoverable_reason,
)
from readur_ray.pipelines.extract import DocExtractor


def test_recoverability_taxonomy():
    # mirrors src/ocr/tests.rs:115-123
    assert is_recoverable_reason("ocr_memory_limit")
    assert is_recoverable_reason("ocr_timeout")
    assert is_recoverable_reason("low_ocr_confidence")
    assert not is_recoverable_reason("file_corrupted")
    assert not is_recoverable_reason("unsupported_format")
    assert not is_recoverable_reason("pdf_parsing_error")


class _Flaky:
    def __init__(self, fail_times: int, message: str):
        self.fail_times = fail_times
        self.message = message
        self.calls = 0

    def __call__(self):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ExtractionError(self.message)
        return "ok"


def _extractor(max_attempts=3):
    return DocExtractor(ExtractionConfig(max_attempts=max_attempts))


def test_recoverable_failure_retried_until_success():
    ex = _extractor()
    flaky = _Flaky(2, "OCR processing timed out after 30s")
    assert ex._with_retry(flaky) == "ok"
    assert flaky.calls == 3


def test_recoverable_failure_exhausts_attempts():
    ex = _extractor(max_attempts=3)
    flaky = _Flaky(99, "OCR processing timed out after 30s")
    with pytest.raises(ExtractionError):
        ex._with_retry(flaky)
    assert flaky.calls == 3  # max_attempts total tries


def test_terminal_failure_not_retried():
    ex = _extractor()
    flaky = _Flaky(99, "PDF has corrupted internal structure")
    with pytest.raises(ExtractionError):
        ex._with_retry(flaky)
    assert flaky.calls == 1
