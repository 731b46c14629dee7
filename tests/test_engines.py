"""Hermetic engine behavior per fixture class (FIXTURES.md §3)."""

import pytest

from readur_ray import synth
from readur_ray.functions.errors import ExtractionError
from readur_ray.stages.engines import HermeticImageOcrEngine, HermeticPdfEngine


@pytest.fixture(scope="module")
def pdf():
    return HermeticPdfEngine()


@pytest.fixture(scope="module")
def img():
    return HermeticImageOcrEngine()


def test_pdf_text_layer_quick_path(pdf):
    payload = synth.pdf_payload("d1", 0, "pdf_text_layer", pages=2)
    res = pdf.extract(payload)
    assert res.kind == "pdf_text"
    assert res.confidence == 95.0
    assert "\n\n" in res.text  # pages joined
    assert res.word_count > 0


def test_pdf_scanned_ocr_path(pdf):
    payload = synth.pdf_payload("d2", 0, "pdf_scanned", pages=3)
    res = pdf.extract(payload)
    assert res.kind == "pdf_ocr"
    assert res.confidence == 85.0
    assert len(res.text.split("\n\n")) == 3


def test_pdf_fake_rejected(pdf):
    payload = synth.pdf_payload("d3", 0, "pdf_fake", pages=1)
    with pytest.raises(ExtractionError, match="Invalid PDF"):
        pdf.extract(payload)


def test_pdf_corrupt(pdf):
    payload = synth.pdf_payload("d4", 0, "pdf_corrupt", pages=1)
    with pytest.raises(ExtractionError, match="corrupted internal structure"):
        pdf.extract(payload)


def test_pdf_font_encoding(pdf):
    payload = synth.pdf_payload("d5", 0, "pdf_font_enc", pages=1)
    with pytest.raises(ExtractionError, match="font encoding"):
        pdf.extract(payload)


def test_pdf_oversized(pdf):
    payload = synth.pdf_payload("d6", 0, "pdf_text_layer", pages=1)
    with pytest.raises(ExtractionError, match="too large"):
        pdf.extract(payload, declared_size=120 * 1024 * 1024)


def test_pdf_window_equals_full_join(pdf):
    """Page-window extraction reassembles to the same text as whole-doc."""
    full = pdf.extract(synth.pdf_payload("d7", 0, "pdf_scanned", pages=40))
    parts = []
    for a in range(0, 40, 16):
        b = min(a + 16, 40)
        parts.append(
            pdf.extract(synth.pdf_payload("d7", 0, "pdf_scanned", pages=40, p0=a, p1=b)).text
        )
    assert "\n\n".join(parts) == full.text


def test_pdf_ocr_strategy_fallback_chain(pdf):
    """The reference tries 3 progressive ocrmypdf strategies
    (enhanced.rs:1008-1052); the %OCRFAILS(n)% marker fails the first n
    hermetically and the winning strategy lands in
    preprocessing_applied."""
    from readur_ray.stages.engines import OCR_STRATEGY_LABELS

    base = synth.pdf_payload("ds", 0, "pdf_scanned", pages=2)
    res1 = pdf.extract(base)
    assert res1.preprocessing_applied == [OCR_STRATEGY_LABELS[0]]

    res2 = pdf.extract(base + b"%OCRFAILS(1)%")
    assert res2.kind == "pdf_ocr"
    assert res2.text == res1.text
    assert res2.preprocessing_applied == [OCR_STRATEGY_LABELS[1]]

    res3 = pdf.extract(base + b"%OCRFAILS(2)%")
    assert res3.preprocessing_applied == [OCR_STRATEGY_LABELS[2]]

    # all three fail → the OCR step errors; the chain falls through to
    # the byte-scan last resort (which succeeds on this payload)
    res4 = pdf.extract(base + b"%OCRFAILS(3)%")
    assert res4.kind == "pdf_bytes"
    assert res4.confidence == 50.0


def test_pdf_quick_path_lineage(pdf):
    res = pdf.extract(synth.pdf_payload("dq", 0, "pdf_text_layer", pages=2))
    assert res.preprocessing_applied == ["PDF text extraction (pdftotext)"]


def test_img_ok(img):
    payload = synth.img_payload("d8", 0, "img_ok")
    res = img.extract(payload)
    assert res.kind == "ocr_text"
    assert res.confidence >= 30.0
    assert res.word_count > 0


def test_img_preprocessing_decisions(img):
    # deterministic class with extreme dims exercises P1/P2
    found = set()
    for i in range(30):
        res = img.extract(synth.img_payload("dd", i, "img_skew_dims"))
        found.update(res.preprocessing_applied)
    assert any("resize_down" in p or "upscale" in p for p in found)


def test_img_dimension_cap(img):
    head = b"\x89PNG\r\n\x1a\n" + b"SYNTH;w=20000;h=100;conf=50.0;\nOCRDATA:;END"
    with pytest.raises(ExtractionError, match="too large"):
        img.extract(head)


def test_img_not_an_image(img):
    with pytest.raises(ExtractionError, match="unsupported"):
        img.extract(b"PK\x03\x04whatever")


def test_determinism():
    a = synth.pdf_payload("dx", 0, "pdf_scanned", pages=5)
    b = synth.pdf_payload("dx", 0, "pdf_scanned", pages=5)
    assert a == b
    r1 = HermeticPdfEngine().extract(a)
    r2 = HermeticPdfEngine().extract(b)
    assert (r1.text, r1.confidence, r1.kind) == (r2.text, r2.confidence, r2.kind)
