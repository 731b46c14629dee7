"""Real engine backends (pypdfium2 / tesserocr / pytesseract).

The OCR wheels are not installed in this container, so the functional
tests skip via importorskip; the fail-fast and factory-dispatch
behaviors run everywhere. Reference chain:
/root/reference/src/ocr/enhanced.rs:816-919 (PDF), 52-119 (image OCR).
"""

import importlib.util

import pytest

from readur_ray.config import ExtractionConfig
from readur_ray.stages.engines import (
    HermeticImageOcrEngine,
    HermeticPdfEngine,
    RealPdfEngine,
    RealTesseractEngine,
    _printable_runs_text,
    make_image_engine,
    make_pdf_engine,
)

_HAS_PDFIUM = importlib.util.find_spec("pypdfium2") is not None
_HAS_TESS = (
    importlib.util.find_spec("tesserocr") is not None
    or importlib.util.find_spec("pytesseract") is not None
)


def test_factory_dispatch_hermetic():
    cfg = ExtractionConfig()
    assert isinstance(make_pdf_engine(cfg), HermeticPdfEngine)
    assert isinstance(make_image_engine(cfg), HermeticImageOcrEngine)


@pytest.mark.skipif(_HAS_PDFIUM, reason="pypdfium2 installed — fail-fast N/A")
def test_real_pdf_engine_fails_fast_without_wheels():
    with pytest.raises(NotImplementedError, match="pypdfium2"):
        RealPdfEngine(ExtractionConfig(engine_backend="real"))


@pytest.mark.skipif(_HAS_TESS, reason="tesseract wheels installed — fail-fast N/A")
def test_real_image_engine_fails_fast_without_wheels():
    with pytest.raises(NotImplementedError):
        RealTesseractEngine(ExtractionConfig(engine_backend="real"))


def test_printable_runs_text():
    payload = b"\x00\x01abcdef\x02\x03xy\x04longword here\xff"
    out = _printable_runs_text(payload)
    assert "abcdef" in out and "longword" in out and "here" in out
    assert "xy" not in out  # runs of <=3 chars dropped


def test_real_pdf_text_layer():
    pypdfium2 = pytest.importorskip("pypdfium2")

    # build a 1-page PDF with a text layer through pdfium itself
    pdf = pypdfium2.PdfDocument.new()
    page = pdf.new_page(612, 792)
    font = pdf.add_font_standard("Helvetica")
    obj = page.add_text(font, 12)
    obj.set_text("hello from the real text layer " * 20)
    page.gen_content()
    payload = pdf.save_to_bytes()

    eng = RealPdfEngine(ExtractionConfig(engine_backend="real"))
    res = eng.extract(payload)
    assert res.kind in ("pdf_text", "pdf_ocr", "pdf_bytes")
    assert res.word_count > 0


def test_real_image_ocr():
    pytest.importorskip("PIL")
    if not _HAS_TESS:
        pytest.skip("no tesseract backend installed")
    import numpy as np
    from PIL import Image, ImageDraw

    img = Image.new("L", (400, 80), 255)
    ImageDraw.Draw(img).text((10, 20), "HELLO WORLD", fill=0)
    import io

    buf = io.BytesIO()
    img.save(buf, format="PNG")

    eng = RealTesseractEngine(ExtractionConfig(engine_backend="real"))
    res = eng.extract(buf.getvalue())
    assert res.kind == "ocr_text"
    assert isinstance(res.confidence, float)


def test_payload_codec_real_decode():
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    from readur_ray.pipelines.multimodal import PayloadCodec

    img = Image.new("L", (320, 200), 128)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    codec = PayloadCodec(use_real=True)
    w, h, nf = codec._decode_real(buf.getvalue())
    assert (w, h, nf) == (320, 200, 1)


def test_payload_codec_fake_is_default():
    from readur_ray.pipelines.multimodal import PayloadCodec

    codec = PayloadCodec()
    assert codec.real is False
    w, h, nf = codec._decode_fake(b"deterministic")
    assert codec._decode_fake(b"deterministic") == (w, h, nf)
