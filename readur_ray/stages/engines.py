"""Hermetic PDF / image-OCR engines (operators M11-M16, P1-P2).

These parse the deterministic synthetic payload formats documented in
readur_ray.synth, reproducing the reference's *orchestration and
outcome semantics*:

- PDF chain (M15, /root/reference/src/ocr/enhanced.rs:816-919):
  size cap → header validation (M7) → quick text-layer parse (M11) →
  quality gate (M13) → OCR path (M14, confidence 85.0) → direct-bytes
  last resort (M12, confidence 50.0); quick path confidence 95.0.
- Fatal classified errors (corrupted structure, font encoding) abort
  the chain instead of falling through to the byte-scan — matching the
  reference's observed fixture outcomes (corrupted_structure.pdf /
  invalid_font_encoding.pdf → file_corrupted / pdf_parsing_error in
  tests/integration_ocr_corruption_tests.rs) rather than returning
  byte-scan garbage at confidence 50.
- Image OCR (M16 + preprocessing decisions P1/P2,
  enhanced.rs:339-386): dimension caps, orientation/resize decisions
  recorded in ``preprocessing_applied``, confidence = engine-reported
  mean (embedded in the synthetic payload, standing in for Tesseract's
  ``mean_text_conf``).

Real engines (pdfium / tesserocr / ocrmypdf) are not installed in this
container; ``RealPdfEngine`` / ``RealTesseractEngine`` are
clearly-marked stubs behind import guards with the same interface.
"""

from __future__ import annotations

import base64
import re
import time
from dataclasses import dataclass, field

from ..config import ExtractionConfig
from ..functions.errors import ExtractionError
from ..functions.mime import is_valid_pdf
from ..functions.quality import pdf_text_quality_sufficient
from ..functions.wordcount import count_words_safely

_PAGE_RE = re.compile(rb"<<PAGE (\d+)>>")


def _burn_ms(ms: float) -> None:
    """Occupy this core for ~ms milliseconds of ALU work (simulated
    OCR inference; see ExtractionConfig.simulated_ocr_ms_per_page)."""
    if ms <= 0:
        return
    end = time.perf_counter() + ms / 1000.0
    x = 0
    while time.perf_counter() < end:
        for _ in range(256):
            x = (x * 1664525 + 1013904223) & 0xFFFFFFFF

_BT_RE = re.compile(rb"BT \((.*?)\) ET", re.S)
_OCR_RE = re.compile(rb"%OCR\(([A-Za-z0-9+/=]*)\|([0-9.]+)\)")
_IMG_HEAD_RE = re.compile(rb"SYNTH;w=(\d+);h=(\d+);conf=([0-9.]+);")
_OCRDATA_RE = re.compile(rb"OCRDATA:([A-Za-z0-9+/=]*);END")


@dataclass
class EngineResult:
    text: str
    confidence: float
    kind: str                    # pdf_text | pdf_ocr | pdf_bytes | ocr_text
    word_count: int
    preprocessing_applied: list[str] = field(default_factory=list)
    processing_time_ms: int = 0


class HermeticPdfEngine:
    """Parses the synthetic PDF payload format. Stateless but kept as an
    object so a real engine (warm pdfium handle) slots in unchanged."""

    def __init__(self, cfg: ExtractionConfig | None = None):
        self.cfg = cfg or ExtractionConfig()

    # -- M11 analog: quick text-layer extraction -------------------------
    def _quick_text(self, payload: bytes) -> str:
        if b"FONTENCERR" in payload:
            raise ExtractionError("invalid font encoding in embedded font")
        pages = _PAGE_RE.split(payload)
        if len(pages) < 2:
            raise ExtractionError("PDF has corrupted internal structure")
        # split() yields [pre, num, body, num, body, ...]
        bodies = pages[2::2]
        page_texts = []
        for body in bodies:
            chunks = [m.decode("utf-8", errors="ignore") for m in _BT_RE.findall(body)]
            page_texts.append(" ".join(chunks))
        return "\n\n".join(page_texts).strip()

    # -- M14 analog: OCR the rasterized pages ----------------------------
    def _ocr_text(self, payload: bytes) -> tuple[str, float]:
        matches = _OCR_RE.findall(payload)
        if not matches:
            raise ExtractionError("No extractable text found by OCR (0 words)")
        texts = [base64.b64decode(b64).decode("utf-8", errors="ignore") for b64, _ in matches]
        return "\n\n".join(texts).strip(), self.cfg.conf_pdf_ocr

    # -- M12 analog: direct byte-scan last resort ------------------------
    def _bytes_text(self, payload: bytes) -> str:
        words: list[str] = []
        for m in _BT_RE.findall(payload):
            words.extend(m.decode("utf-8", errors="ignore").split())
        run: list[str] = []
        cur = []
        for b in payload:
            if 32 <= b <= 126:
                cur.append(chr(b))
            else:
                if len(cur) > 3:
                    run.append("".join(cur))
                cur = []
        if len(cur) > 3:
            run.append("".join(cur))
        for token in " ".join(run).split():
            words.append(token)
        cleaned = " ".join(w for w in words if len(w) > 1)
        if not cleaned.strip():
            raise ExtractionError("No readable text found in PDF")
        return cleaned

    def extract(self, payload: bytes, declared_size: int | None = None) -> EngineResult:
        t0 = time.perf_counter()
        size = declared_size if declared_size is not None else len(payload)
        if size > self.cfg.max_pdf_bytes:
            raise ExtractionError(
                f"PDF file too large: {size / (1024.0 * 1024.0):.1f} MB "
                f"(max: {self.cfg.max_pdf_bytes / (1024.0 * 1024.0):.1f} MB)."
            )
        if not is_valid_pdf(payload[:1024]):
            raise ExtractionError(
                "Invalid PDF file: Missing or corrupted PDF header"
            )
        _burn_ms(self.cfg.simulated_ocr_ms_per_page
                 * max(1, len(_PAGE_RE.findall(payload))))
        # quick path → quality gate → OCR → byte-scan (enhanced.rs:861-919)
        text = self._quick_text(payload)        # fatal errors propagate
        wc = count_words_safely(text)
        if pdf_text_quality_sufficient(text, wc, size):
            ms = int((time.perf_counter() - t0) * 1000)
            return EngineResult(text, self.cfg.conf_pdf_quick, "pdf_text", wc,
                                ["PDF text extraction (pdftotext)"], ms)
        try:
            text, conf = self._ocr_text(payload)
            wc = count_words_safely(text)
            if wc > 0:
                ms = int((time.perf_counter() - t0) * 1000)
                return EngineResult(text, conf, "pdf_ocr", wc,
                                    ["PDF OCR (ocrmypdf force-ocr)"], ms)
            raise ExtractionError("No extractable text found by OCR (0 words)")
        except ExtractionError as ocr_err:
            try:
                text = self._bytes_text(payload)
            except ExtractionError:
                raise ocr_err from None
            wc = count_words_safely(text)
            ms = int((time.perf_counter() - t0) * 1000)
            return EngineResult(text, self.cfg.conf_pdf_bytes, "pdf_bytes", wc,
                                ["Direct PDF text extraction (last resort)"], ms)


class HermeticImageOcrEngine:
    """Parses the synthetic image payload; P1/P2 preprocessing decisions
    are computed from the embedded dimensions (enhanced.rs:339-386)."""

    def __init__(self, cfg: ExtractionConfig | None = None):
        self.cfg = cfg or ExtractionConfig()

    def extract(self, payload: bytes) -> EngineResult:
        t0 = time.perf_counter()
        if not (payload.startswith(b"\x89PNG\r\n\x1a\n") or payload.startswith(b"\xff\xd8\xff")):
            raise ExtractionError("unsupported image format")
        _burn_ms(self.cfg.simulated_ocr_ms_per_page)
        head = _IMG_HEAD_RE.search(payload)
        data = _OCRDATA_RE.search(payload)
        if head is None or data is None:
            raise ExtractionError("corrupted image payload")
        w, h = int(head.group(1)), int(head.group(2))
        conf = float(head.group(3))
        max_w, max_h = self.cfg.max_image_pixels
        if w > max_w or h > max_h:
            raise ExtractionError(
                f"Image too large: {w}x{h} (max: {max_w}x{max_h})"
            )
        prep: list[str] = []
        if self.cfg.enable_image_preprocessing:
            # full P1-P12 chain over the (synthetic) decoded array; the
            # hermetic decode is capped at 384px per side so the chain
            # cost stays bounded (real decoders pass the true array)
            from .preprocess import preprocess_image, synth_gray_image

            arr = synth_gray_image(payload, min(w, 384), min(h, 384))
            _, _, prep = preprocess_image(arr, self.cfg.preprocess_settings())
            if h > 0 and w / h > 2.0 and "orientation_correction" not in prep:
                prep.insert(0, "orientation_correction")
        else:
            if h > 0 and w / h > 2.0:
                prep.append("orientation_correction(rotate90)")   # P1
            if max(w, h) > 2048:
                prep.append("resize_down(2048)")                   # P2
            elif min(w, h) < 300:
                prep.append("upscale(600)")                        # P2
        text = base64.b64decode(data.group(1)).decode("utf-8", errors="ignore")
        wc = count_words_safely(text)
        ms = int((time.perf_counter() - t0) * 1000)
        return EngineResult(text, conf, "ocr_text", wc, prep, ms)


class RealPdfEngine:
    """STUB — real pdfium/pdfminer/ocrmypdf backend (not in container)."""

    def __init__(self, cfg: ExtractionConfig | None = None):
        try:
            import pypdfium2  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "RealPdfEngine requires pypdfium2/ocrmypdf which are not "
                "installed in this environment; use HermeticPdfEngine."
            ) from e

    def extract(self, payload: bytes, declared_size: int | None = None) -> EngineResult:
        raise NotImplementedError


class RealTesseractEngine:
    """STUB — real tesserocr backend (not in container)."""

    def __init__(self, cfg: ExtractionConfig | None = None):
        try:
            import tesserocr  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "RealTesseractEngine requires tesserocr which is not "
                "installed in this environment; use HermeticImageOcrEngine."
            ) from e

    def extract(self, payload: bytes) -> EngineResult:
        raise NotImplementedError
