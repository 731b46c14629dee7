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

``RealPdfEngine`` / ``RealTesseractEngine`` are FULL implementations of
the same interface (pdfium text layer → quality gate → 300-dpi
rasterize + Tesseract; warm tesserocr handle per actor) behind
fail-fast import guards — the container ships no pdfium/tesseract
wheels, so their tests skip here, but the code paths are complete and
selected with ``engine_backend='real'``.

The reference's ocrmypdf step tries THREE progressive strategy
invocations before failing (enhanced.rs:1008-1052: 1. force-ocr -O2
--deskew --clean; 2. --fix-metadata --remove-background -O1;
3. --skip-big); both engines model that chain and record the winning
strategy in ``preprocessing_applied``. The hermetic payload marker
``%OCRFAILS(n)%`` makes the first n strategies fail (n ≥ 3 → the whole
OCR step errors), so fallback behavior is unit-testable.
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
_OCRFAILS_RE = re.compile(rb"%OCRFAILS\((\d)\)%")

# The reference's progressive ocrmypdf fallback chain
# (/root/reference/src/ocr/enhanced.rs:1008-1052); the winning strategy
# is recorded in preprocessing_applied.
OCR_STRATEGY_LABELS = [
    "OCR via ocrmypdf (strategy 1: --force-ocr -O2 --deskew --clean)",
    "OCR via ocrmypdf (strategy 2: --fix-metadata --remove-background -O1)",
    "OCR via ocrmypdf (strategy 3: --skip-big)",
]
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
    pages_ocrd: int = 0          # pages actually run through OCR (north-star
                                 # metrics field; 0 for text-layer/byte-scan)
    processed_dims: tuple[int, int, int] | None = None
                                 # (width, height, bytes) of the PREPROCESSED
                                 # image when preprocessing produced a new
                                 # artifact (OcrResult.processed_image_path,
                                 # enhanced.rs:96-108); None otherwise


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
    def _ocr_text(self, payload: bytes) -> tuple[str, float, str, int]:
        """Models the 3-strategy ocrmypdf chain: the %OCRFAILS(n)%
        payload marker fails the first n strategy invocations, so
        strategy 2/3 fallbacks (and total failure at n >= 3) are
        deterministic and testable. Returns (text, conf, strategy
        label, pages OCR'd) — the label lands in
        preprocessing_applied, the page count in pages_ocrd."""
        m = _OCRFAILS_RE.search(payload)
        n_fail = int(m.group(1)) if m else 0
        if n_fail >= len(OCR_STRATEGY_LABELS):
            raise ExtractionError(
                "ocrmypdf failed: exit code 1 (all fallback strategies exhausted)"
            )
        matches = _OCR_RE.findall(payload)
        if not matches:
            raise ExtractionError("No extractable text found by OCR (0 words)")
        texts = [base64.b64decode(b64).decode("utf-8", errors="ignore") for b64, _ in matches]
        return (
            "\n\n".join(texts).strip(),
            self.cfg.conf_pdf_ocr,
            OCR_STRATEGY_LABELS[n_fail],
            len(matches),
        )

    # -- M12 analog: direct byte-scan last resort ------------------------
    def _bytes_text(self, payload: bytes) -> str:
        words: list[str] = []
        for m in _BT_RE.findall(payload):
            words.extend(m.decode("utf-8", errors="ignore").split())
        words.extend(_printable_runs_text(payload).split())
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
            text, conf, strategy, n_pages = self._ocr_text(payload)
            wc = count_words_safely(text)
            if wc > 0:
                ms = int((time.perf_counter() - t0) * 1000)
                return EngineResult(text, conf, "pdf_ocr", wc, [strategy], ms,
                                    pages_ocrd=n_pages)
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
        pdims: tuple[int, int, int] | None = None
        if self.cfg.enable_image_preprocessing:
            # full P1-P12 chain over the (synthetic) decoded array; the
            # hermetic decode is capped at 384px per side so the chain
            # cost stays bounded (real decoders pass the true array)
            from .preprocess import preprocess_image, synth_gray_image

            arr = synth_gray_image(payload, min(w, 384), min(h, 384))
            out_arr, _, prep = preprocess_image(
                arr, self.cfg.preprocess_settings()
            )
            if h > 0 and w / h > 2.0 and "orientation_correction" not in prep:
                prep.insert(0, "orientation_correction")
            if prep:  # a new artifact exists only if any step ran
                ph, pw = out_arr.shape[:2]
                pdims = (int(pw), int(ph), int(out_arr.nbytes))
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
        return EngineResult(text, conf, "ocr_text", wc, prep, ms, pages_ocrd=1,
                            processed_dims=pdims)


def _printable_runs_text(payload: bytes) -> str:
    """M12 last resort: printable-ASCII runs (>3 chars) from the raw
    bytes, tokens >1 char — shared by the hermetic and real byte-scan
    (/root/reference/src/ocr/enhanced.rs:980-1119)."""
    run: list[str] = []
    cur: list[str] = []
    for b in payload:
        if 32 <= b <= 126:
            cur.append(chr(b))
        else:
            if len(cur) > 3:
                run.append("".join(cur))
            cur = []
    if len(cur) > 3:
        run.append("".join(cur))
    return " ".join(w for w in " ".join(run).split() if len(w) > 1)


class _TesseractBackend:
    """Warm Tesseract handle shared by the real engines: prefers
    tesserocr (in-process API, one warm handle per ACTOR — the ST1
    semantics; /root/reference/src/ocr/health.rs:13-57), falls back to
    pytesseract (subprocess per call). Raises NotImplementedError when
    neither wheel is installed."""

    def __init__(self, cfg: ExtractionConfig):
        self.cfg = cfg
        self._api = None
        self._pytesseract = None
        try:
            import tesserocr

            self._api = tesserocr.PyTessBaseAPI(
                lang=cfg.ocr_language,
                psm=tesserocr.PSM(cfg.ocr_page_segmentation_mode),
                oem=tesserocr.OEM(cfg.ocr_engine_mode),
            )
        except ImportError:
            try:
                import pytesseract

                self._pytesseract = pytesseract
            except ImportError as e:
                raise NotImplementedError(
                    "real engine backend requires tesserocr or pytesseract "
                    "(neither installed); use engine_backend='hermetic'"
                ) from e

    def ocr_array(self, arr) -> tuple[str, float]:
        """(text, mean word confidence 0-100) for a grayscale/RGB
        numpy array."""
        from PIL import Image

        img = Image.fromarray(arr)
        if self._api is not None:
            self._api.SetImage(img)
            text = self._api.GetUTF8Text()
            conf = float(self._api.MeanTextConf())
            return text, conf
        data = self._pytesseract.image_to_data(
            img,
            lang=self.cfg.ocr_language,
            config=f"--psm {self.cfg.ocr_page_segmentation_mode} "
                   f"--oem {self.cfg.ocr_engine_mode}",
            output_type=self._pytesseract.Output.DICT,
            timeout=self.cfg.ocr_timeout_seconds,
        )
        words = [w for w, c in zip(data["text"], data["conf"])
                 if w.strip() and float(c) >= 0]
        confs = [float(c) for w, c in zip(data["text"], data["conf"])
                 if w.strip() and float(c) >= 0]
        text = " ".join(words)
        conf = sum(confs) / len(confs) if confs else 0.0
        return text, conf


class RealTesseractEngine:
    """Real image-OCR backend (M16 + P1-P12 on the true decoded array).

    Same interface and decision chain as HermeticImageOcrEngine:
    decode (PIL) → dimension caps → preprocessing chain on the real
    grayscale array → Tesseract OCR with mean-word-confidence
    (/root/reference/src/ocr/enhanced.rs:339-386,52-119). Construction
    raises NotImplementedError when the OCR wheels are absent, so a
    misconfigured cluster fails fast at actor __init__ (ST4 preflight),
    not mid-stream."""

    def __init__(self, cfg: ExtractionConfig | None = None):
        self.cfg = cfg or ExtractionConfig()
        try:
            import numpy  # noqa: F401
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "RealTesseractEngine requires Pillow (not installed); "
                "use engine_backend='hermetic'"
            ) from e
        self._tess = _TesseractBackend(self.cfg)

    def extract(self, payload: bytes) -> EngineResult:
        import io

        import numpy as np
        from PIL import Image

        t0 = time.perf_counter()
        try:
            img = Image.open(io.BytesIO(payload))
            img.load()
        except Exception as e:
            raise ExtractionError(f"corrupted image payload: {e}") from None
        w, h = img.size
        max_w, max_h = self.cfg.max_image_pixels
        if w > max_w or h > max_h:
            raise ExtractionError(f"Image too large: {w}x{h} (max: {max_w}x{max_h})")
        arr = np.asarray(img.convert("L"))
        prep: list[str] = []
        pdims: tuple[int, int, int] | None = None
        if self.cfg.enable_image_preprocessing:
            from .preprocess import preprocess_image

            arr, _, prep = preprocess_image(arr, self.cfg.preprocess_settings())
            if prep:
                ph, pw = arr.shape[:2]
                pdims = (int(pw), int(ph), int(arr.nbytes))
        text, conf = self._tess.ocr_array(arr)
        text = text.strip()
        wc = count_words_safely(text)
        ms = int((time.perf_counter() - t0) * 1000)
        return EngineResult(text, conf, "ocr_text", wc, prep, ms, pages_ocrd=1,
                            processed_dims=pdims)


class RealPdfEngine:
    """Real PDF backend: pypdfium2 text layer → M13 quality gate →
    per-page rasterize + Tesseract OCR → printable-byte-scan last
    resort — the reference chain at
    /root/reference/src/ocr/enhanced.rs:816-919 with ocrmypdf's
    force-OCR step replaced by in-process pdfium rendering (same
    outcome: OCR of the rasterized pages). Interface-identical to
    HermeticPdfEngine; the DAG runs unchanged with
    engine_backend='real'."""

    RENDER_SCALE = 300 / 72  # rasterize at ~300 dpi for OCR

    def __init__(self, cfg: ExtractionConfig | None = None):
        self.cfg = cfg or ExtractionConfig()
        try:
            import pypdfium2  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "RealPdfEngine requires pypdfium2 (not installed); "
                "use engine_backend='hermetic'"
            ) from e
        self._pdfium = __import__("pypdfium2")
        self._tess: _TesseractBackend | None = None  # lazy: text-layer PDFs never need it

    def _quick_text(self, pdf) -> str:
        pages = []
        for page in pdf:
            tp = page.get_textpage()
            try:
                pages.append(tp.get_text_range())
            finally:
                tp.close()
        return "\n\n".join(pages).strip()

    # (scale, preprocess, skip_big_px): the in-process remap of the
    # reference's 3 ocrmypdf strategies — full quality, recovery
    # without preprocessing, minimal at reduced dpi skipping oversized
    # pages (enhanced.rs:1008-1052, --skip-big).
    _STRATEGIES = [
        (300 / 72, True, None),
        (300 / 72, False, None),
        (150 / 72, False, 50_000_000),
    ]

    def _ocr_pages_once(self, pdf, scale: float, preprocess: bool,
                        skip_big_px: int | None) -> tuple[str, float, int]:
        import numpy as np

        if self._tess is None:
            self._tess = _TesseractBackend(self.cfg)
        texts, confs, n_ocr = [], [], 0
        for page in pdf:
            w, h = page.get_size()
            if skip_big_px is not None and (w * scale) * (h * scale) > skip_big_px:
                continue
            bitmap = page.render(scale=scale, grayscale=True)
            arr = np.asarray(bitmap.to_pil().convert("L"))
            if preprocess and self.cfg.enable_image_preprocessing:
                from .preprocess import preprocess_image

                arr, _, _ = preprocess_image(arr, self.cfg.preprocess_settings())
            t, c = self._tess.ocr_array(arr)
            n_ocr += 1
            if t.strip():
                texts.append(t.strip())
                confs.append(c)
        if not texts:
            raise ExtractionError("No extractable text found by OCR (0 words)")
        return "\n\n".join(texts), min(confs), n_ocr

    def _ocr_pages(self, pdf) -> tuple[str, float, str, int]:
        """Progressive 3-strategy OCR mirroring the reference chain;
        returns (text, conf, winning strategy label, pages OCR'd)."""
        last_err: ExtractionError | None = None
        for i, (scale, preprocess, skip_big) in enumerate(self._STRATEGIES):
            try:
                text, conf, n_ocr = self._ocr_pages_once(
                    pdf, scale, preprocess, skip_big
                )
                return text, conf, OCR_STRATEGY_LABELS[i], n_ocr
            except ExtractionError as e:
                last_err = e
        raise last_err if last_err is not None else ExtractionError(
            "ocrmypdf failed: exit code 1 (all fallback strategies exhausted)"
        )

    def extract(self, payload: bytes, declared_size: int | None = None) -> EngineResult:
        t0 = time.perf_counter()
        size = declared_size if declared_size is not None else len(payload)
        if size > self.cfg.max_pdf_bytes:
            raise ExtractionError(
                f"PDF file too large: {size / (1024.0 * 1024.0):.1f} MB "
                f"(max: {self.cfg.max_pdf_bytes / (1024.0 * 1024.0):.1f} MB)."
            )
        if not is_valid_pdf(payload[:1024]):
            raise ExtractionError("Invalid PDF file: Missing or corrupted PDF header")
        try:
            pdf = self._pdfium.PdfDocument(payload)
        except Exception as e:
            raise ExtractionError(
                f"PDF has corrupted internal structure: {e}"
            ) from None
        try:
            text = self._quick_text(pdf)
            wc = count_words_safely(text)
            if pdf_text_quality_sufficient(text, wc, size):
                ms = int((time.perf_counter() - t0) * 1000)
                return EngineResult(text, self.cfg.conf_pdf_quick, "pdf_text", wc,
                                    ["PDF text extraction (pdfium)"], ms)
            try:
                text, conf, strategy, n_ocr = self._ocr_pages(pdf)
                wc = count_words_safely(text)
                if wc > 0:
                    ms = int((time.perf_counter() - t0) * 1000)
                    return EngineResult(text, conf, "pdf_ocr", wc, [strategy], ms,
                                        pages_ocrd=n_ocr)
                raise ExtractionError("No extractable text found by OCR (0 words)")
            except ExtractionError as ocr_err:
                text = _printable_runs_text(payload)
                if not text.strip():
                    raise ocr_err from None
                wc = count_words_safely(text)
                ms = int((time.perf_counter() - t0) * 1000)
                return EngineResult(text, self.cfg.conf_pdf_bytes, "pdf_bytes", wc,
                                    ["Direct PDF text extraction (last resort)"], ms)
        finally:
            pdf.close()


def make_pdf_engine(cfg: ExtractionConfig):
    """Per-actor engine factory (called once in actor __init__)."""
    if cfg.engine_backend == "real":
        return RealPdfEngine(cfg)
    return HermeticPdfEngine(cfg)


def make_image_engine(cfg: ExtractionConfig):
    if cfg.engine_backend == "real":
        return RealTesseractEngine(cfg)
    return HermeticImageOcrEngine(cfg)
