"""Reference-semantics oracle: expected extraction output per document.

A deliberately simple, single-threaded, row-at-a-time implementation of
the document-level contract (FIXTURES.md §2), used by pytest to check
the distributed pipeline row-by-row on span-sequence equality
(kind, text, media_ref, order) + status/failure_reason/confidence/
word_count. It shares the span-level primitive functions and hermetic
engines (each unit-tested directly against reference-cited behavior);
everything the Ray pipeline does differently — batching, span
flattening, skew explode + groupby reassembly, shuffles, dedup — is
computed here by the obvious sequential method.

Doc-level rules (documented choices, consistent with the reference's
one-file-per-document model, /root/reference/src/ocr/queue.rs:336-590):

- spans are processed in offset order; one output span per input span;
  multipage PDFs join page texts with "\n\n";
- first failing span fails the whole document (all-or-nothing: failed
  docs carry an empty span list);
- doc confidence = min over span confidences; word_count = sum;
- non-allowed mime types fail at validation with unsupported_format
  before any extraction (M4, file_service.rs:204-214);
- M18 validation applies to every extraction result (queue.rs:378-410);
  empty text → "No extractable text" → low_ocr_confidence;
- dedup (D1): exact content keep-first by min doc_id within the run
  (document_ingestion.rs:134-169); losers get status
  'skipped_duplicate' under policy 'skip'/'track', and are untouched
  under 'allow'.
"""

from __future__ import annotations

from .config import ExtractionConfig
import hashlib

from .functions.errors import failure_for_message
from .functions.hashing import merkle_from_span_hashes
from .functions.plaintext import extract_plain_text
from .functions.quality import validate_ocr_quality
from .functions.wordcount import count_words_safely
from .sources.media import MediaResolver, SynthResolver
from .stages.engines import (
    EngineResult,
    ExtractionError,
    HermeticImageOcrEngine,
    HermeticPdfEngine,
)

_ALLOWED_MIMES = {
    "text/plain", "text/html", "application/pdf", "image/png", "image/jpeg",
    "image/tiff", "image/bmp", "multipart/mixed",
}


def expected_doc(
    doc: dict,
    cfg: ExtractionConfig | None = None,
    resolver: MediaResolver | None = None,
) -> dict:
    cfg = cfg or ExtractionConfig()
    resolver = resolver or SynthResolver()
    pdf = HermeticPdfEngine(cfg)
    img = HermeticImageOcrEngine(cfg)

    def failed(reason: str, stage: str) -> dict:
        return {
            "doc_id": doc["doc_id"], "spans": [], "status": "failed",
            "failure_reason": reason, "failure_stage": stage,
            "confidence": 0.0, "word_count": 0, "file_hash": "",
            "dedup_status": "kept", "pages_ocrd": 0,
        }

    if doc["mime_type"] not in _ALLOWED_MIMES:
        return failed("unsupported_format", "validation")

    out_spans: list[dict] = []
    confs: list[float] = []
    words = 0
    pages = 0
    digests: list[str] = []
    for span in sorted(doc["spans"], key=lambda s: s["offset"]):
        try:
            if span["kind"] == "text" and doc["mime_type"] == "text/html":
                from .functions.html import extract_main_content

                raw = span["text"].encode("utf-8", errors="surrogatepass")
                digests.append(hashlib.sha256(raw).hexdigest())
                text = extract_main_content(span["text"])
                res = EngineResult(
                    text, cfg.conf_plain_text, "html_text", count_words_safely(text)
                )
            elif span["kind"] == "text":
                raw = span["text"].encode("utf-8", errors="surrogatepass")
                digests.append(hashlib.sha256(raw).hexdigest())
                text = extract_plain_text(span["text"])
                res = EngineResult(
                    text, cfg.conf_plain_text, "plain_text", count_words_safely(text)
                )
            else:
                payload = resolver.fetch(span["media_ref"])
                digests.append(span_content_digest(span["media_ref"], payload, cfg, resolver))
                declared = resolver.declared_size(span["media_ref"])
                if span["media_ref"].startswith("synth://pdf") or payload[:5] == b"%PDF-" or b"%PDF-" in payload[:1024]:
                    res = pdf.extract(payload, declared)
                else:
                    res = img.extract(payload)
            if res.text.strip() == "":
                raise ExtractionError("No extractable text found in document (0 words)")
            ok, _detail = validate_ocr_quality(
                res.text, res.confidence, res.word_count, cfg.ocr_min_confidence
            )
            if not ok:
                raise ExtractionError(
                    "OCR validation failed: low_ocr_confidence "
                    f"(confidence {res.confidence:.1f}, {res.word_count} words)"
                )
        except ExtractionError as e:
            reason, stage = failure_for_message(str(e))
            return failed(reason, stage)
        out_spans.append(
            {
                "kind": res.kind, "text": res.text,
                "media_ref": span["media_ref"], "offset": span["offset"],
            }
        )
        confs.append(res.confidence)
        words += res.word_count
        pages += res.pages_ocrd

    return {
        "doc_id": doc["doc_id"], "spans": out_spans, "status": "completed",
        "failure_reason": "", "failure_stage": "",
        "confidence": min(confs) if confs else 0.0, "word_count": words,
        "file_hash": merkle_from_span_hashes(digests),
        "dedup_status": "kept", "pages_ocrd": pages,
    }


def span_content_digest(ref: str, payload: bytes, cfg, resolver) -> str:
    """Matches the pipeline's span-hash rule: windowed PDFs (the skew
    explode path) hash as sha256(concat(sha256(window_payload))); all
    other spans as sha256(payload)."""
    from . import synth
    from .pipelines.extract import PAGE_WINDOW

    if ref.startswith("synth://pdf"):
        p = synth.parse_ref(ref)
        pages = int(p.get("pages", 1))
        if pages > cfg.page_explode_threshold and "sz" not in p:
            h = hashlib.sha256()
            for a in range(0, pages, PAGE_WINDOW):
                b = min(a + PAGE_WINDOW, pages)
                wp = resolver.fetch(f"{ref}&p0={a}&p1={b}")
                h.update(hashlib.sha256(wp).digest())
            return h.hexdigest()
    return hashlib.sha256(payload).hexdigest()


def expected_corpus(docs: list[dict], cfg: ExtractionConfig | None = None) -> dict[str, dict]:
    """Expected output for a whole corpus, including dedup keep-first."""
    cfg = cfg or ExtractionConfig()
    out = {d["doc_id"]: expected_doc(d, cfg) for d in docs}
    if cfg.dedup_policy in ("skip", "track", "return_existing"):
        by_hash: dict[str, list[str]] = {}
        for doc_id, row in out.items():
            if row["file_hash"]:
                by_hash.setdefault(row["file_hash"], []).append(doc_id)
        loser_status = (
            "skipped_duplicate" if cfg.dedup_policy != "track" else "tracked_duplicate"
        )
        for _h, ids in by_hash.items():
            if len(ids) > 1:
                for loser in sorted(ids)[1:]:
                    out[loser]["dedup_status"] = loser_status
                    out[loser]["status"] = "skipped_duplicate"
                    out[loser]["spans"] = []
    return out


def doc_file_hash_only(
    doc: dict,
    cfg: ExtractionConfig | None = None,
    resolver: MediaResolver | None = None,
) -> str:
    cfg = cfg or ExtractionConfig()
    resolver = resolver or SynthResolver()
    digests = []
    for span in sorted(doc["spans"], key=lambda s: s["offset"]):
        if span["kind"] == "text":
            raw = span["text"].encode("utf-8", errors="surrogatepass")
            digests.append(hashlib.sha256(raw).hexdigest())
        else:
            payload = resolver.fetch(span["media_ref"])
            digests.append(span_content_digest(span["media_ref"], payload, cfg, resolver))
    return merkle_from_span_hashes(digests)
