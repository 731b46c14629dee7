"""The extraction pipeline — streaming Ray Data end to end.

Replaces the reference's ingest → Postgres queue → OCR-worker loop
(/root/reference/src/ingestion/batch_ingest.rs,
/root/reference/src/ocr/queue.rs:610-694) with a single lazy Dataset
DAG executed by the streaming executor with backpressure:

    read_parquet (pruned columns)
      → classify (vectorized map_batches: route, cost, part_id)
      → [text branch]  stateless vectorized plain-text extraction (M10/M17/M18)
      → [media branch] DocExtractor actor pool (warm engines, M11-M16)
      → [skew branch]  per-page-window explode (flat map_batches)
                        → PageExtractor actor pool
                        → groupby(doc_id) reassembly  [the mandated shuffle]
      → union → (optional dedup pass D1 over a 2-column projection)
      → write partitioned parquet + metrics + ledger

Scale notes (the design assumptions, explicit per north_rule):
- The input is re-scanned once per branch (3 branch filters). The scan
  + classify are cheap vectorized column work; media payloads are NOT
  read at classify time, so the duplicated work is a column projection,
  not I/O. The alternative (materialize the classified dataset) would
  pin the whole input in the object store — wrong at 10^12 docs.
- Media payload bytes never enter a shuffle: they are resolved inside
  the extraction actors (readur_ray.sources.media) and reduced to span
  text + sha256 digests immediately.
- Only the skewed tail (page_count > threshold, a fixed small fraction)
  pays the explode + groupby(doc_id) shuffle; normal documents are
  flattened and reassembled WITHIN a batch (zero shuffle).
- Dedup (D1) runs over a (doc_id, file_hash) projection of the written
  extraction output — column pruning makes this a tiny read — with a
  partial-aggregate → filter(count>1) → broadcast-loser-set plan; the
  full corpus is never shuffled for dedup.
"""

from __future__ import annotations

import hashlib
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import DEFAULT_CONFIG, ExtractionConfig
from ..functions.errors import (
    ExtractionError,
    failure_for_message,
    is_recoverable_reason,
)
from ..functions.hashing import merkle_from_span_hashes
from ..functions.plaintext import extract_plain_text, extract_plain_text_array
from ..functions.quality import validate_ocr_quality
from ..functions.wordcount import count_words_safely
from ..schema import EXTRACTED, OUT_SPAN, PROCESSED_IMAGE
from ..sources.media import make_resolver
from ..stages.engines import make_image_engine, make_pdf_engine
from .. import synth

_ALLOWED_MIMES = {
    "text/plain", "text/html", "application/pdf", "image/png", "image/jpeg",
    "image/tiff", "image/bmp", "multipart/mixed",
}
PAGE_WINDOW = 16  # pages per unit in the skew explode


# ---------------------------------------------------------------------------
# classify (vectorized, stateless)
# ---------------------------------------------------------------------------

def part_id_array(doc_ids: pa.Array, num_parts: int) -> pa.Array:
    """Stable partition assignment: crc32(doc_id) % N (resume-safe)."""
    ids = doc_ids.to_pylist()
    return pa.array(
        [zlib.crc32(s.encode()) % num_parts for s in ids], type=pa.int32()
    )


def classify_batch(batch: pa.Table, cfg: ExtractionConfig) -> pa.Table:
    from ..functions.cost import estimate_cost, priority_array

    batch = batch.combine_chunks()
    mime = batch.column("mime_type").combine_chunks()
    batch = batch.append_column("part_id", part_id_array(
        batch.column("doc_id").combine_chunks(), cfg.num_output_partitions))
    batch = batch.append_column("priority", priority_array(
        batch.column("file_size").combine_chunks(), mime))
    batch = batch.append_column("est_cost", estimate_cost(
        batch.column("file_size").combine_chunks(), mime,
        batch.column("page_count").combine_chunks()))
    return batch


def _route_masks(batch: pa.Table, cfg: ExtractionConfig):
    mime = batch.column("mime_type")
    pages = batch.column("page_count")
    is_text = pc.equal(mime, "text/plain")
    is_skew = pc.greater(pages, cfg.page_explode_threshold)
    is_media = pc.and_(pc.invert(is_text), pc.invert(is_skew))
    return is_text, is_media, is_skew


def route_filter(route: str, cfg: ExtractionConfig):
    def f(batch: pa.Table) -> pa.Table:
        t, m, s = _route_masks(batch, cfg)
        mask = {"text": t, "media": m, "skew": s, "main": pc.invert(s)}[route]
        return batch.filter(mask)
    return f


def cost_order_batch(batch: pa.Table) -> pa.Table:
    """Longest-job-first dispatch (O1): order each block by est_cost
    descending (doc_id tiebreak for determinism) before the actor pool.

    This is the streaming remap of the reference's priority dequeue
    (/root/reference/src/ocr/queue.rs:165-180 — ORDER BY priority DESC):
    the executor slices blocks into batches IN ORDER, so the expensive
    docs of every block are dispatched to the pool first and the final,
    straggler-prone tasks hold only cheap docs. Scoped per block on
    purpose — a global ``ds.sort("est_cost")`` would all-to-all-shuffle
    the span payloads (forbidden by the no-payload-shuffle invariant)
    and add a pipeline barrier; read order already randomizes cost
    across blocks at scale."""
    if batch.num_rows <= 1:
        return batch
    idx = pc.sort_indices(
        batch, sort_keys=[("est_cost", "descending"), ("doc_id", "ascending")]
    )
    return batch.take(idx)


# ---------------------------------------------------------------------------
# text branch — fully vectorized (M10 + M17 + M18)
# ---------------------------------------------------------------------------

def _sorted_flat_spans(batch: pa.Table):
    """Flatten spans; enforce offset order within each doc (lexsort)."""
    spans = batch.column("spans").combine_chunks()
    counts = pc.list_value_length(spans)
    counts = pc.fill_null(counts, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = spans.flatten()
    doc_idx = np.repeat(np.arange(len(counts)), counts)
    offsets_col = flat.field("offset").to_numpy(zero_copy_only=False)
    order = np.lexsort((offsets_col, doc_idx))
    if not np.array_equal(order, np.arange(order.size)):
        flat = flat.take(pa.array(order))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return flat, counts, starts, doc_idx


def _first_per_doc(mask: np.ndarray, doc_idx: np.ndarray, n_docs: int) -> np.ndarray:
    """Index of the first True per doc, -1 where none."""
    out = np.full(n_docs, -1, dtype=np.int64)
    pos = np.flatnonzero(mask)
    if pos.size:
        docs = doc_idx[pos]
        uniq, first = np.unique(docs, return_index=True)
        out[uniq] = pos[first]
    return out


def _segment_sum(values: np.ndarray, counts: np.ndarray, starts: np.ndarray) -> np.ndarray:
    out = np.zeros(len(counts), dtype=np.int64)
    nz = counts > 0
    if nz.any():
        out[nz] = np.add.reduceat(values, starts[nz])
    return out


def make_extract_text_fn(cfg: ExtractionConfig):
    min_conf = cfg.ocr_min_confidence

    def extract_text_docs(batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        batch = batch.combine_chunks()
        n = batch.num_rows
        if n == 0:
            return pa.table({}, schema=EXTRACTED)
        flat, counts, starts, doc_idx = _sorted_flat_spans(batch)
        texts = flat.field("text")
        extracted, words, too_large = extract_plain_text_array(texts)

        # M18 vectorized (confidence is the constant 100 → only the
        # word-count / emptiness / alnum-ratio gates can reject).
        byte_len = pc.binary_length(extracted).cast(pa.float64())
        alnum = pc.count_substring_regex(extracted, pattern=r"[\pL\pN]").cast(pa.float64())
        ratio = pc.divide(alnum, pc.max_element_wise(byte_len, 1.0))
        low_conf = pc.or_(
            pc.or_(pc.equal(byte_len, 0.0), pc.equal(words, 0)),
            pc.less(ratio, 0.3),
        ).to_numpy(zero_copy_only=False)
        too_large_np = too_large.to_numpy(zero_copy_only=False)

        n_docs = n
        fail_large = _first_per_doc(too_large_np, doc_idx, n_docs) >= 0
        fail_low = _first_per_doc(low_conf & ~too_large_np, doc_idx, n_docs) >= 0
        # span order decides which failure wins per doc
        first_any = _first_per_doc(too_large_np | low_conf, doc_idx, n_docs)
        failed = first_any >= 0
        large_wins = np.zeros(n_docs, dtype=bool)
        large_wins[failed] = too_large_np[first_any[failed]]
        reason = np.where(
            failed, np.where(large_wins, "file_too_large", "low_ocr_confidence"), ""
        )
        stage = np.where(failed, np.where(large_wins, "validation", "ocr"), "")

        word_sum = _segment_sum(words.to_numpy(zero_copy_only=False), counts, starts)
        word_sum = np.where(failed, 0, word_sum)

        # output spans: drop spans of failed docs
        keep_span = ~failed[doc_idx]
        out_counts = np.where(failed, 0, counts)
        kept = pa.array(keep_span)
        out_struct = pa.StructArray.from_arrays(
            [
                pa.array(np.full(int(keep_span.sum()), "plain_text"), pa.string()),
                extracted.filter(kept),
                pa.array([""] * int(keep_span.sum()), pa.string()),
                flat.field("offset").filter(kept),
            ],
            fields=list(OUT_SPAN),
        )
        out_offsets = np.concatenate([[0], np.cumsum(out_counts)]).astype(np.int32)
        out_spans = pa.ListArray.from_arrays(pa.array(out_offsets, pa.int32()), out_struct)

        # file_hash (completed docs only): merkle over original span texts
        orig_texts = texts.to_pylist()
        hashes = []
        for d in range(n_docs):
            if failed[d]:
                hashes.append("")
                continue
            h = hashlib.sha256()
            for j in range(starts[d], starts[d] + counts[d]):
                s = orig_texts[j] or ""
                h.update(hashlib.sha256(s.encode("utf-8", errors="surrogatepass")).digest())
            hashes.append(h.hexdigest())

        ms = int((time.perf_counter() - t0) * 1000 / max(n_docs, 1))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "spans": out_spans,
                "status": pa.array(np.where(failed, "failed", "completed"), pa.string()),
                "failure_reason": pa.array(reason, pa.string()),
                "failure_stage": pa.array(stage, pa.string()),
                "confidence": pa.array(
                    np.where(failed, 0.0, 100.0).astype(np.float32), pa.float32()
                ),
                "word_count": pa.array(word_sum.astype(np.int32), pa.int32()),
                "processing_time_ms": pa.array(np.full(n_docs, ms), pa.int64()),
                "file_hash": pa.array(hashes, pa.string()),
                "dedup_status": pa.array(["kept"] * n_docs, pa.string()),
                # reference labels plain-text reads (enhanced.rs:1477)
                "preprocessing_applied": pa.array(
                    [[] if f else ["Plain text read"] for f in failed],
                    pa.list_(pa.string()),
                ),
                "pages_ocrd": pa.array(
                    np.zeros(n_docs, dtype=np.int32), pa.int32()
                ),
                "processed_images": pa.array(
                    [[]] * n_docs, pa.list_(PROCESSED_IMAGE)
                ),
                "part_id": batch.column("part_id"),
            },
            schema=EXTRACTED,
        )

    return extract_text_docs


# ---------------------------------------------------------------------------
# media branch — actor pool with warm engines
# ---------------------------------------------------------------------------

def _empty_extracted() -> pa.Table:
    return pa.table({name: [] for name in EXTRACTED.names}, schema=EXTRACTED)


def _unique_in_order(steps: list[str]) -> list[str]:
    """Doc-level preprocessing lineage: unique-in-order union of the
    per-span engine step lists (a 63-window skewed PDF contributes its
    OCR label once, not 63 times)."""
    seen: set[str] = set()
    out: list[str] = []
    for s in steps:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


class DocExtractor:
    """Stateful stage: resolver + hermetic engines built once per actor
    (the reference builds Tesseract once per worker, ST1/ST4;
    /root/reference/src/ocr/health.rs:13-57)."""

    def __init__(self, cfg: ExtractionConfig):
        from ..state.settings import SettingsStore

        self.cfg = cfg
        self.settings = SettingsStore(cfg)  # per-user configs, built once
        self.resolver = make_resolver(cfg.media_resolver)
        # backend-selected engines (hermetic or real), built once per
        # actor — construction fails fast if a real backend's wheels
        # are missing (ST4 preflight)
        self.pdf = make_pdf_engine(cfg)
        self.img = make_image_engine(cfg)

    def _with_retry(self, fn, *args, ucfg: ExtractionConfig | None = None):
        """Bounded in-actor retry: RECOVERABLE failures (timeout /
        memory / low-confidence — errors.RECOVERABLE_REASONS, mirroring
        OcrError::is_recoverable) get up to cfg.max_attempts tries
        before dead-lettering; terminal failures raise immediately
        (the queue's attempts/max_attempts loop, queue.rs:307-333)."""
        max_attempts = (ucfg or self.cfg).max_attempts
        attempt = 1
        while True:
            try:
                return fn(*args)
            except ExtractionError as e:
                reason, _stage = failure_for_message(str(e))
                if attempt >= max_attempts or not is_recoverable_reason(reason):
                    raise
                attempt += 1

    def _one_span(self, span: dict, mime: str = "", ucfg: ExtractionConfig | None = None):
        """→ (out_span_dict, confidence, word_count, payload_sha256_hex,
        preprocessing_steps, pages_ocrd, processed_image_row_or_None)."""
        cfg = ucfg or self.cfg
        if span["kind"] == "text" and mime == "text/html":
            # north-star HTML branch: DOM text-density boilerplate strip
            from ..functions.html import extract_main_content

            raw = span["text"].encode("utf-8", errors="surrogatepass")
            text = extract_main_content(span["text"])
            kind, conf = "html_text", cfg.conf_plain_text
            wc = count_words_safely(text)
            digest = hashlib.sha256(raw).hexdigest()
            prep = ["HTML main-content extraction (text-density)"]
            pages = 0
            pimg = None
        elif span["kind"] == "text":
            raw = span["text"].encode("utf-8", errors="surrogatepass")
            text = extract_plain_text(span["text"])
            kind, conf = "plain_text", cfg.conf_plain_text
            wc = count_words_safely(text)
            digest = hashlib.sha256(raw).hexdigest()
            prep = ["Plain text read"]
            pages = 0
            pimg = None
        else:
            ref = span["media_ref"]
            payload = self.resolver.fetch(ref)
            digest = hashlib.sha256(payload).hexdigest()
            declared = self.resolver.declared_size(ref)
            if b"%PDF-" in payload[:1024] or ref.startswith("synth://pdf"):
                res = self.pdf.extract(payload, declared)
            else:
                res = self.img.extract(payload)
            text, conf, kind, wc = res.text, res.confidence, res.kind, res.word_count
            prep = list(res.preprocessing_applied)
            pages = res.pages_ocrd
            pimg = None
            if cfg.save_processed_images and res.processed_dims is not None:
                # ProcessedImage row (document.rs:194-238): the artifact
                # ref is a pure function of the payload hash, so resume
                # and re-runs point at the same object
                pw, ph, nbytes = res.processed_dims
                pimg = {
                    "media_ref": ref,
                    "processed_image_ref": f"processed/{digest[:16]}.png",
                    "image_width": pw, "image_height": ph,
                    "file_size": nbytes, "steps": prep,
                }
        if text.strip() == "":
            raise ExtractionError("No extractable text found in document (0 words)")
        ok, _ = validate_ocr_quality(text, conf, wc, cfg.ocr_min_confidence)
        if not ok:
            raise ExtractionError(
                f"OCR validation failed: low_ocr_confidence (confidence {conf:.1f}, {wc} words)"
            )
        out = {"kind": kind, "text": text, "media_ref": span["media_ref"],
               "offset": span["offset"]}
        return out, conf, wc, digest, prep, pages, pimg

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        rows_spans = batch.column("spans").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        mimes = batch.column("mime_type").to_pylist()
        parts = batch.column("part_id").to_pylist()
        # optional per-row owner → per-user Settings (settings.rs:7-65)
        users = (
            batch.column("user_id").to_pylist()
            if "user_id" in batch.column_names else [None] * batch.num_rows
        )
        out = {name: [] for name in EXTRACTED.names}
        for doc_id, spans, mime, part, user in zip(
            doc_ids, rows_spans, mimes, parts, users
        ):
            t0 = time.perf_counter()
            ucfg = self.settings.for_user(user)
            status, reason, stage = "completed", "", ""
            out_spans, confs, words, digests = [], [], 0, []
            prep_steps: list[str] = []
            pages_ocrd = 0
            pimgs: list[dict] = []
            if mime not in _ALLOWED_MIMES:
                status, reason, stage = "failed", "unsupported_format", "validation"
            else:
                try:
                    for span in sorted(spans, key=lambda s: s["offset"]):
                        o, c, w, d, p, pg, pi = self._with_retry(
                            self._one_span, span, mime, ucfg, ucfg=ucfg
                        )
                        out_spans.append(o)
                        confs.append(c)
                        words += w
                        digests.append(d)
                        prep_steps.extend(p)
                        pages_ocrd += pg
                        if pi is not None:
                            pimgs.append(pi)
                except ExtractionError as e:
                    status = "failed"
                    reason, stage = failure_for_message(str(e))
                    out_spans, confs, words, digests = [], [], 0, []
                    prep_steps = []
                    pages_ocrd = 0
                    pimgs = []
            out["doc_id"].append(doc_id)
            out["spans"].append(out_spans)
            out["status"].append(status)
            out["failure_reason"].append(reason)
            out["failure_stage"].append(stage)
            out["confidence"].append(min(confs) if confs else 0.0)
            out["word_count"].append(words)
            out["processing_time_ms"].append(int((time.perf_counter() - t0) * 1000))
            out["file_hash"].append(
                merkle_from_span_hashes(digests) if status == "completed" else ""
            )
            out["dedup_status"].append("kept")
            out["preprocessing_applied"].append(_unique_in_order(prep_steps))
            out["pages_ocrd"].append(pages_ocrd)
            out["processed_images"].append(pimgs)
            out["part_id"].append(part)
        return pa.table(out, schema=EXTRACTED)


# ---------------------------------------------------------------------------
# skew branch — per-page-window explode → actor pool → groupby(doc_id)
# ---------------------------------------------------------------------------

_UNIT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()), ("mime_type", pa.string()), ("part_id", pa.int32()),
        ("n_spans", pa.int32()),
        ("offset", pa.int32()), ("unit_idx", pa.int32()), ("n_units", pa.int32()),
        ("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()),
    ]
)


def make_explode_fn(cfg: ExtractionConfig):
    threshold = cfg.page_explode_threshold

    def explode_skew(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        out = {name: [] for name in _UNIT_SCHEMA.names}
        for doc_id, spans, mime, part in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist(),
            batch.column("mime_type").to_pylist(), batch.column("part_id").to_pylist(),
        ):
            spans = sorted(spans, key=lambda s: s["offset"])
            for span in spans:
                units: list[tuple[str, str, str]] = []   # (kind, text, ref)
                if span["kind"] == "media" and span["media_ref"].startswith("synth://pdf"):
                    p = synth.parse_ref(span["media_ref"])
                    pages = int(p.get("pages", 1))
                    if pages > threshold and "sz" not in p:
                        for a in range(0, pages, PAGE_WINDOW):
                            b = min(a + PAGE_WINDOW, pages)
                            units.append(
                                ("media", "", f"{span['media_ref']}&p0={a}&p1={b}")
                            )
                if not units:
                    units = [(span["kind"], span["text"], span["media_ref"])]
                for ui, (kind, text, ref) in enumerate(units):
                    out["doc_id"].append(doc_id)
                    out["mime_type"].append(mime)
                    out["part_id"].append(part)
                    out["n_spans"].append(len(spans))
                    out["offset"].append(span["offset"])
                    out["unit_idx"].append(ui)
                    out["n_units"].append(len(units))
                    out["kind"].append(kind)
                    out["text"].append(text)
                    out["media_ref"].append(ref)
        return pa.table(out, schema=_UNIT_SCHEMA)

    return explode_skew


_UNIT_RESULT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()), ("mime_type", pa.string()), ("part_id", pa.int32()),
        ("n_spans", pa.int32()),
        ("offset", pa.int32()), ("unit_idx", pa.int32()), ("n_units", pa.int32()),
        ("media_ref", pa.string()),
        ("out_kind", pa.string()), ("out_text", pa.string()),
        ("confidence", pa.float32()), ("error", pa.string()),
        ("payload_sha", pa.string()),
        ("prep", pa.list_(pa.string())),
        ("pages", pa.int32()),
    ]
)


class PageExtractor:
    """Actor pool over exploded units (pages windows / spans of skewed docs)."""

    def __init__(self, cfg: ExtractionConfig):
        self.cfg = cfg
        self.resolver = make_resolver(cfg.media_resolver)
        # backend-selected engines (hermetic or real), built once per
        # actor — construction fails fast if a real backend's wheels
        # are missing (ST4 preflight)
        self.pdf = make_pdf_engine(cfg)
        self.img = make_image_engine(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        out_kind, out_text, confs, errors, shas, preps = [], [], [], [], [], []
        pages_list: list[int] = []
        for kind, text, ref, mime in zip(
            batch.column("kind").to_pylist(), batch.column("text").to_pylist(),
            batch.column("media_ref").to_pylist(), batch.column("mime_type").to_pylist(),
        ):
            try:
                if mime not in _ALLOWED_MIMES:
                    raise ExtractionError(f"unsupported file type: {mime}")
                if kind == "text":
                    raw = text.encode("utf-8", errors="surrogatepass")
                    sha = hashlib.sha256(raw).hexdigest()
                    t = extract_plain_text(text)
                    k, c = "plain_text", self.cfg.conf_plain_text
                    p = ["Plain text read"]
                    pg = 0
                else:
                    payload = self.resolver.fetch(ref)
                    sha = hashlib.sha256(payload).hexdigest()
                    declared = self.resolver.declared_size(ref)
                    if b"%PDF-" in payload[:1024] or ref.startswith("synth://pdf"):
                        res = self.pdf.extract(payload, declared)
                    else:
                        res = self.img.extract(payload)
                    t, c, k = res.text, res.confidence, res.kind
                    p = list(res.preprocessing_applied)
                    pg = res.pages_ocrd
                out_kind.append(k)
                out_text.append(t)
                confs.append(c)
                errors.append("")
                shas.append(sha)
                preps.append(p)
                pages_list.append(pg)
            except ExtractionError as e:
                out_kind.append("")
                out_text.append("")
                confs.append(0.0)
                errors.append(str(e))
                shas.append("")
                preps.append([])
                pages_list.append(0)
        result = pa.table(
            {
                "doc_id": batch.column("doc_id"), "mime_type": batch.column("mime_type"),
                "part_id": batch.column("part_id"), "n_spans": batch.column("n_spans"),
                "offset": batch.column("offset"), "unit_idx": batch.column("unit_idx"),
                "n_units": batch.column("n_units"), "media_ref": batch.column("media_ref"),
                "out_kind": pa.array(out_kind, pa.string()),
                "out_text": pa.array(out_text, pa.string()),
                "confidence": pa.array(confs, pa.float32()),
                "error": pa.array(errors, pa.string()),
                "payload_sha": pa.array(shas, pa.string()),
                "prep": pa.array(preps, pa.list_(pa.string())),
                "pages": pa.array(pages_list, pa.int32()),
            },
            schema=_UNIT_RESULT_SCHEMA,
        )
        return result


def make_reassemble_fn(cfg: ExtractionConfig):
    min_conf = cfg.ocr_min_confidence

    def reassemble(group: pa.Table) -> pa.Table:
        """groupby(doc_id) shuffle target: order units by (offset,
        unit_idx), join window texts with '\\n\\n', rebuild the doc row.
        Span order is data (the offset column), never block order."""
        g = group.combine_chunks()
        idx = pc.sort_indices(
            g, sort_keys=[("offset", "ascending"), ("unit_idx", "ascending")]
        )
        g = g.take(idx)
        doc_id = g.column("doc_id")[0].as_py()
        part = g.column("part_id")[0].as_py()
        offs = g.column("offset").to_pylist()
        errors = g.column("error").to_pylist()
        texts = g.column("out_text").to_pylist()
        kinds = g.column("out_kind").to_pylist()
        confs = g.column("confidence").to_pylist()
        refs = g.column("media_ref").to_pylist()
        shas = g.column("payload_sha").to_pylist()
        unit_preps = g.column("prep").to_pylist()
        unit_pages = g.column("pages").to_pylist()

        def emit(status, reason, stage, spans, conf, wc, fh, prep=None, pages=0):
            return pa.table(
                {
                    "doc_id": [doc_id], "spans": [spans], "status": [status],
                    "failure_reason": [reason], "failure_stage": [stage],
                    "confidence": pa.array([conf], pa.float32()),
                    "word_count": pa.array([wc], pa.int32()),
                    "processing_time_ms": pa.array([0], pa.int64()),
                    "file_hash": [fh], "dedup_status": ["kept"],
                    "preprocessing_applied": pa.array(
                        [prep or []], pa.list_(pa.string())
                    ),
                    "pages_ocrd": pa.array([pages], pa.int32()),
                    "processed_images": pa.array(
                        [[]], pa.list_(PROCESSED_IMAGE)
                    ),
                    "part_id": pa.array([part], pa.int32()),
                },
                schema=EXTRACTED,
            )

        # first failing unit in (offset, unit) order fails the doc
        for err in errors:
            if err:
                reason, stage = failure_for_message(err)
                return emit("failed", reason, stage, [], 0.0, 0, "")

        out_spans, confs_per_span, span_hashes, total_wc = [], [], [], 0
        all_prep: list[str] = []
        i = 0
        n = len(offs)
        while i < n:
            j = i
            while j < n and offs[j] == offs[i]:
                j += 1
            units_text = [t for t in texts[i:j]]
            joined = "\n\n".join(units_text).strip() if j - i > 1 else units_text[0]
            kind = kinds[i]
            conf = min(confs[i:j])
            if j - i > 1:
                h = hashlib.sha256()
                for s in shas[i:j]:
                    h.update(bytes.fromhex(s))
                span_hash = h.hexdigest()
                # strip '&p0=..&p1=..' window suffix to restore the span ref
                ref = refs[i].split("&p0=")[0]
            else:
                span_hash = shas[i]
                ref = refs[i]
            wc = count_words_safely(joined)
            if joined.strip() == "":
                reason, stage = failure_for_message(
                    "No extractable text found in document (0 words)")
                return emit("failed", reason, stage, [], 0.0, 0, "")
            ok, _ = validate_ocr_quality(joined, conf, wc, min_conf)
            if not ok:
                return emit("failed", "low_ocr_confidence", "ocr", [], 0.0, 0, "")
            out_spans.append(
                {"kind": kind, "text": joined, "media_ref": ref, "offset": offs[i]}
            )
            confs_per_span.append(conf)
            span_hashes.append(span_hash)
            total_wc += wc
            for up in unit_preps[i:j]:
                all_prep.extend(up)
            i = j
        return emit(
            "completed", "", "", out_spans,
            min(confs_per_span) if confs_per_span else 0.0, total_wc,
            merkle_from_span_hashes(span_hashes),
            prep=_unique_in_order(all_prep),
            pages=int(sum(unit_pages)),
        )

    return reassemble


def make_reassemble_batch_fn(cfg: ExtractionConfig):
    """Block-local reassembly behind the keyed hash repartition (see
    _assemble): every row of a doc_id is guaranteed co-located in one
    block by hash(doc_id), so splitting the block by doc_id and
    running the per-group reassemble gives the exact groupby result —
    without the logical Sort that groupby().map_groups() plans (which
    would force preserve_order on the whole DAG and turn the
    downstream union into an unbounded buffer). The skew branch holds
    only page-exploded giants (a fixed small fraction of the corpus),
    so the per-block doc loop is over a handful of groups."""
    reassemble = make_reassemble_fn(cfg)

    def reassemble_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # hash partitions can be empty; emit the output schema
            return pa.table({name: [] for name in EXTRACTED.names},
                            schema=EXTRACTED)
        import numpy as np

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        bounds = np.flatnonzero(
            np.r_[True, ids[order][1:] != ids[order][:-1]]
        ).tolist() + [len(ids)]
        outs = []
        for a, b in zip(bounds[:-1], bounds[1:]):
            outs.append(reassemble(batch.take(order[a:b])))
        return pa.concat_tables(outs)

    return reassemble_block


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------

def load_documents(
    path: str, row_filter=None, row_filter_sql: str | None = None
) -> "ray.data.Dataset":
    """Column-pruned (and optionally row-filtered) read with block
    count scaled to the cluster.

    - ``row_filter`` is a pyarrow.dataset expression pushed into the
      scan (row-group pruning + row-level filtering), so the skew
      branch never materializes the spans of the 99.9% of docs it
      discards.
    - Ray sizes read parallelism by estimated bytes and will coalesce
      a small-file corpus into a handful of blocks; the downstream
      ACTOR POOL is fed whole blocks, so fewer blocks than actors
      serializes the heavy extract stage (observed: SplitBlocks(2)
      capped the pool at 2 concurrent actors). Target ~2 blocks per
      CPU — measured best on the isolated pool (4 blocks/CPU pays ~30%
      more dispatch overhead, 1/CPU straggles); at petabyte scale
      native row-group splitting already yields more blocks than CPUs
      and the override is a no-op upper bound."""
    import os as _os

    import ray as _ray

    from ..sources.tables import read_table

    ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    per_cpu = int(_os.environ.get("READUR_SCAN_BLOCKS_PER_CPU", "2"))
    return read_table(
        path,
        columns=["doc_id", "spans", "mime_type", "file_size", "page_count"],
        row_filter=row_filter,
        row_filter_sql=row_filter_sql,
        override_num_blocks=max(16, ncpu * per_cpu),
    )


class UnifiedExtractor(DocExtractor):
    """One actor pool for BOTH routes: text rows take the fully
    vectorized M10/M17/M18 path, media rows the per-span engine path.

    Folding text into the media pool (instead of a third task-pool
    branch) matters for utilization: with separate branches the corpus
    is scanned 3×, and on a node where the pools reserve most CPUs the
    task-pool text branch starves — measured near-serial branch
    execution. One scan + one pool keeps every actor fed."""

    def __init__(self, cfg: ExtractionConfig):
        super().__init__(cfg)
        self._text_fn = make_extract_text_fn(cfg)
        # perf tracing: when READUR_TRACE_DIR is set, append one
        # "(start, end, rows)" line per batch so a harness can compute
        # the pool's concurrency timeline (no cost when unset)
        import os as _os

        self._trace_dir = _os.environ.get("READUR_TRACE_DIR")

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._trace_dir:
            import os as _os

            t0 = time.time()
            out = self._do_call(batch)
            with open(f"{self._trace_dir}/spans-{_os.getpid()}.log", "a") as fh:
                fh.write(f"{t0} {time.time()} {batch.num_rows}\n")
            return out
        return self._do_call(batch)

    def _do_call(self, batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        is_text, is_media, _ = _route_masks(batch, self.cfg)
        text_part = batch.filter(is_text)
        media_part = batch.filter(is_media)
        outs = []
        if text_part.num_rows:
            outs.append(self._text_fn(text_part))
        if media_part.num_rows:
            outs.append(DocExtractor.__call__(self, media_part))
        if not outs:
            return _empty_extracted()
        return pa.concat_tables(outs).combine_chunks()


def _pool_sizes(
    cfg: ExtractionConfig,
) -> tuple[tuple[int, int], tuple[int, int], float, float]:
    """(main_pool_(min,max), page_pool_(min,max), main_cpus, page_cpus).

    BOTH pools autoscale with a SMALL min. This is not (only) about
    ramp: Ray Data's ReservationOpResourceAllocator reserves each map
    operator's `min_max_resource_requirements()` — for a FIXED-size
    actor pool that minimum is the ENTIRE pool (pool_size × num_cpus),
    so a fixed 29-actor pool on a 32-CPU node left ~3 CPUs of budget
    for every other operator in the DAG: the read crawled, the skew
    branch ran essentially AFTER the main branch, and the write
    operator drained one block at a time through the backpressure
    escape hatch. Measured (20k-doc corpus, interleaved A/B in one
    session): fixed main pool 10.5-12.2 s end-to-end vs autoscaling
    (4, max) 3.7 s — the round-3 headline regression. An autoscaling
    pool reserves only its min; it still scales into the allocator's
    shared budget up to max when the input queue builds (verified to
    reach full width on the 200k-doc scaling corpus).

    Ramp vs reservation, the second constraint: Ray's actor autoscaler
    adds ONE actor per decision and no-ops while any actor is pending
    (default_actor_autoscaler.py "pending actors") — so ramping from a
    tiny min costs ~1 actor per actor-startup (~1.5 s), and a 32-CPU
    long job plateaued at 13 of 27 actors (measured 1,078 docs/s vs a
    full-width fixed pool's 1,786). But a pool BELOW its min scales to
    min in ONE parallel burst. The min is therefore set to ~half the
    node's actor budget: instant parallel ramp to useful width, serial
    autoscaling tops it off on long jobs, and at num_cpus=0.5 the
    reserved floor stays ~22% of the node so sibling operators never
    starve. Measured (union DAG, one session, interleaved): long job
    35-37 s vs 48-50 s for a min=4 pool; short job within ~3 s of it.

    Both pools run at num_cpus=0.5: single-threaded Python actors do
    not need a full logical core reserved, and halving the claim both
    halves the reserved floor and lets main + page + stateless tasks
    coexist. Ray Core still places by PHYSICAL logical CPUs, so the
    node cannot be oversubscribed beyond 2 tasks/core.

    Degenerate nodes (< 4 CPUs): both pools pin to a single
    0.5-CPU actor so at least one full CPU stays free for stateless
    tasks (a full-CPU floor deadlocked the scan at num_cpus=2)."""
    import ray as _ray

    ncpu = 8
    if _ray.is_initialized():
        ncpu = int(_ray.cluster_resources().get("CPU", ncpu))
    if ncpu < 4:
        return (1, 1), (1, 1), 0.5, 0.5
    free = max(2, ncpu // 8)
    main_max = max(1, min(cfg.extract_concurrency, ncpu - 1 - free))
    main_min = min(main_max, max(2, (ncpu * 7) // 16))
    page_max = max(1, (ncpu * 3) // 16)
    page_min = min(page_max, 2)
    return (main_min, main_max), (page_min, page_max), 0.5, 0.5


def build_extracted(
    path: str, cfg: ExtractionConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """The lazy extraction DAG (no dedup pass; see run_extraction).

    Two scans: the MAIN scan feeds the unified text+media actor pool;
    the SKEW scan (page_count above the explode threshold — a fixed
    small fraction) feeds explode → page pool → groupby(doc_id)
    reassembly, the mandated skew shuffle."""
    from ..stages.tuning import tuned_executor

    main_pool, page_pool, main_cpus, page_cpus = _pool_sizes(cfg)

    import pyarrow.dataset as _pads

    def branch(route: str):
        thr = cfg.page_explode_threshold
        if route == "skew":
            row_filter = _pads.field("page_count") > thr
            row_sql = f"page_count > {thr}"
        else:
            row_filter = _pads.field("page_count") <= thr
            row_sql = f"page_count <= {thr}"
        ds = load_documents(path, row_filter=row_filter, row_filter_sql=row_sql)
        # batch_size=None → one batch per block: a larger batch_size
        # here makes operator fusion BUNDLE read blocks into that many
        # rows per downstream actor task, collapsing 160 blocks to ~18
        # tasks and starving the actor pool (measured).
        return ds.map_batches(
            lambda b: classify_batch(b, cfg), batch_format="pyarrow",
        )

    # the reads inside this block capture the tuned DataContext COPY,
    # so the tuned budget applies to THIS DAG's execution only
    # (see stages/tuning.py)
    with tuned_executor():
        return _assemble(branch, cfg, main_pool, page_pool,
                         main_cpus, page_cpus)


def _assemble(branch, cfg, main_pool, page_pool, main_cpus, page_cpus):
    main_ds = (
        branch("main")
        .map_batches(route_filter("main", cfg), batch_format="pyarrow")
        .map_batches(cost_order_batch, batch_format="pyarrow")
        .map_batches(
            UnifiedExtractor, fn_constructor_args=(cfg,), batch_format="pyarrow",
            batch_size=cfg.extract_batch_size, concurrency=main_pool,
            num_cpus=main_cpus,
        )
    )
    skew_ds = (
        branch("skew")
        .map_batches(route_filter("skew", cfg), batch_format="pyarrow")
        .map_batches(make_explode_fn(cfg), batch_format="pyarrow", batch_size=64)
        # the pushdown-filtered read often yields ONE block; spread the
        # (tiny) unit stream across the page pool or a single actor
        # OCRs every giant serially — this repartition IS the skew
        # load-balancing step and costs ~nothing (unit rows are small)
        .repartition(page_pool[1] * 4)
        .map_batches(
            PageExtractor, fn_constructor_args=(cfg,), batch_format="pyarrow",
            batch_size=32, concurrency=page_pool, num_cpus=page_cpus,
        )
        # keyed HASH-shuffle co-location, NOT groupby(doc_id): groupby
        # compiles to a logical Sort, and any Sort in the plan flips
        # the WHOLE execution to preserve_order=True (plan.py
        # require_preserve_order) — under which the downstream union
        # buffers its entire input instead of streaming. Harmless at
        # 2M docs (~2 GB buffered); at 20M the union held 14+ GB, the
        # reservation allocator backpressured every upstream operator,
        # and the DAG crawled at <10% CPU (observed 2026-08-21). The
        # hash repartition co-locates each doc's pages with no Sort op,
        # so the union streams; per-doc ordering is re-established
        # LOCALLY inside the reassemble wrapper (offset is data).
        # partition count sizes the aggregator-actor pool (one hash
        # partition each at 0.05 CPU, see stages/tuning.py) — the
        # reassembly stream is small, so page_pool-width partitions
        # spread it without reserving real CPU from the extractors
        .repartition(num_blocks=max(8, page_pool[1]), keys=["doc_id"],
                     sort=False)
        .map_batches(
            make_reassemble_batch_fn(cfg), batch_format="pyarrow",
            batch_size=None,
        )
    )
    return main_ds.union(skew_ds)
