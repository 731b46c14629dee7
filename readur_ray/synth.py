"""Deterministic synthetic interleaved-document corpus + media payloads.

Models the reference's fixture corpus (FIXTURES.md §3; reference files
/root/reference/tests/test_pdfs/, tests/test_images/, generators
create_test_pdfs.py) as seeded synthetic data — no external inputs, no
wall clock. The same functions regenerate any media payload from its
``media_ref`` alone, so actors resolve bytes with zero I/O (the
scale-out analog is an object-store GET inside the actor; see
readur_ray.sources.media).

Media payload formats (parsed — not shortcut — by the hermetic engines
in readur_ray.stages.engines):

PDF  ``synth://pdf/<doc_id>/<span_idx>?cls=..&pages=..&sz=..[&p0=..&p1=..]``
  b"%PDF-1.4\n" then per page:
    b"<<PAGE n>>\n"
    text layer  : b"BT (" + words + b") ET\n"
    scanned page: b"IMG[" + noise + b"]\n" + b"%OCR(" + b64(text) + b"|" + conf + b")\n"
  then b"%%EOF\n". Corrupt class: valid header then garbage (no page
  markers). Font-enc class: page contains b"FONTENCERR". Fake class: no
  %PDF- anywhere.

IMG  ``synth://img/<doc_id>/<span_idx>?cls=..&sz=..``
  b"\x89PNG\r\n\x1a\n" + b"SYNTH;w=<w>;h=<h>;conf=<c>;\n"
  + b"OCRDATA:" + b64(text) + b";END"

ZIP  ``synth://zip/<doc_id>/<span_idx>?sz=..`` → b"PK\x03\x04" + noise
  (unsupported_format path).
"""

from __future__ import annotations

import base64
import hashlib
import random
from urllib.parse import parse_qs, urlparse

import pyarrow as pa

from .schema import DOCUMENTS

_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu report ledger invoice summary contract notice appendix "
    "figure table section clause margin header footer body index"
).split()


def _rng(*key) -> random.Random:
    seed = int.from_bytes(
        hashlib.md5("|".join(str(k) for k in key).encode()).digest()[:8], "big"
    )
    return random.Random(seed)


def gen_words(key: tuple, n_words: int) -> str:
    r = _rng(*key)
    return " ".join(r.choice(_VOCAB) for _ in range(n_words))


# --------------------------------------------------------------------------
# media_ref grammar
# --------------------------------------------------------------------------

def make_ref(kind: str, doc_id: str, span_idx: int, **params) -> str:
    qs = "&".join(f"{k}={v}" for k, v in sorted(params.items()))
    return f"synth://{kind}/{doc_id}/{span_idx}?{qs}"


def parse_ref(ref: str) -> dict:
    u = urlparse(ref)
    parts = u.path.lstrip("/").split("/")
    out = {"scheme": u.scheme, "kind": u.netloc, "doc_id": parts[0], "span_idx": int(parts[1])}
    for k, v in parse_qs(u.query).items():
        out[k] = v[0]
    return out


# --------------------------------------------------------------------------
# payload generation
# --------------------------------------------------------------------------

def _page_text(doc_id: str, span_idx: int, page: int) -> str:
    r = _rng("pagetext", doc_id, span_idx, page)
    return " ".join(r.choice(_VOCAB) for _ in range(r.randint(30, 80)))


def pdf_payload(
    doc_id: str, span_idx: int, cls: str, pages: int, p0: int | None = None, p1: int | None = None
) -> bytes:
    lo, hi = (p0 or 0), (p1 if p1 is not None else pages)
    buf = bytearray()
    if cls == "pdf_fake":
        return b"NOT A PDF AT ALL " + gen_words(("fake", doc_id, span_idx), 10).encode()
    buf += b"%PDF-1.4\n"
    if cls == "pdf_corrupt":
        r = _rng("corrupt", doc_id, span_idx)
        buf += bytes(r.getrandbits(8) for _ in range(256))
        buf += b"\n%%EOF\n"
        return bytes(buf)
    for p in range(lo, hi):
        buf += b"<<PAGE %d>>\n" % p
        if cls == "pdf_font_enc":
            buf += b"FONTENCERR stream with bad cmap\n"
        elif cls == "pdf_scanned":
            txt = _page_text(doc_id, span_idx, p)
            r = _rng("noise", doc_id, span_idx, p)
            noise = bytes(r.getrandbits(8) for _ in range(64))
            buf += b"IMG[" + noise.hex().encode() + b"]\n"
            buf += b"%OCR(" + base64.b64encode(txt.encode()) + b"|85.0)\n"
        else:  # text layer
            txt = _page_text(doc_id, span_idx, p)
            buf += b"BT (" + txt.encode() + b") ET\n"
    buf += b"%%EOF\n"
    return bytes(buf)


def img_payload(doc_id: str, span_idx: int, cls: str) -> bytes:
    r = _rng("img", doc_id, span_idx, cls)
    if cls == "img_skew_dims":
        w, h = r.choice([(1920, 1080), (50, 50), (400, 2000), (4000, 500)])
    else:
        w, h = r.randint(300, 1600), r.randint(300, 1200)
    if cls == "img_low_conf":
        conf = round(r.uniform(5.0, 25.0), 1)
        text = gen_words(("imgtext", doc_id, span_idx), r.randint(5, 20))
    elif cls == "img_empty":
        conf, text = 0.0, ""
    else:
        conf = round(r.uniform(45.0, 98.0), 1)
        text = gen_words(("imgtext", doc_id, span_idx), r.randint(10, 40))
    head = f"SYNTH;w={w};h={h};conf={conf};\n".encode()
    return (
        b"\x89PNG\r\n\x1a\n" + head + b"OCRDATA:" + base64.b64encode(text.encode()) + b";END"
    )


def zip_payload(doc_id: str, span_idx: int) -> bytes:
    return b"PK\x03\x04" + gen_words(("zip", doc_id, span_idx), 8).encode()


def payload_for_ref(ref: str) -> bytes:
    p = parse_ref(ref)
    if p["kind"] == "pdf":
        return pdf_payload(
            p["doc_id"], p["span_idx"], p.get("cls", "pdf_text_layer"),
            int(p.get("pages", 1)),
            int(p["p0"]) if "p0" in p else None,
            int(p["p1"]) if "p1" in p else None,
        )
    if p["kind"] == "img":
        return img_payload(p["doc_id"], p["span_idx"], p.get("cls", "img_ok"))
    if p["kind"] == "zip":
        return zip_payload(p["doc_id"], p["span_idx"])
    raise ValueError(f"unknown synth ref kind: {ref}")


def declared_size_for_ref(ref: str) -> int:
    p = parse_ref(ref)
    if "sz" in p:
        return int(p["sz"])
    return len(payload_for_ref(ref))


# --------------------------------------------------------------------------
# corpus generation
# --------------------------------------------------------------------------

# (class, weight). Skew classes get fixed counts below.
_CLASS_WEIGHTS = [
    ("plain_normal", 18),
    ("plain_multiline", 6),
    ("plain_continuous", 3),
    ("plain_special", 3),
    ("plain_mixed", 3),
    ("html_page", 6),
    ("pdf_text_layer", 16),
    ("pdf_multipage", 8),
    ("pdf_scanned", 8),
    ("pdf_corrupt", 2),
    ("pdf_fake", 2),
    ("pdf_font_enc", 2),
    ("img_ok", 14),
    ("img_low_conf", 3),
    ("img_empty", 2),
    ("img_skew_dims", 3),
    ("interleaved", 8),
    ("unsupported", 2),
]
_DUP_FRACTION = 0.03       # of docs are exact-content duplicates of earlier docs
_GIANT_PER_10K = 2          # pdf_skew_giant docs per 10k docs (fixed, ≥1)
_OVERSIZED_PER_10K = 2


def _choose_classes(n_docs: int, seed: int) -> list[str]:
    r = random.Random(seed)
    classes, weights = zip(*_CLASS_WEIGHTS)
    out = r.choices(classes, weights=weights, k=n_docs)
    n_giant = max(1, (n_docs * _GIANT_PER_10K) // 10_000)
    n_over = max(1, (n_docs * _OVERSIZED_PER_10K) // 10_000)
    n_dup = max(1, int(n_docs * _DUP_FRACTION))
    # plant fixed-count special classes at deterministic positions
    pos = r.sample(range(n_docs), min(n_docs, n_giant + n_over + n_dup))
    for i in pos[:n_giant]:
        out[i] = "pdf_skew_giant"
    for i in pos[n_giant : n_giant + n_over]:
        out[i] = "pdf_oversized"
    for i in pos[n_giant + n_over :]:
        out[i] = "dup_content"
    return out


def _make_doc(doc_id: str, cls: str, seed: int) -> dict:
    r = _rng("doc", seed, doc_id, cls)
    spans: list[dict] = []

    def text_span(off: int, txt: str) -> dict:
        return {"kind": "text", "text": txt, "media_ref": "", "offset": off}

    def media_span(off: int, ref: str) -> dict:
        return {"kind": "media", "text": "", "media_ref": ref, "offset": off}

    mime, pages = "text/plain", 0
    if cls == "html_page":
        from .functions.html import wrap_boilerplate

        mime = "text/html"
        inner = gen_words(("html", doc_id), r.randint(30, 90))
        spans = [text_span(0, wrap_boilerplate(inner, doc_id))]
    elif cls == "plain_normal":
        spans = [text_span(0, gen_words(("t", doc_id), r.randint(20, 120)))]
    elif cls == "plain_multiline":
        lines = [gen_words(("l", doc_id, i), r.randint(4, 12)) for i in range(r.randint(3, 8))]
        spans = [text_span(0, "\n".join(lines))]
    elif cls == "plain_continuous":
        words = [r.choice(_VOCAB).capitalize() for _ in range(r.randint(5, 30))]
        spans = [text_span(0, "".join(words))]
    elif cls == "plain_special":
        base = gen_words(("s", doc_id), r.randint(10, 40))
        spans = [text_span(0, f"café — • “{base}” naïve 模型")]
    elif cls == "plain_mixed":
        parts = [f"{r.randint(0, 999)}#{r.choice(_VOCAB)}$%" for _ in range(r.randint(5, 20))]
        spans = [text_span(0, " ".join(parts))]
    elif cls in ("pdf_text_layer", "pdf_scanned", "pdf_corrupt", "pdf_fake", "pdf_font_enc"):
        mime, pages = "application/pdf", 1 if cls != "pdf_text_layer" else r.randint(1, 2)
        ref = make_ref("pdf", doc_id, 0, cls=cls, pages=pages)
        spans = [media_span(0, ref)]
    elif cls == "pdf_multipage":
        mime, pages = "application/pdf", r.randint(3, 20)
        spans = [media_span(0, make_ref("pdf", doc_id, 0, cls="pdf_text_layer", pages=pages))]
    elif cls == "pdf_skew_giant":
        mime, pages = "application/pdf", 1000
        spans = [media_span(0, make_ref("pdf", doc_id, 0, cls="pdf_scanned", pages=pages))]
    elif cls == "pdf_oversized":
        mime, pages = "application/pdf", 200
        spans = [media_span(0, make_ref("pdf", doc_id, 0, cls="pdf_text_layer", pages=1,
                                        sz=120 * 1024 * 1024))]
    elif cls in ("img_ok", "img_low_conf", "img_empty", "img_skew_dims"):
        mime = "image/png"
        n = r.randint(1, 3) if cls == "img_ok" else 1
        spans = [media_span(i, make_ref("img", doc_id, i, cls=cls)) for i in range(n)]
    elif cls == "interleaved":
        mime = "multipart/mixed"
        n = r.randint(3, 9)
        for i in range(n):
            which = r.random()
            if which < 0.45:
                spans.append(text_span(i, gen_words(("iv", doc_id, i), r.randint(8, 40))))
            elif which < 0.75:
                spans.append(media_span(i, make_ref("img", doc_id, i, cls="img_ok")))
            else:
                p = r.randint(1, 4)
                pages += p
                spans.append(media_span(i, make_ref("pdf", doc_id, i, cls="pdf_text_layer", pages=p)))
        if mime == "multipart/mixed" and pages == 0 and all(s["kind"] == "text" for s in spans):
            mime = "text/plain"
    elif cls == "unsupported":
        mime = "application/zip"
        spans = [media_span(0, make_ref("zip", doc_id, 0))]
    else:
        raise ValueError(cls)

    file_size = 0
    for s in spans:
        if s["kind"] == "text":
            file_size += len(s["text"].encode("utf-8"))
        else:
            file_size += declared_size_for_ref(s["media_ref"])
    return {
        "doc_id": doc_id,
        "spans": spans,
        "mime_type": mime,
        "file_size": file_size,
        "page_count": pages,
        "_cls": cls,
    }


def make_corpus(n_docs: int, seed: int = 42, with_class: bool = False) -> pa.Table:
    """Deterministic corpus of ``n_docs`` interleaved documents."""
    classes = _choose_classes(n_docs, seed)
    rows: list[dict] = []
    for i, cls in enumerate(classes):
        doc_id = f"doc-{i:012d}"
        if cls == "dup_content":
            # exact byte-copy of an earlier (or later-wrapping) doc's spans
            src_i = _rng("dup", seed, i).randrange(n_docs)
            if src_i == i or classes[src_i] == "dup_content":
                src_i = (src_i + 1) % n_docs
                if classes[src_i] == "dup_content" or src_i == i:
                    src_i = 0 if i != 0 else 1
            src = _make_doc(f"doc-{src_i:012d}", classes[src_i], seed)
            rows.append({**src, "doc_id": doc_id, "_cls": "dup_content", "_dup_of": src["doc_id"]})
        else:
            rows.append(_make_doc(doc_id, cls, seed))
    cols = {name: [r.get(name) for r in rows] for name in DOCUMENTS.names}
    table = pa.table(cols, schema=DOCUMENTS)
    if with_class:
        table = table.append_column("_cls", pa.array([r["_cls"] for r in rows], pa.string()))
    return table


def make_corpus_range(
    n_docs: int, start: int, stop: int, seed: int = 42
) -> pa.Table:
    """Rows [start, stop) of make_corpus(n_docs, seed) — deterministic
    per range, so shards can be generated in parallel (the class list
    is O(n) seeded choices, recomputed per shard; dup_content sources
    are re-derived from the class list alone)."""
    classes = _choose_classes(n_docs, seed)
    rows: list[dict] = []
    for i in range(start, stop):
        cls = classes[i]
        doc_id = f"doc-{i:012d}"
        if cls == "dup_content":
            src_i = _rng("dup", seed, i).randrange(n_docs)
            if src_i == i or classes[src_i] == "dup_content":
                src_i = (src_i + 1) % n_docs
                if classes[src_i] == "dup_content" or src_i == i:
                    src_i = 0 if i != 0 else 1
            src = _make_doc(f"doc-{src_i:012d}", classes[src_i], seed)
            rows.append({**src, "doc_id": doc_id})
        else:
            rows.append(_make_doc(doc_id, cls, seed))
    cols = {name: [r.get(name) for r in rows] for name in DOCUMENTS.names}
    return pa.table(cols, schema=DOCUMENTS)


def write_corpus_parallel(
    path: str, n_docs: int, seed: int = 42, rows_per_file: int = 20_000
) -> str:
    """Parallel corpus writer: one Ray task per shard (falls back to
    the serial writer when Ray isn't initialised)."""
    import os

    import ray as _ray

    if not _ray.is_initialized():
        return write_corpus(path, n_docs, seed, rows_per_file)

    os.makedirs(path, exist_ok=True)

    @_ray.remote
    def _shard(shard_no: int, start: int, stop: int) -> int:
        import pyarrow.parquet as pq

        t = make_corpus_range(n_docs, start, stop, seed)
        pq.write_table(t, os.path.join(path, f"part-{shard_no:05d}.parquet"))
        return t.num_rows

    refs = [
        _shard.remote(k, s, min(s + rows_per_file, n_docs))
        for k, s in enumerate(range(0, n_docs, rows_per_file))
    ]
    _ray.get(refs)
    return path


def write_corpus(path: str, n_docs: int, seed: int = 42, rows_per_file: int = 20_000) -> str:
    """Write the corpus as a directory of parquet files (sharded)."""
    import os
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    table = make_corpus(n_docs, seed=seed)
    for shard_no, start in enumerate(range(0, table.num_rows, rows_per_file)):
        chunk = table.slice(start, rows_per_file)
        pq.write_table(chunk, os.path.join(path, f"part-{shard_no:05d}.parquet"))
    return path
