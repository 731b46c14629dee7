"""S5: HTTP upload source.

Re-expresses the reference's multipart upload route → ingest → enqueue
flow (/root/reference/src/routes/documents/crud.rs:77-314,
src/services/file_service.rs:123-149) without the Axum serving shell:
a stdlib ``http.server`` endpoint accepts ``multipart/form-data``
uploads, validates them (filename present, size cap → 413, OCR
language against the available set → 400), and lands each file in a
**spool directory** — payload bytes under a content-addressed name
plus a JSON sidecar carrying the FileIngestionInfo fields the
reference builds (virtual ``upload/<filename>`` path, etag, owner,
priority 5 for direct uploads). Content-hash duplicates are answered
with ``status="duplicate"`` and the existing id (DeduplicationPolicy::
Skip, document_ingestion.rs).

The spool is the Lance-table mailbox: ``read_uploads(spool_dir)``
turns it into a DOCUMENTS-schema Dataset (text inlined, media lazy
behind a ``spool:`` resolver) that feeds the normal extraction DAG —
the enqueue-priority-5 step of the reference becomes "rows appear in
the next incremental run's input". At scale the spool is an object
store prefix and many upload endpoints write to it concurrently; the
reader only lists sidecars (metadata) on the driver.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..functions.mime import detect_mime_from_content

# hermetic analog of OcrHealthChecker.get_available_languages()
# (/root/reference/src/ocr/health.rs — reads installed tessdata packs)
AVAILABLE_OCR_LANGUAGES = (
    "eng", "deu", "fra", "spa", "ita", "por", "nld", "rus",
)

UPLOAD_PRIORITY = 5  # crud.rs:258 — normal priority for direct uploads


def validate_ocr_language(lang: str) -> str:
    lang = lang.strip()
    if lang not in AVAILABLE_OCR_LANGUAGES:
        raise ValueError(
            f"Invalid OCR language '{lang}'. Available languages: "
            + ", ".join(AVAILABLE_OCR_LANGUAGES)
        )
    return lang


# ---------------------------------------------------------------------------
# multipart/form-data parsing (stdlib-only)
# ---------------------------------------------------------------------------

_DISPOSITION = re.compile(
    rb'form-data\s*;\s*name="(?P<name>[^"]*)"(?:\s*;\s*filename="(?P<filename>[^"]*)")?',
    re.I,
)


def parse_multipart(body: bytes, content_type: str) -> list[dict]:
    """Parse a multipart/form-data body into
    [{name, filename, content_type, data}], tolerating binary payloads
    containing CRLF. Raises ValueError on malformed input (→ 400)."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        raise ValueError("missing multipart boundary")
    delim = b"--" + m.group(1).encode()
    parts = body.split(delim)
    out = []
    # parts[0] is the preamble, the last is the '--\r\n' epilogue
    for raw in parts[1:-1]:
        raw = raw.lstrip(b"\r\n")
        if b"\r\n\r\n" not in raw:
            continue
        head, data = raw.split(b"\r\n\r\n", 1)
        data = data[:-2] if data.endswith(b"\r\n") else data
        dm = _DISPOSITION.search(head)
        if not dm:
            raise ValueError("part without content-disposition")
        ctm = re.search(rb"content-type:\s*([^\r\n]+)", head, re.I)
        out.append(
            {
                "name": dm.group("name").decode(),
                "filename": dm.group("filename").decode()
                if dm.group("filename") is not None
                else None,
                "content_type": ctm.group(1).decode().strip() if ctm else None,
                "data": data,
            }
        )
    return out


# ---------------------------------------------------------------------------
# spool
# ---------------------------------------------------------------------------


class UploadSpool:
    """Content-addressed upload landing zone: payload bytes as
    ``<sha256[:32]>.<ext>`` + a ``.json`` sidecar per document. The
    content-derived id makes duplicate detection a dictionary hit
    (the reference's get_document_by_hash check,
    document_ingestion.rs:311-340) and re-uploads idempotent."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._lock = threading.Lock()
        self._by_hash: dict[str, str] = {}
        for f in os.listdir(root):
            if f.endswith(".json"):
                with open(os.path.join(root, f)) as fh:
                    side = json.load(fh)
                self._by_hash[side["sha256"]] = side["id"]

    def ingest(
        self,
        filename: str,
        content_type: str | None,
        data: bytes,
        owner: str = "",
        ocr_language: str = "",
    ) -> dict:
        """Returns the DocumentUploadResponse fields (crud.rs:266-285):
        status 'success' on create, 'duplicate' with the existing id on
        a content-hash hit."""
        sha = hashlib.sha256(data).hexdigest()
        mime = detect_mime_from_content(data, filename, content_type)
        with self._lock:
            if sha in self._by_hash:
                return {
                    "id": self._by_hash[sha],
                    "filename": filename,
                    "file_size": len(data),
                    "mime_type": mime,
                    "status": "duplicate",
                    "message": "Document already exists",
                }
            doc_id = sha[:32]
            ext = filename.rsplit(".", 1)[-1].lower() if "." in filename else "bin"
            stored = f"{doc_id}.{ext}"
            with open(os.path.join(self.root, stored), "wb") as fh:
                fh.write(data)
            sidecar = {
                "id": doc_id,
                "stored": stored,
                "name": filename,
                "relative_path": f"upload/{filename}",  # crud.rs:184 virtual path
                "size": len(data),
                "mime_type": mime,
                "sha256": sha,
                # deterministic stand-in for the reference's
                # '<size>-<timestamp>' upload etag (crud.rs:191)
                "etag": f"{len(data)}-{sha[:8]}",
                "owner": owner,
                "ocr_language": ocr_language,
                "priority": UPLOAD_PRIORITY,
            }
            with open(os.path.join(self.root, f"{doc_id}.json"), "w") as fh:
                json.dump(sidecar, fh, sort_keys=True)
            self._by_hash[sha] = doc_id
        return {
            "id": doc_id,
            "filename": filename,
            "file_size": len(data),
            "mime_type": mime,
            "status": "success",
            "message": "Document uploaded successfully",
        }

    def sidecars(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.root)):
            if f.endswith(".json"):
                with open(os.path.join(self.root, f)) as fh:
                    out.append(json.load(fh))
        return out


class SpoolResolver:
    """MediaResolver over a spool: ``media_ref = 'spool:<stored_name>'``
    → read the payload file inside the extraction actor."""

    def __init__(self, root: str):
        self.root = root

    def fetch(self, ref: str) -> bytes:
        name = ref.split(":", 1)[1] if ref.startswith("spool:") else ref
        path = os.path.join(self.root, os.path.basename(name))
        with open(path, "rb") as fh:
            return fh.read()

    def declared_size(self, ref: str) -> int:
        name = ref.split(":", 1)[1] if ref.startswith("spool:") else ref
        return os.path.getsize(os.path.join(self.root, os.path.basename(name)))


# ---------------------------------------------------------------------------
# HTTP endpoint
# ---------------------------------------------------------------------------


def make_upload_handler(spool: UploadSpool, max_file_size_mb: int = 50,
                        require_auth: str | None = None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if require_auth is not None and (
                self.headers.get("Authorization", "") != require_auth
            ):
                return self._json(401, {"error": "unauthorized"})
            path = urllib.parse.urlparse(self.path).path
            if path.rstrip("/") not in ("/documents", "/api/documents"):
                return self._json(404, {"error": "not found"})
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            try:
                parts = parse_multipart(body, self.headers.get("Content-Type", ""))
            except ValueError as e:
                return self._json(400, {"error": str(e)})

            upload = None
            ocr_language = ""
            owner = ""
            for p in parts:
                name = p["name"]
                if name == "file":
                    if not p["filename"]:
                        return self._json(
                            400, {"error": "No filename provided in upload"}
                        )
                    upload = p
                elif name == "ocr_language" or name.startswith("ocr_languages"):
                    text = p["data"].decode().strip()
                    if text:
                        try:
                            # first valid language wins (crud.rs treats
                            # ocr_languages[0] as primary)
                            if not ocr_language:
                                ocr_language = validate_ocr_language(text)
                            else:
                                validate_ocr_language(text)
                        except ValueError as e:
                            return self._json(400, {"error": str(e)})
                elif name == "owner":
                    owner = p["data"].decode().strip()
            if upload is None:
                return self._json(400, {"error": "No file found in upload"})
            cap = max_file_size_mb * 1024 * 1024
            if len(upload["data"]) > cap:
                return self._json(
                    413,
                    {
                        "error": f"File '{upload['filename']}' size "
                        f"({len(upload['data'])} bytes) exceeds maximum allowed "
                        f"size ({cap} bytes / {max_file_size_mb}MB)"
                    },
                )
            resp = spool.ingest(
                upload["filename"], upload["content_type"], upload["data"],
                owner=owner, ocr_language=ocr_language,
            )
            return self._json(200, resp)

    return Handler


class UploadServer:
    """Threaded upload endpoint over a spool directory. ``with
    UploadServer(dir) as url: POST <url>/documents``."""

    def __init__(self, spool_dir: str, max_file_size_mb: int = 50,
                 username: str = "", password: str = ""):
        self.spool = UploadSpool(spool_dir)
        auth = None
        if username:
            auth = "Basic " + base64.b64encode(
                f"{username}:{password}".encode()
            ).decode()
        self._server = ThreadingHTTPServer(
            ("127.0.0.1", 0),
            make_upload_handler(self.spool, max_file_size_mb, auth),
        )
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self._server.server_address[1]}"

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._server.shutdown()
        self._server.server_close()


# ---------------------------------------------------------------------------
# Ray-side reader
# ---------------------------------------------------------------------------


def read_uploads(spool_dir: str) -> "ray.data.Dataset":
    """Spool → DOCUMENTS-schema Dataset. The driver lists sidecars
    (metadata only); payload reads happen in the mapped tasks — text
    inlined, media lazy behind ``media_resolver='spool:<dir>'``."""
    import ray.data

    sidecars = UploadSpool(spool_dir).sidecars()
    if not sidecars:
        import pyarrow as pa

        from ..schema import DOCUMENTS

        # same 9-column schema as the non-empty branch (DOCUMENTS plus
        # etag/source/owner/priority) — a state-dependent schema breaks
        # unions with connector outputs and etag readers
        empty = pa.table(
            {
                **{f.name: pa.array([], f.type) for f in DOCUMENTS},
                "etag": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "owner": pa.array([], pa.string()),
                "priority": pa.array([], pa.int32()),
            }
        )
        return ray.data.from_arrow(empty)

    def to_documents(batch):
        import pyarrow as pa

        from ..schema import SPAN

        rows = batch.to_pylist()
        cols = {k: [] for k in
                ("doc_id", "spans", "mime_type", "file_size", "page_count",
                 "etag", "source", "owner", "priority")}
        for r in rows:
            if r["mime_type"].startswith("text/"):
                with open(os.path.join(spool_dir, r["stored"]), "rb") as fh:
                    text = fh.read().decode("utf-8", errors="replace")
                span = {"kind": "text", "text": text, "media_ref": "", "offset": 0}
            else:
                span = {"kind": "media", "text": "",
                        "media_ref": f"spool:{r['stored']}", "offset": 0}
            # path alone collides when the same filename is uploaded
            # twice with different content (the spool keeps both): the
            # content-hash suffix makes the id collision-free while
            # keeping the virtual path readable
            cols["doc_id"].append(f"{r['relative_path']}#{r['sha256'][:12]}")
            cols["spans"].append([span])
            cols["mime_type"].append(r["mime_type"])
            cols["file_size"].append(r["size"])
            cols["page_count"].append(0)
            cols["etag"].append(r["etag"])
            cols["source"].append("upload")
            cols["owner"].append(r.get("owner", ""))
            cols["priority"].append(r.get("priority", UPLOAD_PRIORITY))
        return pa.table(
            {
                "doc_id": pa.array(cols["doc_id"], pa.string()),
                "spans": pa.array(cols["spans"], pa.list_(SPAN)),
                "mime_type": pa.array(cols["mime_type"], pa.string()),
                "file_size": pa.array(cols["file_size"], pa.int64()),
                "page_count": pa.array(cols["page_count"], pa.int32()),
                "etag": pa.array(cols["etag"], pa.string()),
                "source": pa.array(cols["source"], pa.string()),
                "owner": pa.array(cols["owner"], pa.string()),
                "priority": pa.array(cols["priority"], pa.int32()),
            }
        )

    return ray.data.from_items(sidecars).map_batches(
        to_documents, batch_format="pyarrow", batch_size=64
    )
