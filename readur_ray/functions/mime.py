"""MIME detection (operators M1-M3, M7).

Replicates /root/reference/src/mime_detection.rs:

- magic-byte sniffing over a content prefix (the subset of signatures
  the extraction engine cares about — pdf/png/jpeg/tiff/bmp/gif/zip —
  mirroring the `infer` crate's tables the reference relies on);
- trust lattice: content detection overrides server-declared type on
  mismatch; generic server types (application/octet-stream, ...) are
  never trusted (mime_detection.rs:300-311);
- compatibility table image/jpg≡image/jpeg etc.
  (mime_detection.rs:316-332);
- `is_valid_pdf` (M7): scan the first 1 KB for "%PDF-" tolerating
  leading junk (/root/reference/src/ocr/enhanced.rs:1618-1635).
"""

from __future__ import annotations

_MAGIC: tuple[tuple[bytes, str], ...] = (
    (b"%PDF-", "application/pdf"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"II*\x00", "image/tiff"),
    (b"MM\x00*", "image/tiff"),
    (b"BM", "image/bmp"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"PK\x03\x04", "application/zip"),
)

_EXT_MAP = {
    "pdf": "application/pdf",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "tif": "image/tiff",
    "tiff": "image/tiff",
    "bmp": "image/bmp",
    "gif": "image/gif",
    "txt": "text/plain",
    "zip": "application/zip",
}

_UNTRUSTED_SERVER_TYPES = frozenset(
    {"application/octet-stream", "application/binary", "binary/octet-stream", "", "unknown"}
)

_COMPAT_PAIRS = frozenset(
    {
        frozenset({"image/jpeg", "image/jpg"}),
        frozenset({"image/tiff", "image/tif"}),
        frozenset({"text/plain", "text/txt"}),
    }
)


def sniff_magic(content: bytes) -> str | None:
    """M2: magic-byte detection over a content prefix."""
    for sig, mime in _MAGIC:
        if content.startswith(sig):
            return mime
    return None


def mime_from_extension(filename: str) -> str:
    ext = filename.rsplit(".", 1)[-1].lower() if "." in filename else ""
    return _EXT_MAP.get(ext, "application/octet-stream")


def is_trusted_server_mime_type(mime_type: str) -> bool:
    return mime_type not in _UNTRUSTED_SERVER_TYPES


def are_mime_types_compatible(type1: str, type2: str) -> bool:
    """M3: mime_detection.rs:316-332."""
    if type1 == type2:
        return True
    if frozenset({type1, type2}) in _COMPAT_PAIRS:
        return True
    p1, p2 = type1.split("/"), type2.split("/")
    return len(p1) == 2 and len(p2) == 2 and p1[0] == p2[0]


def detect_mime_from_content(
    content: bytes, filename: str = "", server_mime_type: str | None = None
) -> str:
    """M2 precedence: magic bytes > trusted server type > extension."""
    detected = sniff_magic(content)
    if detected is not None:
        return detected
    if server_mime_type and is_trusted_server_mime_type(server_mime_type):
        return server_mime_type
    return mime_from_extension(filename)


def is_valid_pdf(data: bytes) -> bool:
    """M7: enhanced.rs:1618-1635 — '%PDF-' anywhere in the first 1 KB."""
    if len(data) < 5:
        return False
    return b"%PDF-" in data[: min(len(data), 1024)]
