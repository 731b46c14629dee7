"""Media payload resolvers.

A resolver turns ``media_ref`` strings into payload bytes *inside* the
extraction actors — payloads are never shipped through shuffles (the
reference likewise stores files on disk and reads them in the worker,
src/services/file_service.rs:123-149, src/ocr/queue.rs:336-365).

- ``SynthResolver``: regenerates deterministic synthetic payloads from
  the ref alone (zero I/O). The scale analog is an object-store GET.
- ``ParquetResolver``: reads a media sidecar parquet
  (schema.MEDIA_SIDECAR). Loaded once per actor in ``__init__``. At
  100 TB the sidecar would be hash-partitioned by media_ref so each
  actor loads only the partitions its batch needs; here the fixture
  sidecars are small enough to load whole — the actor-side plumbing
  (ref → bytes lookup per batch) is identical.

Real-world resolvers (S3/HTTP byte-range readers) would slot in behind
the same two methods.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from .. import synth


class MediaResolver:
    def fetch(self, ref: str) -> bytes:
        raise NotImplementedError

    def declared_size(self, ref: str) -> int:
        """Size known without fetching (HEAD-request analog)."""
        return len(self.fetch(ref))


class SynthResolver(MediaResolver):
    def fetch(self, ref: str) -> bytes:
        return synth.payload_for_ref(ref)

    def declared_size(self, ref: str) -> int:
        return synth.declared_size_for_ref(ref)


class ParquetResolver(MediaResolver):
    def __init__(self, sidecar_path: str):
        table = pq.read_table(sidecar_path, columns=["media_ref", "payload"])
        refs = table.column("media_ref").to_pylist()
        payloads = table.column("payload").to_pylist()
        self._store = dict(zip(refs, payloads))

    def fetch(self, ref: str) -> bytes:
        try:
            return self._store[ref]
        except KeyError:
            raise FileNotFoundError(f"media_ref not in sidecar: {ref}") from None


def make_resolver(spec: str) -> MediaResolver:
    """'synth' | 'parquet:<path>' | 'spool:<dir>' | 'webdav:<base_url>'.

    WebDAV credentials come from READUR_WEBDAV_USERNAME / _PASSWORD so
    secrets never appear in resolver specs (which are logged and
    serialized into actor constructors)."""
    if spec == "synth":
        return SynthResolver()
    if spec.startswith("parquet:"):
        return ParquetResolver(spec.split(":", 1)[1])
    if spec.startswith("spool:"):
        from .upload import SpoolResolver

        return SpoolResolver(spec.split(":", 1)[1])
    if spec.startswith("webdav:"):
        import os

        from .webdav import WebDavResolver

        return WebDavResolver(
            spec.split(":", 1)[1],
            os.environ.get("READUR_WEBDAV_USERNAME", ""),
            os.environ.get("READUR_WEBDAV_PASSWORD", ""),
        )
    raise ValueError(f"unknown media resolver spec: {spec}")


def write_media_sidecar(corpus, path: str) -> str:
    """Materialize every media_ref in a corpus table into a sidecar parquet."""
    import pyarrow as pa

    from ..schema import MEDIA_SIDECAR

    refs, mimes, payloads = [], [], []
    seen = set()
    for spans in corpus.column("spans").to_pylist():
        for s in spans:
            ref = s["media_ref"]
            if s["kind"] == "media" and ref and ref not in seen:
                seen.add(ref)
                p = synth.parse_ref(ref)
                refs.append(ref)
                mimes.append(
                    {"pdf": "application/pdf", "img": "image/png", "zip": "application/zip"}[
                        p["kind"]
                    ]
                )
                payloads.append(synth.payload_for_ref(ref))
    table = pa.table(
        {"media_ref": refs, "mime_type": mimes, "payload": payloads}, schema=MEDIA_SIDECAR
    )
    pq.write_table(table, path)
    return path
