"""Content hashing (operator M8 / dedup key D1).

The reference computes a hex SHA-256 over the whole file's bytes
(/root/reference/src/ingestion/document_ingestion.rs:311-316) and
dedups per user on it. Our documents are multi-span; the engine's
dedup key is a Merkle-style equivalent (see readur_ray.schema):

    span_hash = sha256(payload_bytes)            # per span, in parallel
    file_hash = sha256(concat(span_hash bytes in offset order))

For a single-span document this degrades to sha256(sha256(payload)) —
still a pure function of content. ``sha256_hex`` is also exposed for
the SQL-oracle-checked queries where DuckDB computes sha256(text).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def sha256_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8", errors="surrogatepass")
    return hashlib.sha256(data).hexdigest()


def sha256_hex_array(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Hex sha256 of each utf-8 string in an Arrow array."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return pa.array(
        [None if v is None else sha256_hex(v) for v in texts.to_pylist()],
        type=pa.string(),
    )


def merkle_file_hash(span_payloads: list[bytes]) -> str:
    """file_hash over ordered span payloads (schema.py definition)."""
    h = hashlib.sha256()
    for payload in span_payloads:
        h.update(hashlib.sha256(payload).digest())
    return h.hexdigest()


def merkle_from_span_hashes(span_hashes_hex: list[str]) -> str:
    h = hashlib.sha256()
    for hex_digest in span_hashes_hex:
        h.update(bytes.fromhex(hex_digest))
    return h.hexdigest()
