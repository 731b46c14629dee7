"""Arrow schemas for the interleaved-document tables.

Input shape per BASELINE.json `input_hint`:
``(doc_id: string, spans: list<struct<kind,text,media_ref,offset>>)``
plus sidecar columns materialized for filtering / cost estimation.

Output shape per FIXTURES.md §2, mirroring the reference's
``Document``/``OcrResult``/``FailedDocument`` fields
(/root/reference/src/models/document.rs:8-49,
/root/reference/src/ocr/enhanced.rs:28-36).

`file_hash` note: the reference hashes the whole file's bytes
(document_ingestion.rs:311-316). Our documents are multi-span, and at
scale we refuse to ship raw media payloads through shuffles, so we use a
Merkle-style equivalent: ``sha256(concat(sha256(span_payload) for spans
in offset order))``. It is a pure function of the ordered content bytes,
so it is an equivalent exact-dedup key.
"""

from __future__ import annotations

import pyarrow as pa

SPAN = pa.struct(
    [
        ("kind", pa.string()),       # 'text' | 'media'
        ("text", pa.string()),       # inline payload for kind='text', '' otherwise
        ("media_ref", pa.string()),  # media locator for kind='media', '' otherwise
        ("offset", pa.int32()),      # 0-based order of the span within the doc
    ]
)

DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN)),
        ("mime_type", pa.string()),    # dominant type: text/plain | application/pdf | image/*
        ("file_size", pa.int64()),     # declared total payload bytes
        ("page_count", pa.int32()),    # PDF pages; 0 for pure text
    ]
)

OUT_SPAN = pa.struct(
    [
        ("kind", pa.string()),       # plain_text | pdf_text | pdf_ocr | pdf_bytes | ocr_text
        ("text", pa.string()),
        ("media_ref", pa.string()),  # carries through the source ref ('' for text spans)
        ("offset", pa.int32()),      # preserves input span order (the per-row invariant)
    ]
)

PROCESSED_IMAGE = pa.struct(
    [
        ("media_ref", pa.string()),           # original image locator
        ("processed_image_ref", pa.string()), # deterministic artifact pointer
        ("image_width", pa.int32()),          # processed dimensions
        ("image_height", pa.int32()),
        ("file_size", pa.int64()),            # processed payload bytes
        ("steps", pa.list_(pa.string())),     # the P1-P12 steps applied
    ]
)

EXTRACTED = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(OUT_SPAN)),
        ("status", pa.string()),             # completed | failed | skipped_duplicate
        ("failure_reason", pa.string()),     # '' or taxonomy of document.rs:51-87
        ("failure_stage", pa.string()),      # '' | ingestion | validation | ocr
        ("confidence", pa.float32()),        # min over span confidences
        ("word_count", pa.int32()),          # sum over spans, M17 semantics per span
        ("processing_time_ms", pa.int64()),
        ("file_hash", pa.string()),          # hex sha256 (Merkle over span payloads)
        ("dedup_status", pa.string()),       # kept | skipped_duplicate | tracked_duplicate
        ("preprocessing_applied", pa.list_(pa.string())),  # OcrResult lineage
                                             # (enhanced.rs:28-36): unique-in-order
                                             # union of per-span engine steps
        ("pages_ocrd", pa.int32()),          # pages actually run through OCR
                                             # across all spans (north-star
                                             # metrics field; 0 for text-layer
                                             # / plain-text / byte-scan docs)
        ("processed_images", pa.list_(PROCESSED_IMAGE)),
                                             # ProcessedImage lineage rows
                                             # (document.rs:194-238): one per
                                             # image span whose preprocessing
                                             # produced a new artifact; kept
                                             # only when cfg.save_processed_images
                                             # (settings.rs save_processed_images)
        ("part_id", pa.int32()),             # hash(doc_id) % num_output_partitions
    ]
)

MEDIA_SIDECAR = pa.schema(
    [
        ("media_ref", pa.string()),
        ("mime_type", pa.string()),
        ("payload", pa.binary()),
    ]
)
