"""Priority / cost estimation (operator M20) → skew-aware scheduling.

``calculate_priority`` replicates the reference's size buckets
(/root/reference/src/ingestion/batch_ingest.rs:281-294) with the
watcher's mime boosts (/root/reference/src/scheduling/watcher.rs:553-577).

In the Ray engine priority inverts into an estimated COST used for skew
routing: docs whose estimated cost exceeds a threshold (giant PDFs) are
exploded into per-page rows before the actor-pool stage and reassembled
with a groupby(doc_id) shuffle, so a single 1000-page document cannot
stall the streaming executor (north_rule skew requirement).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MB = 1024 * 1024


def calculate_priority(file_size: int, mime_type: str = "") -> int:
    if file_size <= _MB:
        base = 10
    elif file_size <= 5 * _MB:
        base = 8
    elif file_size <= 10 * _MB:
        base = 6
    elif file_size <= 50 * _MB:
        base = 4
    else:
        base = 2
    if mime_type.startswith("image/"):
        boost = 2
    elif mime_type == "text/plain":
        boost = 1
    else:
        boost = 0
    return min(base + boost, 10)


def priority_array(file_size: pa.Array, mime_type: pa.Array) -> pa.Array:
    """Vectorized M20 over Arrow columns."""
    size = np.asarray(file_size.to_numpy(zero_copy_only=False), dtype=np.int64)
    base = np.full(size.shape, 2, dtype=np.int32)
    base[size <= 50 * _MB] = 4
    base[size <= 10 * _MB] = 6
    base[size <= 5 * _MB] = 8
    base[size <= _MB] = 10
    mimes = mime_type.to_numpy(zero_copy_only=False)
    is_img = np.char.startswith(mimes.astype(str), "image/")
    is_txt = mimes.astype(str) == "text/plain"
    out = base + np.where(is_img, 2, np.where(is_txt, 1, 0)).astype(np.int32)
    return pa.array(np.minimum(out, 10), type=pa.int32())


def estimate_cost(
    file_size: pa.Array, mime_type: pa.Array, page_count: pa.Array
) -> pa.Array:
    """Relative per-doc extraction cost for partition balancing.

    text ~ O(bytes); pdf ~ O(pages) with OCR weight; image ~ O(pixels)
    approximated by bytes. Unit: arbitrary 'cost points'.
    """
    size = np.asarray(file_size.to_numpy(zero_copy_only=False), dtype=np.float64)
    pages = np.asarray(page_count.to_numpy(zero_copy_only=False), dtype=np.float64)
    mimes = mime_type.to_numpy(zero_copy_only=False).astype(str)
    cost = size / (1024.0 * 64)  # base: 1 point per 64 KB
    cost = np.where(np.char.startswith(mimes, "application/pdf"), cost + pages * 10.0, cost)
    cost = np.where(np.char.startswith(mimes, "image/"), cost * 4.0 + 5.0, cost)
    return pa.array(cost, type=pa.float64())
