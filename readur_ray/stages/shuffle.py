"""The engine's shuffle primitive: coarse-hash-partitioned map.

Ray Data's ``groupby(key).map_groups`` pays one Python invocation per
DISTINCT KEY — catastrophic when keys are fine-grained (content
hashes, pair keys, terms: millions of groups). Every wide operator in
this engine instead shuffles on a COARSE deterministic hash of the key
(default 64 partitions) and runs ONE vectorized function per
partition, which handles all contained key-groups with pandas/numpy
(measured: Ray's per-key Aggregate spent 273 s remote wall on the
sf0.1 pair-count reduction; the coarse plan does the identical
reduction in < 1 s of compute).

Used by: exact/path dedup, MinHash/Jaccard/SimHash pair reduction,
tf-idf document frequency + top-K, sliding windows, training_prep.

The partition column must be DETERMINISTIC across processes (crc32 /
md5 prefix / integer mod — never Python ``hash()``, which is seeded
per process and silently splits key-groups across partitions).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray.data

N_COARSE_PARTS = 64


def int_partition(values: np.ndarray, num_parts: int = N_COARSE_PARTS) -> np.ndarray:
    """Partition ids for an int64 key column (hash == value mod N —
    fine for already-hashed keys like shingle/pair/bucket hashes)."""
    return (values % num_parts).astype(np.int64)


def str_partition(values, num_parts: int = N_COARSE_PARTS) -> np.ndarray:
    """Partition ids for a string key column via crc32 (deterministic
    across processes, unlike Python hash()).

    Deliberately a Python loop: measured on 1M short keys, the C-level
    zlib.crc32 loop runs 0.18 s vs pandas.util.hash_array 1.6 s and
    polars .hash() 1.2 s — the 'vectorized' object-array hashes pay
    more per element than crc32's tight C call. Revisit only if keys
    become long (crc32 is O(len))."""
    return np.array(
        [zlib.crc32(v.encode()) % num_parts for v in values], dtype=np.int64
    )


def partitioned_map(
    ds: "ray.data.Dataset",
    add_part_fn,
    part_fn,
    part_col: str = "part",
) -> "ray.data.Dataset":
    """shuffle-on-coarse-key: ``add_part_fn`` (vectorized map_batches)
    appends ``part_col``; the groupby shuffles on it; ``part_fn`` runs
    once per partition over all contained key-groups."""
    return (
        ds.map_batches(add_part_fn, batch_format="pyarrow")
        .groupby(part_col)
        .map_groups(part_fn, batch_format="pyarrow")
    )
