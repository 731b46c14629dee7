"""Content-defined chunking: bit-parity with a byte-at-a-time naive
reference (the rows-only entry's correctness pin — the data-dependent
rolling hash has no SQL oracle) plus the edit-stability property that
justifies CDC over fixed-size chunking."""

from __future__ import annotations

import hashlib
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from readur_ray.pipelines.curation import (
    CDC_MASK_BITS,
    CDC_WINDOW,
    _cdc_boundaries,
    _gear_table,
    cdc_chunks,
)

SF_DIR = "/root/testdata/sf0.001"


def _naive_boundaries(data: bytes) -> list[int]:
    """Byte-at-a-time reference: h_i = Σ_{k=0..63} gear[b_{i-k}] << k
    mod 2^64, boundary when the low CDC_MASK_BITS bits are zero."""
    gear = [int(x) & 0xFFFFFFFFFFFFFFFF for x in _gear_table()]
    mask = (1 << CDC_MASK_BITS) - 1
    ends = []
    for i in range(len(data)):
        h = 0
        for k in range(min(CDC_WINDOW, i + 1)):
            h = (h + (gear[data[i - k]] << k)) & 0xFFFFFFFFFFFFFFFF
        if h & mask == 0:
            ends.append(i + 1)
    if not ends or ends[-1] != len(data):
        ends.append(len(data))
    return ends


def test_cdc_boundaries_match_naive_reference():
    texts = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["text"]
    ).column("text").to_pylist()[:20]
    checked = 0
    for t in texts:
        data = (t or "").encode("utf-8")[:2000]
        got = _cdc_boundaries(data).tolist()
        want = _naive_boundaries(data)
        assert got == want
        checked += len(want)
    assert checked > 20  # real boundaries were exercised


def test_cdc_edit_stability():
    # inserting bytes must only change chunks within CDC_WINDOW of the
    # edit: the boundary set far after the edit is shifted-identical
    rng = np.random.default_rng(7)
    data = bytes(rng.integers(0, 256, 4096, dtype=np.uint8))
    edited = data[:1000] + b"INSERTED!" + data[1000:]
    b0 = set(_cdc_boundaries(data).tolist())
    b1 = set(_cdc_boundaries(edited).tolist())
    shift = len(edited) - len(data)
    far0 = {e for e in b0 if e > 1000 + CDC_WINDOW}
    far1 = {e - shift for e in b1 if e - shift > 1000 + CDC_WINDOW}
    assert far0 == far1
    # and boundaries before the edit are untouched
    pre0 = {e for e in b0 if e <= 1000}
    pre1 = {e for e in b1 if e <= 1000}
    assert pre0 == pre1


def test_cdc_chunks_reassemble(ray_session):
    # chunk lengths per doc must sum to the doc's utf-8 byte length,
    # chunk_no must be 1..n, and equal chunks must hash equal
    df = cdc_chunks(SF_DIR).to_pandas()
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    blen = {
        r.doc_id: len((r.text or "").encode("utf-8")) for r in docs.itertuples()
    }
    for doc, g in df.groupby("doc_id"):
        g = g.sort_values("chunk_no")
        assert list(g["chunk_no"]) == list(range(1, len(g) + 1))
        assert int(g["length"].sum()) == blen[doc]
    # shared passages in the synthetic corpus must produce shared chunks
    dup_hashes = df.groupby("chunk_hash")["doc_id"].nunique()
    assert (dup_hashes > 1).any()
