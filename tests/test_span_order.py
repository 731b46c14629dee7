"""Span-order invariant (north_rule): span order is DATA (the offset
column), never block/storage order. Documents whose spans are stored
scrambled must extract identically to offset-sorted storage."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from readur_ray import synth
from readur_ray.config import ExtractionConfig
from readur_ray.pipelines.extract import build_extracted
from readur_ray.schema import DOCUMENTS


def _extract_table(ray_session, path: str) -> dict:
    import ray

    out = {}
    ds = build_extracted(path, ExtractionConfig())
    for b in ds.iter_batches(batch_format="pyarrow"):
        for row in b.to_pylist():
            spans = [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in row["spans"]
            ]
            out[row["doc_id"]] = (row["status"], spans, row["word_count"])
    return out


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    base = tmp_path_factory.mktemp("spanorder")
    table = synth.make_corpus(300, seed=123)
    sorted_dir, scrambled_dir = str(base / "sorted"), str(base / "scrambled")
    os.makedirs(sorted_dir)
    os.makedirs(scrambled_dir)
    pq.write_table(table, os.path.join(sorted_dir, "part-0.parquet"))

    rows = table.to_pylist()
    for r in rows:
        r["spans"] = list(reversed(r["spans"]))  # storage order scrambled
    cols = {name: [r[name] for r in rows] for name in DOCUMENTS.names}
    pq.write_table(
        pa.table(cols, schema=DOCUMENTS),
        os.path.join(scrambled_dir, "part-0.parquet"),
    )
    return sorted_dir, scrambled_dir


def test_scrambled_storage_order_extracts_identically(ray_session, corpora):
    sorted_dir, scrambled_dir = corpora
    a = _extract_table(ray_session, sorted_dir)
    b = _extract_table(ray_session, scrambled_dir)
    assert a.keys() == b.keys()
    mismatches = [k for k in a if a[k] != b[k]]
    assert not mismatches, f"order-dependent extraction for {mismatches[:5]}"
    # and outputs are offset-sorted
    for status, spans, _ in a.values():
        offs = [s[3] for s in spans]
        assert offs == sorted(offs)
