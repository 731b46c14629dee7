"""Unit tests for the training-data operator suite (textstats, dedup
kernels, similarity, multimodal codec, search windows)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from readur_ray.functions import textstats
from readur_ray.pipelines import dedup as D
from readur_ray.pipelines import multimodal as M


def test_predict_lang_priority_and_unknown():
    hits = {
        "hits_en": pa.array([3, 0, 2, 0]),
        "hits_de": pa.array([3, 0, 5, 0]),
        "hits_fr": pa.array([1, 0, 5, 0]),
        "hits_es": pa.array([0, 0, 1, 0]),
    }
    out = textstats.predict_lang(hits).to_pylist()
    # tie en/de → en (priority); all-zero → unknown; de/fr tie → de
    assert out == ["en", "unknown", "de", "unknown"]


def test_quality_score_components():
    texts = pa.array(
        [
            "the cat sat on the mat with a hat and a bat to see it go by now ok",
            "!!! ??? ...",  # pure punctuation
        ]
    )
    out = textstats.quality_scores(texts)
    scores = out["quality_score"].to_pylist()
    assert scores[0] >= 3
    assert scores[1] <= 2  # fails length + stopword gates


def test_shingles_edges():
    assert textstats.shingles_of("", 3) == []
    assert textstats.shingles_of("one", 3) == ["one"]
    assert textstats.shingles_of("one two", 3) == ["one two"]
    assert textstats.shingles_of("a b c d", 3) == ["a b c", "b c d"]
    # dedup preserves set semantics
    assert textstats.shingles_of("x y x y x y x y", 2) == ["x y", "y x"]


def test_md5_int_ranges():
    v60 = textstats.md5_int60("anything")
    v64 = textstats.md5_int64("anything")
    assert 0 <= v60 < 2**60
    assert 0 <= v64 < 2**64


def test_simhash_batch_matches_per_doc():
    texts = ["alpha bravo charlie", "alpha alpha zulu", "", "delta"]
    batch = D._simhash_batch(texts)
    per_doc = [format(D._simhash64(t), "016x") for t in texts]
    assert batch == per_doc
    assert batch[2] == "0" * 16


def _unpack(out: pa.Table) -> list[tuple[int, int]]:
    keys = out.column("pair_key").to_pylist()
    return sorted((k >> 32, k & 0xFFFFFFFF) for k in keys)


def test_bucket_pairs_vectorized():
    # bucket A: docs 3,1 → pair (1,3); bucket B: single; bucket C: too big
    big = list(range(100, 100 + D.MAX_BUCKET + 1))
    part = pa.table(
        {
            "key": [7, 7, 8] + [9] * len(big),
            "doc_id": [3, 1, 5] + big,
        }
    )
    out = D._bucket_pairs_fn(["key"], D.MAX_BUCKET)(part)
    assert _unpack(out) == [(1, 3)]


def test_bucket_pairs_multiple_size_classes():
    part = pa.table(
        {
            "key": [1, 1, 2, 2, 2, 3, 3],
            "doc_id": [10, 20, 5, 6, 7, 9, 8],
        }
    )
    out = D._bucket_pairs_fn(["key"], 128)(part)
    assert _unpack(out) == [(5, 6), (5, 7), (6, 7), (8, 9), (10, 20)]


def test_payload_codec_deterministic_and_resize():
    codec = M.PayloadCodec()
    batch = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "payload": pa.array([b"hello world", b""], pa.binary())}
    )
    a = codec(batch)
    b = codec(batch)
    assert a.equals(b)
    w = a.column("width").to_pylist()
    rw = a.column("resized_w").to_pylist()
    rh = a.column("resized_h").to_pylist()
    h = a.column("height").to_pylist()
    for wi, hi, rwi, rhi in zip(w, h, rw, rh):
        assert 256 <= wi < 2048 and 256 <= hi < 2048
        assert max(rwi, rhi) <= max(512, min(wi, hi))
        if max(wi, hi) > 512:
            assert max(rwi, rhi) == 512


def test_snippet_window_math():
    from readur_ray.pipelines.search import SEARCH_TERM, SNIPPET_WINDOW

    text = "x" * 100 + SEARCH_TERM + "y" * 100
    pos = text.find(SEARCH_TERM)
    start = max(0, pos - SNIPPET_WINDOW // 2)
    snippet = text[start : start + SNIPPET_WINDOW + len(SEARCH_TERM)]
    assert SEARCH_TERM in snippet
    assert len(snippet) == SNIPPET_WINDOW + len(SEARCH_TERM)


def test_lance_adapter_fallback_and_guard(tmp_path):
    from readur_ray.sources.tables import is_lance_dataset, lance_available, read_table

    assert not is_lance_dataset(str(tmp_path / "x.parquet"))
    assert not is_lance_dataset(["a.parquet", "b.parquet"])
    assert is_lance_dataset("/data/docs.lance")
    if not lance_available():
        import pytest

        with pytest.raises(NotImplementedError):
            read_table("/data/docs.lance")


def test_components_multilevel_contraction_identical(ray_session):
    """Forcing extra bridge-graph contraction rounds (cap=1) must not
    change the result — the recursive contraction is exact."""
    from readur_ray.pipelines import dedup

    sf = "/root/testdata/sf0.001"
    base = sorted(
        (r["doc_id"], r["component_id"])
        for r in dedup.neardup_components(sf).take_all()
    )
    multi = sorted(
        (r["doc_id"], r["component_id"])
        for r in dedup.neardup_components(sf, bridge_driver_cap=1).take_all()
    )
    assert base == multi and len(base) == 500
