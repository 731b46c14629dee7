"""Property-based checks (hypothesis) for the vectorized kernels whose
correctness is subtle: batch-vectorized simhash vs the scalar
definition, coarse-partition pair emission vs a naive per-bucket
reference, signature rows vs per-doc recomputation, and the halo
window count vs a brute-force window."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from readur_ray.pipelines import dedup

TEXT = st.text(
    alphabet=st.sampled_from(list("ab c1.\n")), min_size=0, max_size=80
)


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_simhash_batch_equals_scalar(texts):
    batch = dedup._simhash_batch(texts)
    scalar = [format(dedup._simhash64(t), "016x") for t in texts]
    assert batch == scalar


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_signature_rows_equal_per_doc_recompute(texts):
    from readur_ray.functions.textstats import shingles_of

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    rows = dedup._signature_rows(batch).to_pandas()
    for doc_id, text in enumerate(texts):
        sh = shingles_of(text, 3)
        got = rows[rows.doc_id == doc_id].sort_values("band")["minhash"].to_numpy()
        if not sh:
            assert len(got) == 0
            continue
        base = np.array([dedup._shingle_base(s) for s in sh], dtype=np.uint64)
        exp = (
            (base[:, None] * dedup._A_MIX + dedup._C_MIX) >> np.uint64(4)
        ).min(axis=0).astype(np.int64)
        assert np.array_equal(got, exp)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 200)),  # (bucket key, doc)
        min_size=0, max_size=40,
    ),
    st.integers(2, 6),
)
def test_bucket_pairs_match_naive(rows, max_bucket):
    # dedupe (key, doc) rows — a doc appears once per bucket
    rows = sorted(set(rows))
    part = pa.table(
        {
            "key": pa.array([k for k, _ in rows], pa.int64()),
            "doc_id": pa.array([d for _, d in rows], pa.int64()),
        }
    )
    out = dedup._bucket_pairs_fn(["key"], max_bucket)(part)
    got = sorted(out.column("pair_key").to_pylist())

    naive = []
    by_key = {}
    for k, d in rows:
        by_key.setdefault(k, []).append(d)
    for k, ds in by_key.items():
        ds = sorted(ds)
        if 2 <= len(ds) <= max_bucket:
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    naive.append((ds[i] << 32) | ds[j])
    assert got == sorted(naive)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=60),
    st.integers(1, 500),
)
def test_window_count_searchsorted_vs_naive(ts_list, win):
    ts = np.sort(np.array(ts_list, dtype=np.int64))
    got = (
        np.searchsorted(ts, ts, side="right")
        - np.searchsorted(ts, ts - win, side="left")
    )
    naive = np.array(
        [((ts >= t - win) & (ts <= t)).sum() for t in ts], dtype=np.int64
    )
    assert np.array_equal(got, naive)
