"""Hypothesis fuzzing for the round-4 wave 6-11 kernels: each checked
against an independently-written reference on arbitrary inputs (no
Ray needed — these pin the pure kernels the distributed plans call)."""

from __future__ import annotations

import sys

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_cdc_boundaries_fuzz_vs_naive(data):
    from readur_ray.pipelines.curation import (
        CDC_MASK_BITS,
        CDC_WINDOW,
        _cdc_boundaries,
        _gear_table,
    )

    gear = [int(x) & 0xFFFFFFFFFFFFFFFF for x in _gear_table()]
    mask = (1 << CDC_MASK_BITS) - 1
    want = []
    for i in range(len(data)):
        h = 0
        for k in range(min(CDC_WINDOW, i + 1)):
            h = (h + (gear[data[i - k]] << k)) & 0xFFFFFFFFFFFFFFFF
        if h & mask == 0:
            want.append(i + 1)
    if data and (not want or want[-1] != len(data)):
        want.append(len(data))
    got = _cdc_boundaries(data).tolist()
    assert got == want


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=5),
)
def test_bpe_learn_fuzz_invariants(word_counts, n_merges):
    from readur_ray.pipelines.curation import BPE_EOW, _bpe_learn

    merges = _bpe_learn(word_counts, n_merges)
    assert len(merges) <= n_merges
    total = sum(c for _, c in word_counts)
    seen_counts = [cnt for _, _, cnt in merges]
    for left, right, cnt in merges:
        # a pair can occur at most once per word position: bounded by
        # total word mass times the longest word's pair slots
        assert cnt >= 1
        assert cnt <= total * (max(len(w) for w, _ in word_counts) + 1)
        assert BPE_EOW not in left  # EOW can only ever be a RIGHT side


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=65535), min_size=1, max_size=64),
    st.lists(st.integers(min_value=0, max_value=65535), min_size=1, max_size=64),
)
def test_zorder_interleave_fuzz_roundtrip_and_order(xs, ys):
    from readur_ray.pipelines.analytics import ZORDER_BITS

    n = min(len(xs), len(ys))
    x = np.array(xs[:n], dtype=np.int64)
    y = np.array(ys[:n], dtype=np.int64)
    z = np.zeros(n, dtype=np.int64)
    for i in range(ZORDER_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    # roundtrip
    rx = np.zeros(n, dtype=np.int64)
    ry = np.zeros(n, dtype=np.int64)
    for i in range(ZORDER_BITS):
        rx |= ((z >> (2 * i)) & 1) << i
        ry |= ((z >> (2 * i + 1)) & 1) << i
    assert (rx == x).all() and (ry == y).all()
    # locality: equal points get equal keys; z is injective on (x, y)
    seen = {}
    for xi, yi, zi in zip(x, y, z):
        key = (int(xi), int(yi))
        assert seen.setdefault(key, int(zi)) == int(zi)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),    # user
            st.integers(min_value=0, max_value=100),  # hour offset
            st.integers(min_value=-5, max_value=5),   # cents value
        ),
        min_size=1,
        max_size=40,
    )
)
def test_scd2_kernel_fuzz_vs_pandas(rows):
    """The REAL scd2 partition kernel (_scd2_versions) against an
    independent pandas lag/lead reference over arbitrary event streams
    (ties broken by event_id)."""
    import pandas as pd
    import pyarrow as pa

    from readur_ray.pipelines.sessions import SCD2_SENTINEL_US, _scd2_versions

    ev = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.to_datetime(
                [3600_000_000 * h for _, h, _ in rows], unit="us"
            ),
            "user_id": np.array([u for u, _, _ in rows], dtype=np.int64),
            "cents": np.array([c for _, _, c in rows], dtype=np.int64),
        }
    )
    # reference: lag/lead windows, written independently of the kernel
    ref = ev.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    keep = (ref["user_id"].ne(ref["user_id"].shift())) | (
        ref["cents"].ne(ref["cents"].shift())
    )
    chg = ref[keep].reset_index(drop=True)
    exp_rows = []
    for uid, g in chg.groupby("user_id"):
        g = g.reset_index(drop=True)
        for i in range(len(g)):
            nxt = (
                g["ts"].iloc[i + 1].value // 1000
                if i + 1 < len(g)
                else SCD2_SENTINEL_US
            )
            exp_rows.append(
                (
                    int(uid),
                    i + 1,
                    int(g["cents"].iloc[i]),
                    g["ts"].iloc[i].value // 1000,
                    nxt,
                    1 if i + 1 == len(g) else 0,
                )
            )

    part = pa.table(
        {
            "event_id": pa.array(ev["event_id"].to_numpy(), pa.int64()),
            "ts": pa.array(
                ev["ts"].to_numpy().astype("datetime64[us]"), pa.timestamp("us")
            ),
            "user_id": pa.array(ev["user_id"].to_numpy(), pa.int64()),
            "cents": pa.array(ev["cents"].to_numpy(), pa.int64()),
            "part": pa.array(np.zeros(len(ev), np.int64), pa.int64()),
        }
    )
    out = _scd2_versions(part).to_pandas()
    got_rows = list(
        zip(
            out["user_id"].astype(int),
            out["version"].astype(int),
            out["cents"].astype(int),
            out["valid_from"].to_numpy().astype("datetime64[us]").astype(np.int64),
            out["valid_to"].to_numpy().astype("datetime64[us]").astype(np.int64),
            out["is_current"].astype(int),
        )
    )
    assert sorted(got_rows) == sorted(exp_rows)
