"""Sketch-triad guarantees that the bit-exact oracles can't express:
Bloom's no-false-negatives, Count-Min's one-sided overestimate, and
the histogram quantile's containing-bin identity vs the exact
quantile — each checked against brute-force truth."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives(ray_session, tmp_path):
    # plant true duplicates across the parity split: every odd doc
    # whose text also appears on an even doc MUST be flagged
    texts = [f"unique text number {i}" for i in range(200)]
    for i in range(1, 200, 8):           # 25 odd docs duplicate an even doc's text
        texts[i] = texts[i - 1]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet",
    )
    from readur_ray.pipelines.dedup import bloom_gate

    res = bloom_gate(str(tmp_path)).to_pandas().set_index("doc_id")
    planted = list(range(1, 200, 8))
    assert (res.loc[planted, "maybe_dup"] == 1).all()
    # and the filter is not degenerate: most non-duplicates pass
    clean = res.drop(index=planted)
    assert clean["maybe_dup"].mean() < 0.5


def test_bloom_probe_positions_match_reference_double_hash():
    from readur_ray.pipelines.dedup import BLOOM_K, BLOOM_M
    import hashlib

    h = hashlib.md5(b"some doc text").hexdigest()
    h1, h2 = int(h[:15], 16), int(h[15:30], 16)
    expect = [(h1 + i * h2) % BLOOM_M for i in range(BLOOM_K)]
    # the vectorized kernel in bloom_gate computes the same positions
    pos = (
        np.int64(h1) + np.arange(BLOOM_K, dtype=np.int64) * np.int64(h2)
    ) % BLOOM_M
    assert pos.tolist() == expect


def test_cms_estimate_is_one_sided(ray_session):
    from readur_ray.pipelines.analytics import CMS_D, CMS_W, cms_registers
    import hashlib

    reg = cms_registers(SF_DIR).to_pandas()
    grid = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    grid[reg["row_d"], reg["pos"]] = reg["count"]

    truth = (
        pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id"])
        .to_pandas()["user_id"].value_counts()
    )
    assert int(grid.sum()) == CMS_D * int(truth.sum())  # mass conservation
    over = 0
    for user, n in truth.items():
        h = hashlib.md5(str(user).encode()).hexdigest()
        h1, h2 = int(h[:15], 16), int(h[15:30], 16)
        est = min(grid[d, (h1 + d * h2) % CMS_W] for d in range(CMS_D))
        assert est >= n  # NEVER an underestimate
        over += est - n
    # and the collision overestimate is small at this load factor
    assert over / int(truth.sum()) < 1.0


def test_hist_quantile_bin_contains_exact_quantile(ray_session):
    from readur_ray.pipelines.analytics import HIST_QS, hist_quantiles

    res = hist_quantiles(SF_DIR).to_pandas().set_index("event_type")
    ev = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    ev["cents"] = np.floor(ev["value"] * 100 + 0.5).astype(np.int64)
    for etype, grp in ev.groupby("event_type"):
        cents = np.sort(grp["cents"].to_numpy())
        n = len(cents)
        assert res.loc[etype, "n_events"] == n
        for q, name in HIST_QS:
            rank = -(-q * n // 100)          # ceil(q*n/100), pure ints
            exact = int(cents[rank - 1])     # lower-quantile convention
            qbin = int(res.loc[etype, f"{name}_bin"])
            upper = int(res.loc[etype, f"{name}_upper"])
            assert qbin == int(exact).bit_length()  # containing bin
            assert upper == (1 << qbin) - 1
            assert exact <= upper < 2 * max(exact, 1)  # ≤2x relative bound


def test_cms_registers_merge_by_addition(ray_session, tmp_path):
    # the mergeable-sketch contract: sketch(A ∪ B) == sketch(A) + sketch(B)
    from readur_ray.pipelines.analytics import CMS_D, CMS_W, cms_registers

    ev = pq.read_table(f"{SF_DIR}/events.parquet")
    half = ev.num_rows // 2
    for name, part in (("a", ev.slice(0, half)), ("b", ev.slice(half))):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(part, d / "events.parquet")

    def as_grid(df: pd.DataFrame) -> np.ndarray:
        g = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        g[df["row_d"], df["pos"]] = df["count"]
        return g

    whole = as_grid(cms_registers(SF_DIR).to_pandas())
    merged = as_grid(cms_registers(str(tmp_path / "a")).to_pandas()) + as_grid(
        cms_registers(str(tmp_path / "b")).to_pandas()
    )
    np.testing.assert_array_equal(whole, merged)
