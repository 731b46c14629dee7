"""Structural invariants for the round-4 wave 6-9 operators, beyond
the oracle parity already pinned in test_queries_oracle: properties
that must hold for ANY input, checked on sf0.001."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def test_zorder_interleave_roundtrip(ray_session):
    # de-interleaving the z-value must recover both dimensions exactly
    from readur_ray.pipelines.analytics import ZORDER_BITS, zorder_keys
    import pyarrow.parquet as pq

    df = zorder_keys(SF_DIR).to_pandas()
    ev = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).to_pandas()
    m = df.merge(ev, on="event_id")
    z = m["zval"].to_numpy()
    x = np.zeros(len(z), dtype=np.int64)
    y = np.zeros(len(z), dtype=np.int64)
    for i in range(ZORDER_BITS):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    assert (x == m["user_id"].to_numpy() % (1 << ZORDER_BITS)).all()
    hours = (
        m["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        // 3_600_000_000
    )
    assert (y == hours % (1 << ZORDER_BITS)).all()
    assert (
        df["bucket"].to_numpy() == df["zval"].to_numpy() >> (2 * ZORDER_BITS - 6)
    ).all()


def test_scd2_versions_contiguous_and_non_overlapping(ray_session):
    from readur_ray.pipelines.sessions import SCD2_SENTINEL_US, scd2_merge

    df = scd2_merge(SF_DIR).to_pandas().sort_values(["user_id", "version"])
    for uid, g in df.groupby("user_id"):
        assert list(g["version"]) == list(range(1, len(g) + 1))
        # consecutive versions tile the timeline: valid_to == next
        # valid_from, last row open at the sentinel and flagged current
        vf = g["valid_from"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vt = g["valid_to"].to_numpy().astype("datetime64[us]").astype(np.int64)
        assert (vt[:-1] == vf[1:]).all()
        assert vt[-1] == SCD2_SENTINEL_US
        assert g["is_current"].to_list() == [0] * (len(g) - 1) + [1]
        # CDC dedup: consecutive versions always change the value
        c = g["cents"].to_numpy()
        assert (c[1:] != c[:-1]).all()


def test_resample_grid_dense_per_user(ray_session):
    from readur_ray.pipelines.sessions import US_PER_HOUR, resample_ffill

    df = resample_ffill(SF_DIR).to_pandas()
    h = df["hour"].to_numpy().astype("datetime64[us]").astype(np.int64)
    assert (h % US_PER_HOUR == 0).all()
    df = df.assign(h=h // US_PER_HOUR).sort_values(["user_id", "h"])
    for uid, g in df.groupby("user_id"):
        hh = g["h"].to_numpy()
        assert (np.diff(hh) == 1).all(), f"gap in user {uid} grid"


def test_pagerank_conservation_and_positivity(ray_session):
    # unnormalized PageRank: total mass stays near N·SCALE (truncation
    # only loses mass, bounded by (edges + nodes) per iteration), and
    # every rank is at least the teleport floor
    from readur_ray.pipelines.graph import PR_BASE, PR_SCALE, pagerank

    df = pagerank(SF_DIR).to_pandas()
    n = len(df)
    assert (df["pagerank"] >= PR_BASE).all()
    total = df["pagerank"].sum()
    assert 0.98 * n * PR_SCALE < total <= n * PR_SCALE


def test_winnow_guarantee_shared_run_shares_fingerprint(ray_session):
    # winnowing guarantee: two docs sharing a run of >= k + w - 1
    # words must share at least one fingerprint hash
    import pyarrow as pa

    from readur_ray.pipelines.curation import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    df = winnow_fingerprints(SF_DIR).to_pandas()
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    from readur_ray.functions.textstats import words_of

    words = {r.doc_id: words_of(r.text or "") for r in docs.itertuples()}
    by_doc = {
        doc: set(g["gh"]) for doc, g in df.groupby("doc_id")
    }
    run = WINNOW_K + WINNOW_W - 1
    # find a pair of docs sharing a word run of length >= run
    grams: dict[tuple, int] = {}
    checked = 0
    for doc, ws in words.items():
        for i in range(len(ws) - run + 1):
            key = tuple(ws[i : i + run])
            other = grams.setdefault(key, doc)
            if other != doc:
                assert by_doc.get(doc, set()) & by_doc.get(other, set()), (
                    f"docs {doc}/{other} share a {run}-word run but no fingerprint"
                )
                checked += 1
    # the synthetic corpus contains repeated passages, so the property
    # must actually have been exercised
    assert checked > 0


def test_weighted_sample_prefers_heavy_docs(ray_session):
    # with priority = hash // weight, the sampled docs' mean weight
    # must exceed the corpus mean (sanity of the weighting direction)
    import pyarrow.parquet as pq

    from readur_ray.pipelines.curation import weighted_sample

    got = weighted_sample(SF_DIR).to_pandas()
    all_w = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["n_chars"]
    ).to_pandas()["n_chars"]
    assert got["weight"].mean() > all_w[all_w > 0].mean()


def test_lp_exchange_parity(ray_session, monkeypatch):
    """The width-1 LP leg and the full exchange plan are the same
    algorithm: force the exchange path (LP_LOCAL_MAX=0, cold cache)
    and pin its assignment row-for-row against the width-1 result."""
    from readur_ray.pipelines import similarity as S

    local = (
        S._lp_build(SF_DIR).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    monkeypatch.setattr(S, "LP_LOCAL_MAX", 0)
    exchange = (
        S._lp_build(SF_DIR).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(local, exchange, check_exact=True)


def test_modularity_exchange_parity(ray_session, monkeypatch):
    """Same contract for the modularity scorer: the one-task grid and
    the five-stage exchange plan agree bit-for-bit."""
    from readur_ray.pipelines import similarity as S

    local = S.community_modularity(SF_DIR).to_pandas()
    monkeypatch.setattr(S, "LP_LOCAL_MAX", 0)
    exchange = S.community_modularity(SF_DIR).to_pandas()
    import pandas.testing as pdt

    pdt.assert_frame_equal(local, exchange, check_exact=True)
