"""Skew/boundary stress for the round-4 wave 21/23 operators: a hot
group and a viral day must not change exactness — checked against
driver-side naive references on purpose-built corpora (the same
discipline as test_skew.py for the dedup family)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _naive_top3(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["price_cents"] = np.floor(df.o_totalprice * 100 + 0.5).astype(np.int64)
    df = df.sort_values(
        ["o_custkey", "price_cents", "o_orderkey"],
        ascending=[True, False, True],
        ignore_index=True,
    )
    df["rnk"] = df.groupby("o_custkey").cumcount() + 1
    return df[df.rnk <= 3][
        ["o_custkey", "o_orderkey", "price_cents", "rnk"]
    ].reset_index(drop=True)


def test_grouped_topk_hot_customer_and_ties(ray_session, tmp_path):
    """One customer holds 5000 orders (1000 of them tied at the max
    price); the mergeable K-prune must still produce the exact global
    top-3 with the (price DESC, orderkey ASC) tie-break."""
    from readur_ray.pipelines.analytics import grouped_topk

    rng = np.random.default_rng(7)
    hot = pd.DataFrame(
        {
            "o_orderkey": np.arange(5000, dtype=np.int64),
            "o_custkey": np.zeros(5000, dtype=np.int64),
            "o_totalprice": np.concatenate(
                (np.full(1000, 999.99), rng.uniform(1, 900, 4000).round(2))
            ),
        }
    )
    cold = pd.DataFrame(
        {
            "o_orderkey": np.arange(5000, 5300, dtype=np.int64),
            "o_custkey": np.repeat(np.arange(1, 101, dtype=np.int64), 3),
            "o_totalprice": rng.uniform(1, 900, 300).round(2),
        }
    )
    df = pd.concat([hot, cold], ignore_index=True)
    df.to_parquet(tmp_path / "orders.parquet", index=False)

    got = (
        grouped_topk(str(tmp_path))
        .to_pandas()
        .sort_values(["o_custkey", "rnk"], ignore_index=True)
    )
    want = _naive_top3(df).sort_values(
        ["o_custkey", "rnk"], ignore_index=True
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the hot group still contributes exactly 3 rows, ties broken to
    # the smallest orderkeys among the 1000 tied max-price orders
    hot3 = got[got.o_custkey == 0]
    assert list(hot3.o_orderkey) == [0, 1, 2]


def test_sliding_distinct_viral_day_and_gap_boundary(ray_session, tmp_path):
    """A viral day (1000 distinct users at once) plus users whose
    activity gap is exactly the window width (the interval-adjacency
    edge) — the delta-prefix count must equal the naive per-day
    window distinct."""
    from readur_ray.pipelines.sessions import SLIDE_W, sliding_distinct

    day_us = 86_400_000_000
    rows = []
    # viral day: users 0..999 all active on day 40
    for u in range(1000):
        rows.append((u, 40))
    # boundary users: active day 10 and day 10 + SLIDE_W (adjacent
    # coverage intervals) and day 10 + 2*SLIDE_W + 1 (a real gap)
    for u in (2000, 2001):
        rows.extend([(u, 10), (u, 10 + SLIDE_W), (u, 10 + 2 * SLIDE_W + 1)])
    df = pd.DataFrame(rows, columns=["user_id", "day"])
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "ts": pa.array(
                (df.day * day_us).astype("int64"), pa.timestamp("us")
            ),
            "user_id": pa.array(df.user_id.astype("int64"), pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = (
        sliding_distinct(str(tmp_path))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    # naive: for each present day, distinct users active in [d-6, d]
    present = sorted(df.day.unique())
    want = []
    for d in present:
        w = df[(df.day >= d - (SLIDE_W - 1)) & (df.day <= d)]
        want.append((d, w.user_id.nunique()))
    want_df = pd.DataFrame(want, columns=["day", "n_users_7d"])
    pd.testing.assert_frame_equal(got, want_df, check_dtype=False)
    # the viral day contributes exactly once per user
    assert int(got[got.day == 40].n_users_7d.iloc[0]) == 1000
