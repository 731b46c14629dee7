"""Stress tests for the survival pair (km_risk_table,
harrell_c_index) and the wave-93/94 grid machinery on an adversarial
synthetic corpus: many distinct durations and risk values, so the
2-axis decomposition exercises ALL THREE pair classes (cross-bucket
grid term, same-t-bucket local counts, same-r-cell refinement) rather
than collapsing into one bucket the way the driver tables do. Pinned
against O(n²) pandas brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from readur_ray.pipelines.sessions import (
    CHURN_HORIZON_DAYS,
    DAY_US,
    harrell_c_index,
    km_risk_table,
)


@pytest.fixture(scope="module")
def synth_events(tmp_path_factory):
    """~400 users, spans spread over ~300 distinct durations, event
    counts spread over ~200 distinct risks — forces multi-bucket
    grids on both axes."""
    rng = np.random.default_rng(1234)
    rows_u, rows_t = [], []
    base = 1_700_000_000_000_000  # us epoch, positive
    for uid in range(400):
        first = int(rng.integers(0, 50)) * DAY_US + base
        span_days = int(rng.integers(0, 300))
        n_ev = int(rng.integers(1, 200))
        ts = [first, first + span_days * DAY_US]
        ts += list(
            rng.integers(first, first + span_days * DAY_US + 1, max(n_ev - 2, 0))
        )
        for t in ts[:n_ev] if n_ev >= 2 else ts[:1]:
            rows_u.append(uid)
            rows_t.append(int(t))
    d = tmp_path_factory.mktemp("survival")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows_u)), pa.int64()),
                "ts": pa.array(rows_t, pa.timestamp("us")),
                "user_id": pa.array(rows_u, pa.int64()),
                "event_type": pa.array(["view"] * len(rows_u)),
                "value": pa.array([0.0] * len(rows_u)),
                "props": pa.array(["{}"] * len(rows_u)),
            }
        ),
        d / "events.parquet",
    )
    return str(d)


def _per_user(sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet")
    df = pd.DataFrame(
        {
            "user": t.column("user_id").to_numpy(),
            "day": t.column("ts").cast(pa.int64()).to_numpy() // DAY_US,
        }
    )
    g = df.groupby("user")["day"].agg(["min", "max", "count"]).reset_index()
    gmax = int(df["day"].max())
    g["t"] = g["max"] - g["min"]
    g["e"] = (g["max"] < gmax - CHURN_HORIZON_DAYS).astype(int)
    g["r"] = g["count"]
    return g


def test_km_risk_table_brute(synth_events, ray_session):
    g = _per_user(synth_events)
    out = km_risk_table(synth_events)
    assert int(out["n_risk"].iloc[0]) == len(g)
    for _, row in out.iterrows():
        t = int(row["t_days"])
        assert int(row["n_risk"]) == int((g["t"] >= t).sum())
        assert int(row["d_events"]) == int(((g["t"] == t) & (g["e"] == 1)).sum())
        assert int(row["c_censored"]) == int(
            ((g["t"] == t) & (g["e"] == 0)).sum()
        )
    assert int(out["d_events"].sum() + out["c_censored"].sum()) == len(g)


def test_harrell_c_index_brute(synth_events, ray_session):
    g = _per_user(synth_events)
    t = g["t"].to_numpy()
    e = g["e"].to_numpy()
    r = g["r"].to_numpy()
    lt = t[:, None] < t[None, :]
    ea = (e[:, None] == 1) & lt
    comparable = int(ea.sum())
    concordant = int((ea & (r[:, None] > r[None, :])).sum())
    tied = int((ea & (r[:, None] == r[None, :])).sum())
    assert comparable > 0 and concordant > 0  # non-degenerate fixture
    out = harrell_c_index(synth_events)
    assert int(out["comparable"].iloc[0]) == comparable
    assert int(out["concordant"].iloc[0]) == concordant
    assert int(out["tied_risk"].iloc[0]) == tied


def test_harrell_exchange_path_matches_local(synth_events, ray_session):
    """The width-1 escape must agree bit-for-bit with the grid
    exchange plan on the adversarial multi-bucket fixture."""
    import readur_ray.pipelines.sessions as se

    local = harrell_c_index(synth_events)
    se.CIDX_LOCAL_MAX = 0
    try:
        grid = harrell_c_index(synth_events)
    finally:
        se.CIDX_LOCAL_MAX = 2_000_000
    assert local.equals(grid)
