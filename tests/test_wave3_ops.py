"""Third-wave operator guarantees the bit-exact oracles can't express:
bottom-k's merge property and uniformity, the watermark's equivalence
to a naive sequential scan on adversarial data, ROLLUP level
consistency, and the audio featurizer's windowed-reduction identity —
each against brute-force truth on randomized inputs.
"""

from __future__ import annotations

import hashlib
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


# --- bottomk_sample -------------------------------------------------------

def test_bottomk_matches_naive_and_is_layout_independent(ray_session, tmp_path):
    from readur_ray.pipelines.curation import BOTTOMK, bottomk_sample

    rng = np.random.default_rng(11)
    ids = rng.permutation(5000).astype(np.int64)  # scrambled layout
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array([f"s{i % 7}" for i in ids], pa.string()),
            "text": pa.array(["x"] * len(ids), pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "n_chars": pa.array([1] * len(ids), pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    got = bottomk_sample(str(tmp_path)).to_pandas()
    naive = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), int(i)) for i in ids
    )[:BOTTOMK]
    assert len(got) == BOTTOMK
    assert sorted(zip(got["priority"], got["doc_id"])) == naive


def test_bottomk_merge_property():
    # bottom-k of a union == bottom-k of the parts' bottom-ks — the
    # property that makes the sample refreshable across runs/shards
    k = 50
    rng = np.random.default_rng(7)
    pris = [hashlib.md5(str(i).encode()).hexdigest() for i in range(2000)]
    parts = np.array_split(rng.permutation(pris), 13)
    merged = sorted(p for part in parts for p in sorted(part)[:k])[:k]
    assert merged == sorted(pris)[:k]


# --- status_rollup --------------------------------------------------------

def test_rollup_levels_are_consistent(ray_session):
    from readur_ray.pipelines.analytics import ROLLUP_ALL, status_rollup

    df = status_rollup(SF_DIR).to_pandas()
    leaf = df[df["lvl"] == 0]
    per_type = df[df["lvl"] == 1].set_index("event_type")
    grand = df[df["lvl"] == 3]
    # grand total row: sentinel keys, sums of the leaf level
    assert len(grand) == 1
    assert grand.iloc[0]["event_type"] == ROLLUP_ALL
    assert grand.iloc[0]["n_events"] == leaf["n_events"].sum()
    assert grand.iloc[0]["total_cents"] == leaf["total_cents"].sum()
    # each per-type subtotal == sum of its leaf rows
    by_type = leaf.groupby("event_type")[["n_events", "total_cents"]].sum()
    for et, row in by_type.iterrows():
        assert per_type.loc[et, "n_events"] == row["n_events"]
        assert per_type.loc[et, "total_cents"] == row["total_cents"]
    # no other levels exist (ROLLUP, not CUBE: lvl 2 impossible)
    assert set(df["lvl"].unique()) == {0, 1, 3}


# --- late_data_watermark --------------------------------------------------

def _naive_watermark(ids: np.ndarray, ts: np.ndarray, delay_us: int):
    order = np.argsort(ids, kind="stable")
    late = {}
    wm = None
    for i in order:
        late[int(ids[i])] = int(wm is not None and ts[i] < wm - delay_us)
        wm = ts[i] if wm is None else max(wm, ts[i])
    return late


def test_watermark_matches_naive_on_adversarial_stream(ray_session, tmp_path):
    from readur_ray.pipelines.sessions import (
        WM_DELAY_SECONDS,
        late_data_watermark,
    )

    rng = np.random.default_rng(3)
    n = 4000
    ids = rng.permutation(n).astype(np.int64)  # arrival != storage order
    base = 1_700_000_000_000_000
    # mostly-forward stream with heavy jitter and occasional big
    # backward jumps — exactly the data a watermark exists for
    steps = rng.integers(-900, 1200, n) * 1_000_000
    ts_by_arrival = base + np.cumsum(steps)
    ts = np.empty(n, dtype=np.int64)
    ts[np.argsort(ids, kind="stable")] = ts_by_arrival
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(np.zeros(n, np.int64), pa.int64()),
                "event_type": pa.array(["e"] * n, pa.string()),
                "value": pa.array(np.zeros(n), pa.float64()),
                "props": pa.array([""] * n, pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )

    got = (
        late_data_watermark(str(tmp_path))
        .to_pandas()
        .set_index("event_id")["late"]
        .to_dict()
    )
    expect = _naive_watermark(ids, ts, WM_DELAY_SECONDS * 1_000_000)
    assert len(got) == n
    assert got == expect
    assert sum(expect.values()) > 0  # the jitter really produced late events


def test_watermark_first_event_never_late(ray_session, tmp_path):
    # a single event (and the globally-first event of any stream) has
    # no prior watermark to violate
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([42], pa.int64()),
                "ts": pa.array([123456789], pa.timestamp("us")),
                "user_id": pa.array([0], pa.int64()),
                "event_type": pa.array(["e"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array([""], pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )
    from readur_ray.pipelines.sessions import late_data_watermark

    df = late_data_watermark(str(tmp_path)).to_pandas()
    assert df["late"].tolist() == [0]


# --- audio_features -------------------------------------------------------

def test_audio_featurizer_windowed_reduction_identity():
    from readur_ray.pipelines.multimodal import (
        AUDIO_ENERGY_MOD,
        AUDIO_WINDOW,
        AudioFeaturizer,
    )

    feat = AudioFeaturizer()
    batch = pa.table(
        {
            "doc_id": pa.array([9, 10], pa.int64()),
            "audio_ref": pa.array(["audio://9", "audio://10"], pa.string()),
        }
    )
    out = feat(batch).to_pandas().set_index("doc_id")
    for doc_id in (9, 10):
        ref = f"audio://{doc_id}"
        n_samples = 8000 + int(
            hashlib.md5(ref.encode()).hexdigest()[:8], 16
        ) % 160000
        n_windows = -(-n_samples // AUDIO_WINDOW)
        energies = [
            int(hashlib.md5(f"{ref}:{w}".encode()).hexdigest()[:8], 16)
            % AUDIO_ENERGY_MOD
            for w in range(n_windows)
        ]
        row = out.loc[doc_id]
        assert row["n_samples"] == n_samples
        assert row["n_windows"] == n_windows
        assert row["total_energy"] == sum(energies)
        assert row["peak_energy"] == max(energies)


def test_audio_featurizer_real_path_fails_fast():
    import pytest

    from readur_ray.pipelines.multimodal import AudioFeaturizer

    # the real-codec path is opt-in and must fail fast when the wheel
    # is absent in this container, never silently fall back to the fake
    with pytest.raises(ImportError):
        AudioFeaturizer(use_real=True)


# --- percentile_rank ------------------------------------------------------

def test_percentile_rank_ties_never_straddle_buckets(ray_session, tmp_path):
    # adversarial: massive tie groups sitting exactly on bucket
    # boundaries, one hot source — rank must equal the naive RANK()
    from readur_ray.pipelines.analytics import percentile_rank

    rng = np.random.default_rng(5)
    n = 3000
    # keys concentrated on few values (huge ties) spanning the range
    keys = rng.choice([0, 1, 63, 64, 65, 640, 641, 4095], size=n)
    src = rng.choice(["hot", "hot", "hot", "cold"], size=n)  # skewed
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "source": pa.array(src, pa.string()),
                "text": pa.array(["x"] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "n_chars": pa.array(keys, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = percentile_rank(str(tmp_path)).to_pandas()
    df = pd.DataFrame({"doc_id": np.arange(n), "source": src, "k": keys})
    df["rnk"] = df.groupby("source")["k"].rank(method="min").astype(int)
    df["n_source"] = df.groupby("source")["k"].transform("size")
    merged = got.merge(df, on="doc_id", suffixes=("", "_naive"))
    assert len(merged) == n
    assert (merged["rnk"] == merged["rnk_naive"]).all()
    assert (merged["n_source"] == merged["n_source_naive"]).all()


# --- pivot_daily ----------------------------------------------------------

def test_pivot_daily_partials_merge_to_long_counts(ray_session):
    from readur_ray.pipelines.analytics import pivot_daily

    wide = pivot_daily(SF_DIR).to_pandas().set_index("day")
    ev = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    ev["day"] = ev["ts"].dt.strftime("%Y-%m-%d")
    long = ev.groupby(["day", "event_type"]).size().unstack(fill_value=0)
    assert len(wide) == len(long)
    for t in long.columns:
        assert (wide[f"n_{t}"].sort_index() == long[t].sort_index()).all()
    assert (wide["n_total"] == wide[[c for c in wide.columns if c != "n_total"]].sum(axis=1)).all()
