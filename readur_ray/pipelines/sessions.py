"""Sessionization — a windowed stateful aggregate over the `events`
stream (the custom-operator pattern from SURVEY §2.10/§4: semantics
Ray Data lacks natively, expressed as groupby(key).map_groups with
order-by-timestamp inside the group; the partitioning assumption is
one user's events fit one group).

Sessions split on gaps > GAP_MINUTES between consecutive events of the
same user. Output: (user_id, session_no, session_start, n_events,
duration_us) — integers/timestamps only, mirrored exactly by a window-
function oracle in __ray_entry__.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

GAP_MINUTES = 30


def sessionize(sf_dir: str) -> "ray.data.Dataset":
    gap_us = GAP_MINUTES * 60 * 1_000_000

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def per_user(group: pa.Table) -> pa.Table:
        g = group.combine_chunks()
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        uid = g.column("user_id")[0].as_py()
        gaps = np.diff(ts)
        # session id = 1 + number of gap-splits before this event
        new_session = np.concatenate([[True], gaps > gap_us])
        session_no = np.cumsum(new_session)
        starts = np.flatnonzero(new_session)
        ends = np.concatenate([starts[1:], [len(ts)]])
        n = len(starts)
        return pa.table(
            {
                "user_id": pa.array([uid] * n, pa.int64()),
                "session_no": pa.array(session_no[starts].astype(np.int64), pa.int64()),
                "session_start": pa.array(ts[starts], pa.timestamp("us")),
                "n_events": pa.array((ends - starts).astype(np.int64), pa.int64()),
                "duration_us": pa.array(
                    ts[ends - 1] - ts[starts], pa.int64()
                ),
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
