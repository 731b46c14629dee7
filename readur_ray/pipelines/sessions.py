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


WINDOW_MINUTES = 30        # sliding-window width
BUCKET_SECONDS = 3600      # halo-bucket size (must be >= window)
N_WINDOW_PARTS = 64


def sliding_window_counts(sf_dir: str) -> "ray.data.Dataset":
    """Sliding-window aggregate: per event, the count of SAME-TYPE
    events with ts in [t - 30 min, t] (inclusive) — the
    count(*) OVER (PARTITION BY type ORDER BY ts RANGE 30min PRECEDING)
    window of the SQL oracle.

    Scale plan (halo buckets — the pattern a 100 TB event stream
    needs; a plain groupby(event_type) would put an entire type's
    history in one group): events are bucketed by hour; every event in
    the LAST 30 min of a bucket is also emitted as a halo row into the
    NEXT bucket, so each (type, bucket) group is self-contained for a
    30-min look-back. One shuffle on a coarse hash of (type, bucket);
    counts via two searchsorted calls per group; halo rows counted in
    windows but emit no output rows."""
    win_us = WINDOW_MINUTES * 60 * 1_000_000
    bucket_us = BUCKET_SECONDS * 1_000_000

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        b = batch.combine_chunks()
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = b.column("event_type").to_numpy(zero_copy_only=False)
        bucket = ts // bucket_us
        # halo: events within window of the bucket end roll into bucket+1
        halo_mask = (ts % bucket_us) >= (bucket_us - win_us)
        out_ts = np.concatenate([ts, ts[halo_mask]])
        out_ty = np.concatenate([types, types[halo_mask]])
        out_bk = np.concatenate([bucket, bucket[halo_mask] + 1])
        out_halo = np.concatenate(
            [np.zeros(len(ts), dtype=bool), np.ones(int(halo_mask.sum()), dtype=bool)]
        )
        # coarse shuffle key over (type, bucket) — crc32, NOT Python
        # hash() (randomized per process → would split groups). Hash
        # each DISTINCT type once and broadcast via the inverse index:
        # the per-row Python loop over 100k+ strings becomes a handful
        # of crc calls + one numpy take.
        import zlib

        uniq, inv = np.unique(out_ty, return_inverse=True)
        uniq_codes = np.array(
            [zlib.crc32(t.encode()) for t in uniq], dtype=np.int64
        )
        type_codes = uniq_codes[inv]
        part = (type_codes * 1000003 + out_bk) % N_WINDOW_PARTS
        return pa.table(
            {
                "event_type": pa.array(out_ty, pa.string()),
                "ts": pa.array(out_ts, pa.int64()),
                "bucket": pa.array(out_bk, pa.int64()),
                "halo": pa.array(out_halo, pa.bool_()),
                "part": pa.array(part, pa.int64()),
            }
        )

    def count_part(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["event_type", "bucket", "ts", "halo"]).to_pandas()
        df = df.sort_values(["event_type", "bucket", "ts"], ignore_index=True)
        out_ty, out_ts, out_n = [], [], []
        for (ty, _bk), g in df.groupby(["event_type", "bucket"], sort=False):
            ts = g["ts"].to_numpy()
            own = ~g["halo"].to_numpy()
            if not own.any():
                continue
            t_own = ts[own]
            n = (
                np.searchsorted(ts, t_own, side="right")
                - np.searchsorted(ts, t_own - win_us, side="left")
            )
            out_ty.append(np.full(len(t_own), ty, dtype=object))
            out_ts.append(t_own)
            out_n.append(n)
        if not out_ty:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "n_win": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "event_type": pa.array(np.concatenate(out_ty), pa.string()),
                "ts": pa.array(np.concatenate(out_ts), pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_win": pa.array(
                    np.concatenate(out_n).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_part, batch_format="pyarrow")
    )


def asof_join_clicks(sf_dir: str) -> "ray.data.Dataset":
    """As-of join (custom operator per SURVEY §4: Ray Data has no
    native asof): for every 'purchase' event, the LATEST 'click' by the
    same user with click.ts <= purchase.ts (ties on ts broken by max
    event_id — fully deterministic, unlike a raw ASOF JOIN). Emits
    matched purchases only.

    Plan: one pruned read, filter to the two types, groupby(user_id)
    → in-group sort + searchsorted (vectorized over the group's
    purchases). Partitioning assumption: one user's history fits a
    group (same contract as sessionize); at 10^12 events this becomes
    time-bucketed with carried-forward last-click state per bucket."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.is_in(batch.column("event_type"),
                     value_set=pa.array(["click", "purchase"]))
        )

    def per_user(group: pa.Table) -> pa.Table:
        g = group.combine_chunks()
        empty = pa.table(
            {
                "purchase_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "purchase_ts": pa.array([], pa.timestamp("us")),
                "click_id": pa.array([], pa.int64()),
                "click_ts": pa.array([], pa.timestamp("us")),
                "gap_us": pa.array([], pa.int64()),
            }
        )
        types = g.column("event_type").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        uid = g.column("user_id")[0].as_py()
        is_c = types == "click"
        is_p = types == "purchase"
        if not is_c.any() or not is_p.any():
            return empty
        c_order = np.lexsort((ids[is_c], ts[is_c]))
        c_ts = ts[is_c][c_order]
        c_id = ids[is_c][c_order]
        p_ts = ts[is_p]
        p_id = ids[is_p]
        pos = np.searchsorted(c_ts, p_ts, side="right") - 1
        ok = pos >= 0
        if not ok.any():
            return empty
        pos = pos[ok]
        return pa.table(
            {
                "purchase_id": pa.array(p_id[ok], pa.int64()),
                "user_id": pa.array(np.full(int(ok.sum()), uid), pa.int64()),
                "purchase_ts": pa.array(p_ts[ok], pa.int64()).cast(pa.timestamp("us")),
                "click_id": pa.array(c_id[pos], pa.int64()),
                "click_ts": pa.array(c_ts[pos], pa.int64()).cast(pa.timestamp("us")),
                "gap_us": pa.array(p_ts[ok] - c_ts[pos], pa.int64()),
            }
        )

    return (
        ds.map_batches(keep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


FUNNEL_ORDER = ("view", "click", "purchase")


def funnel_stages(sf_dir: str) -> "ray.data.Dataset":
    """Conversion funnel per session: stage 1 if the session has a
    view, 2 if a click at-or-after the first view, 3 if a purchase
    at-or-after that click — the ORDERED subsequence, not mere
    presence. Sessions are the same 30-min-gap windows as sessionize.

    Plan: groupby(user_id) → in-group sort once, session split, then
    per-session first-view / first-click≥view / first-purchase≥click
    via searchsorted on the session's (tiny) per-type arrays. Output is
    one row per session — integers only, window-function oracle."""
    gap_us = GAP_MINUTES * 60 * 1_000_000

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def per_user(group: pa.Table) -> pa.Table:
        g = group.combine_chunks()
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = g.column("event_type").to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts, types = ts[order], types[order]
        uid = g.column("user_id")[0].as_py()
        new_session = np.concatenate([[True], np.diff(ts) > gap_us])
        starts = np.flatnonzero(new_session)
        ends = np.concatenate([starts[1:], [len(ts)]])
        out_no, out_n, out_stage = [], [], []
        for sno, (a, b) in enumerate(zip(starts, ends), start=1):
            seg_ts, seg_ty = ts[a:b], types[a:b]
            stage = 0
            v = seg_ts[seg_ty == FUNNEL_ORDER[0]]
            if v.size:
                stage = 1
                c = seg_ts[(seg_ty == FUNNEL_ORDER[1]) & (seg_ts >= v.min())]
                if c.size:
                    stage = 2
                    p = seg_ts[(seg_ty == FUNNEL_ORDER[2]) & (seg_ts >= c.min())]
                    if p.size:
                        stage = 3
            out_no.append(sno)
            out_n.append(int(b - a))
            out_stage.append(stage)
        return pa.table(
            {
                "user_id": pa.array([uid] * len(out_no), pa.int64()),
                "session_no": pa.array(out_no, pa.int64()),
                "n_events": pa.array(out_n, pa.int64()),
                "funnel_stage": pa.array(out_stage, pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


RANGE_JOIN_WINDOW_US = 60 * 60 * 1_000_000  # 1 hour look-back


def range_join_clicks(sf_dir: str) -> "ray.data.Dataset":
    """Interval (range) join — the band-join custom operator Ray Data
    lacks: for every 'purchase' event, the COUNT of 'click' events by
    the same user with click.ts in [purchase.ts - 1h, purchase.ts).
    Unlike asof_join_clicks (latest single match) this aggregates a
    whole time band per left row, and unlike sliding_window_counts it
    joins two relations (purchases ← clicks), not one stream to
    itself. Every purchase is emitted (band may be empty → 0), so the
    result is a LEFT range join.

    Plan: one pruned read, filter to the two types, ONE coarse-hash
    shuffle on user_id (partitioned_map — Ray's per-key map_groups
    pays a Python call per user), then a fully vectorized partition
    kernel: clicks sorted once on a composite (user, ts-offset) int64
    key, band = two searchsorted calls over ALL the partition's
    purchases at once. At 10^12 events this becomes the halo-bucket
    plan of sliding_window_counts — hour buckets with a 1h click halo
    replicated into the next bucket."""
    from ..stages.shuffle import int_partition, partitioned_map

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def keep_and_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = batch.filter(
            pc.is_in(batch.column("event_type"),
                     value_set=pa.array(["click", "purchase"]))
        )
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column("part", pa.array(int_partition(uid), pa.int64()))

    empty = pa.table(
        {
            "purchase_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "n_clicks_1h": pa.array([], pa.int64()),
        }
    )

    def per_part(part_tbl: pa.Table) -> pa.Table:
        g = part_tbl.combine_chunks()
        types = g.column("event_type").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        uids = g.column("user_id").to_numpy(zero_copy_only=False)
        is_p = types == "purchase"
        if not is_p.any():
            return empty
        p_ts, p_id, p_u = ts[is_p], ids[is_p], uids[is_p]
        is_c = types == "click"
        if not is_c.any():
            n = np.zeros(len(p_id), dtype=np.int64)
        else:
            c_ts, c_u = ts[is_c], uids[is_c]
            # composite int64 key: user in the high bits, ts offset in
            # the low — one sort + two searchsorted calls cover every
            # user in the partition at once
            t0 = int(ts.min())
            span = int(ts.max()) - t0 + 1
            shift = max(span.bit_length(), 1)
            if int(uids.max()) >= (1 << (63 - shift)):  # pragma: no cover
                raise OverflowError(
                    "user_id × ts-span exceeds the composite int64 key; "
                    "narrow the partition's time range (halo buckets)"
                )
            key_c = np.sort((c_u << shift) | (c_ts - t0))
            hi_key = (p_u << shift) | (p_ts - t0)
            lo_off = np.maximum(p_ts - RANGE_JOIN_WINDOW_US - t0, 0)
            lo_key = (p_u << shift) | lo_off
            n = (
                np.searchsorted(key_c, hi_key, side="left")
                - np.searchsorted(key_c, lo_key, side="left")
            ).astype(np.int64)
        return pa.table(
            {
                "purchase_id": pa.array(p_id, pa.int64()),
                "user_id": pa.array(p_u, pa.int64()),
                "n_clicks_1h": pa.array(n, pa.int64()),
            }
        )

    return partitioned_map(ds, keep_and_part, per_part)


WM_DELAY_SECONDS = 600     # allowed lateness behind the watermark
WM_BUCKETS = 256           # arrival-order buckets for the prefix max

_I64_MIN = np.iinfo(np.int64).min


def late_data_watermark(sf_dir: str) -> "ray.data.Dataset":
    """Streaming watermark gate: events arrive in ``event_id`` order;
    the watermark after event i is max(ts[0..i]) − WM_DELAY_SECONDS,
    and event i is LATE (a stream processor would drop or side-output
    it) iff its ts lies behind the watermark carried by the events
    that arrived BEFORE it. The canonical event-time/processing-time
    semantics of Millwheel / Dataflow / Flink watermarks (public), as
    a batch audit: per event, ``late`` ∈ {0, 1}.

    The core is a distributed RUNNING MAX over a global order — the
    prefix-scan sibling of ``pack_sequences``' prefix sum: pass 1
    computes per-bucket max ts (event_id range buckets; WM_BUCKETS
    int64s reach the driver), an exclusive prefix max over that tiny
    vector is broadcast, and pass 2 sorts each bucket locally and
    combines the bucket's carry-in with the within-bucket running max
    (shifted by one so an event never gates itself). No row-level
    all-to-all: the only shuffle is the bucket groupby, and buckets
    scale with the cluster, not the data."""
    from ray.data.aggregate import Max, Min

    path = f"{sf_dir}/events.parquet"
    delay_us = WM_DELAY_SECONDS * 1_000_000
    lohi = ray.data.read_parquet(path, columns=["event_id"]).aggregate(
        Min("event_id"), Max("event_id")
    )
    lo, hi = int(lohi["min(event_id)"]), int(lohi["max(event_id)"])
    width = (hi - lo) // WM_BUCKETS + 1

    def key_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "bucket": pa.array((ids - lo) // width, pa.int64()),
            }
        )

    keyed = ray.data.read_parquet(path, columns=["event_id", "ts"]).map_batches(
        key_batch, batch_format="pyarrow"
    )

    # pass 1: per-bucket max ts -> exclusive prefix max (driver holds
    # WM_BUCKETS int64s, never rows)
    def bucket_max(batch: pa.Table) -> pa.Table:
        acc = np.full(WM_BUCKETS, _I64_MIN, dtype=np.int64)
        np.maximum.at(
            acc,
            batch.column("bucket").to_numpy(zero_copy_only=False),
            batch.column("ts_us").to_numpy(zero_copy_only=False),
        )
        nz = np.flatnonzero(acc != _I64_MIN)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "ts_max": pa.array(acc[nz], pa.int64()),
            }
        )

    maxes = np.full(WM_BUCKETS, _I64_MIN, dtype=np.int64)
    for b in keyed.map_batches(bucket_max, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        np.maximum.at(
            maxes,
            b.column("bucket").to_numpy(zero_copy_only=False),
            b.column("ts_max").to_numpy(zero_copy_only=False),
        )
    carry_in = np.concatenate(
        ([_I64_MIN], np.maximum.accumulate(maxes)[:-1])
    )
    carry_ref = ray.put(carry_in)

    # pass 2: bucket-local sort + shifted running max + lateness test
    def gate_bucket(part_tbl: pa.Table) -> pa.Table:
        carries = ray.get(carry_ref)
        ids = part_tbl.column("event_id").to_numpy(zero_copy_only=False)
        ts = part_tbl.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, ts = ids[order], ts[order]
        base = carries[int(part_tbl.column("bucket")[0].as_py())]
        run = np.maximum.accumulate(np.concatenate(([base], ts[:-1])))
        # wm_prev == _I64_MIN means "no prior event": never late
        late = (run != _I64_MIN) & (ts < run - delay_us)
        return pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "late": pa.array(late.astype(np.int64), pa.int64()),
            }
        )

    return keyed.groupby("bucket").map_groups(gate_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SCD type-2 versioned merge (change-data-capture → dimension history)
# ---------------------------------------------------------------------------

# open-row sentinel: TIMESTAMP '2200-01-01' in µs. Deliberately INSIDE
# pandas' datetime64[ns] range (max 2262-04-11) — the classic 9999-12-31
# SCD2 sentinel overflows any ns-precision consumer.
SCD2_SENTINEL_US = 7_258_118_400_000_000
SCD2_PARTS = 64


def scd2_merge(sf_dir: str) -> "ray.data.Dataset":
    """Slowly-changing-dimension type 2: fold the `events` stream into
    a versioned per-user attribute history. Events are a CDC change
    feed of the user's `value` attribute (as exact integer cents);
    consecutive duplicates are suppressed (classic CDC dedup) and each
    surviving change opens a version row: (user_id, version, cents,
    valid_from, valid_to, is_current) with valid_to = next change's
    valid_from, sentinel 2200-01-01 on the open row. The lakehouse
    upsert/merge primitive (Kimball SCD2; Delta/Hudi MERGE INTO).

    Scale shape: ONE coarse shuffle on user_id % SCD2_PARTS, then a
    per-partition vectorized sort by (user_id, ts, event_id) + shift
    compare — all of a user's rows co-reside, so version numbering and
    next-change lookup are partition-local. No driver state; ties are
    broken by event_id so the result is layout-independent and
    bit-equal to the lag/lead window oracle."""

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "ts": batch.column("ts"),
                "user_id": batch.column("user_id"),
                "cents": pa.array(cents, pa.int64()),
                "part": pa.array(uid % SCD2_PARTS, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_scd2_versions, batch_format="pyarrow")
    )


def _scd2_versions(part_tbl: pa.Table) -> pa.Table:
    """One user-partition of the SCD2 merge (module-level so the
    hypothesis fuzz in tests/test_wave_properties.py drives the REAL
    kernel): sort by (user_id, ts, event_id), suppress consecutive
    duplicates, version + tile the timeline."""
    df = part_tbl.select(
        ["event_id", "ts", "user_id", "cents"]
    ).to_pandas()
    df = df.sort_values(
        ["user_id", "ts", "event_id"], kind="stable", ignore_index=True
    )
    uid = df["user_id"].to_numpy()
    cents = df["cents"].to_numpy()
    new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
    changed = np.concatenate([[True], cents[1:] != cents[:-1]])
    keep = new_user | changed
    ki = np.flatnonzero(keep)
    k_uid = uid[ki]
    # version = running count within user over kept rows
    k_new_user = np.concatenate([[True], k_uid[1:] != k_uid[:-1]])
    grp_start = np.maximum.accumulate(
        np.where(k_new_user, np.arange(len(ki)), 0)
    )
    version = np.arange(len(ki)) - grp_start + 1
    ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    vfrom = ts_us[ki]
    # valid_to = next kept row's valid_from within the same user
    nxt = np.concatenate([vfrom[1:], [SCD2_SENTINEL_US]])
    last_of_user = np.concatenate([k_uid[1:] != k_uid[:-1], [True]])
    vto = np.where(last_of_user, SCD2_SENTINEL_US, nxt)
    return pa.table(
        {
            "user_id": pa.array(k_uid.astype(np.int64), pa.int64()),
            "version": pa.array(version.astype(np.int64), pa.int64()),
            "cents": pa.array(cents[ki], pa.int64()),
            "valid_from": pa.array(vfrom, pa.timestamp("us")),
            "valid_to": pa.array(vto, pa.timestamp("us")),
            "is_current": pa.array(
                last_of_user.astype(np.int64), pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# hourly gap-fill resample with forward fill (time-series densification)
# ---------------------------------------------------------------------------

RES_PARTS = 64
US_PER_HOUR = 3_600_000_000


def resample_ffill(sf_dir: str) -> "ray.data.Dataset":
    """Time-series densification: per user, an hourly grid from the
    user's first to last event hour, carrying the latest `value` (as
    exact cents) forward across gaps — the resample/gap-fill operator
    every metrics/feature pipeline runs before windowed models.
    Returns (user_id, hour, cents); within an hour the LAST event by
    (ts, event_id) wins, mirrored by the oracle's row_number.

    Scale shape: one coarse shuffle on user_id % RES_PARTS; inside a
    partition each user's fill is one searchsorted over its hourly
    last-events — no cross-user state. Output is inherently
    users × span rows (the densification contract); at 100 TB the
    grid emission streams straight into the partitioned sink, never
    accumulating."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        ts_us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "ts_us": pa.array(ts_us, pa.int64()),
                "user_id": batch.column("user_id"),
                "cents": pa.array(cents, pa.int64()),
                "h": pa.array(ts_us // US_PER_HOUR, pa.int64()),
                "part": pa.array(uid % RES_PARTS, pa.int64()),
            }
        )

    def fill_part(part_tbl: pa.Table) -> pa.Table:
        df = (
            part_tbl.select(["event_id", "ts_us", "user_id", "cents", "h"])
            .to_pandas()
            .sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        )
        out_uid, out_h, out_c = [], [], []
        for uid, g in df.groupby("user_id", sort=False):
            hourly = g.groupby("h", sort=True)["cents"].last()  # last by sort order
            hrs = hourly.index.to_numpy()
            vals = hourly.to_numpy()
            grid = np.arange(hrs[0], hrs[-1] + 1, dtype=np.int64)
            idx = np.searchsorted(hrs, grid, side="right") - 1
            out_uid.append(np.full(len(grid), uid, np.int64))
            out_h.append(grid)
            out_c.append(vals[idx])
        if not out_uid:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "hour": pa.array([], pa.timestamp("us")),
                    "cents": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "user_id": pa.array(np.concatenate(out_uid), pa.int64()),
                "hour": pa.array(
                    np.concatenate(out_h) * US_PER_HOUR, pa.timestamp("us")
                ),
                "cents": pa.array(np.concatenate(out_c), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fill_part, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# ROWS-frame rolling window aggregate
# ---------------------------------------------------------------------------

ROLL_PRECEDING = 2   # SUM OVER (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)


def rolling_sum(sf_dir: str) -> "ray.data.Dataset":
    """Per user, ordered by (ts, event_id): the rolling sum of the
    current + ROLL_PRECEDING preceding events' cents — the ROWS-frame
    windowed aggregate (count-based frame), completing the window
    inventory next to the RANGE/time frames (sliding_window), rank
    frames (percentile_rank) and cumulative frames (late_data_watermark
    / pack_sequences). Returns (event_id, user_id, cents, roll_sum).

    Scale shape: one coarse shuffle on user_id % SCD2_PARTS, then a
    purely vectorized per-partition pass — cumsum minus the cumsum
    shifted by the frame width, reset at user boundaries via the
    per-user running index. No per-row Python, no driver state."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "ts": batch.column("ts"),
                "user_id": batch.column("user_id"),
                "cents": pa.array(cents, pa.int64()),
                "part": pa.array(uid % SCD2_PARTS, pa.int64()),
            }
        )

    def roll_part(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(
            ["event_id", "ts", "user_id", "cents"]
        ).to_pandas().sort_values(
            ["user_id", "ts", "event_id"], kind="stable", ignore_index=True
        )
        uid = df["user_id"].to_numpy()
        c = df["cents"].to_numpy().astype(np.int64)
        n = len(c)
        cs = np.concatenate([[0], np.cumsum(c)])  # cs[i] = sum of c[:i]
        # index within user: positions since the user's first row
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        starts = np.maximum.accumulate(np.where(new_user, np.arange(n), 0))
        idx_in_user = np.arange(n) - starts
        lo = np.arange(n) - np.minimum(idx_in_user, ROLL_PRECEDING)
        roll = cs[np.arange(n) + 1] - cs[lo]
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy(), pa.int64()),
                "user_id": pa.array(uid.astype(np.int64), pa.int64()),
                "cents": pa.array(c, pa.int64()),
                "roll_sum": pa.array(roll.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(roll_part, batch_format="pyarrow")
    )


SLIDE_W = 7  # window width in days, [d - 6, d]
DAY_US = 86_400_000_000


def sliding_distinct(sf_dir: str) -> "ray.data.Dataset":
    """Exact SLIDING-window COUNT DISTINCT — rolling 7-day active
    users per day (WAU), the metric a daily distinct count cannot be
    summed into (users active on several days of a window must count
    once). `distinct_users_daily` is this operator's degenerate W=1
    case; the window makes it a genuinely different plan.

    Plan — the interval-merge + delta-prefix shape:
    1. per-batch LOCAL distinct (user, epoch-day) pairs (combiner);
    2. ONE coarse shuffle on user: per user, sorted unique days merge
       into coverage intervals [a, a+W-1] (a new interval starts at a
       gap > W-1 — the sessionize gap-segmentation kernel on the
       user-day axis), each interval emitting two DELTA rows
       (start, +1), (end+1, −1);
    3. groupby(day) Sum over the deltas — after reduction at most
       2 × #days + W rows — and a driver-side prefix sum over the
       day-domain grid (bounded: the corpus time span in days, ~10³
       for decades — the pack_sequences broadcast-base contract)
       restricted to days with ≥ 1 event.

    Nothing but int64 (user, day) pairs and day-delta rows ever
    shuffle; a viral day costs nothing extra (the pair combiner owns
    skew). Output: (day, n_users_7d) for each day present in the
    events table."""
    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def pairs(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        key = np.unique(u.astype(np.int64) * (1 << 21) + d)
        uu, dd = key >> 21, key & ((1 << 21) - 1)
        return pa.table(
            {
                "user": pa.array(uu, pa.int64()),
                "day": pa.array(dd, pa.int64()),
                "part": pa.array(uu % N_COARSE_PARTS, pa.int64()),
            }
        )

    def deltas(part_tbl: pa.Table) -> pa.Table:
        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        d = part_tbl.column("day").to_numpy(zero_copy_only=False)
        key = np.unique(u * (1 << 21) + d)  # global distinct per user
        u, d = key >> 21, key & ((1 << 21) - 1)
        # interval starts: user change OR day gap > W-1
        new = np.empty(len(u), dtype=bool)
        if len(u):
            new[0] = True
            new[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] > SLIDE_W - 1)
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [len(u)])) - 1
        s_day = d[starts]
        e_day = d[ends] + SLIDE_W  # first day AFTER coverage
        return pa.table(
            {
                "day": pa.array(np.concatenate((s_day, e_day)), pa.int64()),
                "delta": pa.array(
                    np.concatenate(
                        (
                            np.ones(len(s_day), np.int64),
                            -np.ones(len(e_day), np.int64),
                        )
                    ),
                    pa.int64(),
                ),
            }
        )

    from ray.data.aggregate import Sum

    shuffled = ds.map_batches(pairs, batch_format="pyarrow")
    agg = (
        shuffled.groupby("part")
        .map_groups(deltas, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("delta", alias_name="d"))
    )

    # bounded driver reads: the delta grid (<= 2 x #days + W rows) and
    # the present-day set (#days rows after the per-batch unique)
    dd = agg.to_pandas()
    present = np.unique(
        np.concatenate(
            [
                b.column("day").to_numpy(zero_copy_only=False)
                for b in shuffled.map_batches(
                    lambda t: pa.table(
                        {
                            "day": pa.array(
                                np.unique(
                                    t.column("day").to_numpy(
                                        zero_copy_only=False
                                    )
                                ),
                                pa.int64(),
                            )
                        }
                    ),
                    batch_format="pyarrow",
                ).iter_batches(batch_format="pyarrow")
            ]
        )
    )
    days = dd["day"].to_numpy()
    order = np.argsort(days)
    days, vals = days[order], dd["d"].to_numpy()[order]
    run = np.cumsum(vals)
    # count at day x = running sum of deltas with day <= x
    idx = np.searchsorted(days, present, side="right") - 1
    counts = np.where(idx >= 0, run[np.maximum(idx, 0)], 0)
    return ray.data.from_arrow(
        pa.table(
            {
                "day": pa.array(present, pa.int64()),
                "n_users_7d": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )
    )


RETAIN_GAP = 7  # cohort offset in days


def retention_7d(sf_dir: str) -> "ray.data.Dataset":
    """Cohort retention — for each day d, how many of that day's
    distinct active users were ALSO active exactly d+7 (the classic
    D7 retention numerator, plus the cohort size as denominator
    input). The product-analytics class no pointwise aggregate
    expresses: membership in TWO day slices of the same user's
    timeline.

    Plan: the same distinct (user, day) pair combiner and ONE
    user-keyed coarse shuffle as `sliding_distinct`; per user the
    sorted unique day array answers "is d+7 present" for every d with
    one vectorized searchsorted against itself — no self-join, no
    second shuffle. Per-partition (day, retained, cohort) partials
    then fold in a tiny groupby(day). Output:
    (day, n_cohort, n_retained) for every day with ≥ 1 active user."""
    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def pairs(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        key = np.unique(u.astype(np.int64) * (1 << 21) + d)
        uu, dd = key >> 21, key & ((1 << 21) - 1)
        return pa.table(
            {
                "user": pa.array(uu, pa.int64()),
                "day": pa.array(dd, pa.int64()),
                "part": pa.array(uu % N_COARSE_PARTS, pa.int64()),
            }
        )

    def per_part(part_tbl: pa.Table) -> pa.Table:
        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        d = part_tbl.column("day").to_numpy(zero_copy_only=False)
        key = np.unique(u * (1 << 21) + d)
        ret = np.isin(key + RETAIN_GAP, key)  # same user, day + 7
        days = key & ((1 << 21) - 1)
        g = (
            pa.table(
                {
                    "day": pa.array(days, pa.int64()),
                    "coh": pa.array(np.ones(len(days), np.int64), pa.int64()),
                    "ret": pa.array(ret.astype(np.int64), pa.int64()),
                }
            )
            .group_by("day")
            .aggregate([("coh", "sum"), ("ret", "sum")])
        )
        return pa.table(
            {
                "day": g.column("day"),
                "coh_p": g.column("coh_sum").cast(pa.int64()),
                "ret_p": g.column("ret_sum").cast(pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": batch.column("day"),
                "n_cohort": batch.column("coh"),
                "n_retained": batch.column("ret"),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("coh_p", alias_name="coh"), Sum("ret_p", alias_name="ret"))
        .map_batches(rename, batch_format="pyarrow")
    )


def event_transitions(sf_dir: str) -> "ray.data.Dataset":
    """First-order Markov transition counts over each user's
    time-ordered event stream — the sequential-pattern class
    (item_cooccurrence counts UNORDERED same-basket pairs; this counts
    ORDERED consecutive steps, the input to Markov-chain next-action
    models and funnel-drop diagnostics): one row per
    (prev_type, next_type) with its exact corpus-wide count.

    Plan: ONE coarse shuffle on user — a user's whole timeline must
    co-locate, the same invariant sessionize documents — then each
    partition sorts once by (user, ts, event_id) (the deterministic
    tie order the oracle's window mirrors) and reads consecutive-pair
    transitions vectorized (shift-by-one mask on the user boundary);
    per-partition pair counts fold in a tiny final groupby. The wire
    carries (user, ts, event_id, type) once; transition rows are
    pre-reduced per partition (≤ #types² per task)."""
    from ..stages.shuffle import N_COARSE_PARTS
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def keyed(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user": pa.array(u.astype(np.int64), pa.int64()),
                "ts": batch.column("ts").cast(pa.int64()),
                "eid": batch.column("event_id").cast(pa.int64()),
                "etype": batch.column("event_type"),
                "part": pa.array(
                    u.astype(np.int64) % N_COARSE_PARTS, pa.int64()
                ),
            }
        )

    def transitions(part_tbl: pa.Table) -> pa.Table:
        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        ts = part_tbl.column("ts").to_numpy(zero_copy_only=False)
        eid = part_tbl.column("eid").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        et = np.asarray(part_tbl.column("etype").to_pylist(), dtype=object)[
            order
        ]
        same_user = u[order][1:] == u[order][:-1]
        prev = et[:-1][same_user]
        nxt = et[1:][same_user]
        if len(prev) == 0:
            return pa.table(
                {
                    "prev_type": pa.array([], pa.string()),
                    "next_type": pa.array([], pa.string()),
                    "n_p": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "prev_type": pa.array(prev.tolist(), pa.string()),
                "next_type": pa.array(nxt.tolist(), pa.string()),
                "one": pa.array(np.ones(len(prev), np.int64), pa.int64()),
            }
        ).group_by(["prev_type", "next_type"]).aggregate([("one", "sum")])
        return pa.table(
            {
                "prev_type": t.column("prev_type"),
                "next_type": t.column("next_type"),
                "n_p": t.column("one_sum").cast(pa.int64()),
            }
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "prev_type": batch.column("prev_type"),
                "next_type": batch.column("next_type"),
                "n": batch.column("n"),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(transitions, batch_format="pyarrow")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n_p", alias_name="n"))
        .map_batches(rename, batch_format="pyarrow")
    )


def resample_lerp(sf_dir: str) -> "ray.data.Dataset":
    """Time-series densification with LINEAR interpolation — the
    two-sided imputation sibling of `resample_ffill`: per user, the
    hourly grid from first to last event hour where a gap hour takes
    the exact integer lerp between its bracketing hourly anchors,
    cents = ⌊(y0·(h1−h) + y1·(h−h0)) / (h1−h0)⌋ (anchor hours keep
    their own last-event cents; all cents are ≥ 0 in this corpus so
    numpy floor-division and the oracle's `//` agree — the documented
    precondition). The imputation step feature pipelines run when
    carry-forward bias is unacceptable.

    Scale shape: identical to resample_ffill — ONE coarse shuffle on
    user, per-user anchors from one sort, then a fully vectorized
    searchsorted + lerp over the grid; the densified grid streams to
    the sink. Returns (user_id, hour, cents)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        ts_us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "ts_us": pa.array(ts_us, pa.int64()),
                "user_id": batch.column("user_id"),
                "cents": pa.array(cents, pa.int64()),
                "h": pa.array(ts_us // US_PER_HOUR, pa.int64()),
                "part": pa.array(uid % RES_PARTS, pa.int64()),
            }
        )

    def lerp_part(part_tbl: pa.Table) -> pa.Table:
        df = (
            part_tbl.select(["event_id", "ts_us", "user_id", "cents", "h"])
            .to_pandas()
            .sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        )
        out_uid, out_h, out_c = [], [], []
        for uid, g in df.groupby("user_id", sort=False):
            hourly = g.groupby("h", sort=True)["cents"].last()
            hrs = hourly.index.to_numpy()
            vals = hourly.to_numpy()
            grid = np.arange(hrs[0], hrs[-1] + 1, dtype=np.int64)
            i1 = np.searchsorted(hrs, grid, side="left")  # next anchor
            i0 = np.searchsorted(hrs, grid, side="right") - 1  # prev anchor
            h0, y0 = hrs[i0], vals[i0]
            h1, y1 = hrs[np.minimum(i1, len(hrs) - 1)], vals[
                np.minimum(i1, len(hrs) - 1)
            ]
            on_anchor = h0 == grid
            span = np.where(on_anchor, 1, h1 - h0)
            filled = np.where(
                on_anchor,
                y0,
                (y0 * (h1 - grid) + y1 * (grid - h0)) // span,
            )
            out_uid.append(np.full(len(grid), uid, np.int64))
            out_h.append(grid)
            out_c.append(filled.astype(np.int64))
        if not out_uid:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "hour": pa.array([], pa.timestamp("us")),
                    "cents": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "user_id": pa.array(np.concatenate(out_uid), pa.int64()),
                "hour": pa.array(
                    np.concatenate(out_h) * US_PER_HOUR, pa.timestamp("us")
                ),
                "cents": pa.array(np.concatenate(out_c), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lerp_part, batch_format="pyarrow")
    )


PATH_MAX_STEPS = 20  # sequence truncation the oracle mirrors (rn <= 20)


def user_paths(sf_dir: str) -> "ray.data.Dataset":
    """Ordered sequence materialization — the collect / string_agg
    class (the per-entity ordered list no scalar aggregate expresses):
    per user, the chronological '>'-joined event-type path truncated
    to the first PATH_MAX_STEPS steps, plus the untruncated event
    count — the behavior-sequence feature sequence models and funnel
    exploration consume.

    Scale shape: ONE coarse user shuffle; inside a partition one
    lexsort by (user, ts, event_id) orders every user at once, a
    cumcount-style rank (arange minus segment starts) applies the
    truncation VECTORIZED, and only the ≤ PATH_MAX_STEPS surviving
    steps per user are joined into a string (output-row-bounded by
    construction — a hot user contributes 20 steps, not their event
    count; the count column still reports the true total). Returns
    (user_id, n_events, path)."""
    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def keyed(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user": pa.array(u.astype(np.int64), pa.int64()),
                "ts": batch.column("ts").cast(pa.int64()),
                "eid": batch.column("event_id").cast(pa.int64()),
                "etype": batch.column("event_type"),
                "part": pa.array(
                    u.astype(np.int64) % N_COARSE_PARTS, pa.int64()
                ),
            }
        )

    def build(part_tbl: pa.Table) -> pa.Table:
        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        ts = part_tbl.column("ts").to_numpy(zero_copy_only=False)
        eid = part_tbl.column("eid").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        us = u[order]
        et = np.asarray(part_tbl.column("etype").to_pylist(), dtype=object)[
            order
        ]
        idx = np.arange(len(us), dtype=np.int64)
        flags = np.empty(len(us), dtype=bool)
        if len(us):
            flags[0] = True
            flags[1:] = us[1:] != us[:-1]
        start = np.maximum.accumulate(np.where(flags, idx, 0))
        rank = idx - start
        starts = np.flatnonzero(flags)
        ends = np.concatenate((starts[1:], [len(us)]))
        keep = rank < PATH_MAX_STEPS
        out_u, out_n, out_p = [], [], []
        ke = et[keep]
        kstarts = np.searchsorted(np.flatnonzero(keep), starts)
        kends = np.concatenate((kstarts[1:], [len(ke)]))
        for s, e, s2, e2 in zip(starts, ends, kstarts, kends):
            out_u.append(int(us[s]))
            out_n.append(int(e - s))
            out_p.append(">".join(ke[s2:e2]))
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "n_events": pa.array(out_n, pa.int64()),
                "path": pa.array(out_p, pa.string()),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(build, batch_format="pyarrow")
    )


WEEK_DAYS = 7


def cohort_matrix(sf_dir: str) -> "ray.data.Dataset":
    """The full cohort-retention TRIANGLE — distinct users per
    (signup-week cohort, activity week): the product-analytics matrix
    `retention_7d` samples at one fixed offset, generalized to every
    offset (cohort week w0, active week w ≥ w0). Week = epoch-day //
    7. A user's cohort is their FIRST active week.

    Scale shape: the same distinct (user, day) pair combiner and ONE
    user-keyed coarse shuffle as sliding_distinct — a user's whole
    timeline co-locates, so cohort assignment (min week) and the
    (cohort, week) contribution rows fall out of one sorted pass with
    no second data shuffle; per-partition (cohort, week) partial
    counts fold in a tiny groupby over ≤ #weeks² rows. Output:
    (cohort_week, act_week, n_users)."""
    from ..stages.shuffle import N_COARSE_PARTS
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def pairs(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        w = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
            // WEEK_DAYS
        )
        key = np.unique(u.astype(np.int64) * (1 << 21) + w)
        uu, ww = key >> 21, key & ((1 << 21) - 1)
        return pa.table(
            {
                "user": pa.array(uu, pa.int64()),
                "week": pa.array(ww, pa.int64()),
                "part": pa.array(uu % N_COARSE_PARTS, pa.int64()),
            }
        )

    def contribute(part_tbl: pa.Table) -> pa.Table:
        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        w = part_tbl.column("week").to_numpy(zero_copy_only=False)
        key = np.unique(u * (1 << 21) + w)  # sorted by (user, week)
        uu, ww = key >> 21, key & ((1 << 21) - 1)
        flags = np.empty(len(uu), dtype=bool)
        if len(uu):
            flags[0] = True
            flags[1:] = uu[1:] != uu[:-1]
        idx = np.arange(len(uu), dtype=np.int64)
        start = np.maximum.accumulate(np.where(flags, idx, 0))
        cohort = ww[start]  # first (min) week of each user's run
        t = pa.table(
            {
                "cohort_week": pa.array(cohort, pa.int64()),
                "act_week": pa.array(ww, pa.int64()),
                "one": pa.array(np.ones(len(ww), np.int64), pa.int64()),
            }
        ).group_by(["cohort_week", "act_week"]).aggregate([("one", "sum")])
        return pa.table(
            {
                "cohort_week": t.column("cohort_week"),
                "act_week": t.column("act_week"),
                "n_p": t.column("one_sum").cast(pa.int64()),
            }
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": batch.column("cohort_week"),
                "act_week": batch.column("act_week"),
                "n_users": batch.column("n"),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(contribute, batch_format="pyarrow")
        .groupby(["cohort_week", "act_week"])
        .aggregate(Sum("n_p", alias_name="n"))
        .map_batches(rename, batch_format="pyarrow")
    )


def inter_event_gaps(sf_dir: str) -> "ray.data.Dataset":
    """Inter-arrival-time histogram: per user, the gap in whole seconds
    between consecutive events (chronological, event_id tie-break),
    folded into power-of-two buckets — bucket = floor(log2(gap_s + 1)).
    The cadence / burstiness monitor of an event stream (bot traffic
    piles into the 0-1 s buckets, human sessions spread over minutes,
    batch replays land as a spike at the replay period) — the
    DISTRIBUTION of gaps, which sessionize's single 30-min threshold
    collapses to a boolean. Output: (bucket, n_gaps), exact integers.
    floor(log2) on int64 + 1 is float-safe for any realistic gap: a
    double's 52-bit mantissa places log2(n) within 1e-12 of truth
    while the nearest integer log2 is ≥ 1e-10 away for n < 2^31.

    Scale shape: ONE coarse user shuffle (the sessionize/user_paths
    assumption: a user's events fit a partition); inside a partition a
    single lexsort orders every user at once, np.diff + a segment-
    boundary mask drops cross-user pairs, and one bincount reduces the
    partition to ≤ 64 (bucket, count) partials — a fixed-size final
    Sum, rows never leave their partition after the shuffle."""
    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def keyed(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user": pa.array(u, pa.int64()),
                "ts": batch.column("ts").cast(pa.int64()),
                "eid": batch.column("event_id").cast(pa.int64()),
                "part": pa.array(u % N_COARSE_PARTS, pa.int64()),
            }
        )

    def bucket_partials(part_tbl: pa.Table) -> pa.Table:
        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        ts = part_tbl.column("ts").to_numpy(zero_copy_only=False)
        eid = part_tbl.column("eid").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        us, tss = u[order], ts[order]
        same_user = us[1:] == us[:-1]
        gaps_us = (tss[1:] - tss[:-1])[same_user]
        gsec = gaps_us // 1_000_000
        bucket = np.floor(np.log2(gsec + 1)).astype(np.int64)
        if len(bucket) == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        cnt = np.bincount(bucket)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"bucket": batch.column("bucket"), "n": batch.column("n_p")}
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_partials, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(_Sum("n", alias_name="n_p"))
        .map_batches(rename, batch_format="pyarrow")
    )


def event_runs(sf_dir: str) -> "ray.data.Dataset":
    """Run-length encoding of per-user event streams — the
    gaps-and-islands class (SQL's classic double-row_number trick):
    order each user's events by (ts, event_id) and split them into
    maximal runs of the SAME event_type; output the exact
    (event_type, run_len, n_runs) distribution. The behavioral-
    repetition monitor no transition or gap statistic expresses:
    event_transitions counts bigram CHANGES, inter_event_gaps times
    them — this measures how long a user dwells on one action (a bot
    hammering `click` 500× in a row is a single length-500 run; human
    streams decay geometrically), and it is also the payload shape of
    run-length compression accounting.

    Scale shape: ONE coarse user shuffle (the sessionize assumption:
    a user's events fit a partition); inside a partition a single
    lexsort orders every user at once, one vectorized mask (user
    change OR type change) finds run starts, np.diff of the start
    index vector yields every run length with no per-run loop, and a
    local (type, len) fold shrinks the partition to ≤ |types| ×
    |distinct lengths| partials before a tiny two-key Sum exchange —
    event rows never leave their partition after the shuffle."""
    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def keyed(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "user": pa.array(u, pa.int64()),
                "ts": batch.column("ts").cast(pa.int64()),
                "eid": batch.column("event_id").cast(pa.int64()),
                "etype": batch.column("event_type"),
                "part": pa.array(u % N_COARSE_PARTS, pa.int64()),
            }
        )

    def run_partials(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        ts = part_tbl.column("ts").to_numpy(zero_copy_only=False)
        eid = part_tbl.column("eid").to_numpy(zero_copy_only=False)
        et = part_tbl.column("etype").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        new_run = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (et[1:] != et[:-1]))
        )
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.concatenate([starts, [len(u)]])).astype(np.int64)
        df = pd.DataFrame({"event_type": et[starts], "run_len": lens})
        g = (
            df.groupby(["event_type", "run_len"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "run_len": pa.array(g["run_len"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "run_len": batch.column("run_len"),
                "n_runs": batch.column("n_p"),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(run_partials, batch_format="pyarrow")
        .groupby(["event_type", "run_len"])
        .aggregate(_Sum("n", alias_name="n_p"))
        .map_batches(rename, batch_format="pyarrow")
    )


AUTOCORR_MAX_LAG = 7  # daily lags probed (weekly periodicity window)


def autocorr_lags(sf_dir: str) -> "ray.data.Dataset":
    """Periodicity detection — exact Pearson-autocorrelation
    sufficient statistics of each event type's DAILY count series at
    lags 1..AUTOCORR_MAX_LAG: per (event_type, lag) the matched-pair
    count and the five sums (Σxy, Σx, Σy, Σx², Σy²) over day pairs
    (t, t−lag) both present, all exact int64 — the weekly-seasonality
    readout (a traffic series with a 7-day cycle lights lag 7; a
    batch replay lights its replay period) that trend_slopes' single
    straight line cannot see.

    Scale shape: the row stream folds to the (event_type, day) count
    grid with per-batch partials + one tiny Sum exchange (the
    pivot_daily shape); the grid is #types × #days — bounded — so
    each type's series fits one map_groups task, where a sort +
    searchsorted alignment per lag emits AUTOCORR_MAX_LAG fixed rows.
    Rows never shuffle; for decade-long ranges the same plan runs on
    weekly buckets."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def day_partials(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        days = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        g = (
            pd.DataFrame({"event_type": et, "day": days})
            .groupby(["event_type", "day"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "day": pa.array(g["day"].to_numpy().astype(np.int64), pa.int64()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def per_type(group: pa.Table) -> pa.Table:
        et = group.column("event_type")[0].as_py()
        d = group.column("day").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(d)
        d, c = d[order], c[order]
        rows = {k: [] for k in ("lag", "n_pairs", "s_xy", "sum_x", "sum_y",
                                "sum_xx", "sum_yy")}
        for lag in range(1, AUTOCORR_MAX_LAG + 1):
            idx = np.searchsorted(d, d - lag)
            ok = (idx < len(d)) & (d[np.minimum(idx, len(d) - 1)] == d - lag)
            x, y = c[ok], c[np.minimum(idx, len(d) - 1)][ok]
            rows["lag"].append(lag)
            rows["n_pairs"].append(int(ok.sum()))
            rows["s_xy"].append(int(np.sum(x * y)))
            rows["sum_x"].append(int(x.sum()))
            rows["sum_y"].append(int(y.sum()))
            rows["sum_xx"].append(int(np.sum(x * x)))
            rows["sum_yy"].append(int(np.sum(y * y)))
        return pa.table(
            {
                "event_type": pa.array([et] * AUTOCORR_MAX_LAG, pa.string()),
                **{k: pa.array(v, pa.int64()) for k, v in rows.items()},
            }
        )

    return (
        ds.map_batches(day_partials, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(_Sum("c", alias_name="c"))
        .groupby("event_type")
        .map_groups(per_type, batch_format="pyarrow")
    )


ROLLMED_WINDOW = 7  # rolling-median look-back in PRESENT grid days


def rolling_median_daily(sf_dir: str) -> "ray.data.Dataset":
    """Rolling MEDIAN of each event type's daily count series over the
    trailing ROLLMED_WINDOW present days — the robust trend line:
    where trend_slopes' least-squares line and a rolling MEAN both
    chase a single replay spike, the windowed order statistic ignores
    it (breakdown point 0.5), which is exactly what an alerting
    baseline wants. Emitted as med_x2 = 2×median so even-width
    windows (the first 6 rows of a series) stay EXACT integers —
    .5 halves are exact in a double, so both sides agree bit-for-bit.
    Windows count PRESENT grid days (ROWS frame, not RANGE): a day
    with zero events is absent on both sides by the same rule.

    Scale shape: the row stream folds to the bounded (event_type,
    day) count grid with per-batch partials + one tiny Sum exchange
    (the pivot_daily / autocorr_lags shape); each type's series then
    fits one map_groups task where the trailing-window median is a
    ≤ 7-value partial sort per grid day — work is O(#types × #days),
    independent of event volume. Output: (event_type, day, med_x2)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def day_partials(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        days = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        g = (
            pd.DataFrame({"event_type": et, "day": days})
            .groupby(["event_type", "day"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "day": pa.array(g["day"].to_numpy().astype(np.int64), pa.int64()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def per_type(group: pa.Table) -> pa.Table:
        et = group.column("event_type")[0].as_py()
        d = group.column("day").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(d)
        d, c = d[order], c[order]
        med_x2 = np.empty(len(d), dtype=np.int64)
        for i in range(len(d)):
            w = np.sort(c[max(0, i - ROLLMED_WINDOW + 1) : i + 1])
            m = len(w)
            med_x2[i] = (
                2 * int(w[m // 2])
                if m % 2
                else int(w[m // 2 - 1]) + int(w[m // 2])
            )
        return pa.table(
            {
                "event_type": pa.array([et] * len(d), pa.string()),
                "day": pa.array(d, pa.int64()),
                "med_x2": pa.array(med_x2, pa.int64()),
            }
        )

    return (
        ds.map_batches(day_partials, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(_Sum("c", alias_name="c"))
        .groupby("event_type")
        .map_groups(per_type, batch_format="pyarrow")
    )


def error_recovery_time(sf_dir: str) -> "ray.data.Dataset":
    """Error-recovery latency — for EVERY error event, the gap to the
    same user's next non-error event in (ts, event_id) order, folded
    into power-of-two second buckets (floor(log2(gap_s + 1)); errors
    with no later non-error event land in bucket -1 as UNRECOVERED):
    the incident-MTTR distribution of an event stream, a per-
    occurrence as-of alignment that funnel first-times (one row per
    session) and consecutive-pair gaps (type-blind) cannot express.
    Tail-seated by design: the next-after probe is asof_join's
    searchsorted kernel applied within one table, inside the same
    one-user-shuffle + partition lexsort frame event_runs head-checks.

    Scale shape: ONE coarse user shuffle; per partition a single
    lexsort orders every user at once, the non-error POSITION index
    plus one searchsorted gives each error its next candidate, a
    vectorized segment-end compare rules out cross-user bleed, and a
    bincount folds the partition to ≤ 64 bucket partials before a
    tiny Sum — error rows never leave their partition."""
    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def keyed(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        is_err = (
            batch.column("event_type").to_numpy(zero_copy_only=False)
            == "error"
        )
        return pa.table(
            {
                "user": pa.array(u, pa.int64()),
                "ts": batch.column("ts").cast(pa.int64()),
                "eid": batch.column("event_id").cast(pa.int64()),
                "is_err": pa.array(is_err, pa.bool_()),
                "part": pa.array(u % N_COARSE_PARTS, pa.int64()),
            }
        )

    def bucket_partials(part_tbl: pa.Table) -> pa.Table:
        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        ts = part_tbl.column("ts").to_numpy(zero_copy_only=False)
        eid = part_tbl.column("eid").to_numpy(zero_copy_only=False)
        er = part_tbl.column("is_err").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, er = u[order], ts[order], er[order]
        n = len(u)
        # last index of each user's segment, repeated per row
        seg_start = np.flatnonzero(
            np.concatenate(([True], u[1:] != u[:-1]))
        )
        seg_len = np.diff(np.concatenate([seg_start, [n]]))
        seg_end = np.repeat(seg_start + seg_len - 1, seg_len)
        err_idx = np.flatnonzero(er)
        ok_pos = np.flatnonzero(~er)
        cand = np.searchsorted(ok_pos, err_idx, side="right")
        has = cand < len(ok_pos)
        nxt = np.where(has, ok_pos[np.minimum(cand, len(ok_pos) - 1)], n)
        recovered = has & (nxt <= seg_end[err_idx])
        gaps_s = (ts[nxt[recovered]] - ts[err_idx[recovered]]) // 1_000_000
        bucket = np.floor(np.log2(gaps_s + 1)).astype(np.int64)
        counts = np.bincount(bucket) if len(bucket) else np.array([], np.int64)
        nz = np.nonzero(counts)[0]
        out_b = nz.astype(np.int64).tolist()
        out_n = counts[nz].astype(np.int64).tolist()
        n_unrec = int(len(err_idx) - recovered.sum())
        if n_unrec:
            out_b.append(-1)
            out_n.append(n_unrec)
        return pa.table(
            {
                "bucket": pa.array(out_b, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"bucket": batch.column("bucket"), "n": batch.column("n_p")}
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_partials, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(_Sum("n", alias_name="n_p"))
        .map_batches(rename, batch_format="pyarrow")
    )


def growth_accounting(sf_dir: str) -> "ray.data.Dataset":
    """Daily growth accounting — per day the active distinct users,
    the NEW users (first-ever activity that day) and the cumulative
    distinct users to date: the DAU / acquisition / saturation
    triple every growth dashboard opens with, which neither the flat
    DAU series (no first-seen attribution) nor the cohort matrix
    (week grain, retention-shaped) reads off directly. Tail-seated
    by design: a composition of distinct_users_daily's distinct-pair
    fold, a per-user min (the first-seen lane of head-checked
    cohort_matrix), and a bounded-grid prefix sum (the cumulative
    lane of late_data_watermark).

    Scale shape: per-batch (user, day) dedup partials cut the volume
    before ONE coarse user shuffle; each user's group emits one row
    per distinct day plus one first-day marker, a tiny (day) Sum
    folds the grid, and the running total is a single-task prefix
    sum over the bounded day grid (every first_day is a grid day, so
    summing n_new over grid days ≤ d counts exactly the users with
    first_day ≤ d). Output: (day, n_active, n_new, n_cum)."""
    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def pair_partials(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        key = np.unique(u * 1_000_000 + d)  # day fits well under 1e6
        uu, dd = key // 1_000_000, key % 1_000_000
        return pa.table(
            {
                "user": pa.array(uu, pa.int64()),
                "day": pa.array(dd, pa.int64()),
                "part": pa.array(uu % N_COARSE_PARTS, pa.int64()),
            }
        )

    def per_part(part_tbl: pa.Table) -> pa.Table:
        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        d = part_tbl.column("day").to_numpy(zero_copy_only=False)
        key = np.unique(u * 1_000_000 + d)  # re-dedup across batches
        uu, dd = key // 1_000_000, key % 1_000_000
        # key is user-major sorted, so each user's first grid day is
        # the first element of its run
        first = np.concatenate(([True], uu[1:] != uu[:-1]))
        g_day, g_act = np.unique(dd, return_counts=True)
        n_day, n_new = np.unique(dd[first], return_counts=True)
        new_map = dict(zip(n_day.tolist(), n_new.tolist()))
        return pa.table(
            {
                "day": pa.array(g_day, pa.int64()),
                "a": pa.array(g_act.astype(np.int64), pa.int64()),
                "nw": pa.array(
                    [new_map.get(x, 0) for x in g_day.tolist()], pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    def finalize(grid: pa.Table) -> pa.Table:
        d = grid.column("day").to_numpy(zero_copy_only=False)
        a = grid.column("a_p").to_numpy(zero_copy_only=False)
        nw = grid.column("nw_p").to_numpy(zero_copy_only=False)
        order = np.argsort(d)
        d, a, nw = d[order], a[order], nw[order]
        return pa.table(
            {
                "day": pa.array(d, pa.int64()),
                "n_active": pa.array(a, pa.int64()),
                "n_new": pa.array(nw, pa.int64()),
                "n_cum": pa.array(np.cumsum(nw).astype(np.int64), pa.int64()),
            }
        )

    def const_key(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "k", pa.array(np.zeros(len(batch), np.int64), pa.int64())
        )

    return (
        ds.map_batches(pair_partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            _Sum("a", alias_name="a_p"), _Sum("nw", alias_name="nw_p")
        )
        .map_batches(const_key, batch_format="pyarrow")
        .groupby("k")
        .map_groups(
            lambda t: finalize(t.drop_columns(["k"])), batch_format="pyarrow"
        )
    )


def delta_agg_merge(sf_dir: str) -> "ray.data.Dataset":
    """Incremental view maintenance (IVM) with a RETRACTION
    changelog — the streaming-upsert emission class (Flink /
    differential-dataflow style): the (day, event_type) count view is
    'materialized' from the base slice (event_id % 10 != 0), a late
    delta slice (event_id % 10 == 0) arrives, and the operator emits
    ONLY the changelog a downstream consumer needs — one '-' row
    retracting each touched group's old value (when it existed) and
    one '+' row asserting the new value. Untouched groups emit
    nothing: changelog volume is ∝ |delta|, never ∝ |view| — the
    whole point of IVM. Tail-seated by design: the grid fold is
    pivot_daily's head-adjacent shape, and the emit is the changelog
    half of scd2_merge's upsert class.

    Scale shape: ONE read of the union stream — each batch folds to
    (day, type, n_base, n_delta) partials, one tiny two-lane Sum on
    the bounded grid, and a vectorized filter emits the two changelog
    rows per delta-touched group. Output: (day, event_type, op, n)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type"],
    )

    def grid_partials(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        days = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        is_delta = (
            batch.column("event_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            % 10
            == 0
        )
        g = (
            pd.DataFrame(
                {
                    "event_type": et,
                    "day": days,
                    "nb": (~is_delta).astype(np.int64),
                    "nd": is_delta.astype(np.int64),
                }
            )
            .groupby(["event_type", "day"], sort=False)
            .agg(nb=("nb", "sum"), nd=("nd", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
                "nb": pa.array(g["nb"].to_numpy().astype(np.int64), pa.int64()),
                "nd": pa.array(g["nd"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def changelog(batch: pa.Table) -> pa.Table:
        d = batch.column("day").to_numpy(zero_copy_only=False)
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        nb = batch.column("nb_p").to_numpy(zero_copy_only=False)
        nd = batch.column("nd_p").to_numpy(zero_copy_only=False)
        touched = nd > 0
        retract = touched & (nb > 0)
        out_day = np.concatenate([d[retract], d[touched]])
        out_et = np.concatenate([et[retract], et[touched]])
        out_op = ["-"] * int(retract.sum()) + ["+"] * int(touched.sum())
        out_n = np.concatenate([nb[retract], (nb + nd)[touched]])
        return pa.table(
            {
                "day": pa.array(out_day, pa.int64()),
                "event_type": pa.array(out_et, pa.string()),
                "op": pa.array(out_op, pa.string()),
                "n": pa.array(out_n.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(grid_partials, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(
            _Sum("nb", alias_name="nb_p"), _Sum("nd", alias_name="nd_p")
        )
        .map_batches(changelog, batch_format="pyarrow")
    )


EWMA_SCALE = 1_000_000  # fixed-point scale for the halflife-1 EWMA


def ewma_daily(sf_dir: str) -> "ray.data.Dataset":
    """Exponentially weighted moving average of the daily event count
    per type, halflife one step: E_1 = n_1·S, E_t = (E_{t-1} +
    n_t·S) // 2 in fixed-point integers (S = 10^6) — the smoothing
    recursion itself is DEFINED over integers, so the result is
    bit-exact in any engine (a float (1−α)^t closed form is neither
    order- nor libm-independent). The trend line behind every
    "smoothed daily volume" dashboard panel.

    Scale shape: the heavy part — daily counts from raw events — is
    the distributed fold (per-batch (type, day, n) partials, one
    bounded-grid groupby); the recursion then runs per type inside
    map_groups over the TINY daily grid (one row per calendar day —
    thousands of rows however big the corpus). Output:
    (event_type, day, n, ewma_fp)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def day_partials(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        days = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        g = (
            pd.DataFrame({"event_type": et, "day": days, "n": 1})
            .groupby(["event_type", "day"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def ewma(grp: pa.Table) -> pa.Table:
        day = grp.column("day").to_numpy(zero_copy_only=False)
        n = grp.column("n_p").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(day)
        day, n = day[order], n[order]
        e = np.empty(len(n), np.int64)
        acc = int(n[0]) * EWMA_SCALE
        e[0] = acc
        for i in range(1, len(n)):
            acc = (acc + int(n[i]) * EWMA_SCALE) // 2
            e[i] = acc
        return pa.table(
            {
                "event_type": grp.column("event_type"),
                "day": pa.array(day, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "ewma_fp": pa.array(e, pa.int64()),
            }
        )

    return (
        ds.map_batches(day_partials, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(_Sum("n", alias_name="n_p"))
        .groupby("event_type")
        .map_groups(ewma, batch_format="pyarrow")
    )


def seasonality_dow(sf_dir: str) -> "ray.data.Dataset":
    """Day-of-week seasonal index per event type — for each (type,
    weekday) the mean daily count relative to the type's overall mean
    daily count, in exact basis points: index_bp = S_d·n·10000 //
    (n_d·S) over PRESENT days (days where the type has ≥1 event), all
    integer arithmetic. Weekday 0 = Monday via pure epoch-day math
    ((day+3) % 7 — 1970-01-01 was a Thursday), no engine calendar
    functions. The weekly-cycle panel next to ewma_daily's trend
    line.

    Scale shape: the same bounded (type, day) grid fold as
    ewma_daily; the weekday pivot and the share arithmetic run on the
    grid, and the output is ≤ 7 rows per type. Output: (event_type,
    dow, n_days, total, index_bp)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def day_partials(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        days = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        g = (
            pd.DataFrame({"event_type": et, "day": days, "n": 1})
            .groupby(["event_type", "day"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def index_bp(grp: pa.Table) -> pa.Table:
        day = grp.column("day").to_numpy(zero_copy_only=False)
        n = grp.column("n_p").to_numpy(zero_copy_only=False).astype(np.int64)
        dow = (day + 3) % 7
        total_all = int(n.sum())
        n_all = len(day)
        rows = []
        for d in np.unique(dow):
            m = dow == d
            s_d, n_d = int(n[m].sum()), int(m.sum())
            rows.append(
                (int(d), n_d, s_d, s_d * n_all * 10000 // (n_d * total_all))
            )
        return pa.table(
            {
                "event_type": pa.array(
                    [grp.column("event_type")[0].as_py()] * len(rows),
                    pa.string(),
                ),
                "dow": pa.array([r[0] for r in rows], pa.int64()),
                "n_days": pa.array([r[1] for r in rows], pa.int64()),
                "total": pa.array([r[2] for r in rows], pa.int64()),
                "index_bp": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    return (
        ds.map_batches(day_partials, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(_Sum("n", alias_name="n_p"))
        .groupby("event_type")
        .map_groups(index_bp, batch_format="pyarrow")
    )


def cusum_drift(sf_dir: str) -> "ray.data.Dataset":
    """Two-sided CUSUM changepoint score over the per-type daily
    volume series — the classic drift alarm: with deviations scaled
    to integers (dev_t = n_t·n_days − total, so the mean is exactly
    zero without a division), the positive CUSUM max(0, S+dev)
    recursion reduces to cum_t − min(0, running-min cum) and the
    negative side to max(0, running-max cum) − cum_t: pure prefix
    scans, no recursion, every value an exact int64. Reports per type
    the peak excursion each side and the FIRST day attaining it —
    where the changepoint alarm fires. Tail-seated by design:
    ewma_daily's grid fold with cumulative-extrema scans in place of
    the smoothing recursion.

    Scale shape: the distributed fold is the bounded (type, day)
    grid; the scans run per type over the tiny grid inside
    map_groups. Output: (event_type, n_days, max_pos_cusum, day_pos,
    max_neg_cusum, day_neg)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def day_partials(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        days = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        g = (
            pd.DataFrame({"event_type": et, "day": days, "n": 1})
            .groupby(["event_type", "day"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def scan(grp: pa.Table) -> pa.Table:
        day = grp.column("day").to_numpy(zero_copy_only=False)
        n = grp.column("n_p").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(day)
        day, n = day[order], n[order]
        nd, tot = len(n), int(n.sum())
        dev = n * nd - tot
        cum = np.cumsum(dev)
        rmin = np.minimum(np.minimum.accumulate(cum), 0)
        rmax = np.maximum(np.maximum.accumulate(cum), 0)
        pos = cum - rmin
        neg = rmax - cum
        ip = int(np.argmax(pos))
        ineg = int(np.argmax(neg))
        return pa.table(
            {
                "event_type": pa.array(
                    [grp.column("event_type")[0].as_py()], pa.string()
                ),
                "n_days": pa.array([nd], pa.int64()),
                "max_pos_cusum": pa.array([int(pos[ip])], pa.int64()),
                "day_pos": pa.array([int(day[ip])], pa.int64()),
                "max_neg_cusum": pa.array([int(neg[ineg])], pa.int64()),
                "day_neg": pa.array([int(day[ineg])], pa.int64()),
            }
        )

    return (
        ds.map_batches(day_partials, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(_Sum("n", alias_name="n_p"))
        .groupby("event_type")
        .map_groups(scan, batch_format="pyarrow")
    )


SESSION_SWEEP_MIN = (5, 15, 30, 60)


def session_timeout_sweep(sf_dir: str) -> "ray.data.Dataset":
    """Sessionization parameter sensitivity — the sweep an analyst
    runs BEFORE fixing the idle timeout: for each candidate gap
    threshold (5/15/30/60 min), the exact total session count, all
    four from ONE pass (sessions(θ) = n_users + #gaps > θ, so the
    per-user fold just bins its sorted gaps against the four
    thresholds). Tail-seated by design: sessionize's per-user
    grouping emitting a 4-row grid instead of sessions.

    Scale shape: one user-keyed groupby (the group fits — one user's
    events), a vectorized gap-bin fold per group, and a ≤4-row sum.
    Output: (timeout_min, n_sessions)."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    thresh_us = np.array([m * 60_000_000 for m in SESSION_SWEEP_MIN], np.int64)

    def per_user(grp: pa.Table) -> pa.Table:
        t = grp.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = grp.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((eid, t))
        t = t[order]
        gaps = np.diff(t)
        n_sessions = 1 + (gaps[None, :] > thresh_us[:, None]).sum(axis=1)
        return pa.table(
            {
                "timeout_min": pa.array(
                    np.array(SESSION_SWEEP_MIN, np.int64), pa.int64()
                ),
                "n": pa.array(n_sessions.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("timeout_min")
        .aggregate(_Sum("n", alias_name="n_sessions"))
    )


def activity_streaks(sf_dir: str) -> "ray.data.Dataset":
    """Consecutive-day activity streaks — the engagement metric
    behind every 'N-day streak' badge: maximal runs of consecutive
    active days per user (gaps-and-islands: island id = day − rank
    within user), reported as the exact streak-length histogram with
    the number of streaks and of distinct users owning one of that
    exact length. Tail-seated by design: event_runs' islands on the
    user-day grid instead of the event stream.

    Scale shape: the raw stream folds per-batch to distinct (user,
    day) partials → one (user, day) groupby dedups → per-user
    map_groups (a user's DAYS are bounded by the calendar) emits its
    streak lengths → per-batch histogram partials → a bounded
    (streak_len) grid. Output: (streak_len, n_streaks, n_users)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def ud_partials(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        days = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        g = pd.DataFrame({"u": uid, "d": days}).drop_duplicates()
        return pa.table(
            {
                "u": pa.array(g["u"].to_numpy().astype(np.int64), pa.int64()),
                "d": pa.array(g["d"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def per_user(grp: pa.Table) -> pa.Table:
        d = np.sort(
            np.unique(grp.column("d").to_numpy(zero_copy_only=False))
        )
        u = int(grp.column("u")[0].as_py())
        island = d - np.arange(len(d), dtype=np.int64)
        _, counts = np.unique(island, return_counts=True)
        lens, n_streaks = np.unique(counts, return_counts=True)
        return pa.table(
            {
                "streak_len": pa.array(lens.astype(np.int64), pa.int64()),
                "n_streaks": pa.array(
                    n_streaks.astype(np.int64), pa.int64()
                ),
                "n_users": pa.array(
                    np.ones(len(lens), np.int64), pa.int64()
                ),
                "uid": pa.array(np.full(len(lens), u, np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(ud_partials, batch_format="pyarrow")
        .groupby(["u", "d"])
        .aggregate(_Sum("d", alias_name="dummy"))
        .groupby("u")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("streak_len")
        .aggregate(
            _Sum("n_streaks", alias_name="n_streaks"),
            _Sum("n_users", alias_name="n_users"),
        )
    )


def user_behavior_twins(sf_dir: str) -> "ray.data.Dataset":
    """Behavioral-twin detection — users with IDENTICAL event-type
    profiles (the exact (type → count) multiset), the
    entity-resolution smell test for bot farms / duplicate accounts:
    profiles canonicalize to 'type:count|…' strings sorted by type,
    hash, and cluster; the histogram reports how many clusters of
    each size exist and how many users sit in them — the size = 1 row
    counts the unique-profile users (the healthy bulk), the size ≥ 2
    rows are the twins. Tail-seated by design:
    linkage_scores' canonical-key idea on the behavioral axis, with
    dedup_cluster_sizes' histogram fold.

    Scale shape: per-batch (user, type, n) partials → ONE groupby
    (user, type) → per-user map_groups canonicalizes (a user's TYPE
    set is bounded) → a profile-hash groupby sizes the clusters → a
    bounded histogram grid. Output: (cluster_size, n_clusters,
    n_users)."""
    import hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def ut_partials(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        g = (
            pd.DataFrame({"u": uid, "t": et, "n": 1})
            .groupby(["u", "t"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "u": pa.array(g["u"].to_numpy().astype(np.int64), pa.int64()),
                "t": pa.array(g["t"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def profile(grp: pa.Table) -> pa.Table:
        t = grp.column("t").to_pylist()
        n = grp.column("n_p").to_pylist()
        canon = "|".join(
            f"{tt}:{nn}" for tt, nn in sorted(zip(t, n))
        )
        return pa.table(
            {
                "h": pa.array(
                    [hashlib.md5(canon.encode()).hexdigest()], pa.string()
                ),
                "one": pa.array([1], pa.int64()),
            }
        )

    def hist(batch: pa.Table) -> pa.Table:
        sizes = batch.column("size").to_numpy(zero_copy_only=False)
        u = np.unique(sizes)
        return pa.table(
            {
                "cluster_size": pa.array(u.astype(np.int64), pa.int64()),
                "n_clusters": pa.array(
                    np.array([(sizes == x).sum() for x in u], np.int64),
                    pa.int64(),
                ),
                "n_users": pa.array(
                    np.array([(sizes == x).sum() * x for x in u], np.int64),
                    pa.int64(),
                ),
            }
        )

    grid = (
        ds.map_batches(ut_partials, batch_format="pyarrow")
        .groupby(["u", "t"])
        .aggregate(_Sum("n", alias_name="n_p"))
        .groupby("u")
        .map_groups(profile, batch_format="pyarrow")
        .groupby("h")
        .aggregate(_Sum("one", alias_name="size"))
        .map_batches(hist, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(
            _Sum("n_clusters", alias_name="n_clusters"),
            _Sum("n_users", alias_name="n_users"),
        )
        .take_all()  # bounded histogram; typed even when EMPTY (the
        # no-twins corpus is the common healthy case)
    )
    return pa.table(
        {
            "cluster_size": pa.array(
                [int(r["cluster_size"]) for r in grid], pa.int64()
            ),
            "n_clusters": pa.array(
                [int(r["n_clusters"]) for r in grid], pa.int64()
            ),
            "n_users": pa.array(
                [int(r["n_users"]) for r in grid], pa.int64()
            ),
        }
    )


def conversion_by_engagement(sf_dir: str) -> "ray.data.Dataset":
    """Conversion rate by engagement band — the funnel-analytics
    cross-cut: users bucketed by the log2 band of their total event
    count (band = bit_length(n), so the bucketing is exact integers
    and scale-free), conversion = has ≥ 1 'purchase' event; per band
    the user count, converters, and rate in basis points. The panel
    that answers 'does engagement actually drive conversion, and
    where does it saturate'. Tail-seated by design: hist_quantiles'
    log2 banding on a per-user aggregate + a two-flag fold.

    Scale shape: per-batch (user, n, converted) partials → ONE
    groupby(user) completes both → per-batch band partials → a ≤64-
    row grid. Output: (band, n_lo, n_users, n_converted, rate_bp)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        g = (
            pd.DataFrame({"u": uid, "n": 1, "c": (et == "purchase").astype(np.int64)})
            .groupby("u", sort=False)
            .agg(n=("n", "sum"), c=("c", "max"))
            .reset_index()
        )
        return pa.table(
            {
                "u": pa.array(g["u"].to_numpy().astype(np.int64), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def band_fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n_p").to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch.column("c_p").to_numpy(zero_copy_only=False) > 0
        band = np.zeros(len(n), np.int64)
        nn = n.copy()
        while (nn > 0).any():
            band[nn > 0] += 1
            nn >>= 1
        u = np.unique(band)
        return pa.table(
            {
                "band": pa.array(u, pa.int64()),
                "n_users": pa.array(
                    np.array([(band == b).sum() for b in u], np.int64),
                    pa.int64(),
                ),
                "n_converted": pa.array(
                    np.array([c[band == b].sum() for b in u], np.int64),
                    pa.int64(),
                ),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        band = batch.column("band").to_numpy(zero_copy_only=False)
        nu = batch.column("n_users_p").to_numpy(zero_copy_only=False)
        nc = batch.column("n_converted_p").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band": pa.array(band.astype(np.int64), pa.int64()),
                "n_lo": pa.array(
                    (1 << np.maximum(band - 1, 0)).astype(np.int64), pa.int64()
                ),
                "n_users": pa.array(nu.astype(np.int64), pa.int64()),
                "n_converted": pa.array(nc.astype(np.int64), pa.int64()),
                "rate_bp": pa.array(nc * 10000 // nu, pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("u")
        .aggregate(_Sum("n", alias_name="n_p"), _Max("c", alias_name="c_p"))
        .map_batches(band_fold, batch_format="pyarrow")
        .groupby("band")
        .aggregate(
            _Sum("n_users", alias_name="n_users_p"),
            _Sum("n_converted", alias_name="n_converted_p"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


CHURN_W_US = 7 * 86_400_000_000
CHURN_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01: the feature clock


def churn_feature_labels(sf_dir: str) -> "ray.data.Dataset":
    """Churn training-set materialization — the label-and-feature op
    every training-data pipeline ends with: per user, event counts in
    weeks 1-3 of the observation month, distinct active days in that
    window, and the LABEL churned = no events from day 21 on. The
    week windows are fixed epoch ranges off the 2024-01-01 feature
    clock, so features and label derive from pure integer compares —
    and the label window is disjoint from the feature windows (no
    leakage by construction, the property leakage_split audits).
    Tail-seated by design: retention_7d's windowing as a wide
    feature row instead of a cohort fold.

    Scale shape: per-batch per-user window partials → ONE
    groupby(user) sums features and Max-merges the label-window
    flag; output is one row per user. Output: (user_id, n_w1, n_w2,
    n_w3, active_days_w13, churned)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def week_day(batch: pa.Table):
        uid = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        off = t - CHURN_EPOCH_US
        return uid, off // CHURN_W_US, off // 86_400_000_000

    def count_partials(batch: pa.Table) -> pa.Table:
        uid, week, _day = week_day(batch)
        g = (
            pd.DataFrame(
                {
                    "u": uid,
                    "w1": (week == 0).astype(np.int64),
                    "w2": (week == 1).astype(np.int64),
                    "w3": (week == 2).astype(np.int64),
                    "late": (week >= 3).astype(np.int64),
                }
            )
            .groupby("u", sort=False)
            .agg(
                w1=("w1", "sum"), w2=("w2", "sum"), w3=("w3", "sum"),
                late=("late", "max"),
            )
            .reset_index()
        )
        n = len(g)
        return pa.table(
            {
                "u": pa.array(g["u"].to_numpy().astype(np.int64), pa.int64()),
                "w1": pa.array(g["w1"].to_numpy().astype(np.int64), pa.int64()),
                "w2": pa.array(g["w2"].to_numpy().astype(np.int64), pa.int64()),
                "w3": pa.array(g["w3"].to_numpy().astype(np.int64), pa.int64()),
                "late": pa.array(
                    g["late"].to_numpy().astype(np.int64), pa.int64()
                ),
                "ad": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def day_pairs(batch: pa.Table) -> pa.Table:
        uid, week, day = week_day(batch)
        keep = week <= 2
        g = pd.DataFrame({"u": uid[keep], "d": day[keep]}).drop_duplicates()
        return pa.table(
            {
                "u": pa.array(g["u"].to_numpy().astype(np.int64), pa.int64()),
                "d": pa.array(g["d"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def day_rows(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        n = len(u)
        z = np.zeros(n, np.int64)
        return pa.table(
            {
                "u": pa.array(u.astype(np.int64), pa.int64()),
                "w1": pa.array(z, pa.int64()),
                "w2": pa.array(z, pa.int64()),
                "w3": pa.array(z, pa.int64()),
                "late": pa.array(z, pa.int64()),
                "ad": pa.array(np.ones(n, np.int64), pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        late = batch.column("late_p").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch.column("u"),
                "n_w1": batch.column("w1_p"),
                "n_w2": batch.column("w2_p"),
                "n_w3": batch.column("w3_p"),
                "active_days_w13": batch.column("ad_p"),
                "churned": pa.array(
                    (late == 0).astype(np.int64), pa.int64()
                ),
            }
        )

    days = (
        ds.map_batches(day_pairs, batch_format="pyarrow")
        .groupby(["u", "d"])
        .aggregate(_Sum("d", alias_name="dummy"))
        .map_batches(day_rows, batch_format="pyarrow")
    )
    return (
        ds.map_batches(count_partials, batch_format="pyarrow")
        .union(days)
        .groupby("u")
        .aggregate(
            _Sum("w1", alias_name="w1_p"),
            _Sum("w2", alias_name="w2_p"),
            _Sum("w3", alias_name="w3_p"),
            _Max("late", alias_name="late_p"),
            _Sum("ad", alias_name="ad_p"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def ohlc_daily(sf_dir: str) -> "ray.data.Dataset":
    """OHLC candles — open/high/low/close of the event value per
    (type, day) in exact cents, the canonical financial/telemetry
    downsample: open and close are the value at the FIRST and LAST
    (ts, event_id) of the day (the deterministic tiebreak every
    ordered op here uses), high/low are the extremes. Tail-seated by
    design: pivot_daily's grid with order-aware endpoints merged
    through a second bounded fold.

    Scale shape: each batch folds to at most one partial row per
    (type, day) carrying its own endpoints and extremes; a
    groupby-map_groups over the bounded grid merges partials by
    comparing (ts, event_id) keys — no row-level shuffle, no sort.
    Output: (event_type, day, open_c, high_c, low_c, close_c)."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        t = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        day = t // 86_400_000_000
        df = pd.DataFrame(
            {"et": et, "day": day, "t": t, "eid": eid, "c": cents}
        ).sort_values(["t", "eid"])
        g = df.groupby(["et", "day"], sort=False).agg(
            ft=("t", "first"), fe=("eid", "first"), oc=("c", "first"),
            lt=("t", "last"), le=("eid", "last"), cc=("c", "last"),
            hi=("c", "max"), lo=("c", "min"),
        ).reset_index()
        return pa.table(
            {
                "event_type": pa.array(g["et"], pa.string()),
                "day": pa.array(g["day"].to_numpy().astype(np.int64), pa.int64()),
                "ft": pa.array(g["ft"].to_numpy().astype(np.int64), pa.int64()),
                "fe": pa.array(g["fe"].to_numpy().astype(np.int64), pa.int64()),
                "oc": pa.array(g["oc"].to_numpy().astype(np.int64), pa.int64()),
                "lt": pa.array(g["lt"].to_numpy().astype(np.int64), pa.int64()),
                "le": pa.array(g["le"].to_numpy().astype(np.int64), pa.int64()),
                "cc": pa.array(g["cc"].to_numpy().astype(np.int64), pa.int64()),
                "hi": pa.array(g["hi"].to_numpy().astype(np.int64), pa.int64()),
                "lo": pa.array(g["lo"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def merge(grp: pa.Table) -> pa.Table:
        ft = grp.column("ft").to_numpy(zero_copy_only=False)
        fe = grp.column("fe").to_numpy(zero_copy_only=False)
        oc = grp.column("oc").to_numpy(zero_copy_only=False)
        lt = grp.column("lt").to_numpy(zero_copy_only=False)
        le = grp.column("le").to_numpy(zero_copy_only=False)
        cc = grp.column("cc").to_numpy(zero_copy_only=False)
        i_open = int(np.lexsort((fe, ft))[0])
        i_close = int(np.lexsort((-le, -lt))[0])
        return pa.table(
            {
                "event_type": pa.array(
                    [grp.column("event_type")[0].as_py()], pa.string()
                ),
                "day": pa.array(
                    [int(grp.column("day")[0].as_py())], pa.int64()
                ),
                "open_c": pa.array([int(oc[i_open])], pa.int64()),
                "high_c": pa.array(
                    [int(grp.column("hi").to_numpy(zero_copy_only=False).max())],
                    pa.int64(),
                ),
                "low_c": pa.array(
                    [int(grp.column("lo").to_numpy(zero_copy_only=False).min())],
                    pa.int64(),
                ),
                "close_c": pa.array([int(cc[i_close])], pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .map_groups(merge, batch_format="pyarrow")
    )


def event_position_profile(sf_dir: str) -> "ray.data.Dataset":
    """Stream-position profile per event type — WHERE in a user's
    (ts, event_id)-ordered stream each type typically occurs:
    per-event relative position (pos−1)·10⁴ // (len−1) (0 = first
    event, 10⁴ = last; single-event streams count as 0), folded to
    per-type sums and the mean in exact basis points. The
    signup-early / purchase-late ordering this surfaces is the
    sanity check behind every funnel definition. Tail-seated by
    design: sessionize's per-user ordering folded to a grid instead
    of sessions.

    Scale shape: one user-keyed groupby (the group fits), a
    vectorized rank fold per user, a ≤|types|-row grid. Output:
    (event_type, n_events, mean_relpos_bp)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def per_user(grp: pa.Table) -> pa.Table:
        t = grp.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = grp.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        et = np.asarray(grp.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, t))
        et = et[order]
        n = len(et)
        relpos = (
            (np.arange(n, dtype=np.int64) * 10_000 // (n - 1))
            if n > 1
            else np.zeros(n, np.int64)
        )
        g = (
            pd.DataFrame({"event_type": et, "n": 1, "rp": relpos})
            .groupby("event_type", sort=False)
            .agg(n=("n", "sum"), rp=("rp", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
                "rp": pa.array(g["rp"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("n_p").to_numpy(zero_copy_only=False)
        rp = batch.column("rp_p").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n_events": pa.array(n.astype(np.int64), pa.int64()),
                "mean_relpos_bp": pa.array(rp // n, pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            _Sum("n", alias_name="n_p"), _Sum("rp", alias_name="rp_p")
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


CONV_PERCENTS = (50, 90, 99)  # latency percentiles reported


def conversion_latency(sf_dir: str) -> "pa.Table":
    """Signup→purchase conversion latency percentiles — per user,
    the gap in whole seconds from the FIRST signup (by (ts,
    event_id) order) to the first purchase STRICTLY AFTER it in the
    same order, folded to exact p50/p90/p99 at rank ceil(q·n/100)
    over converted users. The time-to-convert distribution every
    funnel dashboard quotes; unlike error_recovery_time's per-
    occurrence log₂ buckets this is a per-USER two-anchor alignment
    with exact percentiles. Tail-seated by design: funnel_stages'
    anchors + global_quantiles' rank rule.

    Scale shape: one user-keyed groupby (a user's stream fits), a
    vectorized two-searchsorted fold per user emitting ≤1 latency
    row, then a (lat_s) VALUE-GRID reduce — driver reads the grid
    (bounded by the corpus time range in seconds), never user rows.
    Output: (q, n_converted, latency_s); empty typed table when no
    user converts."""
    from ray.data.aggregate import Count as _Count

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def per_user(grp: pa.Table) -> pa.Table:
        t = grp.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = grp.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        et = np.asarray(grp.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, t))
        et = et[order]
        ts_o = t[order]
        empty = pa.table({"lat_s": pa.array([], pa.int64())})
        sidx = np.flatnonzero(et == "signup")
        if len(sidx) == 0:
            return empty
        s = int(sidx[0])
        pidx = np.flatnonzero(et == "purchase")
        pidx = pidx[pidx > s]
        if len(pidx) == 0:
            return empty
        lat = int((ts_o[int(pidx[0])] - ts_o[s]) // 1_000_000)
        return pa.table({"lat_s": pa.array([lat], pa.int64())})

    grid = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("lat_s")
        .aggregate(_Count(alias_name="cnt"))
        .take_all()  # bounded: the latency-seconds value grid
    )
    rows = sorted((int(r["lat_s"]), int(r["cnt"])) for r in grid)
    n = sum(c for _, c in rows)
    qs: list[int] = []
    lats: list[int] = []
    if n:
        cum = 0
        pending = sorted(CONV_PERCENTS)
        ranks = {q: (q * n + 99) // 100 for q in CONV_PERCENTS}
        for v, c in rows:
            cum += c
            while pending and cum >= ranks[pending[0]]:
                qs.append(pending.pop(0))
                lats.append(v)
    return pa.table(
        {
            "q": pa.array(qs, pa.int64()),
            "n_converted": pa.array([n] * len(qs), pa.int64()),
            "latency_s": pa.array(lats, pa.int64()),
        }
    )


SNB_LAG_DAYS = 7   # seasonal-naive lag: forecast(d) = actual(d − 7)


def seasonal_naive_backtest(sf_dir: str) -> "pa.Table":
    """Seasonal-naive forecast backtest — per event type, the MAE in
    exact cents of the forecast every capacity dashboard starts from:
    tomorrow's daily value total = the total one week ago
    (forecast(d) = actual(d − SNB_LAG_DAYS), zero when absent), swept
    over the full dense backtest window [min_day + 7, max_day]. The
    baseline number any fancier model must beat — and the missing
    BACKTEST half of the time-series family (ewma_daily smooths,
    trend_slopes fits, seasonality_dow profiles; none of them is
    scored). Tail-seated by design: pivot_daily's (type, day) grid
    self-aligned at lag 7.

    Scale shape: one (type, day) groupby builds the sparse grid; the
    lag join is the SAME grid re-keyed at d + 7 through one
    tagged-union co-partition (grid-sized, bounded by types × days —
    never row-sized); absent-absent days contribute |0 − 0| = 0 and
    need no rows; per-type day ranges broadcast from a #types-row
    read. Output: (event_type, n_days, total_abs_err_cents,
    mae_cents)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def day_partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        day = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"t": et, "d": day, "c": cents})
            .groupby(["t", "d"], sort=False)["c"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(g["t"], pa.string()),
                "d": pa.array(g["d"].to_numpy().astype(np.int64), pa.int64()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(day_partial, batch_format="pyarrow")
        .groupby(["event_type", "d"])
        .aggregate(_Sum("c", alias_name="c"))
    )
    ranges = {
        r["event_type"]: (int(r["mn"]), int(r["mx"]))
        for r in grid.groupby("event_type")
        .aggregate(_Min("d", alias_name="mn"), _Max("d", alias_name="mx"))
        .take_all()  # bounded: one row per type
    }
    rref = ray.put(ranges)

    def tagged(batch: pa.Table) -> pa.Table:
        rg = ray.get(rref)
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        d = batch.column("d").to_numpy(zero_copy_only=False)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        # actual side keyed at d, forecast side keyed at d + lag
        t2 = np.concatenate([et, et])
        dk = np.concatenate([d, d + SNB_LAG_DAYS])
        cv = np.concatenate([c, -c])  # |a − f| = |sum| since ≤1 row/side
        keep = np.array(
            [
                rg[t][0] + SNB_LAG_DAYS <= int(k) <= rg[t][1]
                for t, k in zip(t2, dk)
            ],
            dtype=bool,
        )
        return pa.table(
            {
                "event_type": pa.array(t2[keep], pa.string()),
                "dk": pa.array(dk[keep].astype(np.int64), pa.int64()),
                "v": pa.array(cv[keep].astype(np.int64), pa.int64()),
            }
        )

    def absfold(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "abs_err": pa.array(np.abs(v).astype(np.int64), pa.int64()),
            }
        )

    totals = {
        r["event_type"]: int(r["tot"])
        for r in grid.map_batches(tagged, batch_format="pyarrow")
        .groupby(["event_type", "dk"])
        .aggregate(_Sum("v", alias_name="v"))
        .map_batches(absfold, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(_Sum("abs_err", alias_name="tot"))
        .take_all()  # bounded: one row per type
    }
    types = sorted(
        t for t, (mn, mx) in ranges.items() if mx - mn >= SNB_LAG_DAYS
    )
    n_days = {t: ranges[t][1] - ranges[t][0] - SNB_LAG_DAYS + 1 for t in types}
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_days": pa.array([n_days[t] for t in types], pa.int64()),
            "total_abs_err_cents": pa.array(
                [totals.get(t, 0) for t in types], pa.int64()
            ),
            "mae_cents": pa.array(
                [totals.get(t, 0) // n_days[t] for t in types], pa.int64()
            ),
        }
    )


CHURN_HORIZON_DAYS = 7  # last event older than this vs corpus max = death


def km_risk_table(sf_dir: str) -> "pd.DataFrame":
    """Exact Kaplan-Meier risk table over per-user activity spans —
    the survival-analysis primitive none of the retention queries
    give: for every observed duration t (days between a user's first
    and last event), the number still at risk n(t) = #users with
    duration ≥ t, the deaths d(t) = users whose span ended there AND
    whose last event is older than CHURN_HORIZON_DAYS before the
    corpus max (observed churn), and the right-censored c(t) = spans
    ending at t that were still active at the observation boundary.
    S(t) = Π_{t'≤t} (1 − d/n) is exact rational arithmetic downstream
    — the output IS the product-limit estimator's sufficient
    statistic table (t_days, n_risk, d_events, c_censored).

    Scale shape: one cheap streaming Max over the pruned (ts) column
    fixes the observation boundary; per-batch np.reduceat min/max
    combiner per user, ONE user-keyed coarse co-partition finalizes
    each user's (first_day, last_day) — a user's partials never
    straddle parts — and collapses immediately to (duration, churned)
    value counts, so the final groupby(t_days) fold and the driver
    read are bounded by the corpus day span, not the user count; the
    suffix-sum n_risk is O(span) driver arithmetic (the mix_weights
    bounded-read contract)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def to_day(batch: pa.Table) -> pa.Table:
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "user": pa.array(u, pa.int64()),
                "day": pa.array(d, pa.int64()),
            }
        )

    days = ev.map_batches(to_day, batch_format="pyarrow")
    gmax_day = int(days.aggregate(_Max("day"))["max(day)"])
    cutoff = gmax_day - CHURN_HORIZON_DAYS

    def partial_minmax(batch: pa.Table) -> pa.Table:
        u = batch.column("user").to_numpy(zero_copy_only=False)
        d = batch.column("day").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        us, ds_ = u[order], d[order]
        uniq, start = np.unique(us, return_index=True)
        return pa.table(
            {
                "user": pa.array(uniq, pa.int64()),
                "lo": pa.array(np.minimum.reduceat(ds_, start), pa.int64()),
                "hi": pa.array(np.maximum.reduceat(ds_, start), pa.int64()),
                "part": pa.array(uniq % N_COARSE_PARTS, pa.int64()),
            }
        )

    def per_part(part_tbl: pa.Table) -> pa.Table:
        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        lo = part_tbl.column("lo").to_numpy(zero_copy_only=False)
        hi = part_tbl.column("hi").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        us, los, his = u[order], lo[order], hi[order]
        _, start = np.unique(us, return_index=True)
        flo = np.minimum.reduceat(los, start)
        fhi = np.maximum.reduceat(his, start)
        dur = fhi - flo
        churned = (fhi < cutoff).astype(np.int64)
        key, cnt = np.unique(dur * 2 + churned, return_counts=True)
        t = key >> 1
        ch = key & 1
        c = cnt.astype(np.int64)
        return pa.table(
            {
                "t_days": pa.array(t, pa.int64()),
                "d_events": pa.array(np.where(ch == 1, c, 0), pa.int64()),
                "c_censored": pa.array(np.where(ch == 0, c, 0), pa.int64()),
            }
        )

    rows = (
        days.map_batches(partial_minmax, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby("t_days")
        .aggregate(
            _Sum("d_events", alias_name="d_events"),
            _Sum("c_censored", alias_name="c_censored"),
        )
        .take_all()  # bounded: <= corpus day span rows
    )
    df = pd.DataFrame(rows).sort_values("t_days", ignore_index=True)
    ends = (df["d_events"] + df["c_censored"]).to_numpy()
    df["n_risk"] = ends[::-1].cumsum()[::-1]
    for c in ["t_days", "n_risk", "d_events", "c_censored"]:
        df[c] = df[c].astype("int64")
    return df[["t_days", "n_risk", "d_events", "c_censored"]]


def cochran_armitage_trend(sf_dir: str) -> "pd.DataFrame":
    """Exact Cochran-Armitage trend sufficient statistics — does
    conversion rise MONOTONICALLY with engagement? The ordered
    companion to chi2_independence (which ignores band order) and the
    test-statistic layer conversion_by_engagement's rate panel lacks:
    with band score s = bit_length(events) (the same scale-free log2
    banding), the one output row (n_total, r_total, s_n, s2_n, s_r)
    yields T = N·Σs·r − R·Σs·n and
    z² = N·T² / (R(N−R)(N·Σs²n − (Σsn)²)) as exact rational
    arithmetic downstream. int64 headroom: s ≤ 64, so Σs²n ≤ 4096·N —
    safe to ~10¹⁴ users.

    Scale shape: the conversion_by_engagement fold verbatim — per-
    batch (user, n, converted) partials, ONE groupby(user) completes
    both, then per-batch score moments Sum-fold to the single row;
    no second exchange."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        conv = pa.compute.equal(
            batch.column("event_type"), "purchase"
        ).to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        us = uid[order]
        cs = conv[order].astype(np.int64)
        uniq, start = np.unique(us, return_index=True)
        return pa.table(
            {
                "u": pa.array(uniq, pa.int64()),
                "n": pa.array(
                    np.diff(np.append(start, len(us))).astype(np.int64),
                    pa.int64(),
                ),
                "c": pa.array(np.maximum.reduceat(cs, start), pa.int64()),
            }
        )

    def moments(batch: pa.Table) -> pa.Table:
        n = batch.column("n_p").to_numpy(zero_copy_only=False).astype(np.int64)
        c = (batch.column("c_p").to_numpy(zero_copy_only=False) > 0).astype(
            np.int64
        )
        s = np.zeros(len(n), np.int64)
        nn = n.copy()
        while (nn > 0).any():
            s[nn > 0] += 1
            nn >>= 1
        return pa.table(
            {
                "n_total": pa.array([len(n)], pa.int64()),
                "r_total": pa.array([int(c.sum())], pa.int64()),
                "s_n": pa.array([int(s.sum())], pa.int64()),
                "s2_n": pa.array([int((s * s).sum())], pa.int64()),
                "s_r": pa.array([int((s * c).sum())], pa.int64()),
            }
        )

    folded = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("u")
        .aggregate(_Sum("n", alias_name="n_p"), _Max("c", alias_name="c_p"))
        .map_batches(moments, batch_format="pyarrow")
        .aggregate(
            _Sum("n_total", alias_name="n_total"),
            _Sum("r_total", alias_name="r_total"),
            _Sum("s_n", alias_name="s_n"),
            _Sum("s2_n", alias_name="s2_n"),
            _Sum("s_r", alias_name="s_r"),
        )
    )
    return pd.DataFrame([{k: int(v) for k, v in folded.items()}])[
        ["n_total", "r_total", "s_n", "s2_n", "s_r"]
    ]


CIDX_BUCKETS = 128  # per-axis grid for the concordance exchanges
CIDX_LOCAL_MAX = 2_000_000  # user rows below which c-index runs width-1


def _cidx_local(tbl: "pa.Table") -> "pa.Table":
    """All concordance sufficient statistics over the whole per-user
    (t, e, r) table in one vectorized task — the width-1 leg of
    harrell_c_index's size-adaptive plan. Identical semantics:
    concordant = left-flagged inversions of r under (t, r) sort
    (equal-t pairs sort r-ascending and contribute nothing),
    comparable = per-distinct-t exclusive flag cumsum, tied_risk =
    per-(r, t) counts with a segment-wise exclusive cumsum."""
    from .analytics import _flagged_inv_count

    t = tbl.column("t").to_numpy(zero_copy_only=False)
    e = tbl.column("e").to_numpy(zero_copy_only=False)
    r = tbl.column("r").to_numpy(zero_copy_only=False)
    order = np.lexsort((r, t))
    conc = _flagged_inv_count(r[order], e[order])
    ts_, es_ = t[order], e[order]
    _, start, cnt = np.unique(ts_, return_index=True, return_counts=True)
    ft = np.add.reduceat(es_, start) if len(ts_) else np.array([], np.int64)
    exc = np.concatenate(([0], np.cumsum(ft)[:-1])) if len(ft) else ft
    comparable = int((cnt.astype(np.int64) * exc).sum())
    o2 = np.lexsort((t, r))
    rs, ts2, es2 = r[o2], t[o2], e[o2]
    tied = 0
    if len(rs):
        key_change = np.empty(len(rs), bool)
        key_change[0] = True
        key_change[1:] = (rs[1:] != rs[:-1]) | (ts2[1:] != ts2[:-1])
        st = np.flatnonzero(key_change)
        cn = np.diff(np.append(st, len(rs))).astype(np.int64)
        frt = np.add.reduceat(es2, st)
        rseg = rs[st]
        cum = np.concatenate(([0], np.cumsum(frt)[:-1]))
        rstart_change = np.empty(len(rseg), bool)
        rstart_change[0] = True
        rstart_change[1:] = rseg[1:] != rseg[:-1]
        seg_base = cum[np.maximum.accumulate(
            np.where(rstart_change, np.arange(len(rseg)), 0)
        )]
        tied = int((cn * (cum - seg_base)).sum())
    return pa.table(
        {
            "comparable": pa.array([comparable], pa.int64()),
            "concordant": pa.array([conc], pa.int64()),
            "tied_risk": pa.array([tied], pa.int64()),
        }
    )


def harrell_c_index(sf_dir: str) -> "pd.DataFrame":
    """Exact Harrell concordance-index sufficient statistics — does
    higher engagement predict SHORTER survival? — over the
    km_risk_table population: duration = days between a user's first
    and last event, event flag = churned (span ended before the
    7-day horizon), risk score = total event count. One integer row
    (comparable, concordant, tied_risk): comparable pairs are
    (t_a < t_b, e_a = 1) — the pair is usable only when the shorter
    span actually ended in an observed event; concordant when the
    shorter-lived user carries the strictly higher risk;
    C = (concordant + tied_risk/2) / comparable is exact rational
    arithmetic downstream. The survival-model-evaluation leg that
    closes the km_risk_table story (risk table = the estimator,
    C-index = how well a score orders it).

    Scale shape (kendall_tau's 2-axis grid decomposition made
    asymmetric by the event flag): per-user fold → slim
    (dur, event, risk) table materialized once with (tb, rc) value-
    grid cells attached (equal values share a bucket on each axis).
    Pairs split exactly: (a) different t-bucket AND different r-cell
    — read off the bounded CIDX_BUCKETS² FLAGGED count grid (E1
    matrix: flagged rows in earlier t-buckets with higher r-cells;
    Fpre vector: flagged rows in earlier t-buckets, for comparable);
    (b) same t-bucket — per-bucket `_flagged_inv_count` of risk under
    (t, r) sort (equal-t pairs sort r-ascending and contribute
    nothing; comparable local = per-distinct-t exclusive-cumsum
    arithmetic); (c) different t-bucket, same r-cell —
    per-r-cell `_flagged_inv_count` of risk under (tb, r) sort
    (same-bucket pairs contribute nothing, strictness across buckets
    is guaranteed because equal durations share a bucket); tied_risk
    lives entirely inside one r-cell and folds from per-(r, t) counts
    with a segment-wise exclusive cumsum. Three int64-only exchanges
    past the user fold; driver holds only the bounded grid."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS
    from .analytics import _flagged_inv_count

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def to_day(batch: pa.Table) -> pa.Table:
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {"user": pa.array(u, pa.int64()), "day": pa.array(d, pa.int64())}
        )

    days = ev.map_batches(to_day, batch_format="pyarrow")
    gmax_day = int(days.aggregate(_Max("day"))["max(day)"])
    cutoff = gmax_day - CHURN_HORIZON_DAYS

    def partial_user(batch: pa.Table) -> pa.Table:
        u = batch.column("user").to_numpy(zero_copy_only=False)
        d = batch.column("day").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        us, ds_ = u[order], d[order]
        uniq, start = np.unique(us, return_index=True)
        return pa.table(
            {
                "user": pa.array(uniq, pa.int64()),
                "lo": pa.array(np.minimum.reduceat(ds_, start), pa.int64()),
                "hi": pa.array(np.maximum.reduceat(ds_, start), pa.int64()),
                "n": pa.array(
                    np.diff(np.append(start, len(us))).astype(np.int64),
                    pa.int64(),
                ),
                "part": pa.array(uniq % N_COARSE_PARTS, pa.int64()),
            }
        )

    def final_user(part_tbl: pa.Table) -> pa.Table:
        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        lo = part_tbl.column("lo").to_numpy(zero_copy_only=False)
        hi = part_tbl.column("hi").to_numpy(zero_copy_only=False)
        n = part_tbl.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        us, los, his, ns = u[order], lo[order], hi[order], n[order]
        _, start = np.unique(us, return_index=True)
        flo = np.minimum.reduceat(los, start)
        fhi = np.maximum.reduceat(his, start)
        risk = np.add.reduceat(ns, start)
        return pa.table(
            {
                "t": pa.array(fhi - flo, pa.int64()),
                "e": pa.array((fhi < cutoff).astype(np.int64), pa.int64()),
                "r": pa.array(risk.astype(np.int64), pa.int64()),
            }
        )

    peru = (
        days.map_batches(partial_user, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final_user, batch_format="pyarrow")
        .materialize()
    )

    # Width-1 escape: below CIDX_LOCAL_MAX slim user rows the grid
    # plan's exchanges are pure fixed cost — one task.
    if peru.count() < CIDX_LOCAL_MAX:
        local = peru.repartition(1).map_batches(
            _cidx_local, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        for c in local.columns:
            local[c] = local[c].astype("int64")
        return local[["comparable", "concordant", "tied_risk"]]

    lohi = peru.aggregate(_Min("t"), _Max("t"), _Min("r"), _Max("r"))
    tlo, thi = int(lohi["min(t)"]), int(lohi["max(t)"])
    rlo, rhi = int(lohi["min(r)"]), int(lohi["max(r)"])
    wt = (thi - tlo) // CIDX_BUCKETS + 1
    wr = (rhi - rlo) // CIDX_BUCKETS + 1

    def add_cells(batch: pa.Table) -> pa.Table:
        t = batch.column("t").to_numpy(zero_copy_only=False)
        r = batch.column("r").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "t": batch.column("t"),
                "e": batch.column("e"),
                "r": batch.column("r"),
                "tb": pa.array((t - tlo) // wt, pa.int64()),
                "rc": pa.array((r - rlo) // wr, pa.int64()),
            }
        )

    keyed = peru.map_batches(add_cells, batch_format="pyarrow").materialize()

    def cell_partial(batch: pa.Table) -> pa.Table:
        tb = batch.column("tb").to_numpy(zero_copy_only=False)
        rc = batch.column("rc").to_numpy(zero_copy_only=False)
        e = batch.column("e").to_numpy(zero_copy_only=False)
        cell = tb * CIDX_BUCKETS + rc
        u, inv = np.unique(cell, return_inverse=True)
        flg = np.zeros(len(u), np.int64)
        np.add.at(flg, inv, e)
        return pa.table(
            {
                "cell": pa.array(u, pa.int64()),
                "nf": pa.array(flg, pa.int64()),
            }
        )

    grid_rows = (
        keyed.map_batches(cell_partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(_Sum("nf", alias_name="nf"))
        .take_all()  # bounded: <= CIDX_BUCKETS^2 rows
    )
    C1 = np.zeros((CIDX_BUCKETS, CIDX_BUCKETS), np.int64)
    for row in grid_rows:
        C1[int(row["cell"]) // CIDX_BUCKETS, int(row["cell"]) % CIDX_BUCKETS] = (
            int(row["nf"])
        )
    # P1[tb, rc] = flagged rows in t-buckets < tb at r-cell rc
    P1 = np.vstack(
        [np.zeros((1, CIDX_BUCKETS), np.int64), np.cumsum(C1, 0)[:-1]]
    )
    # E1[tb, rc] = flagged rows in t-buckets < tb with r-cell > rc
    E1 = np.cumsum(P1[:, ::-1], 1)[:, ::-1]
    E1 = np.hstack([E1[:, 1:], np.zeros((CIDX_BUCKETS, 1), np.int64)])
    Fpre = P1.sum(axis=1)  # flagged rows in t-buckets < tb
    e1_ref = ray.put(E1)
    fpre_ref = ray.put(Fpre)

    def tb_stats(group: pa.Table) -> pa.Table:
        t = group.column("t").to_numpy(zero_copy_only=False)
        e = group.column("e").to_numpy(zero_copy_only=False)
        r = group.column("r").to_numpy(zero_copy_only=False)
        rc = group.column("rc").to_numpy(zero_copy_only=False)
        tb = int(group.column("tb")[0].as_py())
        order = np.lexsort((r, t))
        conc = _flagged_inv_count(r[order], e[order])
        # local comparable: per distinct t, exclusive cumsum of flags
        ts_, es_ = t[order], e[order]
        _, start, cnt = np.unique(ts_, return_index=True, return_counts=True)
        ft = np.add.reduceat(es_, start)
        exc = np.concatenate(([0], np.cumsum(ft)[:-1]))
        comp_local = int((cnt.astype(np.int64) * exc).sum())
        comp_cross = int(ray.get(fpre_ref)[tb]) * len(t)
        conc_cross = int(ray.get(e1_ref)[tb][rc].sum())
        return pa.table(
            {
                "comparable": pa.array([comp_local + comp_cross], pa.int64()),
                "concordant": pa.array([conc + conc_cross], pa.int64()),
                "tied_risk": pa.array([0], pa.int64()),
            }
        )

    def rc_stats(group: pa.Table) -> pa.Table:
        tb = group.column("tb").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        e = group.column("e").to_numpy(zero_copy_only=False)
        r = group.column("r").to_numpy(zero_copy_only=False)
        order = np.lexsort((r, tb))
        conc = _flagged_inv_count(r[order], e[order])
        # tied_risk: per (r, t) counts, exclusive flag cumsum within r
        o2 = np.lexsort((t, r))
        rs, ts_, es_ = r[o2], t[o2], e[o2]
        key_change = np.empty(len(rs), bool)
        key_change[0] = True
        key_change[1:] = (rs[1:] != rs[:-1]) | (ts_[1:] != ts_[:-1])
        start = np.flatnonzero(key_change)
        cnt = np.diff(np.append(start, len(rs))).astype(np.int64)
        frt = np.add.reduceat(es_, start)
        rseg = rs[start]
        cum = np.concatenate(([0], np.cumsum(frt)[:-1]))
        rstart_change = np.empty(len(rseg), bool)
        rstart_change[0] = True
        rstart_change[1:] = rseg[1:] != rseg[:-1]
        seg_base = cum[np.maximum.accumulate(
            np.where(rstart_change, np.arange(len(rseg)), 0)
        )]
        exc = cum - seg_base
        tied = int((cnt * exc).sum())
        return pa.table(
            {
                "comparable": pa.array([0], pa.int64()),
                "concordant": pa.array([conc], pa.int64()),
                "tied_risk": pa.array([tied], pa.int64()),
            }
        )

    stats = (
        keyed.groupby("tb")
        .map_groups(tb_stats, batch_format="pyarrow")
        .union(keyed.groupby("rc").map_groups(rc_stats, batch_format="pyarrow"))
        .aggregate(
            _Sum("comparable", alias_name="comparable"),
            _Sum("concordant", alias_name="concordant"),
            _Sum("tied_risk", alias_name="tied_risk"),
        )
    )
    return pd.DataFrame([{k: int(v) for k, v in stats.items()}])[
        ["comparable", "concordant", "tied_risk"]
    ]


def dp_sensitivity_audit(sf_dir: str) -> "pd.DataFrame":
    """User-contribution bounding audit for differentially-private
    releases — the fourth privacy leg after the k-anonymity /
    l-diversity / t-closeness triad (those gate a PUBLISHED table;
    this calibrates the NOISE for aggregate releases): one integer
    row with the exact sensitivity drivers of the two standard event
    releases. For the daily-active-users vector, user-level L0/L1
    sensitivity = the most days any one user touches
    (max_days_active); for the daily-event-counts vector, L∞ per
    cell = the most events one user contributes to a single day
    (max_events_one_day) and L1 = the most events one user
    contributes in total (max_events_total). Each is exactly the
    clipping bound a DP release must enforce (or the worst case it
    must budget for) — Δf for Laplace/Gaussian calibration is read
    straight off this row.

    Scale shape: one pass emits per-batch (user, day) partial counts,
    ONE user-keyed co-partition completes per-(user, day) counts and
    collapses immediately to per-user (days_active, max_day_events,
    total_events) — a user's rows never straddle parts — then a
    4-number Max/Count fold. Driver reads one row."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def partial_ud(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        key = u * (1 << 21) + d
        uk, cnt = np.unique(key, return_counts=True)
        uu = uk >> 21
        return pa.table(
            {
                "user": pa.array(uu, pa.int64()),
                "day": pa.array(uk & ((1 << 21) - 1), pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
                "part": pa.array(uu % N_COARSE_PARTS, pa.int64()),
            }
        )

    def per_part(part_tbl: pa.Table) -> pa.Table:
        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        d = part_tbl.column("day").to_numpy(zero_copy_only=False)
        n = part_tbl.column("n").to_numpy(zero_copy_only=False)
        key = u * (1 << 21) + d
        order = np.argsort(key, kind="stable")
        ks, ns = key[order], n[order]
        uk, start = np.unique(ks, return_index=True)
        per_ud = np.add.reduceat(ns, start)  # events per (user, day)
        uu = uk >> 21
        uuniq, ustart = np.unique(uu, return_index=True)
        days_active = np.diff(np.append(ustart, len(uu))).astype(np.int64)
        max_day = np.maximum.reduceat(per_ud, ustart)
        total = np.add.reduceat(per_ud, ustart)
        return pa.table(
            {
                "n_users": pa.array([len(uuniq)], pa.int64()),
                "max_days_active": pa.array(
                    [int(days_active.max())], pa.int64()
                ),
                "max_events_one_day": pa.array([int(max_day.max())], pa.int64()),
                "max_events_total": pa.array([int(total.max())], pa.int64()),
            }
        )

    folded = (
        ev.map_batches(partial_ud, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .aggregate(
            _Sum("n_users", alias_name="n_users"),
            _Max("max_days_active", alias_name="max_days_active"),
            _Max("max_events_one_day", alias_name="max_events_one_day"),
            _Max("max_events_total", alias_name="max_events_total"),
        )
    )
    return pd.DataFrame([{k: int(v) for k, v in folded.items()}])[
        ["n_users", "max_days_active", "max_events_one_day",
         "max_events_total"]
    ]


def competing_risks(sf_dir: str) -> "pd.DataFrame":
    """Exact competing-risks (cumulative-incidence) risk table — the
    cause-specific extension of km_risk_table: per user, time runs
    from the FIRST event to the first 'purchase' OR the first
    'error', whichever comes first (purchase wins exact ties —
    deterministic), censored at the last event when neither occurs.
    Output per distinct duration: (t_days, n_risk, d_purchase,
    d_error, c_censored) — the Aalen-Johansen estimator's sufficient
    statistics, where treating the competing cause as censoring (the
    classic mistake a single-cause KM makes) would overstate both
    incidences; this table makes the right estimator exact rational
    arithmetic downstream.

    Scale shape: km_risk_table's fold with two masked firsts — per
    batch, per user: min day (any), min purchase day / min error day
    under a BIG sentinel, max day, all via one sort + reduceat; ONE
    user-keyed co-partition finalizes and collapses straight to
    (duration, cause) value counts, so the final fold and the driver
    suffix-sum stay bounded by the corpus day span."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    BIG = np.int64(1 << 40)
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        et = batch.column("event_type")
        isp = pa.compute.equal(et, "purchase").to_numpy(zero_copy_only=False)
        ise = pa.compute.equal(et, "error").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        us, ds_ = u[order], d[order]
        dp = np.where(isp[order], ds_, BIG)
        de = np.where(ise[order], ds_, BIG)
        uniq, start = np.unique(us, return_index=True)
        return pa.table(
            {
                "user": pa.array(uniq, pa.int64()),
                "lo": pa.array(np.minimum.reduceat(ds_, start), pa.int64()),
                "hi": pa.array(np.maximum.reduceat(ds_, start), pa.int64()),
                "fp": pa.array(np.minimum.reduceat(dp, start), pa.int64()),
                "fe": pa.array(np.minimum.reduceat(de, start), pa.int64()),
                "part": pa.array(uniq % N_COARSE_PARTS, pa.int64()),
            }
        )

    def per_part(part_tbl: pa.Table) -> pa.Table:
        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        us = u[order]
        _, start = np.unique(us, return_index=True)
        lo = np.minimum.reduceat(
            part_tbl.column("lo").to_numpy(zero_copy_only=False)[order], start
        )
        hi = np.maximum.reduceat(
            part_tbl.column("hi").to_numpy(zero_copy_only=False)[order], start
        )
        fp = np.minimum.reduceat(
            part_tbl.column("fp").to_numpy(zero_copy_only=False)[order], start
        )
        fe = np.minimum.reduceat(
            part_tbl.column("fe").to_numpy(zero_copy_only=False)[order], start
        )
        # cause: purchase wins exact ties; censored when neither seen
        cause = np.where(
            (fp < BIG) & (fp <= fe), 1, np.where(fe < BIG, 2, 0)
        ).astype(np.int64)
        t = np.where(cause == 1, fp, np.where(cause == 2, fe, hi)) - lo
        key, cnt = np.unique(t * 4 + cause, return_counts=True)
        td = key >> 2
        cs = key & 3
        c = cnt.astype(np.int64)
        return pa.table(
            {
                "t_days": pa.array(td, pa.int64()),
                "d_purchase": pa.array(np.where(cs == 1, c, 0), pa.int64()),
                "d_error": pa.array(np.where(cs == 2, c, 0), pa.int64()),
                "c_censored": pa.array(np.where(cs == 0, c, 0), pa.int64()),
            }
        )

    rows = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby("t_days")
        .aggregate(
            _Sum("d_purchase", alias_name="d_purchase"),
            _Sum("d_error", alias_name="d_error"),
            _Sum("c_censored", alias_name="c_censored"),
        )
        .take_all()  # bounded: <= corpus day span rows
    )
    df = pd.DataFrame(rows).sort_values("t_days", ignore_index=True)
    ends = (df["d_purchase"] + df["d_error"] + df["c_censored"]).to_numpy()
    df["n_risk"] = ends[::-1].cumsum()[::-1]
    for c in ["t_days", "n_risk", "d_purchase", "d_error", "c_censored"]:
        df[c] = df[c].astype("int64")
    return df[["t_days", "n_risk", "d_purchase", "d_error", "c_censored"]]


QINI_BUCKETS = 256  # score grid for the uplift decile rank pass


def qini_uplift_deciles(sf_dir: str) -> "pd.DataFrame":
    """Exact Qini/uplift decile table — the uplift-model evaluation
    none of the classifier-eval queries (roc_points, calibration_bins,
    decile_table) cover, because uplift is a DIFFERENCE of two
    response curves: with the deterministic synthetic assignment
    treat = user_id % 2 and score = total event count (the
    'engagement model'), users rank by (score DESC, user_id ASC) into
    exact deciles 1 + ⌊rn0·10/n⌋, and each decile reports
    (n_treat, n_ctrl, conv_treat, conv_ctrl). The Qini curve's point
    at decile k — cumulative conv_t − conv_c·(N_t/N_c) — is exact
    rational arithmetic over the cumulative sums downstream; a
    negative tail is the signature of a model that targets
    persuadables first.

    Scale shape: the rfm_segments single-metric rank pass verbatim —
    per-user fold to a slim 4-int64 table, bounded QINI_BUCKETS count
    grid, exclusive prefix bases broadcast once, bucket-local lexsort
    with the (−score, user) tie-break — then a ≤10-row decile grid
    Sum fold. Two exchanges past the user fold."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        conv = pa.compute.equal(
            batch.column("event_type"), "purchase"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(u, kind="stable")
        us, cs = u[order], conv[order]
        uniq, start = np.unique(us, return_index=True)
        return pa.table(
            {
                "user": pa.array(uniq, pa.int64()),
                "n": pa.array(
                    np.diff(np.append(start, len(us))).astype(np.int64),
                    pa.int64(),
                ),
                "c": pa.array(np.maximum.reduceat(cs, start), pa.int64()),
            }
        )

    users = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("user")
        .aggregate(_Sum("n", alias_name="score"), _Max("c", alias_name="conv"))
        .materialize()
    )
    n_total = users.count()

    from ray.data.aggregate import Min as _Min

    lohi = users.aggregate(_Min("score"), _Max("score"))
    # descending rank: negate the score, the rfm_segments convention
    lo = -int(lohi["max(score)"])
    hi = -int(lohi["min(score)"])
    width = (hi - lo) // QINI_BUCKETS + 1

    def keyed(batch: pa.Table) -> pa.Table:
        k = -batch.column("score").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user": batch.column("user").cast(pa.int64()),
                "conv": batch.column("conv").cast(pa.int64()),
                "_k": pa.array(k, pa.int64()),
                "_kb": pa.array((k - lo) // width, pa.int64()),
            }
        )

    rows = users.map_batches(keyed, batch_format="pyarrow")

    def kb_partial(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("_kb").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {
                "kb": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    grid = (
        rows.map_batches(kb_partial, batch_format="pyarrow")
        .groupby("kb")
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= QINI_BUCKETS rows
    )
    counts = np.zeros(QINI_BUCKETS, np.int64)
    for r in grid:
        counts[int(r["kb"])] = int(r["n"])
    base = np.concatenate(([0], np.cumsum(counts)[:-1]))
    bcast = ray.put(base)

    def decile_part(group: pa.Table) -> pa.Table:
        pre = ray.get(bcast)
        kb = int(group.column("_kb")[0].as_py())
        k = group.column("_k").to_numpy(zero_copy_only=False)
        u = group.column("user").to_numpy(zero_copy_only=False)
        conv = group.column("conv").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, k))
        rn0 = np.empty(len(k), np.int64)
        rn0[order] = pre[kb] + np.arange(len(k), dtype=np.int64)
        dec = 1 + rn0 * 10 // n_total
        treat = (u % 2).astype(np.int64)
        cell, inv = np.unique(dec * 2 + treat, return_inverse=True)
        nn = np.bincount(inv).astype(np.int64)
        cc = np.zeros(len(cell), np.int64)
        np.add.at(cc, inv, conv)
        d = cell >> 1
        t = cell & 1
        return pa.table(
            {
                "decile": pa.array(d, pa.int64()),
                "n_treat": pa.array(np.where(t == 1, nn, 0), pa.int64()),
                "n_ctrl": pa.array(np.where(t == 0, nn, 0), pa.int64()),
                "conv_treat": pa.array(np.where(t == 1, cc, 0), pa.int64()),
                "conv_ctrl": pa.array(np.where(t == 0, cc, 0), pa.int64()),
            }
        )

    folded = (
        rows.groupby("_kb")
        .map_groups(decile_part, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(
            _Sum("n_treat", alias_name="n_treat"),
            _Sum("n_ctrl", alias_name="n_ctrl"),
            _Sum("conv_treat", alias_name="conv_treat"),
            _Sum("conv_ctrl", alias_name="conv_ctrl"),
        )
        .take_all()  # bounded: <= 10 rows
    )
    df = pd.DataFrame(folded).sort_values("decile", ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["decile", "n_treat", "n_ctrl", "conv_treat", "conv_ctrl"]]


ATTR_WINDOW_DAYS = 14  # attribution lookback; weight halves per day


def time_decay_attribution(sf_dir: str) -> "pd.DataFrame":
    """Exact time-decay multi-touch attribution — for every purchase,
    every preceding touchpoint (view / click / signup) within the
    14-day lookback earns credit 2^(14−gap_days), halving per day of
    separation, all exact integers (the classic time-decay model with
    its geometric weights kept in the power-of-two lattice so no
    float ever appears). Output per touch type: (event_type, n_pairs,
    credit_sum) — last-touch and linear models are both degenerate
    readings of this table, and the per-type credit shares are exact
    rationals downstream. Day-grain semantics (a same-day touch
    credits at full weight regardless of intra-day order) — mirrored
    verbatim by the oracle.

    Scale shape: one pass folds per-batch (user, type, day) touch
    counts and (user, day) purchase counts (both combiner-bounded by
    active days, never raw events); ONE user-keyed co-partition joins
    them WITHOUT a pairwise join: per part, touch keys pack to
    user·2²¹+day and for each gap g ∈ [0, 14] one vectorized
    searchsorted matches purchase-day keys shifted by g — 15·|types|
    searchsorted calls per part, each O(rows log rows), instead of a
    touches×purchases exchange. Credits fold in a ≤|types|-row Sum."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    TOUCH_TYPES = ("click", "signup", "view")  # sorted for output
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        et = batch.column("event_type").to_pandas().to_numpy(dtype=object)
        tcode = np.full(len(u), -1, np.int64)
        for i, t in enumerate(TOUCH_TYPES):
            tcode[et == t] = i
        tcode[et == "purchase"] = len(TOUCH_TYPES)
        keep = tcode >= 0
        key = (u[keep] * (1 << 21) + d[keep]) * 8 + tcode[keep]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uk, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
                "part": pa.array(
                    (uk >> 3 >> 21) % N_COARSE_PARTS, pa.int64()
                ),
            }
        )

    def per_part(part_tbl: pa.Table) -> pa.Table:
        key = part_tbl.column("key").to_numpy(zero_copy_only=False)
        n = part_tbl.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        ks, ns = key[order], n[order]
        uk, start = np.unique(ks, return_index=True)
        cnt = np.add.reduceat(ns, start)  # final per (user, day, code)
        code = uk & 7
        ud = uk >> 3  # user * 2^21 + day
        is_p = code == len(TOUCH_TYPES)
        pd_keys, p_cnt = ud[is_p], cnt[is_p]
        out_t, out_pairs, out_credit = [], [], []
        for i, t in enumerate(TOUCH_TYPES):
            sel = code == i
            t_keys, t_cnt = ud[sel], cnt[sel]
            pairs = 0
            credit = 0
            for g in range(ATTR_WINDOW_DAYS + 1):
                want = pd_keys - g  # same user, g days earlier
                pos = np.searchsorted(t_keys, want)
                pos = np.clip(pos, 0, len(t_keys) - 1) if len(t_keys) else pos
                if len(t_keys) == 0:
                    break
                hit = t_keys[pos] == want
                prod = (p_cnt[hit] * t_cnt[pos[hit]]).sum()
                pairs += int(prod)
                credit += int(prod) * (1 << (ATTR_WINDOW_DAYS - g))
            out_t.append(t)
            out_pairs.append(pairs)
            out_credit.append(credit)
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "n_pairs": pa.array(out_pairs, pa.int64()),
                "credit_sum": pa.array(out_credit, pa.int64()),
            }
        )

    folded = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            _Sum("n_pairs", alias_name="n_pairs"),
            _Sum("credit_sum", alias_name="credit_sum"),
        )
        .take_all()  # bounded: <= |touch types| rows
    )
    df = pd.DataFrame(folded).sort_values("event_type", ignore_index=True)
    df = df[df["n_pairs"] > 0].reset_index(drop=True)
    for c in ["n_pairs", "credit_sum"]:
        df[c] = df[c].astype("int64")
    return df[["event_type", "n_pairs", "credit_sum"]]


def gorilla_dod_audit(sf_dir: str) -> "pd.DataFrame":
    """Exact delta-of-delta timestamp-encoding cost audit (the
    Gorilla/Prometheus TSDB layout) — the time-series member of the
    storage-audit family (rle / dict / front-coding / zonemap /
    bitmap cover value columns; this prices the TIMESTAMP stream):
    per event type, the exact bit cost of encoding each day block's
    sorted timestamps with the paper's dod bucket classes — '0'
    (1 bit) for dod = 0, '10'+7 (9 bits) for [−63, 64], '110'+9 (12)
    for [−255, 256], '1110'+12 (16) for [−2047, 2048], '1111'+32
    (36) otherwise — plus a 64-bit block header for the first
    timestamp. Output per type: (event_type, n_blocks, n_events,
    total_bits, bits_per_event_milli). High milli-bits flag a type
    whose arrivals are too irregular for dod compression — the
    storage planner's signal to bucket it differently.

    Scale shape: blocks ARE the parallel unit, exactly as in the real
    TSDB (Gorilla seals 2-hour blocks; we seal days): ONE
    co-partition on (type, day) gives each map_groups task one
    block — never a global per-type sort — where the cost is a
    sorted diff, a second diff, and one vectorized bucket
    searchsorted; per-block (bits, n) rows then fold in a
    ≤|types|-row Sum. Equal timestamps are order-insensitive (any
    sorted order yields the same delta multiset), so the cost is
    deterministic."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def keyed(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "t": pa.array(t, pa.int64()),
                "day": pa.array(t // DAY_US, pa.int64()),
            }
        )

    # dod bucket upper bounds (inclusive) and their bit costs
    _EDGES = np.array([-2047, -255, -63, 0, 1, 65, 257, 2049], np.int64)
    _COSTS = np.array([36, 16, 12, 9, 1, 9, 12, 16, 36], np.int64)

    def block_cost(group: pa.Table) -> pa.Table:
        et = group.column("event_type")[0].as_py()
        t = np.sort(group.column("t").to_numpy(zero_copy_only=False))
        n = len(t)
        if n == 1:
            bits = 64
        else:
            delta = np.diff(t)
            dod = np.diff(delta, prepend=delta[0] - 0)
            dod[0] = delta[0]  # first delta encodes against prev = 0
            bits = 64 + int(_COSTS[np.searchsorted(_EDGES, dod, "right")].sum())
        return pa.table(
            {
                "event_type": pa.array([et], pa.string()),
                "n_blocks": pa.array([1], pa.int64()),
                "n_events": pa.array([n], pa.int64()),
                "total_bits": pa.array([bits], pa.int64()),
            }
        )

    rows = (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .map_groups(block_cost, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            _Sum("n_blocks", alias_name="n_blocks"),
            _Sum("n_events", alias_name="n_events"),
            _Sum("total_bits", alias_name="total_bits"),
        )
        .take_all()  # bounded: one row per event type
    )
    df = pd.DataFrame(rows).sort_values("event_type", ignore_index=True)
    for c in ["n_blocks", "n_events", "total_bits"]:
        df[c] = df[c].astype("int64")
    df["bits_per_event_milli"] = (
        df["total_bits"] * 1000 // df["n_events"]
    ).astype("int64")
    return df[
        ["event_type", "n_blocks", "n_events", "total_bits",
         "bits_per_event_milli"]
    ]


ISO_BINS = 32  # equal-width score bins for the isotonic fit


def isotonic_calibration(sf_dir: str) -> "pd.DataFrame":
    """Exact isotonic (PAV) calibration of conversion on engagement —
    the monotone regression calibration_bins' raw ECE table is not:
    with users binned by equal-width score bins (score = event count,
    ISO_BINS bins over [0, max]), the isotonic fit at bin i is the
    classic max-min closed form of pool-adjacent-violators,
    fit_i = max_{j≤i} min_{k≥j} (Σpos / Σn over bins j..k) — the
    unique L2 projection of the bin conversion rates onto the
    monotone cone, weighted by bin size. Output per non-empty bin:
    (bin, n_bin, pos_bin, fit_milli) with fit_milli = ⌊1000·fit⌋ —
    the banded-integer discipline; the floor is representative-
    invariant (equal rationals floor equally), so no tie-break
    ambiguity can reach the output.

    Scale shape: the conversion_by_engagement user fold, one Max for
    the bin width, then a ≤ISO_BINS-row grid to the driver where the
    O(B³) max-min runs in exact Python Fractions — bounded by the
    BIN COUNT, never the user count; the oracle mirrors with HUGEINT
    cross-multiplied NOT EXISTS argmins over the same grid."""
    from fractions import Fraction

    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        conv = pa.compute.equal(
            batch.column("event_type"), "purchase"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(u, kind="stable")
        us, cs = u[order], conv[order]
        uniq, start = np.unique(us, return_index=True)
        return pa.table(
            {
                "user": pa.array(uniq, pa.int64()),
                "n": pa.array(
                    np.diff(np.append(start, len(us))).astype(np.int64),
                    pa.int64(),
                ),
                "c": pa.array(np.maximum.reduceat(cs, start), pa.int64()),
            }
        )

    users = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("user")
        .aggregate(_Sum("n", alias_name="score"), _Max("c", alias_name="conv"))
        .materialize()
    )
    smax = int(users.aggregate(_Max("score"))["max(score)"])

    def bin_partial(batch: pa.Table) -> pa.Table:
        sc = batch.column("score").to_numpy(zero_copy_only=False)
        cv = (batch.column("conv").to_numpy(zero_copy_only=False) > 0).astype(
            np.int64
        )
        b = sc * ISO_BINS // (smax + 1)
        u, inv = np.unique(b, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        pos = np.zeros(len(u), np.int64)
        np.add.at(pos, inv, cv)
        return pa.table(
            {
                "bin": pa.array(u, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    grid = (
        users.map_batches(bin_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(_Sum("n", alias_name="n"), _Sum("pos", alias_name="pos"))
        .take_all()  # bounded: <= ISO_BINS rows
    )
    grid.sort(key=lambda r: int(r["bin"]))
    bins = [int(r["bin"]) for r in grid]
    ns = [int(r["n"]) for r in grid]
    ps = [int(r["pos"]) for r in grid]
    B = len(bins)
    # prefix sums -> avg over ordered bin positions j..k
    cn = np.concatenate(([0], np.cumsum(ns)))
    cp = np.concatenate(([0], np.cumsum(ps)))
    mins = []  # min_{k>=j} avg(j..k) per j
    for j in range(B):
        m = min(
            Fraction(int(cp[k + 1] - cp[j]), int(cn[k + 1] - cn[j]))
            for k in range(j, B)
        )
        mins.append(m)
    out = []
    for i in range(B):
        fit = max(mins[: i + 1])
        out.append(
            {
                "bin": bins[i],
                "n_bin": ns[i],
                "pos_bin": ps[i],
                "fit_milli": (1000 * fit.numerator) // fit.denominator,
            }
        )
    df = pd.DataFrame(out)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["bin", "n_bin", "pos_bin", "fit_milli"]]


def km_survival_curve(sf_dir: str) -> "pd.DataFrame":
    """The Kaplan-Meier product-limit curve itself, banded — the
    estimator km_risk_table supplies sufficient statistics for:
    S(t) = Π_{t'≤t} (1 − d/n) evaluated as the INTEGER recurrence
    s_milli(t) = s_milli(prev) · (n−d) // n from s = 1000, i.e. the
    survival probability in exact floored milli-units (true rational
    products have unbounded denominators; the banded recurrence IS
    the defined statistic, mirrored by the oracle's recursive CTE —
    the t_closeness flooring discipline applied sequentially).
    Output per observed duration: (t_days, n_risk, d_events,
    s_milli), monotone non-increasing by construction.

    Scale shape: the km_risk_table fold verbatim (one user-keyed
    co-partition, driver read bounded by the corpus day span); the
    recurrence is O(day span) driver arithmetic on the bounded
    table."""
    import pandas as pd

    base = km_risk_table(sf_dir)
    s = 1000
    out = []
    for _, row in base.iterrows():
        n, d = int(row["n_risk"]), int(row["d_events"])
        s = s * (n - d) // n
        out.append(
            {
                "t_days": int(row["t_days"]),
                "n_risk": n,
                "d_events": d,
                "s_milli": s,
            }
        )
    df = pd.DataFrame(out)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["t_days", "n_risk", "d_events", "s_milli"]]


ABSORB_STEPS = 3  # reach-horizon in transitions


def absorption_reach_milli(sf_dir: str) -> "pd.DataFrame":
    """Markov absorption toward 'purchase' — per starting event type,
    the banded probability of reaching a purchase within 1, 2, and 3
    transitions of the user-journey chain (event_transitions'
    consecutive-by-(ts, event_id) definition, purchase absorbing):
    the journey-planning readout raw transition counts don't give —
    'error' with a high 3-step reach is recoverable friction, a low
    one is a funnel exit. Banded by the sequential integer recurrence
    m_{k+1}(s) = (1000·C[s,purchase] + Σ_{t≠purchase} C[s,t]·m_k(t))
    // r[s] from m_0 = 0 — the km_survival_curve flooring discipline
    applied to a matrix recurrence; exact rational absorption needs
    unbounded denominators, the banded recurrence IS the defined
    statistic, mirrored verbatim by the oracle's three CTE steps.
    Output per non-absorbing type: (event_type, n_out, reach1_milli,
    reach2_milli, reach3_milli).

    Scale shape: one user-keyed co-partition orders each user's
    events and emits per-pair transition partials (a user's events
    never straddle parts); the ≤|types|² count matrix folds in one
    bounded groupby and the K×K recurrence is driver arithmetic —
    bounded by the type alphabet, never the event count."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_id", "user_id", "event_type"],
    )

    def keyed(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "user": pa.array(u, pa.int64()),
                "ts": batch.column("ts").cast(pa.int64()),
                "eid": batch.column("event_id").cast(pa.int64()),
                "event_type": batch.column("event_type"),
                "part": pa.array(u % N_COARSE_PARTS, pa.int64()),
            }
        )

    def per_part(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        t = part_tbl.column("ts").to_numpy(zero_copy_only=False)
        e = part_tbl.column("eid").to_numpy(zero_copy_only=False)
        et = part_tbl.column("event_type").to_pandas().to_numpy(dtype=object)
        order = np.lexsort((e, t, u))
        us, ets = u[order], et[order]
        same = us[1:] == us[:-1]
        prev, nxt = ets[:-1][same], ets[1:][same]
        keep = prev != "purchase"  # purchase is absorbing
        g = (
            pd.DataFrame({"prev": prev[keep], "nxt": nxt[keep], "n": 1})
            .groupby(["prev", "nxt"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "prev": pa.array(g["prev"], pa.string()),
                "nxt": pa.array(g["nxt"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby(["prev", "nxt"])
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= |types|^2 rows
    )
    import collections

    C: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    for r in grid:
        C[r["prev"]][r["nxt"]] += int(r["n"])
    states = sorted(C)
    rsum = {s: sum(C[s].values()) for s in states}
    m = {s: 0 for s in states}
    hist = []
    for _ in range(ABSORB_STEPS):
        m = {
            s: (
                1000 * C[s].get("purchase", 0)
                + sum(
                    C[s].get(t, 0) * m[t]
                    for t in states
                    if t != "purchase"
                )
            )
            // rsum[s]
            for s in states
        }
        hist.append(dict(m))
    df = pd.DataFrame(
        [
            {
                "event_type": s,
                "n_out": rsum[s],
                "reach1_milli": hist[0][s],
                "reach2_milli": hist[1][s],
                "reach3_milli": hist[2][s],
            }
            for s in states
        ]
    ).sort_values("event_type", ignore_index=True)
    for c in df.columns[1:]:
        df[c] = df[c].astype("int64")
    return df
