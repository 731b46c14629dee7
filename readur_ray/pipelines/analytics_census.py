"""Distribution censuses, storage-layout audits, and evaluation
curves (registry themes: stats, audits, plans). Split from
analytics.py round 5; wave order preserved. See README.md
"Registry taxonomy".
"""


from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from .analytics_core import (  # backward refs (split round 5)
    _cents, HLL_P, HLL_W, HLL_SUFFIX_MOD,
    _bit_length, _kanon_qi,
)
from .analytics_evals import (  # backward refs (split round 5)
    HLL_ALPHA_NUM, HLL_ALPHA_DEN_BASE, _inv_count,
)




_FD_SPECS = [
    # (name, table, lhs col, rhs col)
    ("nation_to_segment", "customer", "c_nationkey", "c_mktsegment"),
    ("priority_to_status", "orders", "o_orderpriority", "o_orderstatus"),
    ("lang_to_source", "documents", "lang", "source"),
    ("user_to_event_type", "events", "user_id", "event_type"),
]


def fd_violation_audit(sf_dir: str) -> "pd.DataFrame":
    """Functional-dependency violation audit — the dependency-
    profiling leg the column-wise profiler (profile_columns) and the
    constraint checker (data_quality_audit) don't cover: for each
    candidate FD lhs → rhs, the exact minimum number of rows whose
    rhs would have to change for the FD to hold
    (n_violations = n_rows − Σ_lhs max-rhs-count, the g₃ error of FD
    discovery à la TANE). Zero means the dependency holds exactly
    (a normalization opportunity); a small count is dirty data; a
    large one means no dependency. Output per FD:
    (fd_name, n_groups, n_rows, n_violations).

    Scale shape: per FD one combiner-bounded (lhs, rhs) count fold →
    per-lhs max and sum partials fold through a groupby(lhs) whose
    width is the LHS cardinality — counts, never rows, cross either
    exchange; the four FDs run as four independent bounded folds."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    out = []
    for name, table, lhs, rhs in _FD_SPECS:
        ds = ray.data.read_parquet(
            f"{sf_dir}/{table}.parquet", columns=[lhs, rhs]
        )

        def pair_partial(batch: pa.Table, lhs=lhs, rhs=rhs) -> pa.Table:
            g = batch.group_by([lhs, rhs]).aggregate([([], "count_all")])
            return pa.table(
                {
                    "lhs": g.column(lhs).cast(pa.string()),
                    "rhs": g.column(rhs).cast(pa.string()),
                    "n": g.column("count_all").cast(pa.int64()),
                }
            )

        per_lhs = (
            ds.map_batches(pair_partial, batch_format="pyarrow")
            .groupby(["lhs", "rhs"])
            .aggregate(_Sum("n", alias_name="n"))
            .groupby("lhs")
            .aggregate(
                _Sum("n", alias_name="n_rows"),
                _Max("n", alias_name="n_max"),
            )
        )

        def fold(batch: pa.Table) -> pa.Table:
            nr = batch.column("n_rows").to_numpy(zero_copy_only=False)
            nm = batch.column("n_max").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "g": pa.array([len(nr)], pa.int64()),
                    "r": pa.array([int(nr.sum())], pa.int64()),
                    "v": pa.array([int((nr - nm).sum())], pa.int64()),
                }
            )

        agg = per_lhs.map_batches(fold, batch_format="pyarrow").aggregate(
            _Sum("g", alias_name="g"),
            _Sum("r", alias_name="r"),
            _Sum("v", alias_name="v"),
        )
        out.append(
            {
                "fd_name": name,
                "n_groups": int(agg["g"]),
                "n_rows": int(agg["r"]),
                "n_violations": int(agg["v"]),
            }
        )
    df = pd.DataFrame(out).sort_values("fd_name", ignore_index=True)
    for c in ["n_groups", "n_rows", "n_violations"]:
        df[c] = df[c].astype("int64")
    return df[["fd_name", "n_groups", "n_rows", "n_violations"]]


QQ_BUCKETS = 256  # value grid for the quantile-drift selection


def qq_drift_deciles(sf_dir: str) -> "pd.DataFrame":
    """Exact quantile-quantile drift table — the decile VALUES of
    order totals in the first vs second half of the order-date range,
    side by side: wasserstein_drift integrates the gap and ks_drift
    finds its sup; this names the actual dollar values at each
    decile, the table a finance reviewer reads ('the p90 order grew
    $212'). Deciles are type-1 order statistics (the ⌈q·n/10⌉-th
    smallest cents value, 1-indexed) — exact selection, no
    interpolation. Output per decile 1-9:
    (decile, v_h1_cents, v_h2_cents, diff_cents).

    Scale shape (distributed SELECTION, one step past
    winsorized_stats' trimmed sums): a bounded (period, value-bucket)
    count grid locates each decile's bucket and within-bucket offset
    (equal values share a bucket); the second pass co-partitions ONLY
    the ≤ 18 boundary buckets, local-sorts each, and emits the
    requested order statistics — ≤ 18 small rows to the driver,
    never a global sort."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    DAY_US = 86_400_000_000
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    lohi_d = ds.aggregate(_Min("o_orderdate"), _Max("o_orderdate"))
    dlo = int(pd.Timestamp(lohi_d["min(o_orderdate)"]).value // 1000) // DAY_US
    dhi = int(pd.Timestamp(lohi_d["max(o_orderdate)"]).value // 1000) // DAY_US
    mid = (dlo + dhi) // 2  # first half: day <= mid

    def rows_fn(batch: pa.Table) -> pa.Table:
        day = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        v = _cents(batch.column("o_totalprice")).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "period": pa.array((day > mid).astype(np.int64), pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    rows = ds.map_batches(rows_fn, batch_format="pyarrow").materialize()
    lohi = rows.aggregate(_Min("v"), _Max("v"))
    vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
    wv = (vhi - vlo) // QQ_BUCKETS + 1

    def grid_partial(batch: pa.Table) -> pa.Table:
        p = batch.column("period").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        cell = p * QQ_BUCKETS + (v - vlo) // wv
        u, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    grid = (
        rows.map_batches(grid_partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= 2 * QQ_BUCKETS rows
    )
    counts = np.zeros((2, QQ_BUCKETS), np.int64)
    for r in grid:
        counts[int(r["cell"]) // QQ_BUCKETS, int(r["cell"]) % QQ_BUCKETS] = (
            int(r["n"])
        )
    # plan: per (period, bucket) -> list of (decile, within-offset)
    plan: dict[int, list] = {}
    for p in (0, 1):
        n = int(counts[p].sum())
        cum = np.cumsum(counts[p])
        for q in range(1, 10):
            k = -(-q * n // 10)  # ceil
            b = int(np.searchsorted(cum, k, side="left"))
            off = k - int(cum[b - 1] if b > 0 else 0)  # 1-indexed in bucket
            plan.setdefault(p * QQ_BUCKETS + b, []).append((q, off))
    plan_ref = ray.put(plan)

    def keyed(batch: pa.Table) -> pa.Table:
        pl = ray.get(plan_ref)
        p = batch.column("period").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        cell = p * QQ_BUCKETS + (v - vlo) // wv
        want = np.isin(cell, np.array(sorted(pl), np.int64))
        return pa.table(
            {
                "cell": pa.array(cell[want], pa.int64()),
                "v": pa.array(v[want], pa.int64()),
            }
        )

    def select_part(group: pa.Table) -> pa.Table:
        pl = ray.get(plan_ref)
        cell = int(group.column("cell")[0].as_py())
        v = np.sort(group.column("v").to_numpy(zero_copy_only=False))
        qs, vals = [], []
        for q, off in pl[cell]:
            qs.append(q)
            vals.append(int(v[off - 1]))
        return pa.table(
            {
                "period": pa.array(
                    [cell // QQ_BUCKETS] * len(qs), pa.int64()
                ),
                "decile": pa.array(qs, pa.int64()),
                "val": pa.array(vals, pa.int64()),
            }
        )

    picked = (
        rows.map_batches(keyed, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(select_part, batch_format="pyarrow")
        .take_all()  # bounded: <= 18 rows
    )
    vmap = {(int(r["period"]), int(r["decile"])): int(r["val"])
            for r in picked}
    out = [
        {
            "decile": q,
            "v_h1_cents": vmap[(0, q)],
            "v_h2_cents": vmap[(1, q)],
            "diff_cents": vmap[(1, q)] - vmap[(0, q)],
        }
        for q in range(1, 10)
    ]
    df = pd.DataFrame(out)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["decile", "v_h1_cents", "v_h2_cents", "diff_cents"]]


def runs_test(sf_dir: str) -> "pd.DataFrame":
    """Exact Wald-Wolfowitz runs test sufficient statistics over the
    daily order-count series — the randomness check the drift family
    doesn't make: with each day labeled above/below the series
    MEDIAN (exact type-1 median of the daily counts; median-equal
    days dropped, the classic convention), too FEW runs means
    clustering/trend, too MANY means oscillation; (n_runs, n_above,
    n_below) make E[R] and Var[R] exact rationals downstream. Output
    one row.

    Scale shape: one combiner-bounded fold to per-day counts (days,
    not orders, cross the exchange), then the median pick and the
    run scan are driver arithmetic over the bounded day span."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    DAY_US = 86_400_000_000
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        d = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        u, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {
                "day": pa.array(u, pa.int64()),
                "x": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("day")
        .aggregate(_Sum("x", alias_name="x"))
        .take_all()  # bounded: <= day span rows
    )
    df = pd.DataFrame(rows).sort_values("day", ignore_index=True)
    x = df["x"].to_numpy()
    n = len(x)
    med = int(np.sort(x)[(n + 1) // 2 - 1])  # type-1 median
    lab = np.where(x > med, 1, np.where(x < med, 0, -1))
    lab = lab[lab >= 0]
    n_above = int((lab == 1).sum())
    n_below = int((lab == 0).sum())
    n_runs = int(1 + (lab[1:] != lab[:-1]).sum()) if len(lab) else 0
    out = pd.DataFrame(
        [
            {
                "n_days": n,
                "median_x": med,
                "n_above": n_above,
                "n_below": n_below,
                "n_runs": n_runs,
            }
        ]
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


QMIG_BUCKETS = 256  # value grid for the migration rank passes


def quintile_migration(sf_dir: str) -> "pd.DataFrame":
    """Customer spend-quintile migration matrix — how customers move
    between spend quintiles from the first to the second half of the
    order-date range: the CRM churn/upsell readout rfm_segments'
    static snapshot cannot give. Within each half, ACTIVE customers
    rank by (total cents, custkey) into exact quintiles
    1 + ⌊rn0·5/n⌋ (the rfm convention); customers absent from a half
    take band 0, so the matrix diagonal is loyalty, the upper
    triangle is growth, row 0 is acquisition and column 0 is churn.
    Output per non-empty cell: (q_h1, q_h2, n_customers).

    Scale shape: one (custkey, half) cents fold; per half one
    bucket-grid rank pass over that half's active customers (bounded
    count grid, broadcast exclusive prefix bases, bucket-local
    (cents, custkey) lexsort); the two rank outputs co-partition on
    custkey (tagged union, never a join shuffle of wide rows) and
    collapse to the ≤36-cell matrix."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    DAY_US = 86_400_000_000
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    lohi_d = ds.aggregate(_Min("o_orderdate"), _Max("o_orderdate"))
    dlo = int(pd.Timestamp(lohi_d["min(o_orderdate)"]).value // 1000) // DAY_US
    dhi = int(pd.Timestamp(lohi_d["max(o_orderdate)"]).value // 1000) // DAY_US
    mid = (dlo + dhi) // 2

    def partials(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        v = _cents(batch.column("o_totalprice")).to_numpy(zero_copy_only=False)
        half = (day > mid).astype(np.int64)
        key = ck * 2 + half
        u, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, v)
        return pa.table(
            {
                "key": pa.array(u, pa.int64()),
                "cents": pa.array(s, pa.int64()),
            }
        )

    perch = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("key")
        .aggregate(_Sum("cents", alias_name="cents"))
        .materialize()
    )

    # Width-1 escape: below the cap the two rank passes and the
    # matrix co-partition are pure fixed cost — one vectorized task.
    if perch.count() < 2_000_000:
        def _qmig_local(tbl: pa.Table) -> pa.Table:
            key = tbl.column("key").to_numpy(zero_copy_only=False)
            cents = tbl.column("cents").to_numpy(zero_copy_only=False)
            ck, half = key // 2, key % 2
            qmap: dict[int, np.ndarray] = {}
            for h in (0, 1):
                sel = half == h
                cs, ks = cents[sel], ck[sel]
                order = np.lexsort((ks, cs))
                rn0 = np.empty(len(cs), np.int64)
                rn0[order] = np.arange(len(cs), dtype=np.int64)
                qmap[h] = (ks, 1 + rn0 * 5 // max(len(cs), 1))
            allc = np.unique(ck)
            q1 = np.zeros(len(allc), np.int64)
            q2 = np.zeros(len(allc), np.int64)
            for h, dest in ((0, q1), (1, q2)):
                ks, qv = qmap[h]
                dest[np.searchsorted(allc, ks)] = qv
            cell = q1 * 8 + q2
            u, cnt = np.unique(cell, return_counts=True)
            return pa.table(
                {
                    "cell": pa.array(u, pa.int64()),
                    "n_customers": pa.array(
                        cnt.astype(np.int64), pa.int64()
                    ),
                }
            )

        folded = (
            perch.repartition(1)
            .map_batches(
                _qmig_local, batch_format="pyarrow", batch_size=None
            )
            .take_all()
        )
        out = [
            {
                "q_h1": int(r["cell"]) // 8,
                "q_h2": int(r["cell"]) % 8,
                "n_customers": int(r["n_customers"]),
            }
            for r in folded
        ]
        df = pd.DataFrame(out).sort_values(
            ["q_h1", "q_h2"], ignore_index=True
        )
        for c in df.columns:
            df[c] = df[c].astype("int64")
        return df[["q_h1", "q_h2", "n_customers"]]

    def rank_half(half: int) -> "ray.data.Dataset":
        rows = perch.map_batches(
            lambda b, h=half: (
                lambda k, c: pa.table(
                    {
                        "ck": pa.array(k[k % 2 == h] // 2, pa.int64()),
                        "cents": pa.array(c[k % 2 == h], pa.int64()),
                    }
                )
            )(
                b.column("key").to_numpy(zero_copy_only=False),
                b.column("cents").to_numpy(zero_copy_only=False),
            ),
            batch_format="pyarrow",
        ).materialize()
        n_h = rows.count()
        lohi = rows.aggregate(_Min("cents"), _Max("cents"))
        vlo, vhi = int(lohi["min(cents)"]), int(lohi["max(cents)"])
        wv = (vhi - vlo) // QMIG_BUCKETS + 1

        def keyed(batch: pa.Table) -> pa.Table:
            c = batch.column("cents").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "vb", pa.array((c - vlo) // wv, pa.int64())
            )

        def vb_partial(batch: pa.Table) -> pa.Table:
            u, cnt = np.unique(
                batch.column("vb").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table(
                {
                    "vb": pa.array(u, pa.int64()),
                    "n": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        grid = (
            rows.map_batches(keyed, batch_format="pyarrow")
            .map_batches(vb_partial, batch_format="pyarrow")
            .groupby("vb")
            .aggregate(_Sum("n", alias_name="n"))
            .take_all()  # bounded: <= QMIG_BUCKETS rows
        )
        counts = np.zeros(QMIG_BUCKETS, np.int64)
        for r in grid:
            counts[int(r["vb"])] = int(r["n"])
        base = np.concatenate(([0], np.cumsum(counts)[:-1]))
        bref = ray.put(base)

        def rank_part(group: pa.Table, h=half) -> pa.Table:
            pre = ray.get(bref)
            vb = int(group.column("vb")[0].as_py())
            c = group.column("cents").to_numpy(zero_copy_only=False)
            ck = group.column("ck").to_numpy(zero_copy_only=False)
            order = np.lexsort((ck, c))
            rn0 = np.empty(len(c), np.int64)
            rn0[order] = pre[vb] + np.arange(len(c), dtype=np.int64)
            q = 1 + rn0 * 5 // n_h
            return pa.table(
                {
                    "ck": pa.array(ck, pa.int64()),
                    "q": pa.array(q, pa.int64()),
                    "half": pa.array(np.full(len(c), h, np.int64),
                                     pa.int64()),
                }
            )

        return (
            rows.map_batches(keyed, batch_format="pyarrow")
            .groupby("vb")
            .map_groups(rank_part, batch_format="pyarrow")
        )

    def cell_fold(part_tbl: pa.Table) -> pa.Table:
        ck = part_tbl.column("ck").to_numpy(zero_copy_only=False)
        q = part_tbl.column("q").to_numpy(zero_copy_only=False)
        h = part_tbl.column("half").to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        cks, qs, hs = ck[order], q[order], h[order]
        uniq, start = np.unique(cks, return_index=True)
        q1 = np.zeros(len(uniq), np.int64)
        q2 = np.zeros(len(uniq), np.int64)
        for hh, dest in ((0, q1), (1, q2)):
            sel = hs == hh
            pos = np.searchsorted(uniq, cks[sel])
            dest[pos] = qs[sel]
        cell = q1 * 8 + q2
        u, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def add_part(batch: pa.Table) -> pa.Table:
        ck = batch.column("ck").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array(ck % N_COARSE_PARTS, pa.int64())
        )

    folded = (
        rank_half(0)
        .union(rank_half(1))
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: cell_fold(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .groupby("cell")
        .aggregate(_Sum("n", alias_name="n_customers"))
        .take_all()  # bounded: <= 36 cells
    )
    out = [
        {
            "q_h1": int(r["cell"]) // 8,
            "q_h2": int(r["cell"]) % 8,
            "n_customers": int(r["n_customers"]),
        }
        for r in folded
    ]
    df = pd.DataFrame(out).sort_values(["q_h1", "q_h2"], ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["q_h1", "q_h2", "n_customers"]]


LMOM_BUCKETS = 256  # value grid for the L-moment rank pass
LANE_SHIFT = 20  # base-2^20 lane split for overflow-free partials


def l_moment_ratios(sf_dir: str) -> "pd.DataFrame":
    """Exact probability-weighted-moment numerators of the order-value
    distribution — the L-moment family (Hosking), the robust
    alternative to classical moments that corr_moments' Σx² cannot
    give: with x_(1) ≤ … ≤ x_(n) the cents order statistics,
    B0 = Σ x_(i), B1 = Σ (i−1)·x_(i), B2 = Σ (i−1)(i−2)·x_(i), so
    λ2 = 2B1/(n(n−1)) − B0/n (the L-scale: half the mean absolute
    pairwise difference — Gini's mean difference), and
    τ3 = (6B2' …) the L-skewness, all exact rationals downstream.
    Tie order does not matter: within a tie group x is constant, so
    the weight SUM over the group is rank-order invariant. Output
    one row: (n, b0_sum, b1_sum, b2_sum) with the B-sums as decimal
    strings (B2 ≤ n²·max_cents·n exceeds int64 by design; the
    oracle needs HUGEINT for the same reason).

    Scale shape: one bucket-grid rank pass (bounded count grid,
    broadcast exclusive prefix bases — ranks are base + local
    position after a bucket sort); per-bucket partials fold through
    the `_cvm_lanes`-style base-2²⁰ split — per element
    every base-2²⁰ digit product stays < 2⁴⁰, and the per-CLASS
    global lane sums stay int64 through ~4·10⁶ rows (the next split
    level, base-2¹⁵, extends to ~10⁹ — documented dial). The driver
    reassembles exact Python ints from the 9 lane totals."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )

    def rows_fn(batch: pa.Table) -> pa.Table:
        return pa.table({"v": _cents(batch.column("o_totalprice"))})

    rows = ds.map_batches(rows_fn, batch_format="pyarrow").materialize()
    lohi = rows.aggregate(Min("v"), Max("v"))
    vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
    wv = (vhi - vlo) // LMOM_BUCKETS + 1

    def keyed(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "vb", pa.array((v - vlo) // wv, pa.int64())
        )

    def vb_partial(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("vb").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {
                "vb": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    grid = (
        rows.map_batches(keyed, batch_format="pyarrow")
        .map_batches(vb_partial, batch_format="pyarrow")
        .groupby("vb")
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= LMOM_BUCKETS rows
    )
    counts = np.zeros(LMOM_BUCKETS, np.int64)
    for r in grid:
        counts[int(r["vb"])] = int(r["n"])
    base = np.concatenate(([0], np.cumsum(counts)[:-1]))
    bref = ray.put(base)

    M = (1 << LANE_SHIFT) - 1
    LANE_COLS = (
        [f"b0_l{k}" for k in range(2)]
        + [f"b1_l{k}" for k in range(3)]
        + [f"b2_l{k}" for k in range(4)]
    )

    def moment_part(group: pa.Table) -> pa.Table:
        pre = ray.get(bref)
        vb = int(group.column("vb")[0].as_py())
        v = np.sort(group.column("v").to_numpy(zero_copy_only=False))
        i0 = pre[vb] + np.arange(len(v), dtype=np.int64)  # rank - 1
        w2 = i0 * (i0 - 1)
        vd = [v & M, v >> LANE_SHIFT]
        id_ = [i0 & M, (i0 >> LANE_SHIFT) & M]
        wd = [w2 & M, (w2 >> LANE_SHIFT) & M, w2 >> (2 * LANE_SHIFT)]
        out = {c: 0 for c in LANE_COLS}
        out["b0_l0"] = int(vd[0].sum())
        out["b0_l1"] = int(vd[1].sum())
        for a in range(2):
            for b in range(2):
                out[f"b1_l{a + b}"] += int((id_[a] * vd[b]).sum())
        for a in range(3):
            for b in range(2):
                out[f"b2_l{a + b}"] += int((wd[a] * vd[b]).sum())
        return pa.table({k: pa.array([x], pa.int64())
                         for k, x in out.items()})

    lanes = (
        rows.map_batches(keyed, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(moment_part, batch_format="pyarrow")
        .aggregate(*[_Sum(c, alias_name=c) for c in LANE_COLS])
    )
    S = 1 << LANE_SHIFT
    b0 = sum(int(lanes[f"b0_l{k}"]) * S**k for k in range(2))
    b1 = sum(int(lanes[f"b1_l{k}"]) * S**k for k in range(3))
    b2 = sum(int(lanes[f"b2_l{k}"]) * S**k for k in range(4))
    n = int(counts.sum())
    df = pd.DataFrame(
        [
            {
                "n": n,
                "b0_sum": str(b0),
                "b1_sum": str(b1),
                "b2_sum": str(b2),
            }
        ]
    )
    df["n"] = df["n"].astype("int64")
    for c in ["b0_sum", "b1_sum", "b2_sum"]:
        df[c] = df[c].astype(str)
    return df[["n", "b0_sum", "b1_sum", "b2_sum"]]


SKP_BUCKETS = 256  # key grid for the sort-key planner
SKP_LOCAL_MAX = 2_000_000  # rows below which the planner runs width-1


def sort_key_planner(sf_dir: str) -> "pd.DataFrame":
    """Composite sort-key planner — for each candidate ORDER BY key,
    the EXACT total run count of every measured column under the
    (key, o_orderkey) total order: run counts are precisely what
    RLE/delta encodings and zone-map pruning pay for, so the argmin
    row per column IS the physical-design decision
    (rle_encoding_audit prices ONE given layout; this compares the
    candidates). Candidates: custkey, order day, priority; measured:
    priority code, status code, custkey, day. Output per
    (sort_key, column): n_runs.

    Scale shape: per candidate key, one bounded (key-bucket) count
    grid and one key-bucket co-partition — each bucket local-sorts
    by (key, orderkey) and counts adjacent changes; the ONE run that
    may span a bucket boundary is stitched on the driver from the
    bounded per-bucket (first, last) value tuples (the
    varint_cost_audit boundary discipline). Width-1 escape below
    SKP_LOCAL_MAX rows runs all candidates in one task."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    DAY_US = 86_400_000_000
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority", "o_orderstatus"],
    )

    STATUS = {"F": 0, "O": 1, "P": 2}

    def rows_fn(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        pc_ = pc.utf8_slice_codeunits(
            batch.column("o_orderpriority"), 0, 1
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        st = np.array(
            [STATUS[x] for x in
             batch.column("o_orderstatus").to_pylist()],
            np.int64,
        )
        return pa.table(
            {
                "okey": pa.array(ok, pa.int64()),
                "ck": pa.array(ck, pa.int64()),
                "day": pa.array(day, pa.int64()),
                "pcode": pa.array(pc_, pa.int64()),
                "status": pa.array(st, pa.int64()),
            }
        )

    rows = ds.map_batches(rows_fn, batch_format="pyarrow").materialize()
    CANDS = ["ck", "day", "pcode"]
    MEASURED = ["pcode", "status", "ck", "day"]

    def runs_under(mat: dict, order: "np.ndarray") -> dict:
        out = {}
        for c in MEASURED:
            v = mat[c][order]
            out[c] = 1 + int((v[1:] != v[:-1]).sum()) if len(v) else 0
        return out

    if rows.count() < SKP_LOCAL_MAX:

        def local(tbl: pa.Table) -> pa.Table:
            mat = {
                c: tbl.column(c).to_numpy(zero_copy_only=False)
                for c in ["okey", *MEASURED]
            }
            keys, cols, runs = [], [], []
            for k in CANDS:
                order = np.lexsort((mat["okey"], mat[k]))
                for c, r in runs_under(mat, order).items():
                    keys.append(k)
                    cols.append(c)
                    runs.append(r)
            return pa.table(
                {
                    "sort_key": pa.array(keys, pa.string()),
                    "col": pa.array(cols, pa.string()),
                    "n_runs": pa.array(runs, pa.int64()),
                }
            )

        out = (
            rows.repartition(1)
            .map_batches(local, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        out = out.sort_values(["sort_key", "col"], ignore_index=True)
        out["n_runs"] = out["n_runs"].astype("int64")
        return out[["sort_key", "col", "n_runs"]]

    # grid path: per candidate key, bucket the key range; local
    # adjacent changes + driver boundary stitching off per-bucket
    # (first, last) tuples
    out_rows = []
    for k in CANDS:
        lohi = rows.aggregate(Min(k), Max(k))
        klo, khi = int(lohi[f"min({k})"]), int(lohi[f"max({k})"])
        wk = (khi - klo) // SKP_BUCKETS + 1

        def keyed(batch: pa.Table, k=k, klo=klo, wk=wk) -> pa.Table:
            v = batch.column(k).to_numpy(zero_copy_only=False)
            return batch.append_column(
                "kb", pa.array((v - klo) // wk, pa.int64())
            )

        def bucket_runs(group: pa.Table, k=k) -> pa.Table:
            kb = int(group.column("kb")[0].as_py())
            mat = {
                c: group.column(c).to_numpy(zero_copy_only=False)
                for c in ["okey", *MEASURED, k]
            }
            order = np.lexsort((mat["okey"], mat[k]))
            cols = {"kb": pa.array([kb], pa.int64())}
            for c in MEASURED:
                v = mat[c][order]
                cols[f"chg_{c}"] = pa.array(
                    [int((v[1:] != v[:-1]).sum())], pa.int64()
                )
                cols[f"first_{c}"] = pa.array([int(v[0])], pa.int64())
                cols[f"last_{c}"] = pa.array([int(v[-1])], pa.int64())
            return pa.table(cols)

        grid = (
            rows.map_batches(keyed, batch_format="pyarrow")
            .groupby("kb")
            .map_groups(bucket_runs, batch_format="pyarrow")
            .take_all()  # bounded: <= SKP_BUCKETS rows
        )
        grid.sort(key=lambda r: int(r["kb"]))
        for c in MEASURED:
            total = sum(int(r[f"chg_{c}"]) for r in grid) + 1
            for prev, cur in zip(grid, grid[1:]):
                if int(prev[f"last_{c}"]) != int(cur[f"first_{c}"]):
                    total += 1
            out_rows.append(
                {"sort_key": k, "col": c, "n_runs": total}
            )
    df = pd.DataFrame(out_rows).sort_values(
        ["sort_key", "col"], ignore_index=True
    )
    df["n_runs"] = df["n_runs"].astype("int64")
    return df[["sort_key", "col", "n_runs"]]


XCORR_MAX_LAG = 14


def xcorr_lag_profile(sf_dir: str) -> "pd.DataFrame":
    """Exact cross-correlation lag profile between the daily 'error'
    and 'purchase' count series — the lead-lag detector ('do errors
    LEAD purchases down?') that same-day correlation misses: for
    every lag in ±XCORR_MAX_LAG days, the exact integer co-moment
    row (lag, n, sx, sy, sxy, sxx, syy) over the days where both
    x_t and y_{t+lag} exist, so r(lag) and its argmax are exact
    rational arithmetic downstream. Output: one row per lag with
    n ≥ 2.

    Scale shape: two combiner-bounded day folds (days, not events,
    cross the exchange); the 29-lag alignment is driver arithmetic
    over the bounded spans — the runs_test/changepoint driver-read
    contract."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.is_in(
            et, value_set=pa.array(["error", "purchase"])
        )
        t = batch.filter(keep)
        d = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        isp = pc.equal(t.column("event_type"), "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        key = d * 2 + isp
        u, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby("key")
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= 2 * day span rows
    )
    xs: dict[int, int] = {}
    ys: dict[int, int] = {}
    for r in rows:
        k, n = int(r["key"]), int(r["n"])
        (ys if k % 2 else xs)[k // 2] = n
    out = []
    for lag in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1):
        pairs = [
            (xs[d], ys[d + lag]) for d in xs if (d + lag) in ys
        ]
        if len(pairs) < 2:
            continue
        xa = np.array([p[0] for p in pairs], np.int64)
        ya = np.array([p[1] for p in pairs], np.int64)
        out.append(
            {
                "lag": lag,
                "n": len(pairs),
                "sx": int(xa.sum()),
                "sy": int(ya.sum()),
                "sxy": int((xa * ya).sum()),
                "sxx": int((xa * xa).sum()),
                "syy": int((ya * ya).sum()),
            }
        )
    df = pd.DataFrame(out)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


TUKEY_BUCKETS = 256  # value grid for the per-type quartile pass
TUKEY_LOCAL_MAX = 2_000_000  # rows below which fences run width-1


def tukey_fences(sf_dir: str) -> "pd.DataFrame":
    """Exact Tukey-fence outlier profile per event type — the EDA
    boxplot numbers, exactly: per type the type-1 quartiles of the
    event value (milli-units), and the counts outside the 1.5·IQR
    fences, kept integer by doubling (outlier iff 2v < 2Q1 − 3·IQR
    or 2v > 2Q3 + 3·IQR — no halves ever materialize). mad_outliers
    flags rows by a global median scale; this is the per-group
    quartile version every dashboard draws. Output per type:
    (event_type, n, q1_milli, q3_milli, n_low_out, n_high_out).

    Scale shape: width-1 escape below TUKEY_LOCAL_MAX rows (one
    task, all types); above it, the qq_drift_deciles selection plan
    per type — bounded (type, value-bucket) count grid locates both
    quartiles' buckets and offsets, only boundary buckets
    co-partition for the exact order statistics, then ONE streaming
    pass counts fence violations with the ≤|types| fence table
    broadcast."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def rows_fn(batch: pa.Table) -> pa.Table:
        v = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 1000 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "v": pa.array(v, pa.int64()),
            }
        )

    rows = ev.map_batches(rows_fn, batch_format="pyarrow").materialize()

    def finish(per_type: dict) -> "pd.DataFrame":
        out = []
        for et in sorted(per_type):
            n, q1, q3, lo_n, hi_n = per_type[et]
            out.append(
                {
                    "event_type": et,
                    "n": n,
                    "q1_milli": q1,
                    "q3_milli": q3,
                    "n_low_out": lo_n,
                    "n_high_out": hi_n,
                }
            )
        df = pd.DataFrame(out)
        for c in df.columns[1:]:
            df[c] = df[c].astype("int64")
        return df

    if rows.count() < TUKEY_LOCAL_MAX:

        def local(tbl: pa.Table) -> pa.Table:
            import pandas as pd  # noqa: F811

            et = tbl.column("event_type").to_pandas().to_numpy(dtype=object)
            v = tbl.column("v").to_numpy(zero_copy_only=False)
            rows_out = []
            for t in np.unique(et):
                vv = np.sort(v[et == t])
                n = len(vv)
                q1 = int(vv[(n + 3) // 4 - 1])  # ceil(n/4), 1-indexed
                q3 = int(vv[(3 * n + 3) // 4 - 1])
                iqr = q3 - q1
                lo2, hi2 = 2 * q1 - 3 * iqr, 2 * q3 + 3 * iqr
                rows_out.append(
                    (t, n, q1, q3, int((2 * vv < lo2).sum()),
                     int((2 * vv > hi2).sum()))
                )
            return pa.table(
                {
                    "event_type": pa.array([r[0] for r in rows_out],
                                           pa.string()),
                    "n": pa.array([r[1] for r in rows_out], pa.int64()),
                    "q1_milli": pa.array([r[2] for r in rows_out],
                                         pa.int64()),
                    "q3_milli": pa.array([r[3] for r in rows_out],
                                         pa.int64()),
                    "n_low_out": pa.array([r[4] for r in rows_out],
                                          pa.int64()),
                    "n_high_out": pa.array([r[5] for r in rows_out],
                                           pa.int64()),
                }
            )

        df = (
            rows.repartition(1)
            .map_batches(local, batch_format="pyarrow", batch_size=None)
            .to_pandas()
            .sort_values("event_type", ignore_index=True)
        )
        for c in df.columns[1:]:
            df[c] = df[c].astype("int64")
        return df

    # grid path: type codes are discovered from a bounded fold
    lohi = rows.aggregate(Min("v"), Max("v"))
    vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
    wv = (vhi - vlo) // TUKEY_BUCKETS + 1

    def grid_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        et = batch.column("event_type").to_pandas().to_numpy(dtype=object)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"et": et, "vb": (v - vlo) // wv, "n": 1})
            .groupby(["et", "vb"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "et": pa.array(g["et"], pa.string()),
                "vb": pa.array(g["vb"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    grid = (
        rows.map_batches(grid_partial, batch_format="pyarrow")
        .groupby(["et", "vb"])
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= |types| * TUKEY_BUCKETS rows
    )
    import collections

    counts: dict[str, np.ndarray] = collections.defaultdict(
        lambda: np.zeros(TUKEY_BUCKETS, np.int64)
    )
    for r in grid:
        counts[r["et"]][int(r["vb"])] = int(r["n"])
    plan: dict[str, list] = {}
    for et, c in counts.items():
        n = int(c.sum())
        cum = np.cumsum(c)
        for which, k in (("q1", (n + 3) // 4), ("q3", (3 * n + 3) // 4)):
            b = int(np.searchsorted(cum, k, side="left"))
            off = k - int(cum[b - 1] if b > 0 else 0)
            plan.setdefault(et, []).append((which, b, off))
    plan_ref = ray.put(plan)

    def pick_part(group: pa.Table) -> pa.Table:
        pl = ray.get(plan_ref)
        et = group.column("event_type")[0].as_py()
        vb = int(
            (group.column("v").to_numpy(zero_copy_only=False)[0] - vlo) // wv
        )
        wants = [(w, off) for (w, b, off) in pl.get(et, []) if b == vb]
        if not wants:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "which": pa.array([], pa.string()),
                    "val": pa.array([], pa.int64()),
                }
            )
        v = np.sort(group.column("v").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "event_type": pa.array([et] * len(wants), pa.string()),
                "which": pa.array([w for w, _ in wants], pa.string()),
                "val": pa.array([int(v[off - 1]) for _, off in wants],
                                pa.int64()),
            }
        )

    def route(batch: pa.Table) -> pa.Table:
        pl = ray.get(plan_ref)
        et = batch.column("event_type").to_pandas().to_numpy(dtype=object)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        vb = (v - vlo) // wv
        want = np.zeros(len(v), bool)
        for t, entries in pl.items():
            bs = {b for _, b, _ in entries}
            for b in bs:
                want |= (et == t) & (vb == b)
        t2 = batch.filter(pa.array(want))
        vv = t2.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t2.column("event_type"),
                "v": t2.column("v"),
                "gk": pa.array((vv - vlo) // wv, pa.int64()),
            }
        )

    picked = (
        rows.map_batches(route, batch_format="pyarrow")
        .groupby(["event_type", "gk"])
        .map_groups(
            lambda g: pick_part(g.drop_columns(["gk"])),
            batch_format="pyarrow",
        )
        .take_all()  # bounded: <= 2 rows per type
    )
    q: dict[str, dict] = collections.defaultdict(dict)
    for r in picked:
        q[r["event_type"]][r["which"]] = int(r["val"])
    fences = {
        et: (
            2 * q[et]["q1"] - 3 * (q[et]["q3"] - q[et]["q1"]),
            2 * q[et]["q3"] + 3 * (q[et]["q3"] - q[et]["q1"]),
        )
        for et in q
    }
    f_ref = ray.put(fences)

    def out_partial(batch: pa.Table) -> pa.Table:
        fl = ray.get(f_ref)
        et = batch.column("event_type").to_pandas().to_numpy(dtype=object)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        rows_out = []
        for t in np.unique(et):
            lo2, hi2 = fl[t]
            vv = v[et == t]
            rows_out.append(
                (t, int((2 * vv < lo2).sum()), int((2 * vv > hi2).sum()))
            )
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows_out],
                                       pa.string()),
                "lo": pa.array([r[1] for r in rows_out], pa.int64()),
                "hi": pa.array([r[2] for r in rows_out], pa.int64()),
            }
        )

    outs = (
        rows.map_batches(out_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            _Sum("lo", alias_name="lo"), _Sum("hi", alias_name="hi")
        )
        .take_all()  # bounded: one row per type
    )
    omap = {r["event_type"]: (int(r["lo"]), int(r["hi"])) for r in outs}
    per_type = {
        et: (
            int(counts[et].sum()),
            q[et]["q1"],
            q[et]["q3"],
            omap.get(et, (0, 0))[0],
            omap.get(et, (0, 0))[1],
        )
        for et in counts
    }
    return finish(per_type)


THEIL_WINDOW = 64  # trailing days for the robust slope


def theil_sen_slope(sf_dir: str) -> "pd.DataFrame":
    """Exact Theil-Sen robust slope of the trailing-64-day daily
    order counts — the median of all pairwise slopes (Δcount/Δdays),
    outlier-immune where trend_slopes' least squares is not, and
    EXACT: slopes compare as cross-multiplied integers (denominators
    positive), the lower median element (0-based rank (P−1)//2 under
    (value, dx, dd) order) is selected deterministically, and the
    output is its exact rational (slope_num, slope_den) plus
    slope_milli = ⌊1000·num/den⌋. Output one row:
    (n_days, n_pairs, slope_num, slope_den, slope_milli).

    Scale shape: one combiner-bounded day fold; the ≤ C(64,2) = 2016
    pair scan is driver arithmetic bounded by the WINDOW constant —
    the oracle mirrors with a rank-by-count self-join over the same
    bounded pair set."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    DAY_US = 86_400_000_000
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        d = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        u, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {
                "day": pa.array(u, pa.int64()),
                "x": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("day")
        .aggregate(_Sum("x", alias_name="x"))
        .take_all()  # bounded: <= day span rows
    )
    rows.sort(key=lambda r: int(r["day"]))
    tail = rows[-THEIL_WINDOW:]
    days = np.array([int(r["day"]) for r in tail], np.int64)
    x = np.array([int(r["x"]) for r in tail], np.int64)
    n = len(days)
    ii, jj = np.triu_indices(n, 1)
    dx = x[jj] - x[ii]
    dd = days[jj] - days[ii]
    p = len(dx)
    # deterministic lower-median under (value, dx, dd): value order
    # via cross-multiplied comparison — sort by (dx/dd, dx, dd) using
    # a stable key: numpy lexsort over (dd, dx, dx*LCM? ) — compare
    # exactly by sorting with Fraction keys (bounded P, driver-side)
    from fractions import Fraction

    order = sorted(
        range(p), key=lambda k: (Fraction(int(dx[k]), int(dd[k])),
                                 int(dx[k]), int(dd[k]))
    )
    sel = order[(p - 1) // 2]
    num, den = int(dx[sel]), int(dd[sel])
    milli = (1000 * num) // den
    df = pd.DataFrame(
        [
            {
                "n_days": n,
                "n_pairs": p,
                "slope_num": num,
                "slope_den": den,
                "slope_milli": milli,
            }
        ]
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def revenue_bridge(sf_dir: str) -> "pd.DataFrame":
    """Exact revenue bridge (mix-shift decomposition) — per customer
    nation, first-half vs second-half revenue in integer cents with
    exact basis-point shares: the classic finance 'bridge' that
    splits growth into market growth vs mix shift, where
    share_delta_bp ≠ 0 localizes WHERE the mix moved (a nation can
    grow in cents yet shrink in share). Output per nation:
    (nation, r1_cents, r2_cents, delta_cents, share1_bp, share2_bp,
    share_delta_bp) — shares floor against each half's exact total.

    Scale shape: the spearman union join attaches the nation (never
    a customer broadcast); one bounded (nation, half) cents fold;
    the share arithmetic is driver work over ≤ nations rows."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    DAY_US = 86_400_000_000
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    lohi_d = orders.aggregate(_Min("o_orderdate"), _Max("o_orderdate"))
    dlo = int(pd.Timestamp(lohi_d["min(o_orderdate)"]).value // 1000) // DAY_US
    dhi = int(pd.Timestamp(lohi_d["max(o_orderdate)"]).value // 1000) // DAY_US
    mid = (dlo + dhi) // 2

    def cust_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "custkey": batch.column("c_custkey").cast(pa.int64()),
                "nation": batch.column("c_nationkey").cast(pa.int64()),
                "half": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        day = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        n = batch.num_rows
        return pa.table(
            {
                "custkey": batch.column("o_custkey").cast(pa.int64()),
                "nation": pa.array(np.zeros(n, np.int64), pa.int64()),
                "half": pa.array((day > mid).astype(np.int64), pa.int64()),
                "cents": _cents(batch.column("o_totalprice")),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
            }
        )

    def attach(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        if not (side == 0).any() or not (side == 1).any():
            return pa.table(
                {
                    "nation": pa.array([], pa.int64()),
                    "half": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        nation = int(
            group.column("nation").to_numpy(zero_copy_only=False)[side == 0][0]
        )
        half = group.column("half").to_numpy(zero_copy_only=False)[side == 1]
        cents = group.column("cents").to_numpy(zero_copy_only=False)[side == 1]
        out = np.zeros(2, np.int64)
        np.add.at(out, half, cents)
        return pa.table(
            {
                "nation": pa.array([nation, nation], pa.int64()),
                "half": pa.array([0, 1], pa.int64()),
                "cents": pa.array(out, pa.int64()),
            }
        )

    grid = (
        cust.map_batches(cust_side, batch_format="pyarrow")
        .union(orders.map_batches(order_side, batch_format="pyarrow"))
        .groupby("custkey")
        .map_groups(attach, batch_format="pyarrow")
        .groupby(["nation", "half"])
        .aggregate(_Sum("cents", alias_name="cents"))
        .take_all()  # bounded: <= 2 * nations rows
    )
    r: dict[int, list] = {}
    for row in grid:
        r.setdefault(int(row["nation"]), [0, 0])[int(row["half"])] = int(
            row["cents"]
        )
    t1 = sum(v[0] for v in r.values())
    t2 = sum(v[1] for v in r.values())
    out = [
        {
            "nation": n,
            "r1_cents": v[0],
            "r2_cents": v[1],
            "delta_cents": v[1] - v[0],
            "share1_bp": v[0] * 10000 // t1 if t1 else 0,
            "share2_bp": v[1] * 10000 // t2 if t2 else 0,
        }
        for n, v in r.items()
    ]
    for o in out:
        o["share_delta_bp"] = o["share2_bp"] - o["share1_bp"]
    df = pd.DataFrame(out).sort_values("nation", ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def sequence_gap_audit(sf_dir: str) -> "pd.DataFrame":
    """Line-number sequence completeness audit — lineitem's
    l_linenumber should enumerate 1..k within every order; the audit
    reports exactly how many orders violate that (gaps, wrong
    starts, duplicates) — the ingestion-integrity check
    data_quality_audit's row-level rules can't express because it
    needs the WHOLE group. An order passes iff min = 1, max = count,
    and the line numbers are distinct (equivalently: distinct count
    = count AND min = 1 AND max = count). Output one row:
    (n_orders, n_ok, n_bad_start, n_gapped, n_duped,
    max_linenumber).

    Scale shape: per-batch per-order partials (min, max, count,
    distinct-count via sorted unique) → ONE orderkey-keyed
    co-partition finalizes each order and folds the five counters —
    a handful of int64s per partition reach the driver."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        k = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ln = batch.column("l_linenumber").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        P = 1 << 20  # linenumbers < 2^20 by contract
        key = k * P + ln  # dedupe-aware partial
        u, cnt = np.unique(key, return_counts=True)
        uk = u // P
        uln = u % P
        return pa.table(
            {
                "okey": pa.array(uk, pa.int64()),
                "ln": pa.array(uln, pa.int64()),
                "m": pa.array(cnt.astype(np.int64), pa.int64()),
                "part": pa.array(uk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def per_part(part_tbl: pa.Table) -> pa.Table:
        k = part_tbl.column("okey").to_numpy(zero_copy_only=False)
        ln = part_tbl.column("ln").to_numpy(zero_copy_only=False)
        m = part_tbl.column("m").to_numpy(zero_copy_only=False)
        P = 1 << 20
        key = k * P + ln
        order = np.argsort(key, kind="stable")
        ms = m[order]
        u, start = np.unique(key[order], return_index=True)
        mm = np.add.reduceat(ms, start)  # final multiplicity
        uk = u // P
        uln = u % P
        ouniq, ostart = np.unique(uk, return_index=True)
        n_lines = np.add.reduceat(mm, ostart)
        n_dist = np.diff(np.append(ostart, len(uk)))
        mn = np.minimum.reduceat(uln, ostart)
        mx = np.maximum.reduceat(uln, ostart)
        duped = n_dist != n_lines
        bad_start = mn != 1
        gapped = mx != n_dist  # with distinct lines, max != distinct
        ok = ~(duped | bad_start | (mx != n_lines))
        return pa.table(
            {
                "n_orders": pa.array([len(ouniq)], pa.int64()),
                "n_ok": pa.array([int(ok.sum())], pa.int64()),
                "n_bad_start": pa.array([int(bad_start.sum())], pa.int64()),
                "n_gapped": pa.array(
                    [int((gapped & ~duped).sum())], pa.int64()
                ),
                "n_duped": pa.array([int(duped.sum())], pa.int64()),
                "max_linenumber": pa.array([int(mx.max())], pa.int64()),
            }
        )

    folded = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .aggregate(
            _Sum("n_orders", alias_name="n_orders"),
            _Sum("n_ok", alias_name="n_ok"),
            _Sum("n_bad_start", alias_name="n_bad_start"),
            _Sum("n_gapped", alias_name="n_gapped"),
            _Sum("n_duped", alias_name="n_duped"),
            _Max("max_linenumber", alias_name="max_linenumber"),
        )
    )
    df = pd.DataFrame([{k: int(v) for k, v in folded.items()}])
    return df[
        ["n_orders", "n_ok", "n_bad_start", "n_gapped", "n_duped",
         "max_linenumber"]
    ]


def kendall_matrix_daily(sf_dir: str) -> "pd.DataFrame":
    """Pairwise Kendall dependence MATRIX of the five event types'
    daily count series — the rank-robust co-movement panel ('do
    errors and purchases move together day to day?') that
    xcorr_lag_profile's lag-0 Pearson row reads linearly and
    outliers can flip: per unordered type pair, over the days where
    BOTH series have counts, the exact tau-b sufficient statistics
    (n_days, n1, n2, n3, disc) with disc = `_inv_count` of y under
    (x, y) order — kendall_tau's statistic, swept across all
    C(5,2) = 10 pairs. Output one row per pair.

    Scale shape: one combiner-bounded (type, day) fold; the pair
    sweep is driver arithmetic over the bounded day spans (the
    xcorr/runs_test driver-read contract), merge-sort counting per
    pair."""
    import itertools

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        et = batch.column("event_type").to_pandas().to_numpy(dtype=object)
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        g = (
            pd.DataFrame({"et": et, "day": d, "n": 1})
            .groupby(["et", "day"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "et": pa.array(g["et"], pa.string()),
                "day": pa.array(g["day"].to_numpy(np.int64), pa.int64()),
                "x": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    rows = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby(["et", "day"])
        .aggregate(_Sum("x", alias_name="x"))
        .take_all()  # bounded: <= |types| * day span rows
    )
    series: dict[str, dict[int, int]] = {}
    for r in rows:
        series.setdefault(r["et"], {})[int(r["day"])] = int(r["x"])
    out = []
    for ta, tb in itertools.combinations(sorted(series), 2):
        days = sorted(set(series[ta]) & set(series[tb]))
        x = np.array([series[ta][d] for d in days], np.int64)
        y = np.array([series[tb][d] for d in days], np.int64)
        n = len(days)
        order = np.lexsort((y, x))
        disc = _inv_count(y[order])
        _, xc = np.unique(x, return_counts=True)
        _, yc = np.unique(y, return_counts=True)
        _, jc = np.unique(
            x * (np.int64(y.max()) + 1) + y, return_counts=True
        ) if n else (None, np.array([], np.int64))
        out.append(
            {
                "type_a": ta,
                "type_b": tb,
                "n_days": n,
                "n1": int((xc.astype(np.int64) * (xc - 1) // 2).sum()),
                "n2": int((yc.astype(np.int64) * (yc - 1) // 2).sum()),
                "n3": int((jc.astype(np.int64) * (jc - 1) // 2).sum()),
                "disc": disc,
            }
        )
    df = pd.DataFrame(out).sort_values(
        ["type_a", "type_b"], ignore_index=True
    )
    for c in ["n_days", "n1", "n2", "n3", "disc"]:
        df[c] = df[c].astype("int64")
    return df


KLAD_LEVELS = 7  # width-doubling generalization levels audited


def k_anon_ladder(sf_dir: str) -> "pd.DataFrame":
    """k-anonymity generalization ladder — the REMEDIATION dial
    k_anonymity_audit's snapshot doesn't give: starting from the
    release QI (nation, segment, $1000 balance bucket), each level
    DOUBLES the balance-bucket width (merging adjacent buckets, so
    level l's classes are exact unions of level 0's), and the ladder
    reports per level the class count, the smallest class, and the
    rows still living in classes under k = 5 — the level where
    n_rows_under_5 hits zero is the minimal generalization that
    makes the release safe. Output per level:
    (level, width_dollars, n_classes, min_class, n_rows_under_5).

    Scale shape: ONE bounded (nation, segment, bucket) count-grid
    fold; every level is exact integer re-aggregation of that grid
    on the driver (bucket >> level), so the whole ladder costs one
    exchange."""
    import collections

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        nk, bucket, seg = _kanon_qi(batch, with_segment=True)
        g = (
            pd.DataFrame({"nk": nk, "b": bucket, "seg": seg, "n": 1})
            .groupby(["nk", "b", "seg"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "nk": pa.array(g["nk"].to_numpy(np.int64), pa.int64()),
                "b": pa.array(g["b"].to_numpy(np.int64), pa.int64()),
                "seg": pa.array(g["seg"], pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["nk", "b", "seg"])
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= nations * segments * buckets rows
    )
    out = []
    for level in range(KLAD_LEVELS):
        agg: collections.Counter = collections.Counter()
        for r in grid:
            agg[(int(r["nk"]), r["seg"], int(r["b"]) >> level)] += int(
                r["n"]
            )
        sizes = np.array(list(agg.values()), np.int64)
        out.append(
            {
                "level": level,
                "width_dollars": 1000 * (1 << level),
                "n_classes": len(sizes),
                "min_class": int(sizes.min()),
                "n_rows_under_5": int(sizes[sizes < 5].sum()),
            }
        )
    df = pd.DataFrame(out)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def hll_union_error(sf_dir: str) -> "pd.DataFrame":
    """Measured HyperLogLog UNION-algebra error — the property that
    justifies shipping sketches instead of sets: registers merge by
    elementwise max, so |A ∪ B| estimates WITHOUT re-reading either
    stream. Splitting the event stream at the date midpoint, this
    builds both halves' register tables in ONE pass, merges them,
    and reports the exact-rational raw estimates (the
    hll_error_eval α_m convention, no floats) for H1, H2, and the
    union against the exact distinct-user counts — union_err is the
    number a capacity planner actually absorbs when combining
    per-shard sketches. Output one row: (m, n_h1, n_h2, n_union,
    est_h1_x1000, est_h2_x1000, est_union_x1000, union_err_x1000).

    Scale shape: per-batch distinct (half, user) md5-rho partials →
    one ≤2·2^P-row Max grid; exact counts are one distinct fold per
    axis; the estimator touches 512 ints on the driver."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    from ..functions.textstats import md5_int60

    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def day_rows(batch: pa.Table) -> pa.Table:
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {"day": pa.array(d, pa.int64()), "user": pa.array(u, pa.int64())}
        )

    days = ev.map_batches(day_rows, batch_format="pyarrow").materialize()
    lim = days.aggregate(_Min("day"), _Max("day"))
    mid = (int(lim["min(day)"]) + int(lim["max(day)"])) // 2

    def reg_partial(batch: pa.Table) -> pa.Table:
        d = batch.column("day").to_numpy(zero_copy_only=False)
        u = batch.column("user").to_numpy(zero_copy_only=False)
        half = (d > mid).astype(np.int64)
        key = np.unique(u * 2 + half)
        uu, hh = key // 2, key % 2
        h = np.array([md5_int60(str(x)) for x in uu], dtype=np.int64)
        bucket = h >> HLL_W
        suffix = h & (HLL_SUFFIX_MOD - 1)
        bl = _bit_length(suffix)
        rho = np.where(suffix > 0, HLL_W - bl + 1, HLL_W + 1)
        t = pa.table(
            {
                "hb": pa.array(hh * (1 << HLL_P) + bucket, pa.int64()),
                "rho": pa.array(rho.astype(np.int64), pa.int64()),
            }
        )
        g = t.group_by("hb").aggregate([("rho", "max")])
        return pa.table(
            {"hb": g.column("hb"), "max_rho": g.column("rho_max")}
        )

    regs_rows = (
        days.map_batches(reg_partial, batch_format="pyarrow")
        .groupby("hb")
        .aggregate(_Max("max_rho", alias_name="max_rho"))
        .take_all()  # bounded: <= 2 * 2^P rows
    )
    m = 1 << HLL_P
    regs = [dict(), dict()]
    for r in regs_rows:
        hb = int(r["hb"])
        regs[hb // m][hb % m] = int(r["max_rho"])
    union = {b: max(regs[0].get(b, 0), regs[1].get(b, 0))
             for b in range(m)}

    def est_x1000(rg: dict) -> int:
        s = sum(1 << (53 - rg.get(b, 0)) for b in range(m))
        den = HLL_ALPHA_DEN_BASE * (1000 * m + 1079)
        return HLL_ALPHA_NUM * (m ** 3) * (1 << 53) * 1000 // (den * s)

    def half_counts(batch: pa.Table) -> pa.Table:
        d = batch.column("day").to_numpy(zero_copy_only=False)
        u = batch.column("user").to_numpy(zero_copy_only=False)
        half = (d > mid).astype(np.int64)
        key = np.unique(u * 2 + half)
        return pa.table({"key": pa.array(key, pa.int64())})

    uh = (
        days.map_batches(half_counts, batch_format="pyarrow")
        .groupby("key")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .materialize()
    )

    def hist(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "h1": pa.array([int((k % 2 == 0).sum())], pa.int64()),
                "h2": pa.array([int((k % 2 == 1).sum())], pa.int64()),
            }
        )

    hc = uh.map_batches(hist, batch_format="pyarrow").aggregate(
        _Sum("h1", alias_name="h1"), _Sum("h2", alias_name="h2")
    )

    def user_rows(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        return pa.table({"u": pa.array(np.unique(k // 2), pa.int64())})

    n_union = (
        uh.map_batches(user_rows, batch_format="pyarrow")
        .groupby("u")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .count()
    )
    eu = est_x1000(union)
    df = pd.DataFrame(
        [
            {
                "m": m,
                "n_h1": int(hc["h1"]),
                "n_h2": int(hc["h2"]),
                "n_union": n_union,
                "est_h1_x1000": est_x1000(regs[0]),
                "est_h2_x1000": est_x1000(regs[1]),
                "est_union_x1000": eu,
                "union_err_x1000": eu - 1000 * n_union,
            }
        ]
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def cmh_test(sf_dir: str) -> "pd.DataFrame":
    """Exact Cochran-Mantel-Haenszel sufficient statistics — the
    STRATIFIED 2×2 association test that completes the categorical
    family (chi2_independence tests the marginal table; CMH tests
    exposure→outcome WITHIN strata, immune to the confounding that
    makes marginal associations lie — Simpson's paradox, quantified):
    strata = market segment, exposure = non-negative account
    balance, outcome = customer placed ≥ 1 order. Per stratum the
    exact 2×2 row (stratum, a, r1, c1, n) where a = exposed∧outcome,
    r1/c1 = margins: the CMH statistic
    (Σa − Σ r1·c1/n)² / Σ r1·c1·(n−r1)(n−c1)/(n²(n−1)) is exact
    rational arithmetic downstream, per-stratum expectations never
    floored early. Output one row per stratum.

    Scale shape: the customer projection and an orders semi-join
    flag meet in one custkey co-partition (never a broadcast); the
    2×2 grid folds in a bounded ≤|segments|-cell exchange."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        bal = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "ck": pa.array(ck, pa.int64()),
                "seg": batch.column("c_mktsegment"),
                "exposed": pa.array((bal >= 0).astype(np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(ck), np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        ck = np.unique(
            batch.column("o_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        return pa.table(
            {
                "ck": pa.array(ck, pa.int64()),
                "seg": pa.array([""] * len(ck), pa.string()),
                "exposed": pa.array(np.zeros(len(ck), np.int64), pa.int64()),
                "side": pa.array(np.ones(len(ck), np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def grid_part(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        ck = part_tbl.column("ck").to_numpy(zero_copy_only=False)
        seg = part_tbl.column("seg").to_pandas().to_numpy(dtype=object)
        ex = part_tbl.column("exposed").to_numpy(zero_copy_only=False)
        side = part_tbl.column("side").to_numpy(zero_copy_only=False)
        buyers = np.unique(ck[side == 1])
        cmask = side == 0
        has = np.isin(ck[cmask], buyers).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "seg": seg[cmask],
                    "n": 1,
                    "r1": ex[cmask],
                    "c1": has,
                    "a": ex[cmask] * has,
                }
            )
            .groupby("seg", sort=False)
            .agg(n=("n", "sum"), r1=("r1", "sum"), c1=("c1", "sum"),
                 a=("a", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "stratum": pa.array(g["seg"], pa.string()),
                "a": pa.array(g["a"].to_numpy(np.int64), pa.int64()),
                "r1": pa.array(g["r1"].to_numpy(np.int64), pa.int64()),
                "c1": pa.array(g["c1"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    rows = (
        cust.map_batches(cust_side, batch_format="pyarrow")
        .union(orders.map_batches(order_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(grid_part, batch_format="pyarrow")
        .groupby("stratum")
        .aggregate(
            _Sum("a", alias_name="a"),
            _Sum("r1", alias_name="r1"),
            _Sum("c1", alias_name="c1"),
            _Sum("n", alias_name="n"),
        )
        .take_all()  # bounded: one row per segment
    )
    df = pd.DataFrame(rows).sort_values("stratum", ignore_index=True)
    for c in ["a", "r1", "c1", "n"]:
        df[c] = df[c].astype("int64")
    return df[["stratum", "a", "r1", "c1", "n"]]


def hodges_lehmann(sf_dir: str) -> "pd.DataFrame":
    """Exact Hodges-Lehmann pseudo-median per market segment — the
    median of the Walsh-average multiset {(x_i + x_j)/2 : i ≤ j} over
    customer balances (integer cents): the location estimator dual to
    the Wilcoxon signed-rank test, ~95% Gaussian-efficient yet with a
    29% breakdown point — the robust-location leg the stats family
    lacks (`winsorized_stats` trims by quantile, `tukey_fences` flags
    by IQR, `theil_sen_slope` is the HL idea applied to slopes; this
    is the HL estimator itself). To stay in integers the output is
    the lower/upper middle ORDER STATISTICS of the Walsh-SUM multiset
    (x_i + x_j, i ≤ j): hl_cents = (walsh_lo + walsh_hi) / 4.

    Scale shape: never materializes the O(n²) pair multiset — a
    per-batch (segment, cents) → count pre-reduction bounds the
    shuffled rows by the DISCRETE balance domain (acctbal spans
    [-999.99, 9999.99]: ≤ 1.1M distinct cents, the `weighted_median`
    contract), then per-segment the k-th smallest Walsh sum is found
    by binary search over the sum domain with a vectorized
    two-pointer/prefix-sum count of pairs ≤ T (O(D log D) per probe,
    ~22 probes) — selection over n² implicit pairs at histogram
    cost. Output (segment, n, walsh_lo, walsh_hi)."""
    import pandas as pd

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        bal = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
        cents = np.floor(bal * 100.0 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "seg": batch.column("c_mktsegment"),
                "v": pa.array(cents, pa.int64()),
                "c": pa.array(np.ones(len(cents), np.int64), pa.int64()),
            }
        ).group_by(["seg", "v"]).aggregate([("c", "sum")])
        return pa.table(
            {
                "seg": t.column("seg"),
                "v": t.column("v"),
                "c": t.column("c_sum").cast(pa.int64()),
            }
        )

    def pick(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = group.to_pandas().groupby("v", sort=True)["c"].sum()
        vals = df.index.to_numpy(dtype=np.int64)
        cnt = df.to_numpy(dtype=np.int64)
        cum = cnt.cumsum()
        n = int(cum[-1])
        m = n * (n + 1) // 2
        k1, k2 = (m + 1) // 2, m // 2 + 1

        def pairs_le(t: int) -> int:
            # ordered pairs (any order, incl i=j) with v_i + v_j <= t
            idx = np.searchsorted(vals, t - vals, side="right") - 1
            w = np.where(idx >= 0, cum[np.maximum(idx, 0)], 0)
            p = int((cnt * w).sum())
            d = int(cnt[2 * vals <= t].sum())
            return (p + d) // 2

        def kth(k: int) -> int:
            lo, hi = int(2 * vals[0]), int(2 * vals[-1])
            while lo < hi:
                mid = (lo + hi) // 2
                if pairs_le(mid) >= k:
                    hi = mid
                else:
                    lo = mid + 1
            return lo

        return pa.table(
            {
                "segment": pa.array(
                    [group.column("seg")[0].as_py()], pa.string()
                ),
                "n": pa.array([n], pa.int64()),
                "walsh_lo": pa.array([kth(k1)], pa.int64()),
                "walsh_hi": pa.array([kth(k2)], pa.int64()),
            }
        )

    rows = (
        cust.map_batches(partials, batch_format="pyarrow")
        .groupby("seg")
        .map_groups(pick, batch_format="pyarrow")
        .take_all()  # bounded: one row per segment
    )
    df = pd.DataFrame(rows).sort_values("segment", ignore_index=True)
    for c in ["n", "walsh_lo", "walsh_hi"]:
        df[c] = df[c].astype("int64")
    return df[["segment", "n", "walsh_lo", "walsh_hi"]]


def roaring_container_audit(sf_dir: str) -> "pd.DataFrame":
    """Roaring-bitmap CONTAINER plan for the distinct order-key set —
    per 2^16-value chunk, the exact distinct count, the number of
    maximal consecutive-integer runs, and the container the Roaring
    rules pick with its serialized cost: `array` (2 bytes/value) when
    ≤ 4096 values, `bitmap` (fixed 8 KiB) above, overridden by `run`
    (2 + 4·runs bytes) when cheaper — the storage layout every
    bitmap-index / posting-list engine (Lucene, ClickHouse, Druid,
    Pilosa) derives from exactly these three numbers. TPC-H order
    keys are gappy by construction (3 of every 4 key slots unused),
    so chunks sit near the array/run boundary and the audit is a
    non-trivial planning decision per chunk — the per-container
    complement to `bitmap_index_audit`'s per-column view and
    `rle_encoding_audit`'s sorted-column runs.

    Scale shape: per-batch pre-distinct bounds the shuffled rows by
    distinct keys per batch; one coarse chunk-keyed exchange
    co-locates each chunk (a chunk's rows never straddle
    partitions), then the census is one vectorized np.unique/diff
    per partition. Output one row per chunk, ordered."""
    import pandas as pd

    from ..stages.shuffle import N_COARSE_PARTS

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        v = np.unique(
            batch.column("o_orderkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        chunk = v >> 16
        return pa.table(
            {
                "chunk": pa.array(chunk, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "part": pa.array(chunk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def census(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = pd.DataFrame(
            {
                "chunk": part_tbl.column("chunk").to_numpy(
                    zero_copy_only=False
                ),
                "v": part_tbl.column("v").to_numpy(zero_copy_only=False),
            }
        )
        rows = []
        for chunk, g in df.groupby("chunk", sort=True):
            vals = np.unique(g["v"].to_numpy(np.int64))
            n = len(vals)
            runs = 1 + int((np.diff(vals) > 1).sum()) if n else 0
            run_cost = 2 + 4 * runs
            alt_cost = 2 * n if n <= 4096 else 8192
            if run_cost < alt_cost:
                cont, cost = "run", run_cost
            elif n <= 4096:
                cont, cost = "array", alt_cost
            else:
                cont, cost = "bitmap", alt_cost
            rows.append((int(chunk), n, runs, cont, cost))
        return pa.table(
            {
                "chunk": pa.array([r[0] for r in rows], pa.int64()),
                "n_values": pa.array([r[1] for r in rows], pa.int64()),
                "n_runs": pa.array([r[2] for r in rows], pa.int64()),
                "container": pa.array([r[3] for r in rows], pa.string()),
                "est_bytes": pa.array([r[4] for r in rows], pa.int64()),
            }
        )

    df = (
        orders.map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: census(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    for c in ["chunk", "n_values", "n_runs", "est_bytes"]:
        df[c] = df[c].astype("int64")
    return df.sort_values("chunk", ignore_index=True)[
        ["chunk", "n_values", "n_runs", "container", "est_bytes"]
    ]


TA_K = 8                    # rank-join top-k
TA_GRID = (1, 2, 4, 8, 16, 32, 64, 128, 256)  # audited sorted-access depths


def ta_topk_depth_audit(sf_dir: str) -> "pd.DataFrame":
    """Fagin Threshold-Algorithm EARLY-TERMINATION audit for the
    rank-join top-k over two part scores (s1 = retail-price cents,
    s2 = 1000·size): at each audited sorted-access depth d, the
    exact TA state — threshold T(d) = s1@d + s2@d (the d-th entries
    of the two descending lists, ties broken by part id), the number
    of items SEEN (rank ≤ d in either list), and the k-th best exact
    total among seen items — plus the stop flag kth_best ≥ T(d).
    The first stopped depth is how deep a top-k rank join must scan
    before the TA bound certifies the answer: the measurement behind
    choosing sorted-access prefetch for any score-combining top-k
    (retrieval fusion, `rrf_fusion`'s cousin with a certificate).

    Scale shape: the two depth-256 list prefixes come from two
    bounded sort-limits (driver holds 2·256 rows — the audited-depth
    contract); the cutoffs broadcast in-closure and item scoring is
    ONE streaming pass emitting per-(depth) partials: a seen-count
    cell plus the batch-local top-k totals; the global k-th best is
    a per-depth top-k merge over ≤ k·|grid| rows per partition fold.
    Never a full rank materialization, never a driver scan."""
    import pandas as pd

    parts_ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_retailprice", "p_size"],
    )

    def score(batch: pa.Table) -> pa.Table:
        pk = batch.column("p_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        s1 = np.floor(
            batch.column("p_retailprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        s2 = batch.column("p_size").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) * 1000
        return pa.table(
            {
                "id": pa.array(pk, pa.int64()),
                "s1": pa.array(s1, pa.int64()),
                "s2": pa.array(s2, pa.int64()),
            }
        )

    scored = parts_ds.map_batches(score, batch_format="pyarrow").materialize()
    n_items = scored.count()
    grid = [d for d in TA_GRID if d <= n_items]
    max_d = grid[-1]

    pre1 = scored.sort(["s1", "id"], descending=[True, False]).limit(
        max_d
    ).take_all()
    pre2 = scored.sort(["s2", "id"], descending=[True, False]).limit(
        max_d
    ).take_all()
    cut1 = [(int(pre1[d - 1]["s1"]), int(pre1[d - 1]["id"])) for d in grid]
    cut2 = [(int(pre2[d - 1]["s2"]), int(pre2[d - 1]["id"])) for d in grid]
    thresholds = {
        d: cut1[i][0] + cut2[i][0] for i, d in enumerate(grid)
    }

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        s1 = batch.column("s1").to_numpy(zero_copy_only=False)
        s2 = batch.column("s2").to_numpy(zero_copy_only=False)
        total = s1 + s2
        d_out, seen_out, tot_out = [], [], []
        for i, d in enumerate(grid):
            c1v, c1i = cut1[i]
            c2v, c2i = cut2[i]
            seen = (
                (s1 > c1v)
                | ((s1 == c1v) & (ids <= c1i))
                | (s2 > c2v)
                | ((s2 == c2v) & (ids <= c2i))
            )
            tops = np.sort(total[seen])[::-1][:TA_K]
            d_out.extend([d] * (1 + len(tops)))
            seen_out.append(int(seen.sum()))
            seen_out.extend([0] * len(tops))
            tot_out.append(-1)
            tot_out.extend(int(t) for t in tops)
        return pa.table(
            {
                "d": pa.array(d_out, pa.int64()),
                "n_seen": pa.array(seen_out, pa.int64()),
                "cand": pa.array(tot_out, pa.int64()),
            }
        )

    def per_depth(group: pa.Table) -> pa.Table:
        d = int(group.column("d")[0].as_py())
        seen = int(
            group.column("n_seen").to_numpy(zero_copy_only=False).sum()
        )
        cand = group.column("cand").to_numpy(zero_copy_only=False)
        cand = np.sort(cand[cand >= 0])[::-1]
        kth = int(cand[TA_K - 1]) if len(cand) >= TA_K and seen >= TA_K else -1
        return pa.table(
            {
                "depth": pa.array([d], pa.int64()),
                "n_seen": pa.array([seen], pa.int64()),
                "kth_best": pa.array([kth], pa.int64()),
            }
        )

    rows = (
        scored.map_batches(partials, batch_format="pyarrow")
        .groupby("d")
        .map_groups(per_depth, batch_format="pyarrow")
        .take_all()  # bounded: one row per audited depth
    )
    df = pd.DataFrame(rows).sort_values("depth", ignore_index=True)
    df["threshold"] = df["depth"].map(thresholds)
    df["stopped"] = (
        (df["kth_best"] >= 0) & (df["kth_best"] >= df["threshold"])
    ).astype("int64")
    for c in ["depth", "n_seen", "threshold", "kth_best", "stopped"]:
        df[c] = df[c].astype("int64")
    return df[["depth", "n_seen", "threshold", "kth_best", "stopped"]]


HAAR_L = 12                 # series padded to 2^12 = 4096 days
HAAR_TOP_K = 16             # synopsis size
HAAR_EPOCH = np.datetime64("1992-01-01")


def haar_synopsis(sf_dir: str) -> "pd.DataFrame":
    """Exact Haar-wavelet SYNOPSIS of the daily-revenue series — the
    top-16 detail coefficients of the unnormalized (integer) Haar
    transform of day-indexed revenue cents (zero-padded to 2^12),
    ranked by exact basis energy d²·2^{L−l}: the classic wavelet
    synopsis every approximate-query engine keeps instead of the
    full series (Matias/Vitter/Wang SIGMOD'98), and the
    multi-RESOLUTION complement to the time-series family here
    (`ewma_daily` smooths, `seasonality_dow` reads one period,
    `changepoint_split` finds one break; the wavelet ranking says
    WHICH scales carry the series' energy — a top-heavy low-level
    set means high-frequency noise, top-heavy high-level
    coefficients mean seasonal/trend structure). Integer sums/differences keep every
    coefficient exact; energies are compared in arbitrary precision
    (Python int / HUGEINT) so the ranking is bit-stable. Output
    (rnk, level, pos, coef), rnk 1..16 by (energy desc, level, pos).

    Scale shape: one domain-bounded (day, cents) fold — the day
    domain is the 7-year TPC-H calendar (≤ 2 557 rows, the
    `kendall_matrix_daily` contract) — then the 4096-point transform
    is driver arithmetic. At a series too long to hold (10^9 points)
    the transform tiles: each 2^k block transforms independently in
    a map_groups and only block summaries recurse — the documented
    dial; the day-grid fixture never needs it."""
    import pandas as pd

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_extendedprice"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        d = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        day = ((d.astype("datetime64[D]") - HAAR_EPOCH) // np.timedelta64(
            1, "D"
        )).astype(np.int64)
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "day": pa.array(day, pa.int64()),
                "c": pa.array(cents, pa.int64()),
            }
        ).group_by("day").aggregate([("c", "sum")])
        return pa.table(
            {
                "day": t.column("day"),
                "c": t.column("c_sum").cast(pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    rows = (
        lit.map_batches(partials, batch_format="pyarrow")
        .groupby("day")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the 7-year day domain
    )
    n = 1 << HAAR_L
    series = [0] * n
    for r in rows:
        d = int(r["day"])
        if 0 <= d < n:
            series[d] = int(r["c"])

    details: list[tuple[int, int, int, int]] = []  # (energy, level, pos, d)
    s = series
    for level in range(1, HAAR_L + 1):
        nxt, det = [], []
        for i in range(0, len(s), 2):
            a, b = s[i], s[i + 1]
            nxt.append(a + b)
            det.append(a - b)
        for pos, d in enumerate(det):
            details.append((d * d * (1 << (HAAR_L - level)), level, pos, d))
        s = nxt

    details.sort(key=lambda t: (-t[0], t[1], t[2]))
    top = details[:HAAR_TOP_K]
    df = pd.DataFrame(
        {
            "rnk": np.arange(1, len(top) + 1, dtype=np.int64),
            "level": np.array([t[1] for t in top], np.int64),
            "pos": np.array([t[2] for t in top], np.int64),
            "coef": np.array([t[3] for t in top], np.int64),
        }
    )
    return df


HIST_SEL_B = 16             # equi-depth buckets
HIST_SEL_PREDS = (          # (pred_id, lo, hi) in cents, half-open
    (1, 100_000, 200_000),
    (2, 1_000_000, 2_000_000),
    (3, 2_000_000, 4_000_000),
    (4, 5_000_000, 10_000_000),
    (5, 0, 1_500_000),
    (6, 9_000_000, 99_999_999),
)


def histogram_selectivity_audit(sf_dir: str) -> "pd.DataFrame":
    """Equi-depth-histogram SELECTIVITY-ESTIMATION error — build the
    16-bucket equi-depth histogram the classical optimizer keeps for
    l_extendedprice (bucket b spans ranks ⌊b·n/16⌋+1..⌊(b+1)·n/16⌋;
    boundaries are exact order statistics) and, for six fixed range
    predicates, compare the textbook continuous-uniform
    interpolation estimate Σ_b n_b·overlap/width (integer floor
    arithmetic, half-open [min_b, max_b+1) domains) against the true
    count: the estimation-error table behind every cost model's
    range-scan cardinality, and the single-column complement to
    `selectivity_drift`'s correlation audit (this one measures
    WITHIN-column skew error, that one cross-column independence
    error). Output (pred_id, lo, hi, est_rows, true_rows, abs_err).

    Scale shape: the (cents, count) histogram fold is bounded by the
    discrete price domain (the `weighted_median` contract) and goes
    through one constant-key co-partition so boundaries, estimates
    and true counts are all computed VECTORIZED inside one task —
    the driver sees only the 6 output rows."""
    import pandas as pd

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "v": pa.array(cents, pa.int64()),
                "c": pa.array(np.ones(len(cents), np.int64), pa.int64()),
            }
        ).group_by("v").aggregate([("c", "sum")])
        return pa.table(
            {
                "v": t.column("v"),
                "c": t.column("c_sum").cast(pa.int64()),
                "g": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            }
        )

    def audit(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = group.to_pandas().groupby("v", sort=True)["c"].sum()
        vals = df.index.to_numpy(dtype=np.int64)
        cnt = df.to_numpy(dtype=np.int64)
        cum = cnt.cumsum()
        n = int(cum[-1])

        def at_rank(k: int) -> int:
            return int(vals[np.searchsorted(cum, k, side="left")])

        buckets = []
        for b in range(HIST_SEL_B):
            lo_r = b * n // HIST_SEL_B
            hi_r = (b + 1) * n // HIST_SEL_B
            if hi_r == lo_r:
                continue
            buckets.append(
                (hi_r - lo_r, at_rank(lo_r + 1), at_rank(hi_r))
            )

        def true_count(lo: int, hi: int) -> int:
            a = np.searchsorted(vals, lo, side="left")
            b2 = np.searchsorted(vals, hi, side="left")
            return int(cnt[a:b2].sum())

        out = []
        for pid, lo, hi in HIST_SEL_PREDS:
            est = 0
            for nb, minb, maxb in buckets:
                ov = min(hi, maxb + 1) - max(lo, minb)
                if ov > 0:
                    est += nb * ov // (maxb + 1 - minb)
            tr = true_count(lo, hi)
            out.append((pid, lo, hi, est, tr, abs(est - tr)))
        arr = np.array(out, np.int64)
        return pa.table(
            {
                "pred_id": pa.array(arr[:, 0], pa.int64()),
                "lo": pa.array(arr[:, 1], pa.int64()),
                "hi": pa.array(arr[:, 2], pa.int64()),
                "est_rows": pa.array(arr[:, 3], pa.int64()),
                "true_rows": pa.array(arr[:, 4], pa.int64()),
                "abs_err": pa.array(arr[:, 5], pa.int64()),
            }
        )

    df = (
        lit.map_batches(partials, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda g: audit(g.drop_columns(["g"])),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("pred_id", ignore_index=True)


CSK_D = 3          # count-sketch register rows
CSK_W = 256        # counters per row
CSK_EVAL_TOP = 20  # heaviest users probed


def count_sketch_error(sf_dir: str) -> "pd.DataFrame":
    """Measured Count-SKETCH error — the signed-median estimator
    (Charikar/Chen/Farach-Colton) next to `cms_error_eval`'s
    min-estimator: registers C[d][h_d(u)] accumulate s_d(u)·count
    with a ±1 hash sign, and the estimate is the MEDIAN over rows of
    s_d(u)·C[d][h_d(u)] — unbiased with TWO-sided error (collisions
    cancel in expectation), where Count-Min only ever overestimates.
    For the 20 heaviest users by exact count, (user_id, true_n,
    est_n, err = est−true): read against cms_error_eval's one-sided
    column, this is the sketch-family trade the curation pipeline
    picks between (biased-small-memory vs unbiased-needs-median).

    Scale shape: registers are PURE SUMS (layout-independent): each
    batch folds its unique users locally and emits signed (d, cell)
    contributions, Sum-reduced to the fixed D·W grid; exact top-20
    is one user fold + bounded sort-limit; the probe touches the
    broadcast-sized grid only. md5-derived cells/signs mirror the
    oracle bit-for-bit."""
    import hashlib as _hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def _cells(u: int):
        h = _hashlib.md5(str(u).encode()).hexdigest()
        h1, h2 = int(h[:15], 16), int(h[15:30], 16)
        cells = [(h1 + d * h2) % CSK_W for d in range(CSK_D)]
        signs = [1 if int(h[29 + d], 16) % 2 == 0 else -1
                 for d in range(CSK_D)]
        return cells, signs

    def reg_partials(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            return_counts=True,
        )
        d_out, cell_out, val_out = [], [], []
        for uid, n in zip(u, cnt):
            cells, signs = _cells(int(uid))
            for d in range(CSK_D):
                d_out.append(d)
                cell_out.append(cells[d])
                val_out.append(signs[d] * int(n))
        return pa.table(
            {
                "d": pa.array(d_out, pa.int64()),
                "cell": pa.array(cell_out, pa.int64()),
                "val": pa.array(val_out, pa.int64()),
            }
        )

    grid = np.zeros((CSK_D, CSK_W), np.int64)
    for r in (
        ds.map_batches(reg_partials, batch_format="pyarrow")
        .groupby(["d", "cell"])
        .aggregate(_Sum("val", alias_name="val"))
        .take_all()  # bounded: the fixed D x W register grid
    ):
        grid[int(r["d"]), int(r["cell"])] = int(r["val"])

    def count_partials(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            return_counts=True,
        )
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    top = (
        ds.map_batches(count_partials, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(_Sum("n", alias_name="true_n"))
        .sort(["true_n", "user_id"], descending=[True, False])
        .limit(CSK_EVAL_TOP)
        .take_all()
    )

    def med3(a: int, b: int, c: int) -> int:
        return max(min(a, b), min(max(a, b), c))

    rows = []
    for r in top:
        uid, tn = int(r["user_id"]), int(r["true_n"])
        cells, signs = _cells(uid)
        ests = [signs[d] * int(grid[d, cells[d]]) for d in range(CSK_D)]
        est = med3(*ests)
        rows.append((uid, tn, est, est - tn))
    df = pd.DataFrame(
        rows, columns=["user_id", "true_n", "est_n", "err"]
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values(
        ["true_n", "user_id"], ascending=[False, True], ignore_index=True
    )


JO_TABLES = ("region", "nation", "customer", "orders")
# Per-table local filters (each table carries its own predicate into
# every join order, as a Selinger enumerator assumes):
JO_REGIONS = ("ASIA", "EUROPE")
JO_NATION_MIN = "J"              # n_name >= 'J'
JO_SEGMENT = "BUILDING"
JO_PRIORITY = "1-URGENT"


def join_order_sequences():
    """All left-deep cross-product-free join orders of the 4-table FK
    chain region-nation-customer-orders: start anywhere, extend the
    connected interval left or right (2^3 patterns, 8 valid). Returns
    [(order_str, [interval prefixes of len >= 2])], sorted by
    order_str — shared verbatim with the SQL oracle generator."""
    import itertools

    seqs = []
    for start in range(4):
        for pattern in itertools.product((0, 1), repeat=3):
            lo = hi = start
            order = [JO_TABLES[start]]
            intervals = []
            ok = True
            for b in pattern:
                if b == 1:
                    if hi == 3:
                        ok = False
                        break
                    hi += 1
                    order.append(JO_TABLES[hi])
                else:
                    if lo == 0:
                        ok = False
                        break
                    lo -= 1
                    order.append(JO_TABLES[lo])
                intervals.append((lo, hi))
            if ok:
                seqs.append((">".join(order), intervals))
    return sorted(seqs)


def join_order_costs(sf_dir: str) -> "pd.DataFrame":
    """Selinger-style left-deep join-ORDER enumeration with EXACT
    intermediate cardinalities — for each of the 8 cross-product-free
    left-deep orders of the filtered FK chain σ(region) ⋈ σ(nation)
    ⋈ σ(customer) ⋈ σ(orders), the cost Σ|prefix join| over all
    length-≥2 prefixes (the classic CP-free cost model), ranked. On
    an UNfiltered N:1 chain every interval collapses to the fact
    count and the enumeration is degenerate; the per-table filters
    make the interval sizes genuinely diverge, so the ranking shows
    the real Selinger phenomenon — push the most selective tables
    earliest — with EXACT sizes where an optimizer uses estimates
    (read next to `histogram_selectivity_audit`'s estimation error
    and `join_strategy_plan`'s physical-operator choice, this is the
    third leg: logical order). Output (ord, order_str, cost).

    Scale shape: the 10 interval cardinalities are 4 streaming
    filtered counts, 3 catalog-bounded lookups (region 5 rows /
    nation 25 rows broadcast in-closure), and ONE custkey
    co-partition carrying three 0/1 customer flags that scores
    |c⋈o|, |n⋈c⋈o|, |r⋈n⋈c⋈o| together — the driver sees 10 ints
    and ranks 8 constant rows."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    region = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).take_all()  # bounded: 5-row catalog
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_regionkey", "n_name"],
    ).take_all()  # bounded: 25-row catalog

    rkeys_f = {
        int(r["r_regionkey"]) for r in region if r["r_name"] in JO_REGIONS
    }
    nat_f = [r for r in nation if r["n_name"] >= JO_NATION_MIN]
    nkeys_f = {int(r["n_nationkey"]) for r in nat_f}
    nkeys_rf = {
        int(r["n_nationkey"])
        for r in nat_f
        if int(r["n_regionkey"]) in rkeys_f
    }

    sizes = {
        (0, 0): len(rkeys_f),
        (1, 1): len(nat_f),
        (0, 1): len(nkeys_rf),
    }

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    nf_arr = np.array(sorted(nkeys_f), np.int64)
    nrf_arr = np.array(sorted(nkeys_rf), np.int64)

    def cust_side(batch: pa.Table) -> pa.Table:
        seg = batch.column("c_mktsegment").to_numpy(zero_copy_only=False)
        nk = batch.column("c_nationkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        f_plain = (seg == JO_SEGMENT).astype(np.int64)
        f_n = f_plain * np.isin(nk, nf_arr).astype(np.int64)
        f_rn = f_plain * np.isin(nk, nrf_arr).astype(np.int64)
        return pa.table(
            {
                "ck": pa.array(ck, pa.int64()),
                "f_plain": pa.array(f_plain, pa.int64()),
                "f_n": pa.array(f_n, pa.int64()),
                "f_rn": pa.array(f_rn, pa.int64()),
                "side": pa.array(np.zeros(len(ck), np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        pr = batch.column("o_orderpriority").to_numpy(zero_copy_only=False)
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[pr == JO_PRIORITY]
        z = np.zeros(len(ck), np.int64)
        return pa.table(
            {
                "ck": pa.array(ck, pa.int64()),
                "f_plain": pa.array(z, pa.int64()),
                "f_n": pa.array(z, pa.int64()),
                "f_rn": pa.array(z, pa.int64()),
                "side": pa.array(np.ones(len(ck), np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def score(part_tbl: pa.Table) -> pa.Table:
        ck = part_tbl.column("ck").to_numpy(zero_copy_only=False)
        side = part_tbl.column("side").to_numpy(zero_copy_only=False)
        cm = side == 0
        c_ck = ck[cm]
        o_ck = ck[~cm]
        if len(c_ck) == 0 or len(o_ck) == 0:
            z = [0, 0, 0]
            return pa.table(
                {
                    "co": pa.array([z[0]], pa.int64()),
                    "nco": pa.array([z[1]], pa.int64()),
                    "rnco": pa.array([z[2]], pa.int64()),
                }
            )
        srt = np.argsort(c_ck)
        c_ck_s = c_ck[srt]
        idx = np.searchsorted(c_ck_s, o_ck)
        idx = np.clip(idx, 0, len(c_ck_s) - 1)
        hit = c_ck_s[idx] == o_ck
        out = []
        for col in ("f_plain", "f_n", "f_rn"):
            f = part_tbl.column(col).to_numpy(zero_copy_only=False)[cm][srt]
            out.append(int(f[idx[hit]].sum()))
        return pa.table(
            {
                "co": pa.array([out[0]], pa.int64()),
                "nco": pa.array([out[1]], pa.int64()),
                "rnco": pa.array([out[2]], pa.int64()),
            }
        )

    # customer-only interval sizes fold in the same pass as the flags;
    # the mapped side is materialized once and reused by the custkey
    # co-partition below (saves a second full customer scan+map)
    cust_mapped = cust.map_batches(
        cust_side, batch_format="pyarrow"
    ).materialize()
    c_sizes = cust_mapped.aggregate(
        _Sum("f_plain", alias_name="c"),
        _Sum("f_n", alias_name="nc"),
        _Sum("f_rn", alias_name="rnc"),
    )
    sizes[(2, 2)] = int(c_sizes["c"])
    sizes[(1, 2)] = int(c_sizes["nc"])
    sizes[(0, 2)] = int(c_sizes["rnc"])

    o_cnt = orders.map_batches(
        lambda b: pa.table(
            {
                "n": pa.array(
                    [
                        int(
                            (
                                b.column("o_orderpriority").to_numpy(
                                    zero_copy_only=False
                                )
                                == JO_PRIORITY
                            ).sum()
                        )
                    ],
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).aggregate(_Sum("n", alias_name="n"))
    sizes[(3, 3)] = int(o_cnt["n"])

    fact = (
        cust_mapped
        .union(orders.map_batches(order_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(
            lambda g: score(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .aggregate(
            _Sum("co", alias_name="co"),
            _Sum("nco", alias_name="nco"),
            _Sum("rnco", alias_name="rnco"),
        )
    )
    sizes[(2, 3)] = int(fact["co"])
    sizes[(1, 3)] = int(fact["nco"])
    sizes[(0, 3)] = int(fact["rnco"])

    rows = []
    for order_str, intervals in join_order_sequences():
        rows.append((order_str, sum(sizes[iv] for iv in intervals)))
    df = pd.DataFrame(rows, columns=["order_str", "cost"]).sort_values(
        ["cost", "order_str"], ignore_index=True
    )
    df.insert(0, "ord", np.arange(1, len(df) + 1, dtype=np.int64))
    df["cost"] = df["cost"].astype("int64")
    return df


PFOR_BITS = (2, 4, 6, 8, 12, 16)   # audited pack widths
PFOR_LOCAL_MAX = 2_000_000         # rows below which the audit runs width-1
PFOR_BUCKETS = 256                 # value grid for the sorted-delta pass


def pfor_exception_audit(sf_dir: str) -> "pd.DataFrame":
    """PForDelta PACK-WIDTH audit — for the sorted order-key stream,
    the exact exception census at each candidate bit width b: deltas
    that don't fit b bits become 8-byte exceptions, so the estimated
    layout cost is 8 (first value) + ⌈(n−1)·b/8⌉ (packed deltas) +
    8·exc(b), and the audited widths trace the classic FastPFOR
    cost valley — too narrow drowns in exceptions, too wide wastes
    every slot. This is the BIT-PACKED member of the storage family:
    `varint_cost_audit` prices the byte-aligned LEB128 layouts; the
    posting-list engines that beat varint do it with exactly this
    exception tradeoff. Output one row per width:
    (bits, n_deltas, n_exceptions, est_bytes, is_best).

    Scale shape: the sorted-delta stream is never globally sorted —
    width-1 escape below PFOR_LOCAL_MAX rows (one local sort+diff);
    above it, the `varint_cost_audit` value-bucket grid: per-bucket
    LOCAL sorted diffs fold a 6-counter exceedance vector plus
    (vmin, vmax, count), and the driver adds the one boundary delta
    per consecutive non-empty bucket pair from the bounded
    256-bucket grid."""
    import pandas as pd

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    )
    rows = orders.map_batches(
        lambda b: pa.table(
            {
                "v": b.column("o_orderkey").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    n_rows = rows.count()

    if n_rows < PFOR_LOCAL_MAX:

        def local(tbl: pa.Table) -> pa.Table:
            v = np.sort(tbl.column("v").to_numpy(zero_copy_only=False))
            d = np.diff(v)
            nd = len(d)
            out_b, out_e = [], []
            for b in PFOR_BITS:
                out_b.append(b)
                out_e.append(int((d >= (1 << b)).sum()))
            return pa.table(
                {
                    "bits": pa.array(out_b, pa.int64()),
                    "nd": pa.array([nd] * len(out_b), pa.int64()),
                    "exc": pa.array(out_e, pa.int64()),
                }
            )

        got = (
            rows.repartition(1)
            .map_batches(local, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
        nd = int(got[0]["nd"]) if got else 0
        exc_map = {int(r["bits"]): int(r["exc"]) for r in got}
    else:
        from ray.data.aggregate import Max as _Max, Min as _Min

        lohi = rows.aggregate(_Min("v"), _Max("v"))
        vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
        wv = (vhi - vlo) // PFOR_BUCKETS + 1

        def keyed(batch: pa.Table) -> pa.Table:
            v = batch.column("v").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "cell", pa.array((v - vlo) // wv, pa.int64())
            )

        def bucket_census(group: pa.Table) -> pa.Table:
            cell = int(group.column("cell")[0].as_py())
            v = np.sort(group.column("v").to_numpy(zero_copy_only=False))
            d = np.diff(v)
            excs = [int((d >= (1 << b)).sum()) for b in PFOR_BITS]
            return pa.table(
                {
                    "cell": pa.array([cell], pa.int64()),
                    "cnt": pa.array([len(v)], pa.int64()),
                    "vmin": pa.array([int(v[0])], pa.int64()),
                    "vmax": pa.array([int(v[-1])], pa.int64()),
                    **{
                        f"e{b}": pa.array([e], pa.int64())
                        for b, e in zip(PFOR_BITS, excs)
                    },
                }
            )

        grid = (
            rows.map_batches(keyed, batch_format="pyarrow")
            .groupby("cell")
            .map_groups(bucket_census, batch_format="pyarrow")
            .take_all()  # bounded: the fixed 256-bucket grid
        )
        grid.sort(key=lambda r: int(r["cell"]))
        nd = sum(int(r["cnt"]) for r in grid) - 1 if grid else 0
        exc_map = {b: 0 for b in PFOR_BITS}
        prev_max = None
        for r in grid:
            for b in PFOR_BITS:
                exc_map[b] += int(r[f"e{b}"])
            if prev_max is not None:
                bd = int(r["vmin"]) - prev_max
                for b in PFOR_BITS:
                    if bd >= (1 << b):
                        exc_map[b] += 1
            prev_max = int(r["vmax"])

    out = []
    for b in PFOR_BITS:
        exc = exc_map.get(b, 0)
        est = 8 + (nd * b + 7) // 8 + 8 * exc
        out.append((b, nd, exc, est))
    import pandas as pd  # noqa: F811

    df = pd.DataFrame(
        out, columns=["bits", "n_deltas", "n_exceptions", "est_bytes"]
    )
    best = df.sort_values(["est_bytes", "bits"]).iloc[0]["bits"]
    df["is_best"] = (df["bits"] == best).astype("int64")
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("bits", ignore_index=True)


RR_FLIP_DEN = 4   # flip with probability 1/4 (hash-simulated)


def randomized_response_eval(sf_dir: str) -> "pd.DataFrame":
    """Randomized-response (Warner) DEBIASING eval — the local-DP
    mechanism simulated deterministically and closed exactly: each
    customer reports their sensitive bit (negative account balance)
    FLIPPED with probability 1/4 (an md5 bit of the customer key, so
    the 'coin' is reproducible), and the per-segment debiased
    estimate ŷ = (4·obs − n)/2 is compared to the true count. The
    LOCAL-privacy complement to `dp_sensitivity_audit`'s central
    sensitivity: this is the estimator a collector uses when it
    never sees true bits, and err_x2 measures the realized (not
    just expected) debiasing error on this corpus. All integer:
    est_x2 = 4·obs − n so est = est_x2/2. Output per segment:
    (stratum, n, true_yes, obs_yes, est_x2, err_x2).

    Scale shape: one streaming pass — per batch the md5 coin and
    both bits vectorize into four per-segment cells; one bounded
    ≤|segments| fold. No shuffle wider than the segment grid."""
    import hashlib as _hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )

    def cells(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        bal = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
        y = (bal < 0).astype(np.int64)
        flip = np.array(
            [
                int(_hashlib.md5(str(int(c)).encode()).hexdigest()[:2], 16)
                % RR_FLIP_DEN
                == 0
                for c in ck
            ],
            np.int64,
        )
        obs = y ^ flip
        t = pa.table(
            {
                "stratum": batch.column("c_mktsegment"),
                "n": pa.array(np.ones(len(ck), np.int64), pa.int64()),
                "true_yes": pa.array(y, pa.int64()),
                "obs_yes": pa.array(obs, pa.int64()),
            }
        ).group_by("stratum").aggregate(
            [("n", "sum"), ("true_yes", "sum"), ("obs_yes", "sum")]
        )
        return pa.table(
            {
                "stratum": t.column("stratum"),
                "n": t.column("n_sum").cast(pa.int64()),
                "true_yes": t.column("true_yes_sum").cast(pa.int64()),
                "obs_yes": t.column("obs_yes_sum").cast(pa.int64()),
            }
        )

    rows = (
        cust.map_batches(cells, batch_format="pyarrow")
        .groupby("stratum")
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("true_yes", alias_name="true_yes"),
            _Sum("obs_yes", alias_name="obs_yes"),
        )
        .take_all()  # bounded: one row per segment
    )
    df = pd.DataFrame(rows).sort_values("stratum", ignore_index=True)
    for c in ["n", "true_yes", "obs_yes"]:
        df[c] = df[c].astype("int64")
    df["est_x2"] = 4 * df["obs_yes"] - df["n"]
    df["err_x2"] = df["est_x2"] - 2 * df["true_yes"]
    for c in ["est_x2", "err_x2"]:
        df[c] = df[c].astype("int64")
    return df[["stratum", "n", "true_yes", "obs_yes", "est_x2", "err_x2"]]


ST_LOCAL_MAX = 2_000_000   # rows below which the ranking runs width-1
ST_BUCKETS = 256           # value-range buckets for the distributed rank


def siegel_tukey(sf_dir: str) -> "pd.DataFrame":
    """Exact Siegel-Tukey rank-DISPERSION test statistics — the
    scale-difference leg of the nonparametric family: ranks are
    assigned ALTERNATING FROM THE EXTREMES of the pooled sorted
    order (1 to the smallest, 2-3 to the two largest, 4-5 to the
    next smallest pair, ...), so a group concentrated in the middle
    collects high ranks and a dispersed group low ones; the rank sum
    then feeds the Mann-Whitney machinery but tests VARIANCE, not
    location (`mann_whitney_u` / `kruskal_wallis` test shift;
    nothing else here tests spread nonparametrically). Pooled groups
    are the R vs A return flags over price cents; ties are broken
    deterministically by (value, orderkey, linenumber) — the audit
    convention, documented in place of midranks, keeping every rank
    an exact integer. Output per group: (grp, n, rank_sum).

    Scale shape: the global position is never computed by a global
    sort — width-1 escape below ST_LOCAL_MAX rows; above it the
    spearman bucket-grid discipline: a bounded 256-cell value-range
    count grid folds to the driver, prefix bases broadcast, and each
    bucket sorts LOCALLY by (v, ok, ln) to get exact global
    positions; the alternating-rank closed form (low depth d: odd →
    2d−1, even → 2d; high depth e: odd → 2e, even → 2e−1) vectorizes
    per bucket and two rank sums fold out."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
        ],
    )

    def rows_fn(batch: pa.Table) -> pa.Table:
        fl = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        keep = (fl == "R") | (fl == "A")
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)[keep]
        ok = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        ln = batch.column("l_linenumber").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        g = (fl[keep] == "R").astype(np.int64)  # 1 = R, 0 = A
        return pa.table(
            {
                "v": pa.array(cents, pa.int64()),
                "ok": pa.array(ok, pa.int64()),
                "ln": pa.array(ln, pa.int64()),
                "g": pa.array(g, pa.int64()),
            }
        )

    rows = lit.map_batches(rows_fn, batch_format="pyarrow").materialize()
    n_total = rows.count()

    def alt_ranks(pos: "np.ndarray", n: int) -> "np.ndarray":
        # pos is 1-based global position in the pooled sorted order
        low = pos <= (n + 1) // 2
        d = np.where(low, pos, n + 1 - pos)
        odd = d % 2 == 1
        r_low = np.where(odd, 2 * d - 1, 2 * d)
        r_high = np.where(odd, 2 * d, 2 * d - 1)
        return np.where(low, r_low, r_high).astype(np.int64)

    def fold(g: "np.ndarray", r: "np.ndarray") -> pa.Table:
        return pa.table(
            {
                "grp": pa.array(["A", "R"], pa.string()),
                "n": pa.array(
                    [int((g == 0).sum()), int((g == 1).sum())], pa.int64()
                ),
                "rank_sum": pa.array(
                    [int(r[g == 0].sum()), int(r[g == 1].sum())],
                    pa.int64(),
                ),
            }
        )

    if n_total < ST_LOCAL_MAX:

        def local(tbl: pa.Table) -> pa.Table:
            v = tbl.column("v").to_numpy(zero_copy_only=False)
            ok = tbl.column("ok").to_numpy(zero_copy_only=False)
            ln = tbl.column("ln").to_numpy(zero_copy_only=False)
            g = tbl.column("g").to_numpy(zero_copy_only=False)
            order = np.lexsort((ln, ok, v))
            pos = np.empty(len(v), np.int64)
            pos[order] = np.arange(1, len(v) + 1)
            return fold(g, alt_ranks(pos, len(v)))

        parts = (
            rows.repartition(1)
            .map_batches(local, batch_format="pyarrow", batch_size=None)
        )
    else:
        from ray.data.aggregate import Max as _Max, Min as _Min

        lohi = rows.aggregate(_Min("v"), _Max("v"))
        vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
        wv = (vhi - vlo) // ST_BUCKETS + 1

        def keyed(batch: pa.Table) -> pa.Table:
            v = batch.column("v").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "cell", pa.array((v - vlo) // wv, pa.int64())
            )

        kd = rows.map_batches(keyed, batch_format="pyarrow").materialize()
        counts = {
            int(r["cell"]): int(r["count()"])
            for r in kd.groupby("cell").count().take_all()
        }  # bounded: the 256-cell grid
        bases = {}
        acc = 0
        for c in sorted(counts):
            bases[c] = acc
            acc += counts[c]
        bases_ref = ray.put(bases)

        def bucket_fold(group: pa.Table, _n=n_total) -> pa.Table:
            cell = int(group.column("cell")[0].as_py())
            base = ray.get(bases_ref)[cell]
            v = group.column("v").to_numpy(zero_copy_only=False)
            ok = group.column("ok").to_numpy(zero_copy_only=False)
            ln = group.column("ln").to_numpy(zero_copy_only=False)
            g = group.column("g").to_numpy(zero_copy_only=False)
            order = np.lexsort((ln, ok, v))
            pos = np.empty(len(v), np.int64)
            pos[order] = base + np.arange(1, len(v) + 1)
            return fold(g, alt_ranks(pos, _n))

        parts = (
            kd.groupby("cell")
            .map_groups(bucket_fold, batch_format="pyarrow")
        )

    out = (
        parts.groupby("grp")
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("rank_sum", alias_name="rank_sum"),
        )
        .take_all()  # bounded: 2 group rows
    )
    df = pd.DataFrame(out).sort_values("grp", ignore_index=True)
    for c in ["n", "rank_sum"]:
        df[c] = df[c].astype("int64")
    return df[["grp", "n", "rank_sum"]]


HILB_N = 64    # grid side (order-6 Hilbert curve)


def _hilbert_xy2d(n: int, x: "np.ndarray", y: "np.ndarray") -> "np.ndarray":
    """Vectorized order-log2(n) Hilbert curve index (xy2d), the
    classic bit-twiddling walk mirrored level-by-level in the SQL
    oracle."""
    x = x.copy()
    y = y.copy()
    d = np.zeros(len(x), np.int64)
    s = n // 2
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * np.where(rx == 0, ry, 3 - ry)
        # rotate quadrant (canonical Wikipedia rot(): reflect with
        # n-1-·, then swap, whenever ry == 0)
        flip = (ry == 0) & (rx == 1)
        x = np.where(flip, n - 1 - x, x)
        y = np.where(flip, n - 1 - y, y)
        rot = ry == 0
        x2 = np.where(rot, y, x)
        y2 = np.where(rot, x, y)
        x, y = x2, y2
        s //= 2
    return d


def hilbert_locality_audit(sf_dir: str) -> "pd.DataFrame":
    """Space-filling-curve LOCALITY comparison — lay the non-empty
    cells of the (order-day × customer-key) 64×64 grid out in
    row-major, Z-order (bit interleave, `zorder_keys`' curve) and
    HILBERT order, and measure each layout's locality as the total
    and max Manhattan jump between consecutive non-empty cells: the
    number every clustered-storage engine is implicitly optimizing
    when it picks a cell ordering (neighboring cells share pages /
    row groups; a big jump is a seek). Z-order pays its notorious
    boundary jumps (crossing a quadrant seam teleports); Hilbert is
    jump-1 on the FULL grid by construction and near-1 on sparse
    grids — this audit puts exact numbers on that folklore for this
    corpus's occupancy pattern. Output one row per ordering:
    (ordering, n_cells, total_jump, max_jump).

    Scale shape: one domain-bounded (cell → count) fold — the grid
    is FIXED at 4096 cells regardless of corpus size (the
    `haar_synopsis` contract) — then all three orderings and their
    jump sums are driver arithmetic over ≤ 4096 rows; the Hilbert
    walk is the vectorized 6-level bit rotation, mirrored level by
    level in the oracle's unrolled CTEs."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_custkey"]
    )

    def cells(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        day = (
            (d.astype("datetime64[D]") - HAAR_EPOCH)
            // np.timedelta64(1, "D")
        ).astype(np.int64)
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        x = np.clip(day * HILB_N // 2557, 0, HILB_N - 1)
        y = ck % HILB_N
        cell = y * HILB_N + x
        t = pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "c": pa.array(np.ones(len(cell), np.int64), pa.int64()),
            }
        ).group_by("cell").aggregate([("c", "sum")])
        return pa.table(
            {"cell": t.column("cell"), "c": t.column("c_sum").cast(pa.int64())}
        )

    rows = (
        orders.map_batches(cells, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the fixed 4096-cell grid
    )
    cell = np.array(sorted(int(r["cell"]) for r in rows), np.int64)
    x = cell % HILB_N
    y = cell // HILB_N

    def zorder(xv: "np.ndarray", yv: "np.ndarray") -> "np.ndarray":
        z = np.zeros(len(xv), np.int64)
        for b in range(6):
            z |= ((xv >> b) & 1) << (2 * b)
            z |= ((yv >> b) & 1) << (2 * b + 1)
        return z

    orderings = {
        "row_major": y * HILB_N + x,
        "z_order": zorder(x, y),
        "hilbert": _hilbert_xy2d(HILB_N, x, y),
    }
    out = []
    for name in sorted(orderings):
        idx = np.argsort(orderings[name], kind="stable")
        xs, ys = x[idx], y[idx]
        jumps = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
        out.append(
            (
                name,
                len(xs),
                int(jumps.sum()) if len(jumps) else 0,
                int(jumps.max()) if len(jumps) else 0,
            )
        )
    df = pd.DataFrame(
        out, columns=["ordering", "n_cells", "total_jump", "max_jump"]
    )
    for c in ["n_cells", "total_jump", "max_jump"]:
        df[c] = df[c].astype("int64")
    return df.sort_values("ordering", ignore_index=True)


PTK_SHARDS = 16   # deterministic event shards (event_id % 16)
PTK_K = 32        # local and global top-k


def partial_topk_merge_eval(sf_dir: str) -> "pd.DataFrame":
    """The classic distributed-top-k FAILURE MODE measured exactly —
    shard events by event_id % 16 (ingest-order sharding: a user's
    events SPLIT across shards), take each shard's local top-32
    users by partial count, merge the candidate lists, and score the
    naive estimate (sum of the partial counts that survived local
    top-k) against the exact answer: for each true top-32 user,
    (rank, user_id, true_n, est_n, n_shards_counted, in_candidates).
    est_n < true_n happens exactly when a heavy user misses some
    shard's local top-k — the underestimation every
    local-topk-then-merge pipeline silently ships (`heavy_hitters_exact`
    is the exact fold; this measures what the shortcut loses; a
    sketch (`cms_error_eval`) brackets it from the other side).

    Scale shape: per-batch (shard, user) partial counts fold through
    one (shard, user)-keyed exchange; local top-32 is a per-shard
    bounded sort inside the fold partition; the candidate/truth
    comparison touches ≤ 16·32 candidate rows + the 32-row exact
    top (one user fold + bounded sort-limit)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        ev = batch.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        shard = ev % PTK_SHARDS
        t = pa.table(
            {
                "shard": pa.array(shard, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "n": pa.array(np.ones(len(u), np.int64), pa.int64()),
            }
        ).group_by(["shard", "user_id"]).aggregate([("n", "sum")])
        return pa.table(
            {
                "shard": t.column("shard"),
                "user_id": t.column("user_id"),
                "n": t.column("n_sum").cast(pa.int64()),
            }
        )

    sharded = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["shard", "user_id"])
        .aggregate(_Sum("n", alias_name="n"))
        .materialize()
    )

    def local_topk(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = group.to_pandas().sort_values(
            ["n", "user_id"], ascending=[False, True]
        ).head(PTK_K)
        return pa.table(
            {
                "user_id": pa.array(
                    df["user_id"].to_numpy(np.int64), pa.int64()
                ),
                "est": pa.array(df["n"].to_numpy(np.int64), pa.int64()),
                "sh": pa.array(np.ones(len(df), np.int64), pa.int64()),
            }
        )

    cands = (
        sharded.groupby("shard")
        .map_groups(local_topk, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            _Sum("est", alias_name="est_n"),
            _Sum("sh", alias_name="n_shards_counted"),
        )
        .take_all()  # bounded: <= 16*32 candidate rows
    )
    cmap = {
        int(r["user_id"]): (int(r["est_n"]), int(r["n_shards_counted"]))
        for r in cands
    }

    top = (
        sharded.groupby("user_id")
        .aggregate(_Sum("n", alias_name="true_n"))
        .sort(["true_n", "user_id"], descending=[True, False])
        .limit(PTK_K)
        .take_all()
    )
    out = []
    for i, r in enumerate(top, 1):
        u, tn = int(r["user_id"]), int(r["true_n"])
        est, nsh = cmap.get(u, (0, 0))
        out.append((i, u, tn, est, nsh, 1 if u in cmap else 0))
    df = pd.DataFrame(
        out,
        columns=[
            "rank", "user_id", "true_n", "est_n", "n_shards_counted",
            "in_candidates",
        ],
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def energy_distance(sf_dir: str) -> "pd.DataFrame":
    """Exact ENERGY-DISTANCE sufficient statistics between the R and
    A return-flag price distributions — the Székely-Rizzo two-sample
    statistic E = 2·E|X−Y| − E|X−X'| − E|Y−Y'|, kept exact as the
    three pairwise-absolute-difference SUMS over cents plus the two
    counts (n_x, n_y, sum_xy, sum_xx, sum_yy): E's sign/magnitude is
    then pure rational arithmetic. Energy distance is consistent
    against ALL distribution differences (location, scale, shape),
    where `mann_whitney_u` sees location, `siegel_tukey` scale and
    `ks_drift` the max ECDF gap — this is the omnibus leg of the
    two-sample family, and O(n²) pairwise sums are computed WITHOUT
    pairs: from the sorted value multiset, Σ_{i<j}|v_i−v_j| =
    Σ_i v_i·(2i−n−1) (tie-order invariant), and the cross term folds
    from per-value prefix counts of the opposite group.

    Scale shape: two domain-bounded (cents → count) histograms (the
    `weighted_median` contract) meet in ONE constant-key
    co-partition where all three sums vectorize from cumulative
    histogram arrays; the driver sees one 5-integer row. int64
    headroom: Σ|diff| ≤ n²·range ≈ 10¹⁷ at sf0.1 — the HUGEINT /
    split-accumulator dial is documented for beyond."""
    import pandas as pd

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        fl = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        keep = (fl == "R") | (fl == "A")
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)[keep]
        g = (fl[keep] == "R").astype(np.int64)
        t = pa.table(
            {
                "v": pa.array(cents, pa.int64()),
                "g": pa.array(g, pa.int64()),
                "c": pa.array(np.ones(len(cents), np.int64), pa.int64()),
            }
        ).group_by(["v", "g"]).aggregate([("c", "sum")])
        return pa.table(
            {
                "v": t.column("v"),
                "g": t.column("g"),
                "c": t.column("c_sum").cast(pa.int64()),
                "k": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = (
            group.to_pandas()
            .groupby(["v", "g"], sort=True)["c"]
            .sum()
            .reset_index()
        )

        def within(vals: "np.ndarray", cnt: "np.ndarray") -> int:
            # sum_{i<j} |v_i - v_j| over the expanded multiset:
            # expand via cumulative positions — for sorted distinct
            # values with counts, each value v at positions
            # (L+1..L+c): sum v*(2i-n-1) over its run =
            # v * (2*(L*c + c*(c+1)/2) - c*(n+1))
            n = int(cnt.sum())
            L = np.concatenate([[0], cnt.cumsum()[:-1]])
            coef = 2 * (L * cnt + cnt * (cnt + 1) // 2) - cnt * (n + 1)
            return int((vals * coef).sum())

        out = {}
        hists = {}
        for gi in (0, 1):
            sub = df[df["g"] == gi]
            vals = sub["v"].to_numpy(np.int64)
            cnt = sub["c"].to_numpy(np.int64)
            hists[gi] = (vals, cnt)
            out[gi] = (int(cnt.sum()), within(vals, cnt))

        # cross term: for each x value, sum over y of |x - y| from
        # the opposite histogram's prefix sums
        vx, cx = hists[1]  # R
        vy, cy = hists[0]  # A
        cumy_c = np.concatenate([[0], cy.cumsum()])
        cumy_s = np.concatenate([[0], (vy * cy).cumsum()])
        idx = np.searchsorted(vy, vx, side="right")
        ny, sy = int(cy.sum()), int((vy * cy).sum())
        le_c, le_s = cumy_c[idx], cumy_s[idx]
        per_x = vx * le_c - le_s + (sy - le_s) - vx * (ny - le_c)
        sum_xy = int((per_x * cx).sum())

        return pa.table(
            {
                "n_x": pa.array([out[1][0]], pa.int64()),
                "n_y": pa.array([out[0][0]], pa.int64()),
                "sum_xy": pa.array([sum_xy], pa.int64()),
                "sum_xx": pa.array([out[1][1]], pa.int64()),
                "sum_yy": pa.array([out[0][1]], pa.int64()),
            }
        )

    df = (
        lit.map_batches(partials, batch_format="pyarrow")
        .groupby("k")
        .map_groups(
            lambda g: fold(g.drop_columns(["k"])),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def cuped_moments(sf_dir: str) -> "pd.DataFrame":
    """Exact CUPED sufficient statistics — the variance-reduction
    workhorse of online experimentation (Deng et al., WSDM'13) kept
    in integers: per deterministic arm (user-id parity), the moment
    sums (n, sx, sy, sxx, sxy, syy) of X = the user's
    first-half-of-timeline event count (the pre-period covariate)
    and Y = the second-half count (the metric), plus the pooled
    θ pieces theta_num = n·Σxy − Σx·Σy and theta_den = n·Σxx −
    (Σx)², from which θ̂ and the variance-reduction factor
    1 − ρ² are exact rationals. `ab_lift` reads the effect;
    this measures how much pre-period adjustment would shrink its
    confidence interval — the experimentation-family leg nothing
    else here covers. Output one row per arm.

    Scale shape: the per-user (pre, post) pair folds from one
    (user)-keyed count exchange (timeline midpoint from a bounded
    min/max aggregate), then moments are a per-batch vectorized
    fold to two 8-integer rows. No driver state beyond them."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    lohi = ev.aggregate(_Min("ts"), _Max("ts"))
    # exact integer-microsecond midpoint (floor), mirrored by the
    # oracle's epoch_us arithmetic — no sub-µs interval rounding
    lo_us = int(
        np.datetime64(lohi["min(ts)"], "us").astype(np.int64)
    )
    hi_us = int(
        np.datetime64(lohi["max(ts)"], "us").astype(np.int64)
    )
    mid_us = lo_us + (hi_us - lo_us) // 2

    def per_user(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ts = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        pre = (ts < mid_us).astype(np.int64)
        t = pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "x": pa.array(pre, pa.int64()),
                "y": pa.array(1 - pre, pa.int64()),
            }
        ).group_by("user_id").aggregate([("x", "sum"), ("y", "sum")])
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "x": t.column("x_sum").cast(pa.int64()),
                "y": t.column("y_sum").cast(pa.int64()),
            }
        )

    users = (
        ev.map_batches(per_user, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            _Sum("x", alias_name="x"), _Sum("y", alias_name="y")
        )
    )

    def moments(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        arm = (u % 2).astype(np.int64)
        rows = []
        for a in (0, 1):
            m = arm == a
            xa, ya = x[m], y[m]
            rows.append(
                (
                    a,
                    int(m.sum()),
                    int(xa.sum()),
                    int(ya.sum()),
                    int((xa * xa).sum()),
                    int((xa * ya).sum()),
                    int((ya * ya).sum()),
                )
            )
        arr = np.array(rows, np.int64)
        return pa.table(
            {
                "arm": pa.array(arr[:, 0], pa.int64()),
                "n": pa.array(arr[:, 1], pa.int64()),
                "sx": pa.array(arr[:, 2], pa.int64()),
                "sy": pa.array(arr[:, 3], pa.int64()),
                "sxx": pa.array(arr[:, 4], pa.int64()),
                "sxy": pa.array(arr[:, 5], pa.int64()),
                "syy": pa.array(arr[:, 6], pa.int64()),
            }
        )

    rows = (
        users.map_batches(moments, batch_format="pyarrow")
        .groupby("arm")
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("sx", alias_name="sx"),
            _Sum("sy", alias_name="sy"),
            _Sum("sxx", alias_name="sxx"),
            _Sum("sxy", alias_name="sxy"),
            _Sum("syy", alias_name="syy"),
        )
        .take_all()  # bounded: 2 arm rows
    )
    df = pd.DataFrame(rows).sort_values("arm", ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    df["theta_num"] = df["n"] * df["sxy"] - df["sx"] * df["sy"]
    df["theta_den"] = df["n"] * df["sxx"] - df["sx"] * df["sx"]
    for c in ["theta_num", "theta_den"]:
        df[c] = df[c].astype("int64")
    return df[
        ["arm", "n", "sx", "sy", "sxx", "sxy", "syy",
         "theta_num", "theta_den"]
    ]


def grid_percolation(sf_dir: str) -> "pd.DataFrame":
    """Spatial CONNECTIVITY census of the workload heatmap — treat
    the occupied cells of the (order-day × custkey) 64×64 grid as
    sites and connect 4-neighbors (site percolation): one row with
    (n_occupied, n_adjacent_pairs, n_clusters, largest_cluster).
    Read next to `hilbert_locality_audit` (same grid, layout cost)
    this says whether occupancy is one percolating slab — batch
    scheduling and cache reuse behave completely differently than
    for scattered islands, and the giant-cluster fraction is the
    standard percolation order parameter for that transition.

    Scale shape: the grid is FIXED at 4096 cells — one
    domain-bounded (cell → count) fold, then adjacency and
    union-find are driver arithmetic over ≤ 4096 sites (the
    `haar_synopsis` contract); the oracle reaches the same
    components with a recursive CTE over the derived edge set."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_custkey"]
    )

    def cells(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        day = (
            (d.astype("datetime64[D]") - HAAR_EPOCH)
            // np.timedelta64(1, "D")
        ).astype(np.int64)
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        x = np.clip(day * HILB_N // 2557, 0, HILB_N - 1)
        y = ck % HILB_N
        cell = y * HILB_N + x
        t = pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "c": pa.array(np.ones(len(cell), np.int64), pa.int64()),
            }
        ).group_by("cell").aggregate([("c", "sum")])
        return pa.table(
            {"cell": t.column("cell"), "c": t.column("c_sum").cast(pa.int64())}
        )

    rows = (
        orders.map_batches(cells, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the fixed 4096-cell grid
    )
    occ = sorted(int(r["cell"]) for r in rows)
    occ_set = set(occ)
    parent = {c: c for c in occ}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    n_adj = 0
    for c in occ:
        x, y = c % HILB_N, c // HILB_N
        for nb in ((x + 1, y), (x, y + 1)):
            if nb[0] < HILB_N and nb[1] < HILB_N:
                c2 = nb[1] * HILB_N + nb[0]
                if c2 in occ_set:
                    n_adj += 1
                    ra, rb = find(c), find(c2)
                    if ra != rb:
                        parent[ra] = rb
    sizes: dict = {}
    for c in occ:
        r = find(c)
        sizes[r] = sizes.get(r, 0) + 1
    return pd.DataFrame(
        [
            {
                "n_occupied": len(occ),
                "n_adjacent_pairs": n_adj,
                "n_clusters": len(sizes),
                "largest_cluster": max(sizes.values()) if sizes else 0,
            }
        ]
    ).astype("int64")


SRP_BUCKETS = 16  # range-partition fan


def string_range_partition_plan(sf_dir: str) -> "pd.DataFrame":
    """RANGE-PARTITION boundary plan for a STRING sort key — the 15
    part-name order statistics at ranks ⌊i·n/16⌋ and the exact row
    count each resulting range bucket receives (row → bucket = how
    many boundaries ≤ its key): what a sort-based writer (Iceberg /
    Delta range distribution, Spark range partitioner) materializes
    before a global string sort, and the skew read that
    `shard_balance_plan`'s hash fan can't give — duplicate-heavy
    keys pile into one bucket HERE, visibly. Output per bucket:
    (bucket, lo_bound, n_rows).

    Scale shape: never a global string sort — a bounded 2-char
    prefix count grid (≤ 26² cells) folds to the driver, the driver
    locates which prefix cell holds each target rank, ONE
    prefix-cell co-partition extracts the 15 boundary strings from
    local sorts at local offsets, and a final streaming pass counts
    searchsorted bucket assignments; the driver holds 15 strings
    and the 16-row plan."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    parts_ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_name"]
    )

    def prefix_counts(batch: pa.Table) -> pa.Table:
        names = batch.column("p_name").to_pylist()
        pre = [(n or "  ")[:2] for n in names]
        import collections

        c = collections.Counter(pre)
        return pa.table(
            {
                "pre": pa.array(list(c.keys()), pa.string()),
                "c": pa.array(
                    np.fromiter(c.values(), np.int64, len(c)), pa.int64()
                ),
            }
        )

    grid = (
        parts_ds.map_batches(prefix_counts, batch_format="pyarrow")
        .groupby("pre")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the 2-char prefix grid
    )
    grid.sort(key=lambda r: r["pre"])
    n = sum(int(r["c"]) for r in grid)
    targets = [i * n // SRP_BUCKETS for i in range(1, SRP_BUCKETS)]

    # locate (prefix cell, local offset) for each target rank
    acc = 0
    want: dict = {}
    for r in grid:
        c = int(r["c"])
        for t in targets:
            if acc < t <= acc + c:
                want.setdefault(r["pre"], []).append(t - acc)
        acc += c
    want_ref = ray.put(want)

    def extract(group: pa.Table) -> pa.Table:
        wt = ray.get(want_ref)
        pre = group.column("pre")[0].as_py()
        offs = wt.get(pre)
        if not offs:
            return pa.table({"rank_off": pa.array([], pa.int64()),
                             "bound": pa.array([], pa.string())})
        names = sorted(group.column("name").to_pylist())
        return pa.table(
            {
                "rank_off": pa.array(offs, pa.int64()),
                "bound": pa.array([names[o - 1] for o in offs], pa.string()),
            }
        )

    tagged = parts_ds.map_batches(
        lambda b: pa.table(
            {
                "pre": pa.array(
                    [(x or "  ")[:2] for x in b.column("p_name").to_pylist()],
                    pa.string(),
                ),
                "name": b.column("p_name"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    got = (
        tagged.groupby("pre")
        .map_groups(extract, batch_format="pyarrow")
        .take_all()  # bounded: <= 15 boundary rows
    )
    # global boundary order == sorted bound strings: prefix cells are
    # contiguous in string order and within-cell local sort + offset
    # is the global rank, so sorting the extracted strings (dups kept)
    # reconstructs the rank order exactly
    bounds = sorted(r["bound"] for r in got)
    bref = np.array(bounds, dtype=object)

    def bucket_counts(batch: pa.Table) -> pa.Table:
        names = np.array(batch.column("p_name").to_pylist(), dtype=object)
        b = np.searchsorted(bref, names, side="right")
        bc = np.bincount(b, minlength=SRP_BUCKETS).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    np.arange(SRP_BUCKETS, dtype=np.int64), pa.int64()
                ),
                "n_rows": pa.array(bc[:SRP_BUCKETS], pa.int64()),
            }
        )

    agg = (
        parts_ds.map_batches(bucket_counts, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(_Sum("n_rows", alias_name="n_rows"))
        .take_all()
    )
    df = pd.DataFrame(agg).sort_values("bucket", ignore_index=True)
    df["lo_bound"] = [""] + bounds
    df["n_rows"] = df["n_rows"].astype("int64")
    df["bucket"] = df["bucket"].astype("int64")
    return df[["bucket", "lo_bound", "n_rows"]]


FSA_TENANTS = 16   # top users treated as tenants
FSA_CAP_DEN = 2    # capacity = total demand // 2


def fair_share_allocation(sf_dir: str) -> "pd.DataFrame":
    """Exact MAX-MIN FAIR (water-filling) allocation — the 16
    heaviest users are tenants with demand = their event count, the
    scheduler has capacity C = ⌊total/2⌋, and the allocation is the
    max-min fair point: tenants under the water level keep their
    demand, the rest share the remainder at one level L = R/(m−k),
    integerized by largest-remainder with the +1s going to the
    smallest user ids (fully deterministic, Σalloc = C exactly).
    This is the allocator inside every multi-tenant fair scheduler
    (YARN fair share / DRF's single-resource case); the audit names
    exactly who is capped and by how much on this workload —
    `budget_allocation`'s greedy knapsack is value-seeking, this is
    fairness-seeking, the two poles of the allocation family.
    Output (user_id, demand, alloc) by (demand desc, user_id).

    Scale shape: one user-count fold + a bounded 16-row sort-limit;
    the water-level scan (integer cross-multiplication, no
    division) and the remainder split are driver arithmetic on 16
    integers."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partials(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            return_counts=True,
        )
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    top = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(_Sum("n", alias_name="n"))
        .sort(["n", "user_id"], descending=[True, False])
        .limit(FSA_TENANTS)
        .take_all()
    )
    dem = sorted((int(r["n"]), int(r["user_id"])) for r in top)
    m = len(dem)
    total = sum(d for d, _ in dem)
    cap = total // FSA_CAP_DEN

    prefix = [0]
    for d, _ in dem:
        prefix.append(prefix[-1] + d)

    allocs: dict = {}
    if total <= cap:
        for d, u in dem:
            allocs[u] = d
    else:
        for kk in range(m):
            rem_n = m - kk
            rem = cap - prefix[kk]
            lower_ok = kk == 0 or dem[kk - 1][0] * rem_n <= rem
            upper_ok = rem < dem[kk][0] * rem_n
            if lower_ok and upper_ok:
                base, extra = divmod(rem, rem_n)
                unsat = sorted(u for _, u in dem[kk:])
                for d, u in dem[:kk]:
                    allocs[u] = d
                for i, u in enumerate(unsat):
                    allocs[u] = base + (1 if i < extra else 0)
                break

    rows = sorted(dem, key=lambda t: (-t[0], t[1]))
    df = pd.DataFrame(
        [(u, d, allocs[u]) for d, u in rows],
        columns=["user_id", "demand", "alloc"],
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


RB_NODES = 16   # cluster size before the resize


def rebalance_delta_audit(sf_dir: str) -> "pd.DataFrame":
    """REBALANCE-DELTA audit for two placement schemes — when the
    cluster grows 16 → 17 nodes, how many keys MOVE under (a) naive
    modulo placement and (b) rendezvous (highest-random-weight)
    hashing, as exact counts over the customer keys: the classic
    consistent-hashing result made concrete (modulo reshuffles
    ~15/16 of all keys; rendezvous moves only the ~1/17 that now
    prefer the new node — and every key that moves goes TO the new
    node, never laterally). `rendezvous_assign` places keys; this
    measures the operational cost of elasticity, which is the reason
    the scheme exists. Output (scheme, n_keys, n_moved, moved_bp).

    Scale shape: one streaming pass per scheme folded to two
    3-integer rows — per batch the 17 md5 scores per key vectorize
    as a (keys × nodes) argmax (md5 mirrored bit-for-bit in the
    oracle; ties broken by higher node id on both sides)."""
    import hashlib as _hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )

    def cells(batch: pa.Table) -> pa.Table:
        ks = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(ks)
        scores = np.empty((n, RB_NODES + 1), np.int64)
        for j, k in enumerate(ks.tolist()):
            for i in range(RB_NODES + 1):
                h = _hashlib.md5(f"{i}:{k}".encode()).hexdigest()
                scores[j, i] = int(h[:15], 16)
        # argmax with ties to the HIGHER node id: reverse the node
        # axis so np.argmax's first-wins picks the largest id
        rev = scores[:, ::-1]
        a16 = RB_NODES - 1 - np.argmax(rev[:, 1:], axis=1)
        a17 = RB_NODES - np.argmax(rev, axis=1)
        mv_r = int((a16 != a17).sum())
        mv_m = int(((ks % RB_NODES) != (ks % (RB_NODES + 1))).sum())
        return pa.table(
            {
                "scheme": pa.array(["mod", "rendezvous"], pa.string()),
                "n_keys": pa.array([n, n], pa.int64()),
                "n_moved": pa.array([mv_m, mv_r], pa.int64()),
            }
        )

    rows = (
        cust.map_batches(cells, batch_format="pyarrow")
        .groupby("scheme")
        .aggregate(
            _Sum("n_keys", alias_name="n_keys"),
            _Sum("n_moved", alias_name="n_moved"),
        )
        .take_all()  # bounded: 2 scheme rows
    )
    df = pd.DataFrame(rows).sort_values("scheme", ignore_index=True)
    for c in ["n_keys", "n_moved"]:
        df[c] = df[c].astype("int64")
    df["moved_bp"] = (df["n_moved"] * 10000 // df["n_keys"]).astype("int64")
    return df[["scheme", "n_keys", "n_moved", "moved_bp"]]


DCC_KS = (1, 2, 4, 8, 16, 32, 64, 128)  # dictionary cutoff grid


def dict_cutoff_curve(sf_dir: str) -> "pd.DataFrame":
    """HYBRID dictionary-encoding cutoff curve — for the part-type
    column, the exact serialized cost of a PARTIAL dictionary
    holding only the k most frequent values (freq desc, value asc)
    with an escape path for the rest: per row 1 escape bit plus
    either a ⌈log2(k+1)⌉-bit code (hit) or the raw 8·(len+1)-bit
    string (miss), plus the dictionary itself (Σ len+1 bytes over
    its k entries); est_bytes = dict + ⌈bits/8⌉. The is_best row is
    the partial-dictionary optimum — the knob real writers
    (Parquet's dict-size fallback, ORC's dictionary check) tune,
    where `dict_encoding_audit` only prices the all-or-nothing
    choice. Skewed value frequencies make the curve genuinely
    non-monotone in k. Output (k, n_hits, dict_bytes, est_bytes,
    is_best).

    Scale shape: one (value → count) fold bounded by the column's
    dictionary domain (p_type ≈ 150 values — the catalog-bounded
    contract), then the whole curve is driver arithmetic over that
    histogram."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    parts_ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        vals = batch.column("p_type").to_pylist()
        import collections

        c = collections.Counter(vals)
        return pa.table(
            {
                "v": pa.array(list(c.keys()), pa.string()),
                "c": pa.array(
                    np.fromiter(c.values(), np.int64, len(c)), pa.int64()
                ),
            }
        )

    hist = (
        parts_ds.map_batches(partials, batch_format="pyarrow")
        .groupby("v")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the p_type dictionary domain
    )
    ent = sorted(
        ((int(r["c"]), r["v"]) for r in hist), key=lambda t: (-t[0], t[1])
    )
    n = sum(c for c, _ in ent)
    miss_bits_total = sum(c * 8 * (len(v) + 1) for c, v in ent)

    out = []
    hits = 0
    dict_bytes = 0
    hit_miss_bits = 0  # bits of rows now encoded as dict hits
    cum = {0: (0, 0, 0)}
    for k in range(1, max(DCC_KS) + 1):
        if k <= len(ent):
            c, v = ent[k - 1]
            hits += c
            dict_bytes += len(v) + 1
            hit_miss_bits += c * 8 * (len(v) + 1)
        cum[k] = (hits, dict_bytes, hit_miss_bits)
    for k in DCC_KS:
        hits_k, db_k, hmb_k = cum[min(k, len(ent))] if k > len(ent) else cum[k]
        w_bits = max(1, (k + 1 - 1).bit_length())  # ceil(log2(k+1))
        bits = n + hits_k * w_bits + (miss_bits_total - hmb_k)
        est = db_k + (bits + 7) // 8
        out.append((k, hits_k, db_k, est))
    df = pd.DataFrame(
        out, columns=["k", "n_hits", "dict_bytes", "est_bytes"]
    )
    best = df.sort_values(["est_bytes", "k"]).iloc[0]["k"]
    df["is_best"] = (df["k"] == best).astype("int64")
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("k", ignore_index=True)


AMS_TRIALS = 12   # sign trials (3 groups of 4 -> median of means)


def ams_f2_eval(sf_dir: str) -> "pd.DataFrame":
    """AMS second-moment (F2) sketch eval — the Alon-Matias-Szegedy
    estimator measured against the exact second frequency moment of
    the user-activity distribution: twelve ±1-sign trials (md5
    coins) each maintain the PURE SUM T_j = Σ_u s_j(u)·f_u, the
    estimator is the median over 3 groups of the mean of 4 trial
    squares (E[T²] = F2), and the output row carries the exact F2,
    the three group sums, est_x4 = med3 (so est = est_x4/4) and the
    signed error. F2 is the self-join size / skew statistic
    (`hhi_concentration` is F2 normalized; a CMS row's collision
    mass is F2/W in expectation) — this closes the sketch-family
    loop for moments the way cms/count-sketch evals do for point
    queries. All integers: T_j ≤ ΣF1, T² ≤ 10¹² at sf0.1.

    Scale shape: trial sums are layout-independent pure sums — per
    batch the 12 signed contributions of its unique users fold as a
    12-cell exchange; exact F2 is one user-count exchange + a
    Σn² partial fold. Driver sees 12 + 1 integers."""
    import hashlib as _hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def trial_partials(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            return_counts=True,
        )
        t_out = np.zeros(AMS_TRIALS, np.int64)
        for uid, n in zip(u.tolist(), cnt.tolist()):
            for j in range(AMS_TRIALS):
                h = _hashlib.md5(f"{j}:{uid}".encode()).hexdigest()
                s = 1 if int(h[:2], 16) % 2 == 0 else -1
                t_out[j] += s * n
        return pa.table(
            {
                "trial": pa.array(
                    np.arange(AMS_TRIALS, dtype=np.int64), pa.int64()
                ),
                "t": pa.array(t_out, pa.int64()),
            }
        )

    trials = {
        int(r["trial"]): int(r["t"])
        for r in (
            ds.map_batches(trial_partials, batch_format="pyarrow")
            .groupby("trial")
            .aggregate(_Sum("t", alias_name="t"))
            .take_all()  # bounded: 12 trial rows
        )
    }

    def count_partials(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            return_counts=True,
        )
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    f2 = int(
        (
            ds.map_batches(count_partials, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(_Sum("n", alias_name="n"))
            .map_batches(
                lambda b: pa.table(
                    {
                        "sq": pa.array(
                            [
                                int(
                                    (
                                        b.column("n").to_numpy(
                                            zero_copy_only=False
                                        ).astype(np.int64)
                                        ** 2
                                    ).sum()
                                )
                            ],
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
            )
            .aggregate(_Sum("sq", alias_name="sq"))
        )["sq"]
    )

    g = [
        sum(trials[j] * trials[j] for j in range(4 * i, 4 * i + 4))
        for i in range(3)
    ]
    est_x4 = max(min(g[0], g[1]), min(max(g[0], g[1]), g[2]))
    df = pd.DataFrame(
        [
            {
                "f2_exact": f2,
                "g1_sum_t2": g[0],
                "g2_sum_t2": g[1],
                "g3_sum_t2": g[2],
                "est_x4": est_x4,
                "err_x4": est_x4 - 4 * f2,
            }
        ]
    ).astype("int64")
    return df


AQP_DENS = (16, 4)   # sample denominators for the estimate columns


def sampled_selectivity_audit(sf_dir: str) -> "pd.DataFrame":
    """SAMPLE-BASED selectivity estimation (AQP) error — the same
    six price-range predicates `histogram_selectivity_audit` feeds
    its equi-depth synopsis, estimated instead from deterministic
    Bernoulli row samples (md5(orderkey:linenumber) thresholds) at
    1/16 and 1/4, scaled back up and compared to the true count:
    the two classical cardinality-estimation inputs (histogram vs
    sample) now sit side by side on identical predicates, which is
    how an optimizer bake-off actually reads — histograms are
    cheap-but-shape-blind inside buckets, samples are shape-exact
    but noisy at low selectivity, and the err columns quantify both
    on this corpus. Output (pred_id, lo, hi, true_rows, est16,
    est4, err16, err4).

    Scale shape: ONE streaming pass — per batch the row hash and
    the six predicate masks vectorize into an 18-cell (pred ×
    {true, s16, s4}) partial, Sum-folded; the md5 row key is the
    `hash_sample` discipline (deterministic, layout-free)."""
    import hashlib as _hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    SPACE = 1 << 60
    thr = {d: SPACE // d for d in AQP_DENS}

    def cells(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ln = batch.column("l_linenumber").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        u = np.array(
            [
                int(
                    _hashlib.md5(f"{o}:{l}".encode()).hexdigest()[:15], 16
                )
                for o, l in zip(ok.tolist(), ln.tolist())
            ],
            np.int64,
        )
        pid_out, tr, s16, s4 = [], [], [], []
        in16 = u < thr[16]
        in4 = u < thr[4]
        for pid, lo, hi in HIST_SEL_PREDS:
            m = (cents >= lo) & (cents < hi)
            pid_out.append(pid)
            tr.append(int(m.sum()))
            s16.append(int((m & in16).sum()))
            s4.append(int((m & in4).sum()))
        return pa.table(
            {
                "pred_id": pa.array(pid_out, pa.int64()),
                "tr": pa.array(tr, pa.int64()),
                "s16": pa.array(s16, pa.int64()),
                "s4": pa.array(s4, pa.int64()),
            }
        )

    rows = (
        lit.map_batches(cells, batch_format="pyarrow")
        .groupby("pred_id")
        .aggregate(
            _Sum("tr", alias_name="true_rows"),
            _Sum("s16", alias_name="s16"),
            _Sum("s4", alias_name="s4"),
        )
        .take_all()  # bounded: 6 predicate rows
    )
    df = pd.DataFrame(rows).sort_values("pred_id", ignore_index=True)
    pred = {p: (lo, hi) for p, lo, hi in HIST_SEL_PREDS}
    df["lo"] = df["pred_id"].map(lambda p: pred[p][0])
    df["hi"] = df["pred_id"].map(lambda p: pred[p][1])
    df["est16"] = df["s16"] * 16
    df["est4"] = df["s4"] * 4
    df["err16"] = (df["est16"] - df["true_rows"]).abs()
    df["err4"] = (df["est4"] - df["true_rows"]).abs()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[
        ["pred_id", "lo", "hi", "true_rows", "est16", "est4",
         "err16", "err4"]
    ]


def mom_selection_audit(sf_dir: str) -> "pd.DataFrame":
    """MEDIAN-OF-MEDIANS pivot-quality audit — run the classic BFPRT
    grouping (consecutive doc_id groups of 5 over document lengths),
    take each group's middle element, take the exact lower median of
    those group medians, and measure where that pivot actually lands
    in the full distribution: (n, mom_value, mom_rank, median_rank,
    rank_bp). The theorem guarantees the pivot's rank in [30%, 70%];
    the audit shows the realized split on this corpus — the number
    behind every deterministic-selection / distributed-quantile
    fallback path (`global_quantiles`' exact ranks are what MoM
    approximates in one shuffle-free pass). rank_bp = ⌊10⁴·rank/n⌋.

    Scale shape: groups are doc_id//5 (contiguous ids — the
    `haar_synopsis` fixture contract), so group medians fold from a
    group-keyed exchange bounded by n/5 SLIM int rows; the median of
    medians is a domain-bounded (length → count) histogram pick
    (the `weighted_median` plan), and the final rank is one
    streaming count-less-than pass."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def grp_rows(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        v = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "g": pa.array(d // 5, pa.int64()),
                "pos": pa.array(d % 5, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "part": pa.array((d // 5) % 64, pa.int64()),
            }
        )

    def grp_median(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = pd.DataFrame(
            {
                "g": part_tbl.column("g").to_numpy(zero_copy_only=False),
                "v": part_tbl.column("v").to_numpy(zero_copy_only=False),
            }
        )
        med = (
            df.groupby("g")["v"]
            .apply(lambda s: int(np.sort(s.to_numpy())[(len(s) - 1) // 2]))
            .reset_index(name="m")
        )
        t = pa.table(
            {
                "m": pa.array(med["m"].to_numpy(np.int64), pa.int64()),
                "c": pa.array(np.ones(len(med), np.int64), pa.int64()),
            }
        ).group_by("m").aggregate([("c", "sum")])
        return pa.table(
            {"m": t.column("m"), "c": t.column("c_sum").cast(pa.int64())}
        )

    meds = (
        docs.map_batches(grp_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: grp_median(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .groupby("m")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the discrete length domain
    )
    mv = np.array(sorted(int(r["m"]) for r in meds), np.int64)
    mc = np.array(
        [c for _, c in sorted((int(r["m"]), int(r["c"])) for r in meds)],
        np.int64,
    )
    cum = mc.cumsum()
    n_groups = int(cum[-1])
    k = (n_groups + 1) // 2  # lower median of the group medians
    mom = int(mv[np.searchsorted(cum, k, side="left")])

    def rank_cells(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "lt": pa.array([int((v < mom).sum())], pa.int64()),
                "n": pa.array([len(v)], pa.int64()),
            }
        )

    agg = docs.map_batches(rank_cells, batch_format="pyarrow").aggregate(
        _Sum("lt", alias_name="lt"), _Sum("n", alias_name="n")
    )
    n, lt = int(agg["n"]), int(agg["lt"])
    mom_rank = lt + 1
    df = pd.DataFrame(
        [
            {
                "n": n,
                "mom_value": mom,
                "mom_rank": mom_rank,
                "median_rank": (n + 1) // 2,
                "rank_bp": mom_rank * 10000 // n if n else 0,
            }
        ]
    ).astype("int64")
    return df


def revenue_path_extremes(sf_dir: str) -> "pd.DataFrame":
    """PATH extremes of the daily-revenue series — exact maximum
    drawdown of the cumulative series (the largest peak-to-trough
    drop: max over t of running-max − v_t, with the peak/trough
    day indices, ties to the earliest) plus the longest strictly
    rising and strictly falling runs of the DAILY series: the
    path-dependent statistics the pointwise family (`ewma_daily`,
    `tukey_fences`, `runs_test` counts sign runs, `ohlc_daily` bars)
    never sees — drawdown (of the daily LEVEL series: largest drop
    from any earlier day's level, the price-series convention) is
    THE robustness number for level processes, and the longest
    monotone runs bound how long a trend detector can stay wrong. Output one row: (n_days, max_drawdown_cents, peak_day,
    trough_day, longest_rise, longest_fall).

    Scale shape: one day-domain-bounded (day, cents) fold (the
    `haar_synopsis` contract), then the path scan is driver
    arithmetic over ≤ 2557 integers; the oracle replays the same
    scan with window prefix-max and run-group CTEs."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_extendedprice"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        d = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        day = (
            (d.astype("datetime64[D]") - HAAR_EPOCH)
            // np.timedelta64(1, "D")
        ).astype(np.int64)
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "day": pa.array(day, pa.int64()),
                "c": pa.array(cents, pa.int64()),
            }
        ).group_by("day").aggregate([("c", "sum")])
        return pa.table(
            {"day": t.column("day"), "c": t.column("c_sum").cast(pa.int64())}
        )

    rows = (
        lit.map_batches(partials, batch_format="pyarrow")
        .groupby("day")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the 7-year day domain
    )
    series = sorted((int(r["day"]), int(r["c"])) for r in rows)
    days = [d for d, _ in series]
    vals = [c for _, c in series]

    run_max = None
    run_max_day = -1
    best_dd = 0
    best_peak = best_trough = -1
    for d, c in series:
        if run_max is None or c > run_max:
            run_max = c
            run_max_day = d
        dd = run_max - c
        if dd > best_dd:
            best_dd = dd
            best_peak = run_max_day
            best_trough = d

    longest_rise = longest_fall = 0
    cur_r = cur_f = 1 if vals else 0
    for i in range(1, len(vals)):
        if vals[i] > vals[i - 1]:
            cur_r += 1
            cur_f = 1
        elif vals[i] < vals[i - 1]:
            cur_f += 1
            cur_r = 1
        else:
            cur_r = cur_f = 1
        longest_rise = max(longest_rise, cur_r)
        longest_fall = max(longest_fall, cur_f)
    longest_rise = max(longest_rise, cur_r if vals else 0)
    longest_fall = max(longest_fall, cur_f if vals else 0)

    return pd.DataFrame(
        [
            {
                "n_days": len(series),
                "max_drawdown_cents": best_dd,
                "peak_day": best_peak,
                "trough_day": best_trough,
                "longest_rise": longest_rise,
                "longest_fall": longest_fall,
            }
        ]
    ).astype("int64")


PPS_TARGET = 256   # Poisson-PPS expected sample size


def pps_sample_calibration(sf_dir: str) -> "pd.DataFrame":
    """Poisson-PPS SAMPLING calibration — include each order with
    probability min(1, k·w/W) proportional to its price (k = 256,
    the deterministic md5 coin: include iff u·W < k·w·2⁶⁰ scaled
    exactly), then compare realized inclusion counts against the
    exact expected-count numerators per price decile: the
    design-calibration read for weighted sampling (`weighted_sample`
    draws a fixed-size A-ES sample; Poisson-PPS is the
    variable-size estimator HT-weighting assumes, and its realized-
    vs-expected gap per stratum is what a survey statistician
    checks first). expected_x1m = Σ ⌊10⁶·min(1, k·w/W)⌋ keeps the
    comparison in integers. Output per decile: (decile, n_orders,
    sum_price_cents, expected_x1m, realized).

    Scale shape: W and the decile boundaries come from the bounded
    price-histogram plan (`weighted_median` contract); the
    inclusion pass is one streaming map folding 4 cells per decile.
    The decile of an order is its rank bucket by (price, orderkey)
    — computed from the same histogram, never a global sort."""
    import hashlib as _hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def hist_partials(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "v": pa.array(cents, pa.int64()),
                "c": pa.array(np.ones(len(cents), np.int64), pa.int64()),
            }
        ).group_by("v").aggregate([("c", "sum")])
        return pa.table(
            {"v": t.column("v"), "c": t.column("c_sum").cast(pa.int64())}
        )

    hist = (
        orders.map_batches(hist_partials, batch_format="pyarrow")
        .groupby("v")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the discrete price domain
    )
    vals = np.array(sorted(int(r["v"]) for r in hist), np.int64)
    cnts = np.array(
        [c for _, c in sorted((int(r["v"]), int(r["c"])) for r in hist)],
        np.int64,
    )
    cum = cnts.cumsum()
    n = int(cum[-1])
    W = int((vals * cnts).sum())
    # decile of a value: by rank of its LAST occurrence bucketed —
    # deciles split at ranks ceil(i*n/10); a value's orders may span
    # deciles only at boundaries — assign by the order's rank among
    # (price, orderkey), reproduced below via (value, within-value
    # orderkey rank); for the decile bounds we need rank prefixes:
    starts = np.concatenate([[0], cum[:-1]])  # rank before each value

    SPACE = 1 << 60

    def cells(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        u = np.array(
            [
                int(_hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
                for k in ok.tolist()
            ],
            dtype=object,
        )
        # exact inclusion: u*W < k*w*2^60  (python ints, no overflow)
        inc = np.array(
            [
                1 if int(uu) * W < PPS_TARGET * int(w) * SPACE else 0
                for uu, w in zip(u, cents.tolist())
            ],
            np.int64,
        )
        # expected numerator per order: floor(1e6 * min(1, k*w/W))
        exp = np.array(
            [
                min(10**6, 10**6 * PPS_TARGET * int(w) // W)
                for w in cents.tolist()
            ],
            np.int64,
        )
        # decile via global rank midpoint of the order's value run:
        # rank(order) = starts[value] + (rank among same-value orders)
        # — same-value rank needs orderkey order within value; for
        # decile assignment we use the value's START rank (all orders
        # of one value share a decile unless the run straddles a
        # boundary; using the start rank makes the rule exact and
        # mirrorable: decile = start_rank * 10 // n)
        idx = np.searchsorted(vals, cents)
        dec = (starts[idx] * 10 // n).astype(np.int64)
        t = pa.table(
            {
                "decile": pa.array(dec, pa.int64()),
                "n_orders": pa.array(
                    np.ones(len(dec), np.int64), pa.int64()
                ),
                "sum_price_cents": pa.array(cents, pa.int64()),
                "expected_x1m": pa.array(exp, pa.int64()),
                "realized": pa.array(inc, pa.int64()),
            }
        ).group_by("decile").aggregate(
            [
                ("n_orders", "sum"),
                ("sum_price_cents", "sum"),
                ("expected_x1m", "sum"),
                ("realized", "sum"),
            ]
        )
        return pa.table(
            {
                "decile": t.column("decile"),
                **{
                    c: t.column(f"{c}_sum").cast(pa.int64())
                    for c in (
                        "n_orders", "sum_price_cents", "expected_x1m",
                        "realized",
                    )
                },
            }
        )

    rows = (
        orders.map_batches(cells, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(
            _Sum("n_orders", alias_name="n_orders"),
            _Sum("sum_price_cents", alias_name="sum_price_cents"),
            _Sum("expected_x1m", alias_name="expected_x1m"),
            _Sum("realized", alias_name="realized"),
        )
        .take_all()  # bounded: 10 decile rows
    )
    df = pd.DataFrame(rows).sort_values("decile", ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[
        ["decile", "n_orders", "sum_price_cents", "expected_x1m",
         "realized"]
    ]


HQE_BUCKETS = 64   # equi-width synopsis size


def histogram_quantile_error(sf_dir: str) -> "pd.DataFrame":
    """Equi-WIDTH-histogram QUANTILE-estimation error — the dual of
    `histogram_selectivity_audit`: that one asks a synopsis for a
    range COUNT; this one asks it for the nine DECILE VALUES of
    l_extendedprice and compares against the exact order statistics.
    The 64-bucket equi-width synopsis estimates decile i (target
    rank k = i·n/10, value at rank max(k,1)) by walking bucket
    cumulative counts and interpolating uniformly inside the
    crossing bucket (integer floor arithmetic on the half-open
    bucket span): est = lo_b + (k − cum_before)·width_b //
    count_b. Skewed mass makes the mid-deciles land deep inside
    fat buckets — the error column is the case for equi-DEPTH
    synopses when quantiles are the workload. Output (decile,
    exact_value, est_value, abs_err).

    Scale shape: everything derives from one domain-bounded
    (cents → count) histogram fold (the `weighted_median`
    contract) routed through one constant-key co-partition; both
    the exact deciles and the synopsis walk vectorize in that one
    task and the driver sees 9 rows."""
    import pandas as pd

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "v": pa.array(cents, pa.int64()),
                "c": pa.array(np.ones(len(cents), np.int64), pa.int64()),
            }
        ).group_by("v").aggregate([("c", "sum")])
        return pa.table(
            {
                "v": t.column("v"),
                "c": t.column("c_sum").cast(pa.int64()),
                "g": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            }
        )

    def audit(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = group.to_pandas().groupby("v", sort=True)["c"].sum()
        vals = df.index.to_numpy(dtype=np.int64)
        cnt = df.to_numpy(dtype=np.int64)
        cum = cnt.cumsum()
        n = int(cum[-1])
        vmin, vmax = int(vals[0]), int(vals[-1])
        wb = (vmax - vmin) // HQE_BUCKETS + 1

        # equi-width bucket counts
        bidx = (vals - vmin) // wb
        bcnt = np.zeros(HQE_BUCKETS, np.int64)
        np.add.at(bcnt, bidx, cnt)
        bcum = bcnt.cumsum()

        out = []
        for i in range(1, 10):
            k = max(i * n // 10, 1)
            exact = int(vals[np.searchsorted(cum, k, side="left")])
            b = int(np.searchsorted(bcum, k, side="left"))
            cum_before = int(bcum[b - 1]) if b > 0 else 0
            lo_b = vmin + b * wb
            est = lo_b + (k - cum_before) * wb // max(int(bcnt[b]), 1)
            out.append((i, exact, int(est), abs(int(est) - exact)))
        arr = np.array(out, np.int64)
        return pa.table(
            {
                "decile": pa.array(arr[:, 0], pa.int64()),
                "exact_value": pa.array(arr[:, 1], pa.int64()),
                "est_value": pa.array(arr[:, 2], pa.int64()),
                "abs_err": pa.array(arr[:, 3], pa.int64()),
            }
        )

    df = (
        lit.map_batches(partials, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda g: audit(g.drop_columns(["g"])),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("decile", ignore_index=True)


RING_NODES = 16              # physical nodes
RING_VNODES = (1, 4, 16, 64)  # virtual nodes per physical node


def ring_vnode_balance(sf_dir: str) -> "pd.DataFrame":
    """Consistent-hash RING balance vs virtual-node count — place
    the customer keys on a 16-node hash ring with v ∈ {1,4,16,64}
    virtual nodes each (ring positions md5(node:replica), key goes
    to the first position clockwise from md5(key)), and report the
    exact per-level load spread: (vnodes, n_keys, max_load,
    min_load, imbalance_bp = 10⁴·(max−min)/mean). The classic ring
    result measured: v = 1 leaves O(log n / n) spread, and the
    spread shrinks ~1/√v — the third placement scheme beside
    `rendezvous_assign` (HRW) and `rebalance_delta_audit`'s modulo,
    and the one real stores (Dynamo/Cassandra) actually run; the
    curve is the vnode-count sizing table.

    Scale shape: the ring (≤ 16·64 positions) is built on the
    driver and broadcast once; key placement is one streaming pass
    with a vectorized searchsorted per level, folding a bounded
    16-cell load grid per level."""
    import hashlib as _hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )

    rings = {}
    for v in RING_VNODES:
        pos, owner = [], []
        for node in range(RING_NODES):
            for rep in range(v):
                h = int(
                    _hashlib.md5(f"{node}:{rep}".encode()).hexdigest()[:15],
                    16,
                )
                pos.append(h)
                owner.append(node)
        order = np.argsort(np.array(pos, np.int64), kind="stable")
        rings[v] = (
            np.array(pos, np.int64)[order],
            np.array(owner, np.int64)[order],
        )
    rings_ref = ray.put(rings)

    def cells(batch: pa.Table) -> pa.Table:
        rg = ray.get(rings_ref)
        ks = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        u = np.array(
            [
                int(_hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
                for k in ks.tolist()
            ],
            np.int64,
        )
        v_out, n_out, l_out = [], [], []
        for v in RING_VNODES:
            pos, owner = rg[v]
            idx = np.searchsorted(pos, u, side="left")
            idx[idx == len(pos)] = 0  # wrap
            nodes = owner[idx]
            counts = np.bincount(nodes, minlength=RING_NODES).astype(
                np.int64
            )
            v_out.extend([v] * RING_NODES)
            n_out.extend(range(RING_NODES))
            l_out.extend(counts.tolist())
        return pa.table(
            {
                "vnodes": pa.array(v_out, pa.int64()),
                "node": pa.array(n_out, pa.int64()),
                "load": pa.array(l_out, pa.int64()),
            }
        )

    rows = (
        cust.map_batches(cells, batch_format="pyarrow")
        .groupby(["vnodes", "node"])
        .aggregate(_Sum("load", alias_name="load"))
        .take_all()  # bounded: 4 levels x 16 nodes
    )
    import collections

    per = collections.defaultdict(list)
    for r in rows:
        per[int(r["vnodes"])].append(int(r["load"]))
    out = []
    for v in RING_VNODES:
        loads = per[v]
        n_keys = sum(loads)
        mx, mn = max(loads), min(loads)
        mean = n_keys // RING_NODES
        out.append(
            (v, n_keys, mx, mn, (mx - mn) * 10000 // max(mean, 1))
        )
    df = pd.DataFrame(
        out,
        columns=["vnodes", "n_keys", "max_load", "min_load",
                 "imbalance_bp"],
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


import itertools as _itertools

PRED_ORDER_NAMES = ("ret_r", "qty_hi", "disc_hi", "status_f")


def predicate_order_sequences():
    """All 24 evaluation orders of the four canonical lineitem
    predicates — shared verbatim with the SQL oracle generator."""
    return sorted(
        ">".join(p) for p in _itertools.permutations(PRED_ORDER_NAMES)
    )


def predicate_order_costs(sf_dir: str) -> "pd.DataFrame":
    """SHORT-CIRCUIT conjunct-ordering costs with EXACT conditional
    selectivities — for every one of the 24 evaluation orders of the
    four canonical lineitem predicates (returnflag='R',
    quantity≥25, discount≥5%, linestatus='F'), the exact number of
    predicate evaluations a short-circuiting AND performs:
    evals = n + n_{p1} + n_{p1∧p2} + n_{p1∧p2∧p3}. The textbook
    rule orders by MARGINAL selectivity, but correlated predicates
    break it (`selectivity_drift` measures the correlations; this
    costs their consequence): the exact 2⁴-cell joint distribution
    makes every conditional exact, and the ranking shows how far
    the marginal-order heuristic lands from optimal on this corpus.
    Output (ord, order_str, evals), ranked by (evals, order_str).

    Scale shape: ONE streaming pass folds the 16-cell predicate-
    bitmask histogram (vectorized flags per batch); all 24 order
    costs are driver arithmetic over those 16 integers."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_quantity", "l_discount", "l_linestatus"
        ],
    )

    def cells(batch: pa.Table) -> pa.Table:
        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        dc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        ls = batch.column("l_linestatus").to_numpy(zero_copy_only=False)
        flags = (
            (rf == "R").astype(np.int64)
            + 2 * (qty >= 25).astype(np.int64)
            + 4 * (np.floor(dc * 100.0 + 0.5) >= 5).astype(np.int64)
            + 8 * (ls == "F").astype(np.int64)
        )
        cnt = np.bincount(flags, minlength=16).astype(np.int64)
        return pa.table(
            {
                "mask": pa.array(np.arange(16, dtype=np.int64), pa.int64()),
                "c": pa.array(cnt, pa.int64()),
            }
        )

    rows = (
        lit.map_batches(cells, batch_format="pyarrow")
        .groupby("mask")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the 16-cell joint grid
    )
    cnt = np.zeros(16, np.int64)
    for r in rows:
        cnt[int(r["mask"])] = int(r["c"])
    n = int(cnt.sum())
    bit = {name: 1 << i for i, name in enumerate(PRED_ORDER_NAMES)}

    def count_all(preds) -> int:
        need = 0
        for p in preds:
            need |= bit[p]
        return int(
            sum(cnt[m] for m in range(16) if (m & need) == need)
        )

    out = []
    for order_str in predicate_order_sequences():
        ps = order_str.split(">")
        evals = n
        for i in range(1, 4):
            evals += count_all(ps[:i])
        out.append((order_str, evals))
    df = pd.DataFrame(out, columns=["order_str", "evals"]).sort_values(
        ["evals", "order_str"], ignore_index=True
    )
    df.insert(0, "ord", np.arange(1, len(df) + 1, dtype=np.int64))
    df["evals"] = df["evals"].astype("int64")
    return df


def stream_disorder_profile(sf_dir: str) -> "pd.DataFrame":
    """STREAM-DISORDER profile — the histogram of |rank-by-event-time
    − rank-by-ingest-order| over ORDERS (ingest order = orderkey;
    event time = the order's FIRST ship date, ties broken by
    orderkey), bucketed by powers of two (bucket −1 = perfectly
    placed): how far orders sit from their time-ordered position,
    which is exactly the reorder-buffer / allowed-lateness sizing
    question — `late_data_watermark` counts lateness in TIME; this
    measures it in RANKS, the unit a bounded reorder buffer
    actually works in. (The events table is perfectly time-ordered
    by construction and lineitem's (orderkey, linenumber) is not
    unique in this fixture, so the order-level stream is the
    well-posed disordered sequence.) Output (bucket_pow2, n_rows).

    Scale shape: the (orderkey → min ship-day) fold is one
    exchange; BOTH ranks then come from bounded 64-cell count
    grids (orderkey ranges / day ranges) + per-bucket local sorts —
    never a global sort; the two rank row-sets meet in one
    orderkey co-partition of slim int64 rows and displacements
    fold into a ≤ 26-cell histogram."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def base_rows(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        day = (
            (d.astype("datetime64[D]") - HAAR_EPOCH)
            // np.timedelta64(1, "D")
        ).astype(np.int64)
        t = pa.table(
            {
                "key": pa.array(ok, pa.int64()),
                "day": pa.array(day, pa.int64()),
            }
        ).group_by("key").aggregate([("day", "min")])
        return pa.table(
            {
                "key": t.column("key"),
                "day": t.column("day_min").cast(pa.int64()),
            }
        )

    rows0 = (
        lit.map_batches(base_rows, batch_format="pyarrow")
        .groupby("key")
        .aggregate(_Min("day"))
        .map_batches(
            lambda b: pa.table(
                {
                    "key": b.column("key").cast(pa.int64()),
                    "day": b.column("min(day)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def rank_pass(cell_col_fn, sort_cols):
        kd = rows0.map_batches(
            cell_col_fn, batch_format="pyarrow"
        ).materialize()
        counts = {
            int(r["cell"]): int(r["count()"])
            for r in kd.groupby("cell").count().take_all()
        }  # bounded: 256 cells
        bases = {}
        acc = 0
        for c in sorted(counts):
            bases[c] = acc
            acc += counts[c]
        bases_ref = ray.put(bases)

        def pos_rows(group: pa.Table) -> pa.Table:
            import pandas as pd  # noqa: F811

            cell = int(group.column("cell")[0].as_py())
            base = ray.get(bases_ref)[cell]
            df = group.to_pandas().sort_values(sort_cols)
            return pa.table(
                {
                    "key": pa.array(
                        df["key"].to_numpy(np.int64), pa.int64()
                    ),
                    "pos": pa.array(
                        base + np.arange(1, len(df) + 1, dtype=np.int64),
                        pa.int64(),
                    ),
                }
            )

        return (
            kd.groupby("cell")
            .map_groups(pos_rows, batch_format="pyarrow")
            .repartition(8)
            .materialize()
        )

    lohi = rows0.aggregate(_Min("key"), _Max("key"))
    olo, ohi = int(lohi["min(key)"]), int(lohi["max(key)"])
    # 64-cell grids: the rank pass cost is per-task fixed overhead,
    # not volume (the narrow-fan rule) — 256 cells measured 11.6 s,
    # 64 cells ~7 s at sf0.1
    wo = (ohi - olo) // 64 + 1

    def cell_ingest(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "cell", pa.array((k - olo) // wo, pa.int64())
        )

    dlohi = rows0.aggregate(_Min("day"), _Max("day"))
    dlo, dhi = int(dlohi["min(day)"]), int(dlohi["max(day)"])
    wd = (dhi - dlo) // 64 + 1

    def cell_time(batch: pa.Table) -> pa.Table:
        day = batch.column("day").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "cell", pa.array((day - dlo) // wd, pa.int64())
        )

    pos_a = rank_pass(cell_ingest, ["key"])
    pos_t = rank_pass(cell_time, ["day", "key"])

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": batch.column("key").cast(pa.int64()),
                    "pos": batch.column("pos").cast(pa.int64()),
                    "side": pa.array(
                        np.full(batch.num_rows, side, np.int64),
                        pa.int64(),
                    ),
                    "part": pa.array(
                        batch.column("key").to_numpy(
                            zero_copy_only=False
                        )
                        % 64,
                        pa.int64(),
                    ),
                }
            )

        return fn

    def disp_fold(part_tbl: pa.Table) -> pa.Table:
        import collections

        import pandas as pd  # noqa: F811

        df = part_tbl.to_pandas()
        a = df[df["side"] == 0].set_index("key")["pos"]
        t = df[df["side"] == 1].set_index("key")["pos"]
        d = (a - t).abs().to_numpy(np.int64)
        c: collections.Counter = collections.Counter()
        for v in d.tolist():
            b = -1 if v == 0 else int(v).bit_length() - 1
            c[b] += 1
        keys = sorted(c)
        return pa.table(
            {
                "bucket_pow2": pa.array(keys, pa.int64()),
                "n_rows": pa.array([c[k] for k in keys], pa.int64()),
            }
        )

    rows = (
        pos_a.map_batches(tag(0), batch_format="pyarrow")
        .union(pos_t.map_batches(tag(1), batch_format="pyarrow"))
        .groupby("part")
        .map_groups(
            lambda g: disp_fold(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .groupby("bucket_pow2")
        .aggregate(_Sum("n_rows", alias_name="n_rows"))
        .take_all()  # bounded: <= 26 log buckets
    )
    df = pd.DataFrame(rows).sort_values("bucket_pow2", ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df
