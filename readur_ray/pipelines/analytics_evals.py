"""TPC-H remainder, sketch/encoding error evaluations, and classical
statistical tests (registry themes: analytics, evals, stats). Split
from analytics.py round 5; wave order preserved. See README.md
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
    _cents, HLL_P, hll_registers, CMS_D,
    CMS_W, cms_registers, Q10_LO_US, Q10_HI_US,
    FK_EDGES, _kanon_qi,
)




ABC_BUCKETS = 256


def abc_analysis(sf_dir: str) -> "ray.data.Dataset":
    """ABC (Pareto) analysis of part revenue — class A holds the
    parts up to the 80% cumulative-revenue mark in descending
    revenue order, B to 95%, C the tail; the classic inventory
    segmentation. Class boundaries are integer cross-multiplications
    on the EXCLUSIVE running revenue (excl·10 < total·8 → A,
    excl·100 < total·95 → B), so the cut is exact and the
    (rev desc, partkey asc) order is total. Tail-seated by design:
    compaction_plan's two-pass bucket-grid prefix, descending.

    Scale shape: per-part revenue is one partkey groupby; the
    descending prefix is two-pass — pass 1 folds per-batch
    (revenue-bucket, Σrev) partials (equal revenues share a bucket
    by construction, so ties never straddle offsets), the driver
    builds exclusive higher-bucket offsets (≤256 ints), and pass 2
    sorts each bucket locally, classifies, and folds per-class
    partials into a 3-row grid. A value-skewed bucket bounds at the
    distinct-revenue group, the documented dial. Output: (cls,
    n_parts, revenue_cents, share_bp)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def rev_partials(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        g = (
            pd.DataFrame({"pk": pk, "c": cents})
            .groupby("pk", sort=False)["c"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "pk": pa.array(g["pk"].to_numpy().astype(np.int64), pa.int64()),
                "rev": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    per_part = (
        lines.map_batches(rev_partials, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(_Sum("rev", alias_name="rev"))
        .materialize()
    )
    mm = per_part.aggregate(_Min("rev"), _Max("rev"))
    lo, hi = int(mm["min(rev)"]), int(mm["max(rev)"])
    span = max(hi - lo, 1)

    def bucket_of(rev: np.ndarray) -> np.ndarray:
        return np.minimum(
            (rev - lo) * ABC_BUCKETS // span, ABC_BUCKETS - 1
        )

    def b_partials(batch: pa.Table) -> pa.Table:
        rev = batch.column("rev").to_numpy(zero_copy_only=False)
        b = bucket_of(rev)
        g = (
            pd.DataFrame({"b": b, "s": rev})
            .groupby("b", sort=False)["s"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "b": pa.array(g["b"].to_numpy().astype(np.int64), pa.int64()),
                "s": pa.array(g["s"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    bucket_sum = np.zeros(ABC_BUCKETS, np.int64)
    for bt in (
        per_part.map_batches(b_partials, batch_format="pyarrow")
        .groupby("b")
        .aggregate(_Sum("s", alias_name="s"))
        .iter_batches(batch_format="pyarrow")
    ):
        for b, sv in zip(bt.column("b").to_pylist(), bt.column("s").to_pylist()):
            bucket_sum[b] += sv
    total = int(bucket_sum.sum())
    # offset[b] = revenue in strictly HIGHER buckets (descending order)
    desc_cum = np.cumsum(bucket_sum[::-1])[::-1]
    offsets = desc_cum - bucket_sum

    def tag(batch: pa.Table) -> pa.Table:
        rev = batch.column("rev").to_numpy(zero_copy_only=False)
        return batch.append_column("b", pa.array(bucket_of(rev), pa.int64()))

    def classify(grp: pa.Table) -> pa.Table:
        rev = grp.column("rev").to_numpy(zero_copy_only=False)
        pk = grp.column("pk").to_numpy(zero_copy_only=False)
        b = int(grp.column("b")[0].as_py())
        order = np.lexsort((pk, -rev))
        rev = rev[order]
        excl = np.concatenate(([0], np.cumsum(rev)[:-1])) + int(offsets[b])
        cls = np.where(
            excl * 10 < total * 8, "A",
            np.where(excl * 100 < total * 95, "B", "C"),
        )
        g = (
            pd.DataFrame({"cls": cls, "n": 1, "rev": rev})
            .groupby("cls", sort=False)
            .agg(n=("n", "sum"), rev=("rev", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "cls": pa.array(g["cls"], pa.string()),
                "n_parts": pa.array(
                    g["n"].to_numpy().astype(np.int64), pa.int64()
                ),
                "revenue_cents": pa.array(
                    g["rev"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    def share(batch: pa.Table) -> pa.Table:
        rev = batch.column("revenue_cents_p").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cls": batch.column("cls"),
                "n_parts": batch.column("n_parts_p"),
                "revenue_cents": pa.array(rev.astype(np.int64), pa.int64()),
                "share_bp": pa.array(rev * 10000 // total, pa.int64()),
            }
        )

    return (
        per_part.map_batches(tag, batch_format="pyarrow")
        .groupby("b")
        .map_groups(classify, batch_format="pyarrow")
        .groupby("cls")
        .aggregate(
            _Sum("n_parts", alias_name="n_parts_p"),
            _Sum("revenue_cents", alias_name="revenue_cents_p"),
        )
        .map_batches(share, batch_format="pyarrow")
    )


JSP_ROW_BYTES = 16    # modeled key+payload width on the exchange
JSP_N_WORKERS = 256   # design-point cluster the plan is priced for


def join_strategy_plan(sf_dir: str) -> "ray.data.Dataset":
    """Broadcast-vs-shuffle join planner — the engine's own core
    decision materialized as data: for every FK edge, the exact row
    counts both sides and the two exchange costs under the explicit
    integer model (broadcast ships the parent to every worker:
    parent_rows × 16 B × 256 workers; shuffle moves both sides once:
    (child+parent) × 16 B), picking the cheaper. This is the rule
    the repo itself applies — nation rides ray.put in q5/q10,
    customer rides a co-partition — now priced edge by edge.
    Tail-seated by design: orphan_fk_audit's edge list with a
    constant-space count fold per side.

    Scale shape: per edge two count-only folds (one int per batch);
    the plan arithmetic runs on a 7-row grid. Output: (edge,
    child_rows, parent_rows, broadcast_bytes, shuffle_bytes,
    strategy)."""
    from ray.data.aggregate import Sum as _Sum

    def count_rows(fname: str, col: str) -> "ray.data.Dataset":
        return (
            ray.data.read_parquet(f"{sf_dir}/{fname}", columns=[col])
            .map_batches(
                lambda t: pa.table({"n": pa.array([t.num_rows], pa.int64())}),
                batch_format="pyarrow",
            )
            .aggregate(_Sum("n", alias_name="n"))
        )

    rows = []
    counted: dict[str, int] = {}
    for edge, child_f, child_k, parent_f, parent_k in FK_EDGES:
        for f, c in ((child_f, child_k), (parent_f, parent_k)):
            if f not in counted:
                counted[f] = int(count_rows(f, c)["n"])
        ch, pr = counted[child_f], counted[parent_f]
        bcast = pr * JSP_ROW_BYTES * JSP_N_WORKERS
        shuf = (ch + pr) * JSP_ROW_BYTES
        rows.append(
            (edge, ch, pr, bcast, shuf,
             "broadcast" if bcast < shuf else "shuffle")
        )
    return pa.table(
        {
            "edge": pa.array([r[0] for r in rows], pa.string()),
            "child_rows": pa.array([r[1] for r in rows], pa.int64()),
            "parent_rows": pa.array([r[2] for r in rows], pa.int64()),
            "broadcast_bytes": pa.array([r[3] for r in rows], pa.int64()),
            "shuffle_bytes": pa.array([r[4] for r in rows], pa.int64()),
            "strategy": pa.array([r[5] for r in rows], pa.string()),
        }
    )


Q6_LO_US = 852_076_800_000_000   # 1997-01-01
Q6_HI_US = 883_612_800_000_000   # 1998-01-01


def q6_forecast_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q6 (forecasting revenue change) — the pure scan-edge
    query: one filter-aggregate over lineitem (ship-date year,
    discount in [0.05, 0.07], quantity < 24) with revenue =
    Σ price·discount in exact cents; no join, no groupby — the query
    that isolates scan + predicate throughput, and the one a
    column-pruned, row-group-pruned read should make IO-bound.
    Discounts compare in exact integer basis points (floor(d·10⁴ +
    0.5)) so the float boundary 0.05 can never straddle engines.
    Tail-seated by design: the degenerate (single-group) member of
    the pricing_summary family.

    Scale shape: per-batch (cents, n) partials → one 2-int global
    aggregate; only 4 columns leave storage. Output: (revenue_cents,
    n_lines)."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def fold(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        disc_bp = np.floor(
            batch.column("l_discount").to_numpy(zero_copy_only=False) * 10000.0
            + 0.5
        ).astype(np.int64)
        qty_c = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        keep = (
            (sd >= Q6_LO_US) & (sd < Q6_HI_US)
            & (disc_bp >= 500) & (disc_bp <= 700)
            & (qty_c < 2400)
        )
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )[keep]
        cents = np.floor(
            price * (disc_bp[keep] / 10000.0) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "revenue_cents": pa.array([int(cents.sum())], pa.int64()),
                "n_lines": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    agg = ds.map_batches(fold, batch_format="pyarrow").aggregate(
        _Sum("revenue_cents", alias_name="revenue_cents"),
        _Sum("n_lines", alias_name="n_lines"),
    )
    return pa.table(
        {k: pa.array([int(v)], pa.int64()) for k, v in agg.items()}
    )


def q15_top_supplier(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q15 (top supplier) — the argmax-with-ties-ALL shape over
    an aggregate: per-supplier revenue in one ship-date quarter, then
    every supplier whose revenue EQUALS the global max (the classic
    view + max subquery). Distinct from supplier_scorecard's full
    rollup and from top-k sorts: the cut is an equality against a
    global scalar, so ties all surface. Tail-seated by design: the
    scorecard's suppkey fold with a broadcast-scalar filter.

    Scale shape: per-batch (suppkey, cents) partials → ONE
    groupby(suppkey) → a 1-int global Max → the equality filter
    streams; the dimension stitch is a broadcast. Output:
    (s_suppkey, s_name, revenue_cents)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    supp_rows = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).take_all()
    sname = {int(r["s_suppkey"]): r["s_name"] for r in supp_rows}

    def fold(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = (sd >= Q10_LO_US) & (sd < Q10_HI_US)
        sk = batch.column("l_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        g = (
            pd.DataFrame({"sk": sk, "c": cents})
            .groupby("sk", sort=False)["c"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "sk": pa.array(g["sk"].to_numpy().astype(np.int64), pa.int64()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    per_supp = (
        lines.map_batches(fold, batch_format="pyarrow")
        .groupby("sk")
        .aggregate(_Sum("c", alias_name="rev"))
        .materialize()
    )
    top = int(per_supp.aggregate(_Max("rev"))["max(rev)"])

    def winners(batch: pa.Table) -> pa.Table:
        rev = batch.column("rev").to_numpy(zero_copy_only=False)
        keep = rev == top
        sk = batch.column("sk").to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "s_suppkey": pa.array(sk, pa.int64()),
                "s_name": pa.array(
                    [sname[int(x)] for x in sk], pa.string()
                ),
                "revenue_cents": pa.array(
                    rev[keep].astype(np.int64), pa.int64()
                ),
            }
        )

    return per_supp.map_batches(winners, batch_format="pyarrow")


def q14_promo_share(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q14 (promotion effect) — promo revenue share of one
    ship-month's total, in exact basis points: promo_cents·10⁴ //
    total_cents over the lineitem ⋈ part partkey co-partition. The
    CASE-inside-aggregate shape (one join, two conditional sums, one
    ratio) that dashboards call 'share of X'. Tail-seated by design:
    q19's co-partition with a two-lane conditional fold.

    Scale shape: the month filter prunes lineitem at the scan; part
    ships only (partkey, is_promo) int pairs; the co-partition folds
    each partition to (promo_cents, total_cents) partials and the
    global stage is a 2-int sum. Output: (promo_cents, total_cents,
    promo_share_bp)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum
    from ..stages.shuffle import N_COARSE_PARTS

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )

    def line_side(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = (sd >= Q10_LO_US) & (sd < Q10_HI_US)
        pk = batch.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        n = len(pk)
        return pa.table(
            {
                "k": pa.array(pk, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "promo": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(pk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def part_side(batch: pa.Table) -> pa.Table:
        pk = batch.column("p_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ptype = np.asarray(batch.column("p_type").to_pylist(), dtype=object)
        promo = np.array(
            [1 if str(t).startswith("PROMO") else 0 for t in ptype], np.int64
        )
        n = len(pk)
        return pa.table(
            {
                "k": pa.array(pk, pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "promo": pa.array(promo, pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(pk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def join_fold(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")["promo"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_b")
        cents = m["cents"].to_numpy()
        promo = m["promo_b"].to_numpy()
        return pa.table(
            {
                "promo_cents": pa.array(
                    [int(cents[promo == 1].sum())], pa.int64()
                ),
                "total_cents": pa.array([int(cents.sum())], pa.int64()),
            }
        )

    agg = (
        lines.map_batches(line_side, batch_format="pyarrow")
        .union(part.map_batches(part_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(join_fold, batch_format="pyarrow")
        .aggregate(
            _Sum("promo_cents", alias_name="promo_cents"),
            _Sum("total_cents", alias_name="total_cents"),
        )
    )
    pc_, tc = int(agg["promo_cents"]), int(agg["total_cents"])
    return pa.table(
        {
            "promo_cents": pa.array([pc_], pa.int64()),
            "total_cents": pa.array([tc], pa.int64()),
            "promo_share_bp": pa.array(
                [pc_ * 10000 // tc if tc else 0], pa.int64()
            ),
        }
    )


def q17_small_quantity(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q17 (small-quantity-order revenue) — the correlated
    aggregate: lines whose quantity is below 20% of their PART's
    average quantity. The 1/5 threshold makes it exact integer
    arithmetic: qty < sum/(5n) ⇔ qty_c·5·n_part < sum_qty_c_part —
    no division anywhere. The shape Q18 doesn't cover: the gate
    compares each ROW against its own group's aggregate, so the
    per-part statistics must rejoin the fact on the SAME partkey
    co-partition that computed them. Tail-seated by design: q18's
    groupby-produced build side probed by the raw rows instead of
    the groups.

    Scale shape: pass 1 folds (partkey, sum_qty_c, n) partials → one
    groupby; pass 2 re-keys the stats and the raw (partkey, qty_c,
    cents) rows onto the same co-partition, evaluates the
    cross-multiplied gate vectorized, and folds to a 2-int global
    sum. Output: (revenue_cents, n_lines)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum
    from ..stages.shuffle import N_COARSE_PARTS

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def qty_partials(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        qty_c = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"pk": pk, "s": qty_c, "n": 1})
            .groupby("pk", sort=False)
            .agg(s=("s", "sum"), n=("n", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "pk": pa.array(g["pk"].to_numpy().astype(np.int64), pa.int64()),
                "s": pa.array(g["s"].to_numpy().astype(np.int64), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def stats_side(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(pk.astype(np.int64), pa.int64()),
                "a": batch.column("s_p"),
                "b": batch.column("n_p"),
                "side": pa.array(np.zeros(len(pk), np.int64), pa.int64()),
                "part": pa.array(pk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def row_side(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        qty_c = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        price_c = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(pk, pa.int64()),
                "a": pa.array(qty_c, pa.int64()),
                "b": pa.array(price_c, pa.int64()),
                "side": pa.array(np.ones(len(pk), np.int64), pa.int64()),
                "part": pa.array(pk % N_COARSE_PARTS, pa.int64()),
            }
        )

    stats = (
        lines.map_batches(qty_partials, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(_Sum("s", alias_name="s_p"), _Sum("n", alias_name="n_p"))
        .map_batches(stats_side, batch_format="pyarrow")
    )

    def gate(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")[["a", "b"]]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_s")
        qty, price = m["a"].to_numpy(), m["b"].to_numpy()
        sum_q, n_part = m["a_s"].to_numpy(), m["b_s"].to_numpy()
        keep = qty * 5 * n_part < sum_q
        return pa.table(
            {
                "revenue_cents": pa.array(
                    [int(price[keep].sum())], pa.int64()
                ),
                "n_lines": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    agg = (
        stats.union(lines.map_batches(row_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(gate, batch_format="pyarrow")
        .aggregate(
            _Sum("revenue_cents", alias_name="revenue_cents"),
            _Sum("n_lines", alias_name="n_lines"),
        )
    )
    return pa.table(
        {k: pa.array([int(v)], pa.int64()) for k, v in agg.items()}
    )


Q7_NATIONS = ("NATION_1", "NATION_2")
Q7_Y96_US = 820_454_400_000_000   # 1996-01-01
Q7_Y97_US = 852_076_800_000_000   # 1997-01-01
Q7_HI_US = 883_612_800_000_000    # 1998-01-01


def q7_volume_shipping(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q7 (volume shipping) — bidirectional trade between two
    nations by ship year: revenue where the supplier sits in one
    nation of the pair and the customer in the OTHER, grouped by
    (supp_nation, cust_nation, year). q5's chained co-partitions with
    the equality flipped to a cross-pair test and a year lane riding
    the payload; the year derives from pure epoch comparison (1996 +
    [sd ≥ 1997-01-01]) — no calendar functions. Tail-seated by
    design: q5's three-hop chain, filtered to the pair at every
    scan edge.

    Scale shape: both dimension sides pre-filter to the two nations
    at the scan; the three fact co-partitions (orderkey, custkey,
    suppkey) each pre-sum per (next-key, nation-lane, year) group;
    the global stage is a ≤4-row grid. Output: (supp_nation,
    cust_nation, l_year, revenue_cents)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum
    from ..stages.shuffle import N_COARSE_PARTS

    nation_rows = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    pair = {
        int(r["n_nationkey"]): r["n_name"]
        for r in nation_rows
        if r["n_name"] in Q7_NATIONS
    }
    pair_keys = np.array(sorted(pair), np.int64)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )

    def order_side(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(ok)
        return pa.table(
            {
                "k": pa.array(ok, pa.int64()),
                "a": pa.array(ck, pa.int64()),
                "b": pa.array(np.zeros(n, np.int64), pa.int64()),
                "year": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(ok % N_COARSE_PARTS, pa.int64()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = (sd >= Q7_Y96_US) & (sd < Q7_HI_US)
        lk = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        sk = batch.column("l_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        year = 1996 + (sd[keep] >= Q7_Y97_US).astype(np.int64)
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        n = len(lk)
        return pa.table(
            {
                "k": pa.array(lk, pa.int64()),
                "a": pa.array(np.zeros(n, np.int64), pa.int64()),
                "b": pa.array(sk, pa.int64()),
                "year": pa.array(year, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(lk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop1(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")["a"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_b")
        g = (
            m.groupby(["a_b", "b", "year"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        ck = g["a_b"].to_numpy().astype(np.int64)
        n = len(ck)
        return pa.table(
            {
                "k": pa.array(ck, pa.int64()),
                "a": pa.array(g["b"].to_numpy().astype(np.int64), pa.int64()),
                "b": pa.array(np.zeros(n, np.int64), pa.int64()),
                "year": pa.array(
                    g["year"].to_numpy().astype(np.int64), pa.int64()
                ),
                "cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nk = batch.column("c_nationkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = np.isin(nk, pair_keys)
        ck, nk = ck[keep], nk[keep]
        n = len(ck)
        return pa.table(
            {
                "k": pa.array(ck, pa.int64()),
                "a": pa.array(nk, pa.int64()),
                "b": pa.array(np.zeros(n, np.int64), pa.int64()),
                "year": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop2(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")["a"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_b")
        g = (
            m.groupby(["a", "a_b", "year"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        sk = g["a"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "k": pa.array(sk, pa.int64()),
                "a": pa.array(g["a_b"].to_numpy().astype(np.int64), pa.int64()),
                "year": pa.array(
                    g["year"].to_numpy().astype(np.int64), pa.int64()
                ),
                "cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
                "side": pa.array(np.ones(len(sk), np.int64), pa.int64()),
                "part": pa.array(sk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def supp_side(batch: pa.Table) -> pa.Table:
        sk = batch.column("s_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nk = batch.column("s_nationkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = np.isin(nk, pair_keys)
        sk, nk = sk[keep], nk[keep]
        n = len(sk)
        return pa.table(
            {
                "k": pa.array(sk, pa.int64()),
                "a": pa.array(nk, pa.int64()),
                "year": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(sk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop3(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")["a"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_b")
        m = m[m["a"] != m["a_b"]]  # cross-pair: nations must differ
        g = (
            m.groupby(["a_b", "a", "year"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "snat": pa.array(
                    g["a_b"].to_numpy().astype(np.int64), pa.int64()
                ),
                "cnat": pa.array(
                    g["a"].to_numpy().astype(np.int64), pa.int64()
                ),
                "year": pa.array(
                    g["year"].to_numpy().astype(np.int64), pa.int64()
                ),
                "cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    stage1 = orders.map_batches(order_side, batch_format="pyarrow").union(
        lines.map_batches(line_side, batch_format="pyarrow")
    )
    stage2 = (
        stage1.groupby("part")
        .map_groups(hop1, batch_format="pyarrow")
        .union(cust.map_batches(cust_side, batch_format="pyarrow"))
    )
    stage3 = (
        stage2.groupby("part")
        .map_groups(hop2, batch_format="pyarrow")
        .union(supp.map_batches(supp_side, batch_format="pyarrow"))
    )
    grid = (
        stage3.groupby("part")
        .map_groups(hop3, batch_format="pyarrow")
        .groupby(["snat", "cnat", "year"])
        .aggregate(_Sum("cents", alias_name="cents_p"))
        .take_all()  # ≤ |pair|²·years rows — the bounded grid
    )
    return pa.table(
        {
            "supp_nation": pa.array(
                [pair[int(r["snat"])] for r in grid], pa.string()
            ),
            "cust_nation": pa.array(
                [pair[int(r["cnat"])] for r in grid], pa.string()
            ),
            "l_year": pa.array([int(r["year"]) for r in grid], pa.int64()),
            "revenue_cents": pa.array(
                [int(r["cents_p"]) for r in grid], pa.int64()
            ),
        }
    )


def q13_customer_distribution(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q13 (customer distribution) — the LEFT-JOIN histogram:
    how many customers placed exactly N orders, INCLUDING the
    zero-order customers an inner join would silently drop (the row
    most analysts get wrong). Tail-seated by design: orphan_fk_audit's
    tagged-union co-partition with the histogram folded on the
    missing side.

    Scale shape: orders folds per-batch (custkey, n) partials → the
    customer keys and the order counts meet on ONE custkey
    co-partition (Sum orders, Max customer-flag) → per-batch
    (c_count, custdist) histogram partials → a bounded grid; zero
    customers never leave their partition as rows, only as grid
    counts. Output: (c_count, custdist)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )

    def order_fold(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        u, cnt = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "key": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
                "is_cust": pa.array(np.zeros(len(u), np.int64), pa.int64()),
            }
        )

    def cust_fold(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(ck)
        return pa.table(
            {
                "key": pa.array(ck, pa.int64()),
                "n": pa.array(np.zeros(n, np.int64), pa.int64()),
                "is_cust": pa.array(np.ones(n, np.int64), pa.int64()),
            }
        )

    def hist_fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n_p").to_numpy(zero_copy_only=False)
        is_cust = batch.column("c_p").to_numpy(zero_copy_only=False) > 0
        n = n[is_cust]  # order rows citing a non-customer key: none here
        u, cnt = np.unique(n, return_counts=True)
        return pa.table(
            {
                "c_count": pa.array(u.astype(np.int64), pa.int64()),
                "custdist": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    return (
        orders.map_batches(order_fold, batch_format="pyarrow")
        .union(cust.map_batches(cust_fold, batch_format="pyarrow"))
        .groupby("key")
        .aggregate(
            _Sum("n", alias_name="n_p"), _Max("is_cust", alias_name="c_p")
        )
        .map_batches(hist_fold, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(_Sum("custdist", alias_name="custdist"))
    )


Q8_REGION = "ASIA"          # the market (customer side)
Q8_FOCUS_NATION = "NATION_2"  # the supplier nation whose share we track
Q8_PTYPE = "PROMO"


def q8_market_share(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q8 (national market share) — the deepest composition in
    the registry: within one region's market for one part type, the
    revenue share supplied by one focus nation, per order year.
    Three fact co-partitions CHAINED (partkey against the
    type-filtered part, orderkey against the window-filtered orders,
    custkey against the region-filtered customer) and the supplier
    side resolved by the join_strategy_plan decision — the
    focus-nation suppkey set broadcasts (1/25 of a dimension-scale
    table; the co-partition fallback is q5/q7's third hop verbatim
    when supplier goes fact-scale). Share in exact basis points.
    Tail-seated by design: q7's chain with a broadcast-flag final
    lane.

    Scale shape: every scan pre-filters (type, window, region); each
    hop pre-sums per next-key group; the global stage is a 2-year
    grid. Output: (o_year, total_cents, focus_cents, share_bp)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum
    from ..stages.shuffle import N_COARSE_PARTS

    nation_rows = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).take_all()
    region_rows = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).take_all()
    rname = {r["r_regionkey"]: r["r_name"] for r in region_rows}
    market_nations = np.array(
        sorted(
            int(n["n_nationkey"])
            for n in nation_rows
            if rname[n["n_regionkey"]] == Q8_REGION
        ),
        np.int64,
    )
    focus_key = next(
        int(n["n_nationkey"])
        for n in nation_rows
        if n["n_name"] == Q8_FOCUS_NATION
    )
    focus_supp = np.sort(
        np.array(
            [
                r["s_suppkey"]
                for r in ray.data.read_parquet(
                    f"{sf_dir}/supplier.parquet",
                    columns=["s_suppkey", "s_nationkey"],
                ).take_all()
                if int(r["s_nationkey"]) == focus_key
            ],
            np.int64,
        )
    )
    focus_ref = ray.put(focus_supp)

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    )
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )

    def line_side(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ok = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        sk = batch.column("l_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        n = len(pk)
        return pa.table(
            {
                "k": pa.array(pk, pa.int64()),
                "a": pa.array(ok, pa.int64()),
                "b": pa.array(sk, pa.int64()),
                "year": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(pk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def part_side(batch: pa.Table) -> pa.Table:
        ptype = np.asarray(batch.column("p_type").to_pylist(), dtype=object)
        keep = ptype == Q8_PTYPE
        pk = batch.column("p_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        n = len(pk)
        return pa.table(
            {
                "k": pa.array(pk, pa.int64()),
                "a": pa.array(np.zeros(n, np.int64), pa.int64()),
                "b": pa.array(np.zeros(n, np.int64), pa.int64()),
                "year": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(pk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop_part(part_tbl: pa.Table) -> pa.Table:
        focus = ray.get(focus_ref)
        df = part_tbl.to_pandas()
        keep_keys = set(df[df["side"] == 0]["k"].to_numpy())
        probe = df[df["side"] == 1]
        m = probe[probe["k"].isin(keep_keys)]
        ok = m["a"].to_numpy().astype(np.int64)
        sk = m["b"].to_numpy().astype(np.int64)
        if len(focus):
            idx = np.minimum(np.searchsorted(focus, sk), len(focus) - 1)
            is_focus = (focus[idx] == sk).astype(np.int64)
        else:
            is_focus = np.zeros(len(sk), np.int64)
        n = len(ok)
        return pa.table(
            {
                "k": pa.array(ok, pa.int64()),
                "a": pa.array(np.zeros(n, np.int64), pa.int64()),
                "focus": pa.array(is_focus, pa.int64()),
                "year": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(
                    m["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(ok % N_COARSE_PARTS, pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = (od >= Q7_Y96_US) & (od < Q7_HI_US)
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        year = 1996 + (od[keep] >= Q7_Y97_US).astype(np.int64)
        n = len(ok)
        return pa.table(
            {
                "k": pa.array(ok, pa.int64()),
                "a": pa.array(ck, pa.int64()),
                "focus": pa.array(np.zeros(n, np.int64), pa.int64()),
                "year": pa.array(year, pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(ok % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop_order(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")[["a", "year"]]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_b")
        g = (
            m.groupby(["a_b", "year_b", "focus"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        ck = g["a_b"].to_numpy().astype(np.int64)
        n = len(ck)
        return pa.table(
            {
                "k": pa.array(ck, pa.int64()),
                "focus": pa.array(
                    g["focus"].to_numpy().astype(np.int64), pa.int64()
                ),
                "year": pa.array(
                    g["year_b"].to_numpy().astype(np.int64), pa.int64()
                ),
                "cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nk = batch.column("c_nationkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = np.isin(nk, market_nations)
        ck = ck[keep]
        n = len(ck)
        return pa.table(
            {
                "k": pa.array(ck, pa.int64()),
                "focus": pa.array(np.zeros(n, np.int64), pa.int64()),
                "year": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop_cust(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        keep_keys = set(df[df["side"] == 0]["k"].to_numpy())
        probe = df[df["side"] == 1]
        m = probe[probe["k"].isin(keep_keys)].copy()
        m["fc"] = m["cents"] * (m["focus"] == 1)
        g = (
            m.groupby("year", sort=False)
            .agg(total=("cents", "sum"), focus=("fc", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "year": pa.array(
                    g["year"].to_numpy().astype(np.int64), pa.int64()
                ),
                "total": pa.array(
                    g["total"].to_numpy().astype(np.int64), pa.int64()
                ),
                "focus": pa.array(
                    g["focus"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    stage1 = lines.map_batches(line_side, batch_format="pyarrow").union(
        part.map_batches(part_side, batch_format="pyarrow")
    )
    stage2 = (
        stage1.groupby("part")
        .map_groups(hop_part, batch_format="pyarrow")
        .union(orders.map_batches(order_side, batch_format="pyarrow"))
    )
    stage3 = (
        stage2.groupby("part")
        .map_groups(hop_order, batch_format="pyarrow")
        .union(cust.map_batches(cust_side, batch_format="pyarrow"))
    )
    grid = (
        stage3.groupby("part")
        .map_groups(hop_cust, batch_format="pyarrow")
        .groupby("year")
        .aggregate(
            _Sum("total", alias_name="total_cents"),
            _Sum("focus", alias_name="focus_cents"),
        )
        .take_all()
    )
    grid.sort(key=lambda r: r["year"])
    return pa.table(
        {
            "o_year": pa.array([int(r["year"]) for r in grid], pa.int64()),
            "total_cents": pa.array(
                [int(r["total_cents"]) for r in grid], pa.int64()
            ),
            "focus_cents": pa.array(
                [int(r["focus_cents"]) for r in grid], pa.int64()
            ),
            "share_bp": pa.array(
                [
                    int(r["focus_cents"]) * 10000 // int(r["total_cents"])
                    if int(r["total_cents"])
                    else 0
                    for r in grid
                ],
                pa.int64(),
            ),
        }
    )


Q22_RECENT_US = 915_148_800_000_000  # 1999-01-01: the dormancy cutoff


def q22_sales_opportunity(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q22 (global sales opportunity), adapted twice to the
    data: nation stands in for the absent phone country code, and
    "no orders" becomes "no orders since 1999" (every synthetic
    customer has SOME order, so the verbatim anti-join is the empty
    set — dormancy is the version with signal): customers with an
    ABOVE-AVERAGE positive balance and no recent orders, per nation. The
    above-average gate is exact integer cross-multiplication
    (bal_c · n_pos > S_pos — no division), the no-orders test is the
    anti-join polarity of q13's co-partition, and the rollup rides
    a 25-row broadcast. Tail-seated by design: q13's tagged union
    with a broadcast scalar gate.

    Scale shape: pass 1 is a 2-int global aggregate (n_pos, Σ_pos);
    pass 2 meets customers and per-customer order counts on ONE
    custkey co-partition and folds straight to per-nation partials;
    the grid is ≤25 rows. Output: (n_name, numcust,
    totacctbal_cents)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    nation_rows = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    nname = {int(r["n_nationkey"]): r["n_name"] for r in nation_rows}

    def pos_partials(batch: pa.Table) -> pa.Table:
        bal_c = np.floor(
            batch.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        pos = bal_c[bal_c > 0]
        return pa.table(
            {
                "n": pa.array([len(pos)], pa.int64()),
                "s": pa.array([int(pos.sum())], pa.int64()),
            }
        )

    stats = cust.map_batches(pos_partials, batch_format="pyarrow").aggregate(
        _Sum("n", alias_name="n"), _Sum("s", alias_name="s")
    )
    n_pos, s_pos = int(stats["n"]), int(stats["s"])

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nk = batch.column("c_nationkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        bal_c = np.floor(
            batch.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        keep = bal_c * n_pos > s_pos  # bal > avg(positive balances)
        ck, nk, bal_c = ck[keep], nk[keep], bal_c[keep]
        n = len(ck)
        return pa.table(
            {
                "key": pa.array(ck, pa.int64()),
                "nk": pa.array(nk, pa.int64()),
                "bal": pa.array(bal_c, pa.int64()),
                "has_order": pa.array(np.zeros(n, np.int64), pa.int64()),
                "is_cust": pa.array(np.ones(n, np.int64), pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ck = np.unique(
            batch.column("o_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )[od >= Q22_RECENT_US]
        )
        n = len(ck)
        return pa.table(
            {
                "key": pa.array(ck, pa.int64()),
                "nk": pa.array(np.zeros(n, np.int64), pa.int64()),
                "bal": pa.array(np.zeros(n, np.int64), pa.int64()),
                "has_order": pa.array(np.ones(n, np.int64), pa.int64()),
                "is_cust": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def nation_fold(batch: pa.Table) -> pa.Table:
        nk = batch.column("nk_p").to_numpy(zero_copy_only=False)
        bal = batch.column("bal_p").to_numpy(zero_copy_only=False)
        has_o = batch.column("o_p").to_numpy(zero_copy_only=False) > 0
        is_c = batch.column("c_p").to_numpy(zero_copy_only=False) > 0
        keep = is_c & ~has_o
        g = (
            pd.DataFrame({"nk": nk[keep], "n": 1, "b": bal[keep]})
            .groupby("nk", sort=False)
            .agg(n=("n", "sum"), b=("b", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "nk": pa.array(g["nk"].to_numpy().astype(np.int64), pa.int64()),
                "numcust": pa.array(
                    g["n"].to_numpy().astype(np.int64), pa.int64()
                ),
                "totacctbal_cents": pa.array(
                    g["b"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    grid = (
        cust.map_batches(cust_side, batch_format="pyarrow")
        .union(orders.map_batches(order_side, batch_format="pyarrow"))
        .groupby("key")
        .aggregate(
            _Sum("nk", alias_name="nk_p"),
            _Sum("bal", alias_name="bal_p"),
            _Max("has_order", alias_name="o_p"),
            _Max("is_cust", alias_name="c_p"),
        )
        .map_batches(nation_fold, batch_format="pyarrow")
        .groupby("nk")
        .aggregate(
            _Sum("numcust", alias_name="numcust"),
            _Sum("totacctbal_cents", alias_name="totacctbal_cents"),
        )
        .take_all()
    )
    return pa.table(
        {
            "n_name": pa.array(
                [nname[int(r["nk"])] for r in grid], pa.string()
            ),
            "numcust": pa.array([int(r["numcust"]) for r in grid], pa.int64()),
            "totacctbal_cents": pa.array(
                [int(r["totacctbal_cents"]) for r in grid], pa.int64()
            ),
        }
    )


CMS_EVAL_TOP = 20


def cms_error_eval(sf_dir: str) -> "pa.Table":
    """Measured Count-Min overestimation — the eval that closes the
    CMS loop (bloom_fpr_eval's role for Bloom, minhash_eval's for
    MinHash): for the 20 heaviest users by EXACT count, the sketch's
    estimate (min over the D register rows) and the one-sided error
    est − true. At D=4/W=256 the error is deliberately visible, so
    the εN = e/W bound reads as data next to the measured values.
    Tail-seated by design: cms_registers' grid + an exact
    heavy-hitter fold + a driver-side probe of D·W ints.

    Scale shape: the register build is the head-checked no-row-
    shuffle pipeline; exact counts are one user groupby + a 20-row
    sort-limit; the probe touches only the broadcast-sized D×W grid.
    Output: (user_id, true_n, est_n, overestimate)."""
    import hashlib as _hashlib

    from ray.data.aggregate import Sum as _Sum

    grid = np.zeros((CMS_D, CMS_W), np.int64)
    for r in cms_registers(sf_dir).take_all():
        grid[int(r["row_d"]), int(r["pos"])] = int(r["count"])

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

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
        .limit(CMS_EVAL_TOP)
        .take_all()
    )
    uids = [int(r["user_id"]) for r in top]
    trues = [int(r["true_n"]) for r in top]
    ests = []
    for u in uids:
        h = _hashlib.md5(str(u).encode()).hexdigest()
        h1, h2 = int(h[:15], 16), int(h[15:30], 16)
        ests.append(
            int(min(grid[d, (h1 + d * h2) % CMS_W] for d in range(CMS_D)))
        )
    return pa.table(
        {
            "user_id": pa.array(uids, pa.int64()),
            "true_n": pa.array(trues, pa.int64()),
            "est_n": pa.array(ests, pa.int64()),
            "overestimate": pa.array(
                [e - t for e, t in zip(ests, trues)], pa.int64()
            ),
        }
    )


HLL_ALPHA_NUM = 7213      # α_m = 0.7213/(1 + 1.079/m) as an exact rational
HLL_ALPHA_DEN_BASE = 10   # → 7213·m / (10·(1000·m + 1079))


def hll_error_eval(sf_dir: str) -> "pa.Table":
    """Measured HyperLogLog error — the eval that closes the LAST
    sketch loop (after bloom_fpr_eval, cms_error_eval, minhash_eval):
    the RAW HLL estimate from the 256 registers against the exact
    distinct-user count, every step exact rational arithmetic — α_m
    as the published 7213m/(10(1000m+1079)), the harmonic sum over a
    2^53 common denominator (Σ 2^(53−ρ) fits int64 at m = 256), and
    the estimate α·m³·2^53·1000 // (den·S) one big-integer division.
    No small-range correction (ln is transcendental); the zero-
    register count V is emitted so a consumer can apply linear
    counting downstream. Tail-seated by design: hll_registers' grid +
    one exact distinct fold.

    Scale shape: the register build is the head-checked fixed-
    exchange pipeline; the exact count is one distinct fold; the
    estimator touches 256 ints. Output: (m, v_zero, n_exact,
    est_raw_x1000, err_x1000)."""
    from ray.data.aggregate import Sum as _Sum

    regs = {
        int(r["bucket"]): int(r["max_rho"])
        for r in hll_registers(sf_dir).take_all()
    }
    m = 1 << HLL_P
    s_all = sum(1 << (53 - regs.get(b, 0)) for b in range(m))
    v_zero = sum(1 for b in range(m) if b not in regs)
    den = HLL_ALPHA_DEN_BASE * (1000 * m + 1079)
    est_x1000 = HLL_ALPHA_NUM * (m ** 3) * (1 << 53) * 1000 // (den * s_all)

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def distinct_fold(batch: pa.Table) -> pa.Table:
        u = np.unique(
            batch.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        return pa.table({"u": pa.array(u, pa.int64())})

    n_exact = int(
        ds.map_batches(distinct_fold, batch_format="pyarrow")
        .groupby("u")
        .aggregate(_Sum("u", alias_name="dummy"))
        .count()
    )
    return pa.table(
        {
            "m": pa.array([m], pa.int64()),
            "v_zero": pa.array([v_zero], pa.int64()),
            "n_exact": pa.array([n_exact], pa.int64()),
            "est_raw_x1000": pa.array([est_x1000], pa.int64()),
            "err_x1000": pa.array([est_x1000 - 1000 * n_exact], pa.int64()),
        }
    )


BUDGET_TOTAL = 10_000  # documents the sampling budget hands out


def budget_allocation(sf_dir: str) -> "pa.Table":
    """Largest-remainder (Hamilton) apportionment of a sampling
    budget across sources, weighted by corpus bytes — the allocator a
    crawl/sampling scheduler runs: base = B·w_s // W exactly, then
    the leftover seats go to the largest remainders (ties to the
    lexicographically first source), so Σ alloc = B EXACTLY and the
    allocation is deterministic — the property proportional floats
    can't give. Tail-seated by design: welch_t2_grid's per-source
    fold with the apportionment finalized on the ≤|sources| grid.

    Scale shape: one pass folds per-source byte sums into a bounded
    grid; the Hamilton step touches only that grid. Output: (source,
    weight, base_alloc, extra, alloc)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("source").to_pylist(), dtype=object)
        nb = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        g = (
            pd.DataFrame({"source": src, "w": nb})
            .groupby("source", sort=False)["w"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "w": pa.array(g["w"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = sorted(
        (r["source"], int(r["w"]))
        for r in (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby("source")
            .aggregate(_Sum("w", alias_name="w"))
            .take_all()
        )
    )
    total = sum(w for _, w in grid)
    base = [(s, w, BUDGET_TOTAL * w // total, BUDGET_TOTAL * w % total)
            for s, w in grid]
    leftover = BUDGET_TOTAL - sum(b for _, _, b, _ in base)
    order = sorted(base, key=lambda r: (-r[3], r[0]))
    extra_set = {r[0] for r in order[:leftover]}
    return pa.table(
        {
            "source": pa.array([r[0] for r in base], pa.string()),
            "weight": pa.array([r[1] for r in base], pa.int64()),
            "base_alloc": pa.array([r[2] for r in base], pa.int64()),
            "extra": pa.array(
                [1 if r[0] in extra_set else 0 for r in base], pa.int64()
            ),
            "alloc": pa.array(
                [r[2] + (1 if r[0] in extra_set else 0) for r in base],
                pa.int64(),
            ),
        }
    )


QSE_BINS = 128               # fixed-width sketch buckets per type
QSE_PERCENTS = (50, 90, 99)  # quantiles the sketch is judged on


def quantile_sketch_error(sf_dir: str) -> "pa.Table":
    """Measured histogram-sketch quantile error — the eval that
    prices the fixed-bin quantile estimate every streaming dashboard
    ships (hist_quantiles' grid) against the EXACT percentile
    (global_quantiles' definition), per event type. The sketch
    estimate is the lower edge of the first QSE_BINS-wide bucket
    whose cumulative count reaches rank ceil(q·n/100); the exact
    answer is percentile_disc over integer cents. err_cents = est −
    exact is the sketch's signed bias in value units — bounded above
    by 0 (a lower edge never overshoots) and below by −width, read
    from data instead of assumed. Joins the measured-error family
    (bloom_fpr_eval, cms_error_eval, hll_error_eval). Tail-seated by
    design: hist_quantiles' bucket grid judged by global_quantiles'
    exact rank rule.

    Scale shape: pass 1 is a per-type (min, max, count) aggregate
    (driver reads #types rows); pass 2 exchanges per-(type, bucket)
    partials (≤ #types × QSE_BINS); the exact side reduces to the
    (type, cents) VALUE GRID — bounded by the cents range, not row
    count — and each per-type map_groups task folds grid rows, never
    raw rows. Output: (event_type, q, n_rows, est_cents,
    exact_cents, err_cents)."""
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        v = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "cents": pa.array(v, pa.int64()),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pyarrow")

    stats = {
        r["event_type"]: (int(r["mn"]), int(r["mx"]), int(r["n"]))
        for r in cents.groupby("event_type")
        .aggregate(
            _Min("cents", alias_name="mn"),
            _Max("cents", alias_name="mx"),
            _Count(alias_name="n"),
        )
        .take_all()  # bounded: one row per event type
    }
    widths = {t: (mx - mn + QSE_BINS) // QSE_BINS for t, (mn, mx, _) in stats.items()}
    ranks = {
        (t, q): (q * n + 99) // 100
        for t, (_, _, n) in stats.items()
        for q in QSE_PERCENTS
    }
    bref = ray.put({t: (mn, widths[t]) for t, (mn, _, _) in stats.items()})

    def bucket_partials(batch: pa.Table) -> pa.Table:
        bc = ray.get(bref)
        types = batch.column("event_type").to_numpy(zero_copy_only=False)
        v = batch.column("cents").to_numpy(zero_copy_only=False)
        out_t: list[str] = []
        out_b: list[int] = []
        out_n: list[int] = []
        for t in np.unique(types):
            mn, width = bc[t]
            b = (v[types == t] - mn) // width
            cnt = np.bincount(b)
            nz = np.nonzero(cnt)[0]
            out_t += [t] * len(nz)
            out_b += nz.tolist()
            out_n += cnt[nz].astype(np.int64).tolist()
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "bucket": pa.array(out_b, pa.int64()),
                "bn": pa.array(out_n, pa.int64()),
            }
        )

    bucket_rows = (
        cents.map_batches(bucket_partials, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .aggregate(_Sum("bn", alias_name="c"))
        .take_all()  # bounded: ≤ #types × QSE_BINS rows
    )
    by_t: dict[str, list[tuple[int, int]]] = {}
    for r in bucket_rows:
        by_t.setdefault(r["event_type"], []).append(
            (int(r["bucket"]), int(r["c"]))
        )
    est: dict[tuple[str, int], int] = {}
    for t, rows in by_t.items():
        mn, width = stats[t][0], widths[t]
        cum = 0
        pending = sorted(QSE_PERCENTS)
        for b, c in sorted(rows):
            cum += c
            while pending and cum >= ranks[(t, pending[0])]:
                est[(t, pending[0])] = mn + b * width
                pending.pop(0)

    rref = ray.put(ranks)

    def grid_partials(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_numpy(zero_copy_only=False)
        v = batch.column("cents").to_numpy(zero_copy_only=False)
        out_t: list[str] = []
        out_v: list[int] = []
        out_n: list[int] = []
        for t in np.unique(types):
            vals, cnts = np.unique(v[types == t], return_counts=True)
            out_t += [t] * len(vals)
            out_v += vals.tolist()
            out_n += cnts.astype(np.int64).tolist()
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "cents": pa.array(out_v, pa.int64()),
                "cnt": pa.array(out_n, pa.int64()),
            }
        )

    def exact_fold(grp: pa.Table) -> pa.Table:
        rk = ray.get(rref)
        t = grp.column("event_type")[0].as_py()
        vals = grp.column("cents").to_numpy(zero_copy_only=False)
        cnts = grp.column("cnt").to_numpy(zero_copy_only=False)
        order = np.argsort(vals)
        cum = np.cumsum(cnts[order])
        sv = vals[order]
        qs, ex = [], []
        for q in QSE_PERCENTS:
            idx = int(np.searchsorted(cum, rk[(t, q)]))
            qs.append(q)
            ex.append(int(sv[idx]))
        return pa.table(
            {
                "event_type": pa.array([t] * len(qs), pa.string()),
                "q": pa.array(qs, pa.int64()),
                "exact_cents": pa.array(ex, pa.int64()),
            }
        )

    exact_rows = (
        cents.map_batches(grid_partials, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(_Sum("cnt", alias_name="cnt"))
        .groupby("event_type")
        .map_groups(exact_fold, batch_format="pyarrow")
        .take_all()  # bounded: #types × |QSE_PERCENTS| rows
    )
    rows = sorted(
        (r["event_type"], int(r["q"]), int(r["exact_cents"]))
        for r in exact_rows
    )
    return pa.table(
        {
            "event_type": pa.array([t for t, _, _ in rows], pa.string()),
            "q": pa.array([q for _, q, _ in rows], pa.int64()),
            "n_rows": pa.array(
                [stats[t][2] for t, _, _ in rows], pa.int64()
            ),
            "est_cents": pa.array(
                [est[(t, q)] for t, q, _ in rows], pa.int64()
            ),
            "exact_cents": pa.array([e for _, _, e in rows], pa.int64()),
            "err_cents": pa.array(
                [est[(t, q)] - e for t, q, e in rows], pa.int64()
            ),
        }
    )


KMV_K = 64                      # bottom-k sketch size
KMV_HASH_MOD = 1 << 48          # 12 hex chars of md5 — keeps (k−1)·2^48 in int64


def kmv_distinct_eval(sf_dir: str) -> "pa.Table":
    """Measured KMV (bottom-k / theta-sketch) distinct-count error —
    per event type, the k-minimum-values estimate (k−1)·2^48 // h_k
    from the KMV_K smallest DISTINCT 48-bit md5 hashes of user_id,
    against the exact distinct count (of the same hash domain, so a
    48-bit collision cancels identically on both sides); types with
    fewer than k distinct users fall back to the exact count, the
    standard KMV rule. Completes the sketch-eval family
    (bloom_fpr_eval, cms_error_eval, hll_error_eval,
    quantile_sketch_error) with the ONE mergeable distinct sketch the
    registry lacked — Bar-Yossef et al.'s counting-distinct-elements
    bottom-k. Tail-seated by design: hll_error_eval's protocol on a
    bottom-k register.

    Scale shape: the exact side is the (type, hash) DISTINCT grid
    (one coarse reduce) folded to #types counts; the sketch side
    emits ≤ KMV_K candidate rows per (batch, type) and a per-type
    fold over those bounded candidates — no raw row ever reaches the
    driver. Output: (event_type, n_exact, k_used, est, err)."""
    import hashlib

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def hash_rows(batch: pa.Table) -> pa.Table:
        types = np.asarray(
            batch.column("event_type").to_pylist(), dtype=object
        )
        users = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        out_t: list[str] = []
        out_h: list[int] = []
        for t in np.unique(types):
            uu = np.unique(users[types == t])
            hv = sorted(
                {
                    int(
                        hashlib.md5(f"kmv:{int(u)}".encode()).hexdigest()[:12],
                        16,
                    )
                    for u in uu
                }
            )
            out_t += [t] * len(hv)
            out_h += hv
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "hv": pa.array(out_h, pa.int64()),
            }
        )

    hashed = ds.map_batches(hash_rows, batch_format="pyarrow")

    exact = {
        r["event_type"]: int(r["nd"])
        for r in hashed.groupby(["event_type", "hv"])
        .aggregate(_Sum("hv", alias_name="dummy"))
        .map_batches(
            lambda b: pa.table(
                {
                    "event_type": b.column("event_type"),
                    "one": pa.array(
                        np.ones(b.num_rows, np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("event_type")
        .aggregate(_Sum("one", alias_name="nd"))
        .take_all()  # bounded: one row per type
    }

    def bottom_partial(batch: pa.Table) -> pa.Table:
        types = np.asarray(
            batch.column("event_type").to_pylist(), dtype=object
        )
        hv = batch.column("hv").to_numpy(zero_copy_only=False)
        out_t: list[str] = []
        out_h: list[int] = []
        for t in np.unique(types):
            vals = np.unique(hv[types == t])[:KMV_K]
            out_t += [t] * len(vals)
            out_h += vals.tolist()
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "hv": pa.array(out_h, pa.int64()),
            }
        )

    def fold(grp: pa.Table) -> pa.Table:
        t = grp.column("event_type")[0].as_py()
        vals = np.unique(grp.column("hv").to_numpy(zero_copy_only=False))
        k_used = min(len(vals), KMV_K)
        hk = int(vals[k_used - 1])
        return pa.table(
            {
                "event_type": pa.array([t], pa.string()),
                "k_used": pa.array([k_used], pa.int64()),
                "hk": pa.array([hk], pa.int64()),
            }
        )

    sk = {
        r["event_type"]: (int(r["k_used"]), int(r["hk"]))
        for r in hashed.map_batches(bottom_partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()  # bounded: one row per type
    }
    types = sorted(exact)
    ests = []
    for t in types:
        k_used, hk = sk[t]
        n = exact[t]
        ests.append(n if n < KMV_K else (k_used - 1) * KMV_HASH_MOD // hk)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_exact": pa.array([exact[t] for t in types], pa.int64()),
            "k_used": pa.array([sk[t][0] for t in types], pa.int64()),
            "est": pa.array(ests, pa.int64()),
            "err": pa.array(
                [e - exact[t] for e, t in zip(ests, types)], pa.int64()
            ),
        }
    )


PB_REPLICAS = 16   # Poisson-bootstrap replicas
PB_NIBBLES = 16    # zero-nibbles of md5 → Binomial(16, 1/16) ≈ Poisson(1)


def poisson_bootstrap_ci(sf_dir: str) -> "pa.Table":
    """Deterministic Poisson bootstrap of the mean purchase value —
    the resampling trick that makes bootstrap CIs computable in one
    streaming pass over sharded data (Chamandy et al., "Estimating
    uncertainty for massive data streams", Google 2012): replica b
    weights each purchase by w = #zero nibbles among the first
    PB_NIBBLES of md5(event, b) ~ Binomial(16, 1/16) ≈ Poisson(1),
    so every replica is a with-replacement resample no two workers
    need to coordinate, and the spread of the PB_REPLICAS replica
    means IS the sampling distribution of the estimator. All
    arithmetic integer cents; weights are deterministic, so the CI
    is reproducible row-order-free. Tail-seated by design:
    hash_sample's md5 discipline driving weighted_sample's weighted
    mean, replicated.

    Scale shape: each batch folds to PB_REPLICAS (Σw, Σw·cents)
    int64 partials — fixed size regardless of rows — one
    groupby(replica).Sum() reduce, driver reads PB_REPLICAS rows.
    Output: (replica, n_eff, sum_cents, mean_cents)."""
    import hashlib

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        sel = et == "purchase"
        ids = batch.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[sel]
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False)[sel] * 100.0
            + 0.5
        ).astype(np.int64)
        reps, ns, sums = [], [], []
        for b in range(PB_REPLICAS):
            w = np.fromiter(
                (
                    hashlib.md5(f"pb:{int(i)}:{b}".encode())
                    .hexdigest()[:PB_NIBBLES]
                    .count("0")
                    for i in ids
                ),
                dtype=np.int64,
                count=len(ids),
            )
            reps.append(b)
            ns.append(int(w.sum()))
            sums.append(int((w * cents).sum()))
        return pa.table(
            {
                "replica": pa.array(reps, pa.int64()),
                "n_eff": pa.array(ns, pa.int64()),
                "s": pa.array(sums, pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("replica")
        .aggregate(_Sum("n_eff", alias_name="n_eff"), _Sum("s", alias_name="s"))
        .take_all()  # bounded: PB_REPLICAS rows
    )
    out = sorted((int(r["replica"]), int(r["n_eff"]), int(r["s"])) for r in rows)
    return pa.table(
        {
            "replica": pa.array([r for r, _, _ in out], pa.int64()),
            "n_eff": pa.array([n for _, n, _ in out], pa.int64()),
            "sum_cents": pa.array([s for _, _, s in out], pa.int64()),
            "mean_cents": pa.array(
                [s // n for _, n, s in out], pa.int64()
            ),
        }
    )


LPT_WORKERS = 8   # shards the balance plan packs into


def shard_balance_plan(sf_dir: str) -> "pa.Table":
    """LPT shard-balance plan — Graham's longest-processing-time list
    scheduling over the (source, lang) work cells: items sorted by
    total chars DESC (ties (source, lang) ASC) each go to the
    currently least-loaded of LPT_WORKERS shards (ties → lowest
    shard), the 4/3-approximate makespan balancer every
    heterogeneous-scan scheduler runs before launching workers.
    Where compaction_plan packs SEQUENTIALLY into size-capped files
    and salt_plan splits single hot keys, this is the third planner
    shape: min-makespan ASSIGNMENT of whole cells. Tail-seated by
    design: budget_allocation's bounded-grid greedy with a different
    invariant.

    Scale shape: per-batch (source, lang, chars) partials → ONE
    bounded groupby (≤ sources×langs cells) → the greedy runs on the
    driver over that grid (the plan IS driver-sized state, like
    budget_allocation); doc rows never leave their scan. Output:
    (rank, source, lang, item_chars, worker, load_after)."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang", "n_chars"]
    )
    grid = (
        ds.groupby(["source", "lang"])
        .aggregate(_Sum("n_chars", alias_name="w"))
        .take_all()  # bounded: one row per (source, lang) cell
    )
    items = sorted(
        ((r["source"], r["lang"], int(r["w"])) for r in grid),
        key=lambda r: (-r[2], r[0], r[1]),
    )
    loads = [0] * LPT_WORKERS
    ranks, srcs, langs, ws_, wk, la = [], [], [], [], [], []
    for rank, (s, l, w) in enumerate(items, start=1):
        k = loads.index(min(loads))
        loads[k] += w
        ranks.append(rank)
        srcs.append(s)
        langs.append(l)
        ws_.append(w)
        wk.append(k)
        la.append(loads[k])
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "source": pa.array(srcs, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "item_chars": pa.array(ws_, pa.int64()),
            "worker": pa.array(wk, pa.int64()),
            "load_after": pa.array(la, pa.int64()),
        }
    )


ROC_DAY_US = 86_400_000_000   # µs per day — the user-day grain


def _conversion_score_grid(sf_dir: str) -> list[tuple[int, int, int]]:
    """The conversion-propensity SCORE GRID shared by roc_points and
    calibration_bins — score a USER-DAY by its event count, label it
    by whether a purchase happened that day; returns the bounded
    sorted grid [(score, positives, negatives)]. roc_points sweeps it
    into the exact confusion curve + Mann-Whitney AUC (ties at half
    weight, millionths); calibration_bins scores a fixed saturating
    propensity model against it. Pure integer arithmetic throughout.

    Scale shape: one (user, day) groupby completes the grain (Sum
    count, Max label), a second bounded groupby folds it to the
    score grid (≤ max daily events rows); callers read only the
    grid."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def ud_partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // ROC_DAY_US
        )
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        g = (
            pd.DataFrame(
                {"u": uid, "d": day, "n": 1, "y": (et == "purchase").astype(np.int64)}
            )
            .groupby(["u", "d"], sort=False)
            .agg(n=("n", "sum"), y=("y", "max"))
            .reset_index()
        )
        return pa.table(
            {
                "u": pa.array(g["u"].to_numpy().astype(np.int64), pa.int64()),
                "d": pa.array(g["d"].to_numpy().astype(np.int64), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
                "y": pa.array(g["y"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def to_grid(batch: pa.Table) -> pa.Table:
        s = batch.column("n").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s": pa.array(s.astype(np.int64), pa.int64()),
                "pos": pa.array(y.astype(np.int64), pa.int64()),
                "neg": pa.array((1 - y).astype(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(ud_partial, batch_format="pyarrow")
        .groupby(["u", "d"])
        .aggregate(_Sum("n", alias_name="n"), _Max("y", alias_name="y"))
        .map_batches(to_grid, batch_format="pyarrow")
        .groupby("s")
        .aggregate(_Sum("pos", alias_name="pos"), _Sum("neg", alias_name="neg"))
        .take_all()  # bounded: the daily-event-count score grid
    )
    return sorted((int(r["s"]), int(r["pos"]), int(r["neg"])) for r in grid)


def roc_points(sf_dir: str) -> "pa.Table":
    """ROC curve + exact Mann-Whitney AUC over the conversion score
    grid (see _conversion_score_grid for the grain and docstring of
    record — this is the fold half of the original single function)."""
    rows = _conversion_score_grid(sf_dir)
    p_tot = sum(p for _, p, _ in rows)
    n_tot = sum(n for _, _, n in rows)
    u2 = 0
    negless = 0
    for _, p, n in rows:
        u2 += p * (2 * negless + n)
        negless += n
    auc = u2 * 1_000_000 // (2 * p_tot * n_tot)
    thr, tp_l, fp_l = [], [], []
    tp = fp = 0
    for s, p, n in reversed(rows):
        tp += p
        fp += n
        thr.append(s)
        tp_l.append(tp)
        fp_l.append(fp)
    return pa.table(
        {
            "thr": pa.array(thr, pa.int64()),
            "tp": pa.array(tp_l, pa.int64()),
            "fp": pa.array(fp_l, pa.int64()),
            "fn": pa.array([p_tot - t for t in tp_l], pa.int64()),
            "tn": pa.array([n_tot - f for f in fp_l], pa.int64()),
            "tpr_bp": pa.array([t * 10_000 // p_tot for t in tp_l], pa.int64()),
            "fpr_bp": pa.array([f * 10_000 // n_tot for f in fp_l], pa.int64()),
            "auc_x1e6": pa.array([auc] * len(thr), pa.int64()),
        }
    )


def source_shape_overlap(sf_dir: str) -> "pa.Table":
    """Histogram-intersection similarity between source LENGTH
    distributions — per source pair, Σ_band min(p_a, p_b) where p is
    the source's share (in bp, floored) of docs in each log2(n_chars)
    band: the distribution-shape overlap matrix (Swain & Ballard's
    histogram intersection kernel) that says which sources are
    interchangeable in a sampling mix and which one is shaped like
    nothing else — the SHAPE axis where audience_overlap measures
    shared members and ks_drift two fixed samples. Tail-seated by
    design: conversion_by_engagement's banding folded into a
    pairwise kernel.

    Scale shape: per-batch (source, band) partials → ONE bounded
    groupby (≤ sources × 64 cells) → the pairwise fold runs on the
    driver over that grid (sources² pairs of ≤64-long bp vectors —
    driver-sized by the same contract as budget_allocation). Output:
    (source_a, source_b, overlap_bp)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def band_partial(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("source").to_pylist(), dtype=object)
        n = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        band = np.zeros(len(n), np.int64)
        nn = n.copy()
        while (nn > 0).any():
            band[nn > 0] += 1
            nn >>= 1
        g = (
            pd.DataFrame({"s": src, "b": band, "c": 1})
            .groupby(["s", "b"], sort=False)["c"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["s"], pa.string()),
                "band": pa.array(
                    g["b"].to_numpy().astype(np.int64), pa.int64()
                ),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(band_partial, batch_format="pyarrow")
        .groupby(["source", "band"])
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: sources × log2 bands
    )
    by_src: dict[str, dict[int, int]] = {}
    for r in grid:
        by_src.setdefault(r["source"], {})[int(r["band"])] = int(r["c"])
    bp = {
        s: {b: c * 10_000 // sum(cells.values()) for b, c in cells.items()}
        for s, cells in by_src.items()
    }
    srcs = sorted(bp)
    out_a, out_b, out_o = [], [], []
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            common = set(bp[sa]) & set(bp[sb])
            out_a.append(sa)
            out_b.append(sb)
            out_o.append(sum(min(bp[sa][b], bp[sb][b]) for b in common))
    return pa.table(
        {
            "source_a": pa.array(out_a, pa.string()),
            "source_b": pa.array(out_b, pa.string()),
            "overlap_bp": pa.array(out_o, pa.int64()),
        }
    )


def hhi_concentration(sf_dir: str) -> "pa.Table":
    """Herfindahl–Hirschman language concentration per source —
    HHI = Σ_lang share² in exact basis points (Σ cnt² · 10⁴ //
    tot²), the antitrust regulator's concentration index read over a
    corpus: 10⁴ = monolingual source, → 0 = perfectly spread. The
    square-law cousin gini_sources (rank-weighted inequality) and
    l_diversity_audit (min distinct count) don't compute — and,
    being a plain sum of squares, it needs NO sort and merges
    associatively where Gini cannot. Tail-seated by design:
    contingency_grid's cells under a square-law fold.

    Scale shape: per-batch (source, lang) partials → ONE bounded
    groupby (≤ sources × langs) → the square-law fold reads the grid
    on the driver. Output: (source, n_docs, n_langs, hhi_bp)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "s": np.asarray(
                        batch.column("source").to_pylist(), dtype=object
                    ),
                    "l": np.asarray(
                        batch.column("lang").to_pylist(), dtype=object
                    ),
                    "c": 1,
                }
            )
            .groupby(["s", "l"], sort=False)["c"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["s"], pa.string()),
                "lang": pa.array(g["l"], pa.string()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: sources × langs cells
    )
    cells: dict[str, list[int]] = {}
    for r in grid:
        cells.setdefault(r["source"], []).append(int(r["c"]))
    srcs = sorted(cells)
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "n_docs": pa.array([sum(cells[s]) for s in srcs], pa.int64()),
            "n_langs": pa.array([len(cells[s]) for s in srcs], pa.int64()),
            "hhi_bp": pa.array(
                [
                    sum(c * c for c in cells[s])
                    * 10_000
                    // (sum(cells[s]) ** 2)
                    for s in srcs
                ],
                pa.int64(),
            ),
        }
    )


def gini_split_stump(sf_dir: str) -> "pa.Table":
    """Decision-stump split search, exact — for every candidate
    threshold v over n_chars (split: x ≤ v vs x > v), the Gini
    impurity DECREASE of predicting lang = 'en', in exact nano-units:
    gain·n²·n_l·n_r = 2p(n−p)·n_l·n_r − 2n·(p_l(n_l−p_l)·n_r +
    p_r(n_r−p_r)·n_l), floored against the common denominator — the
    CART split-finding primitive (Breiman et al. 1984) run at corpus
    scale, emitted as the FULL gain curve so the best stump AND the
    plateau around it are readable (argmax = max(gain, then min
    thr)). Gini gain is concave-guaranteed ≥ 0, so no sign tricks
    are needed; intermediates exceed int64 and ride Python bigints /
    the oracle's HUGEINT. Tail-seated by design: hist_quantiles'
    value grid swept by a supervised objective.

    Scale shape: ONE bounded (n_chars value) groupby with per-batch
    (count, positives) partials; the prefix-scan gain fold reads the
    value GRID on the driver — rows never leave their scan. Output:
    (thr, n_left, pos_left, n_right, pos_right, gain_x1e9)."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["n_chars", "lang"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        v = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        en = (
            np.asarray(batch.column("lang").to_pylist(), dtype=object) == "en"
        ).astype(np.int64)
        g = (
            pd.DataFrame({"v": v, "c": 1, "p": en})
            .groupby("v", sort=False)
            .agg(c=("c", "sum"), p=("p", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "v": pa.array(g["v"].to_numpy().astype(np.int64), pa.int64()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
                "p": pa.array(g["p"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = sorted(
        (int(r["v"]), int(r["c"]), int(r["p"]))
        for r in ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(_Sum("c", alias_name="c"), _Sum("p", alias_name="p"))
        .take_all()  # bounded: the n_chars value grid
    )
    n = sum(c for _, c, _ in grid)
    p = sum(q for _, _, q in grid)
    thr, nl_l, pl_l, nr_l, pr_l, gain_l = [], [], [], [], [], []
    nl = pl = 0
    for v, c, q in grid:
        nl += c
        pl += q
        if nl >= n:
            break  # right side must be non-empty
        nr, pr = n - nl, p - pl
        num = 2 * p * (n - p) * nl * nr - 2 * n * (
            pl * (nl - pl) * nr + pr * (nr - pr) * nl
        )
        gain = num * 1_000_000_000 // (n * n * nl * nr)
        thr.append(v)
        nl_l.append(nl)
        pl_l.append(pl)
        nr_l.append(nr)
        pr_l.append(pr)
        gain_l.append(gain)
    return pa.table(
        {
            "thr": pa.array(thr, pa.int64()),
            "n_left": pa.array(nl_l, pa.int64()),
            "pos_left": pa.array(pl_l, pa.int64()),
            "n_right": pa.array(nr_l, pa.int64()),
            "pos_right": pa.array(pr_l, pa.int64()),
            "gain_x1e9": pa.array(gain_l, pa.int64()),
        }
    )


DICT_AUDIT_COLS = (
    ("documents", "source"),
    ("documents", "lang"),
    ("events", "event_type"),
)


def dict_encoding_audit(sf_dir: str) -> "pa.Table":
    """Dictionary-encoding benefit audit — for each low-cardinality
    string column the writer could dictionary-encode, the exact byte
    math a columnar layout decision needs: raw bytes (Σ strlen),
    dictionary bytes (Σ strlen over DISTINCT values + n rows × the
    index width 1/2/4 chosen by cardinality), and the savings in bp
    (offset-shifted floor so a pathological negative saving still
    divides exactly). profile_columns reports shapes and
    front_coding_audit prices prefix compression of SORTED keys —
    this prices the dictionary, the decision Parquet writers
    actually make per column chunk. Tail-seated by design:
    profile_columns' per-column fold with storage-cost arithmetic.

    Scale shape: per column ONE (value) groupby with per-batch
    (count, bytes) partials — dictionary candidates are
    low-cardinality by selection, so the distinct grid is bounded;
    the driver reads it and does pure integer byte math. Output:
    (table_name, column_name, n_rows, n_distinct, raw_bytes,
    dict_bytes, savings_bp)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    rows = []
    for table, col in DICT_AUDIT_COLS:
        ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

        def partial(batch: pa.Table, _c=col) -> pa.Table:
            vals = np.asarray(batch.column(_c).to_pylist(), dtype=object)
            g = (
                pd.DataFrame({"v": vals, "c": 1})
                .groupby("v", sort=False)["c"]
                .sum()
                .reset_index()
            )
            return pa.table(
                {
                    "v": pa.array(g["v"], pa.string()),
                    "c": pa.array(
                        g["c"].to_numpy().astype(np.int64), pa.int64()
                    ),
                }
            )

        grid = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("v")
            .aggregate(_Sum("c", alias_name="c"))
            .take_all()  # bounded: the column's distinct values
        )
        n = sum(int(r["c"]) for r in grid)
        d = len(grid)
        raw = sum(len(r["v"].encode()) * int(r["c"]) for r in grid)
        dict_entries = sum(len(r["v"].encode()) for r in grid)
        idx_bytes = 1 if d <= 256 else (2 if d <= 65536 else 4)
        dict_total = dict_entries + n * idx_bytes
        savings_bp = (raw - dict_total + 8 * raw) * 10_000 // raw - 80_000
        rows.append((table, col, n, d, raw, dict_total, savings_bp))
    return pa.table(
        {
            "table_name": pa.array([r[0] for r in rows], pa.string()),
            "column_name": pa.array([r[1] for r in rows], pa.string()),
            "n_rows": pa.array([r[2] for r in rows], pa.int64()),
            "n_distinct": pa.array([r[3] for r in rows], pa.int64()),
            "raw_bytes": pa.array([r[4] for r in rows], pa.int64()),
            "dict_bytes": pa.array([r[5] for r in rows], pa.int64()),
            "savings_bp": pa.array([r[6] for r in rows], pa.int64()),
        }
    )


CAL_K = 3      # saturating-propensity half-point: p_hat = s/(s+K)
CAL_BINS = 10  # equal-width probability bins


def calibration_bins(sf_dir: str) -> "pa.Table":
    """Reliability diagram + exact ECE of a FIXED propensity model —
    score every user-day by the saturating curve p_hat = s/(s+CAL_K)
    (in millionths, exact floor) where s is the day's event count,
    fold user-days into CAL_BINS equal-width probability bins, and
    per bin emit count, positives, confidence mass and the exact
    calibration gap |pos/n − conf/n| in millionths (one common
    denominator, so |pos·10⁶ − conf_sum| // n is exact), plus the
    corpus ECE = Σ_b |pos_b·10⁶ − conf_b| // N. roc_points asks
    whether the score DISCRIMINATES; this asks whether its
    probabilities are HONEST — the other half of classifier eval,
    and the one that decides if scores can gate data (a miscalibrated
    quality gate silently shifts the kept distribution). Tail-seated
    by design: roc_points' grid against a fixed link function.

    Scale shape: consumes the bounded _conversion_score_grid (two
    groupbys, per-batch partials); the bin fold is pure driver
    integer math over that grid. Output: (bin, n, pos, conf_sum,
    gap_x1e6, ece_x1e6), non-empty bins only."""
    rows = _conversion_score_grid(sf_dir)
    acc: dict[int, list[int]] = {}
    for s, pos, neg in rows:
        n = pos + neg
        p_hat = s * 1_000_000 // (s + CAL_K)
        b = p_hat * CAL_BINS // 1_000_000
        cell = acc.setdefault(b, [0, 0, 0])
        cell[0] += n
        cell[1] += pos
        cell[2] += p_hat * n
    n_tot = sum(c[0] for c in acc.values())
    num_tot = sum(
        abs(c[1] * 1_000_000 - c[2]) for c in acc.values()
    )
    ece = num_tot // n_tot
    bins = sorted(acc)
    return pa.table(
        {
            "bin": pa.array(bins, pa.int64()),
            "n": pa.array([acc[b][0] for b in bins], pa.int64()),
            "pos": pa.array([acc[b][1] for b in bins], pa.int64()),
            "conf_sum": pa.array([acc[b][2] for b in bins], pa.int64()),
            "gap_x1e6": pa.array(
                [
                    abs(acc[b][1] * 1_000_000 - acc[b][2]) // acc[b][0]
                    for b in bins
                ],
                pa.int64(),
            ),
            "ece_x1e6": pa.array([ece] * len(bins), pa.int64()),
        }
    )


def chi2_independence(sf_dir: str) -> "pa.Table":
    """Exact Pearson chi-square decomposition of the source × lang
    contingency — for EVERY cell of the full marginal cross (including
    zero-observation cells) the observed count, the expected count in
    millionths (R·C·10⁶ // N) and the cell's chi-square contribution
    (O·N − R·C)²·10⁶ // (N·R·C) — numerator a square so provably
    ≥ 0, intermediates on Python ints / HUGEINT — plus the total
    statistic as the sum of the floored cell terms (mirrored exactly
    in SQL). contingency_grid emits the counts; this emits the TEST —
    which cells drive source/language dependence, the routing signal
    a mixture-weights job needs. Tail-seated by design:
    contingency_grid's counts pushed through cross-multiplied
    inference.

    Scale shape: per-batch (source, lang) Counter partials → ONE
    bounded groupby (sources × langs grid); marginals and the
    cross-multiplied fold are pure driver integer math over that
    grid. Output: (source, lang, obs, exp_x1e6, contrib_x1e6,
    chi2_x1e6)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("source").to_pylist(), dtype=object)
        la = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        g = (
            pd.DataFrame({"source": s, "lang": la, "c": 1})
            .groupby(["source", "lang"], sort=False)["c"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "lang": pa.array(g["lang"], pa.string()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: sources × langs cells
    )
    obs = {(r["source"], r["lang"]): int(r["c"]) for r in grid}
    sources = sorted({k[0] for k in obs})
    langs = sorted({k[1] for k in obs})
    rc = {s: sum(obs.get((s, la), 0) for la in langs) for s in sources}
    lc = {la: sum(obs.get((s, la), 0) for s in sources) for la in langs}
    nn = sum(rc.values())
    out_s, out_l, out_o, out_e, out_c = [], [], [], [], []
    for s in sources:
        for la in langs:
            o = obs.get((s, la), 0)
            diff = o * nn - rc[s] * lc[la]
            out_s.append(s)
            out_l.append(la)
            out_o.append(o)
            out_e.append(rc[s] * lc[la] * 1_000_000 // nn)
            out_c.append(diff * diff * 1_000_000 // (nn * rc[s] * lc[la]))
    chi2 = sum(out_c)
    return pa.table(
        {
            "source": pa.array(out_s, pa.string()),
            "lang": pa.array(out_l, pa.string()),
            "obs": pa.array(out_o, pa.int64()),
            "exp_x1e6": pa.array(out_e, pa.int64()),
            "contrib_x1e6": pa.array(out_c, pa.int64()),
            "chi2_x1e6": pa.array([chi2] * len(out_s), pa.int64()),
        }
    )


RLE_BUCKET = 65536  # contiguous id-range width for distributed run count
RLE_COLS = (
    ("documents", "source", "doc_id"),
    ("documents", "lang", "doc_id"),
    ("events", "event_type", "event_id"),
)


def rle_encoding_audit(sf_dir: str) -> "pa.Table":
    """Run-length-encoding benefit audit in PHYSICAL row order — for
    each dict-candidate column, the exact number of value runs when
    rows are laid out by their id, and the exact RLE byte cost
    (Σ over runs of strlen(value) + 4 length bytes) against raw
    Σ strlen, savings in bp (same offset-shifted floor as
    dict_encoding_audit). dict_encoding_audit prices the dictionary
    regardless of order; THIS prices how clustered the layout already
    is — the signal that decides whether a rewrite (zorder_keys'
    output) is worth the IO. Tail-seated by design:
    dict_encoding_audit's byte math over event_runs' run discipline.

    Scale shape: contiguous id-range buckets (id // RLE_BUCKET) —
    ONE groupby whose group is a bounded bucket, sorted locally for
    internal runs + (first, last) edge values; the driver stitches
    adjacent buckets (a merge where last_b == first_{b+1} subtracts
    one run and its bytes — associative, so a tree reduce replaces
    the driver fold at extreme scale). Driver read bounded at
    n / RLE_BUCKET rows per column. Output: (table_name,
    column_name, n_rows, n_runs, raw_bytes, rle_bytes, savings_bp)."""
    rows_out = []
    for table, col, idcol in RLE_COLS:
        ds = ray.data.read_parquet(
            f"{sf_dir}/{table}.parquet", columns=[idcol, col]
        )

        def to_bucket(batch: pa.Table, _id=idcol) -> pa.Table:
            ids = batch.column(_id).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            return pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "v": batch.column(1 - batch.schema.get_field_index(_id)),
                    "bucket": pa.array(ids // RLE_BUCKET, pa.int64()),
                }
            )

        def bucket_runs(grp: pa.Table) -> pa.Table:
            import pandas as pd

            df = grp.select(["id", "v"]).to_pandas().sort_values("id")
            v = df["v"].to_numpy()
            lens = np.array([len(x.encode()) for x in v], dtype=np.int64)
            starts = np.r_[True, v[1:] != v[:-1]]
            return pa.table(
                {
                    "bucket": pa.array(
                        [int(grp.column("bucket")[0].as_py())], pa.int64()
                    ),
                    "n": pa.array([len(v)], pa.int64()),
                    "raw": pa.array([int(lens.sum())], pa.int64()),
                    "runs": pa.array([int(starts.sum())], pa.int64()),
                    "rbytes": pa.array(
                        [int((lens[starts] + 4).sum())], pa.int64()
                    ),
                    "first_v": pa.array([str(v[0])], pa.string()),
                    "last_v": pa.array([str(v[-1])], pa.string()),
                }
            )

        grid = sorted(
            (
                int(r["bucket"]),
                int(r["n"]),
                int(r["raw"]),
                int(r["runs"]),
                int(r["rbytes"]),
                r["first_v"],
                r["last_v"],
            )
            for r in ds.map_batches(to_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_runs, batch_format="pyarrow")
            .take_all()  # bounded: n / RLE_BUCKET stitch rows
        )
        n = sum(g[1] for g in grid)
        raw = sum(g[2] for g in grid)
        runs = sum(g[3] for g in grid)
        rbytes = sum(g[4] for g in grid)
        for prev, cur in zip(grid, grid[1:]):
            if prev[6] == cur[5]:  # run continues across the boundary
                runs -= 1
                rbytes -= len(cur[5].encode()) + 4
        savings_bp = (raw - rbytes + 8 * raw) * 10_000 // raw - 80_000
        rows_out.append((table, col, n, runs, raw, rbytes, savings_bp))
    return pa.table(
        {
            "table_name": pa.array([r[0] for r in rows_out], pa.string()),
            "column_name": pa.array([r[1] for r in rows_out], pa.string()),
            "n_rows": pa.array([r[2] for r in rows_out], pa.int64()),
            "n_runs": pa.array([r[3] for r in rows_out], pa.int64()),
            "raw_bytes": pa.array([r[4] for r in rows_out], pa.int64()),
            "rle_bytes": pa.array([r[5] for r in rows_out], pa.int64()),
            "savings_bp": pa.array([r[6] for r in rows_out], pa.int64()),
        }
    )


ZM_BUCKET = 1024  # zone (row-group analogue) width in doc_id space
ZM_THRESHOLDS = tuple(2 ** k for k in range(5, 15))  # 32 .. 16384


def zonemap_audit(sf_dir: str) -> "pa.Table":
    """Zone-map (min/max statistics) pruning audit — partition
    documents into doc_id zones of ZM_BUCKET rows, keep each zone's
    max(n_chars) and row count, and for every threshold t in the
    fixed ZM_THRESHOLDS grid report exactly how many zones the
    predicate n_chars > t could SKIP outright (zone max ≤ t) and the
    row fraction pruned, in bp. compaction_plan sizes files and
    zorder_keys orders them — this measures what the ordering BUYS:
    the skip rate a reader's row-group statistics would actually
    achieve. Tail-seated by design: dict/rle audits' storage-cost
    fold pointed at read-side statistics.

    Scale shape: per-batch (zone, max, count) partials → ONE bounded
    groupby (n / ZM_BUCKET zones); a vectorized threshold sweep per
    zone block emits (thr, skippable, rows) partials → one tiny
    groupby(thr); the driver reads |ZM_THRESHOLDS| rows. Output:
    (thr, n_zones, skippable_zones, rows_skipped, prune_bp)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        z = (
            batch.column("doc_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // ZM_BUCKET
        )
        nc = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        g = (
            pd.DataFrame({"z": z, "mx": nc, "c": 1})
            .groupby("z", sort=False)
            .agg(mx=("mx", "max"), c=("c", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "z": pa.array(g["z"].to_numpy().astype(np.int64), pa.int64()),
                "mx": pa.array(
                    g["mx"].to_numpy().astype(np.int64), pa.int64()
                ),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    zones = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("z")
        .aggregate(_Max("mx", alias_name="mx"), _Sum("c", alias_name="c"))
    )

    thr_arr = np.array(ZM_THRESHOLDS, dtype=np.int64)

    def sweep(batch: pa.Table) -> pa.Table:
        mx = batch.column("mx").to_numpy(zero_copy_only=False)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        skip = mx[None, :] <= thr_arr[:, None]  # (T, zones)
        return pa.table(
            {
                "thr": pa.array(thr_arr, pa.int64()),
                "zones": pa.array(
                    np.full(len(thr_arr), len(mx), np.int64), pa.int64()
                ),
                "skippable": pa.array(
                    skip.sum(axis=1).astype(np.int64), pa.int64()
                ),
                "rows_skipped": pa.array(
                    (skip * c[None, :]).sum(axis=1).astype(np.int64),
                    pa.int64(),
                ),
                "rows": pa.array(
                    np.full(len(thr_arr), int(c.sum()), np.int64), pa.int64()
                ),
            }
        )

    grid = (
        zones.map_batches(sweep, batch_format="pyarrow")
        .groupby("thr")
        .aggregate(
            _Sum("zones", alias_name="zones"),
            _Sum("skippable", alias_name="skippable"),
            _Sum("rows_skipped", alias_name="rows_skipped"),
            _Sum("rows", alias_name="rows"),
        )
        .take_all()  # bounded: |ZM_THRESHOLDS| rows
    )
    rows = sorted(
        (
            int(r["thr"]),
            int(r["zones"]),
            int(r["skippable"]),
            int(r["rows_skipped"]),
            int(r["rows"]),
        )
        for r in grid
    )
    return pa.table(
        {
            "thr": pa.array([r[0] for r in rows], pa.int64()),
            "n_zones": pa.array([r[1] for r in rows], pa.int64()),
            "skippable_zones": pa.array([r[2] for r in rows], pa.int64()),
            "rows_skipped": pa.array([r[3] for r in rows], pa.int64()),
            "prune_bp": pa.array(
                [r[3] * 10_000 // r[4] for r in rows], pa.int64()
            ),
        }
    )


GD_SCALE = 32    # grid cell width = 1/32 in embedding coordinate space
GD_MINPTS = 4    # a cell is DENSE when it holds >= this many points
GD_OFF = 1 << 20   # coordinate offset keeping packed cell keys positive
GD_SPAN = 1 << 21  # packed key stride: cell = (cx+OFF)*SPAN + (cy+OFF)


def grid_dbscan(sf_dir: str) -> "pa.Table":
    """Grid-density clustering — DBSCAN collapsed onto a quantized
    grid (the cell-based variant used when pairwise eps-queries are
    too expensive): each embedding quantizes to the cell
    (floor(x·32), floor(y·32)) of its first two coordinates, a cell
    is DENSE when it holds ≥ GD_MINPTS points, and dense cells that
    touch in the 8-neighbourhood merge into clusters via connected
    components; points in non-dense cells are noise. The DENSITY
    clustering class the suite lacks: k-means (semdedup / kmeans_
    inertia) partitions by nearest centroid and must be told k;
    this finds arbitrarily-shaped blobs and outliers with no k at
    all — the outlier-mining / region-discovery shape. Reference
    parity: readur has no clustering; this extends the curation
    suite (cluster_purity consumes labels; this PRODUCES them).

    Exactness: quantization is floor(x·32) — ×2^5 is exact in any
    binary float, so float32 vs DOUBLE never disagree; everything
    after is integer. Cell keys pack as (cx+2^20)·2^21 + (cy+2^20),
    mirrored verbatim by the oracle, whose connected components run
    as a recursive min-label CTE (dedup_components precedent).

    Scale shape: per-batch cell bincount partials (arrow list
    offsets, no per-row stack) → ONE bounded groupby(cell) Sum; the
    occupied-cell grid is driver-bounded by the coordinate domain —
    normalized embeddings live in [-1, 1], so ≤ (2·32+2)² ≈ 4.4k
    cells regardless of row count — and the union-find runs on the
    dense subset of THAT, never on points. One exchange total;
    points never shuffle. Output: (cluster_id = min packed cell of
    the component, n_cells, n_points) per cluster, plus the noise
    row cluster_id = −1 (non-dense cells and their points), sorted
    by cluster_id."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.values.to_numpy(zero_copy_only=False)
        offs = col.offsets.to_numpy(zero_copy_only=False)[:-1]
        cx = np.floor(
            vals[offs].astype(np.float64) * GD_SCALE
        ).astype(np.int64)
        cy = np.floor(
            vals[offs + 1].astype(np.float64) * GD_SCALE
        ).astype(np.int64)
        cell = (cx + GD_OFF) * GD_SPAN + (cy + GD_OFF)
        u, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(u, pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: occupied cells <= (2*GD_SCALE+2)^2
    )
    counts = {int(r["cell"]): int(r["c"]) for r in grid}
    dense = {c for c, n in counts.items() if n >= GD_MINPTS}

    parent = {c: c for c in dense}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for cell in dense:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = cell + dx * GD_SPAN + dy
                if nb in dense:
                    ra, rb = find(cell), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)

    comp_cells: dict[int, int] = {}
    comp_points: dict[int, int] = {}
    for cell in dense:
        root = find(cell)
        comp_cells[root] = comp_cells.get(root, 0) + 1
        comp_points[root] = comp_points.get(root, 0) + counts[cell]

    n_noise_cells = len(counts) - len(dense)
    n_noise_pts = sum(counts.values()) - sum(comp_points.values())
    rows = [(-1, n_noise_cells, n_noise_pts)] + sorted(
        (cid, comp_cells[cid], comp_points[cid]) for cid in comp_cells
    )
    return pa.table(
        {
            "cluster_id": pa.array([r[0] for r in rows], pa.int64()),
            "n_cells": pa.array([r[1] for r in rows], pa.int64()),
            "n_points": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def wasserstein_drift(sf_dir: str) -> "ray.data.Dataset":
    """Exact 1-D Wasserstein-1 (earth-mover) distance of each
    source's ``n_chars`` distribution against the whole corpus — the
    INTEGRAL-norm companion to ks_drift's sup-norm. KS flags the
    single worst ECDF gap (sensitive to one sharp localized shift,
    blind to magnitude elsewhere); W1 integrates |ΔECDF| over the
    value axis, i.e. the total mass × distance that would have to
    move — the drift monitor that responds to a slow whole-
    distribution slide KS barely sees. Output per source: ``n_s``,
    ``n_all`` and ``w1_num`` = Σ_i |n_all·F_s(v_i) − n_s·F(v_i)| ·
    (v_{i+1} − v_i) over the sorted global value grid, so
    W1 = w1_num / (n_s·n_all) is exact integer arithmetic (the last
    grid point contributes 0: both ECDFs are complete there).
    Overflow bound: w1_num ≤ n_s·n_all·(v_max − v_min), inside int64
    through ~10^6 docs/source × 10^7 corpus × 10^4 range; beyond
    that the same plan emits HUGEINT-style hi/lo splits.

    Scale shape: identical to ks_drift (deliberately — one grid
    serves both norms): rows reduce to the (source, value) count
    grid with per-batch pyarrow group_by partials, ONE small groupby
    folds the grid, the global cumulative is built once from the
    tiny value histogram and broadcast, and a per-source map_groups
    scans its ≤|domain| grid rows — rows never shuffle, only grid
    cells do."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def cell_partials(batch: pa.Table) -> pa.Table:
        g = (
            batch.group_by(["source", "n_chars"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "source": g.column("source"),
                "v": g.column("n_chars").cast(pa.int64()),
                "c": g.column("count_all").cast(pa.int64()),
            }
        )

    cells = (
        ds.map_batches(cell_partials, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(_Sum("c", alias_name="c"))
    )

    hist: dict[int, int] = {}
    for b in cells.iter_batches(batch_format="pyarrow"):
        for v, c in zip(b.column("v").to_pylist(), b.column("c").to_pylist()):
            hist[v] = hist.get(v, 0) + c
    vals = np.array(sorted(hist), dtype=np.int64)
    cum_all = np.cumsum([hist[int(v)] for v in vals]).astype(np.int64)
    n_all = int(cum_all[-1])
    dv = np.diff(vals)  # gap to the next grid value; last point drops
    bcast = ray.put((vals, cum_all, dv))

    def per_source(group: pa.Table) -> pa.Table:
        gvals, gcum, gdv = ray.get(bcast)
        v = group.column("v").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        n_s = int(c.sum())
        cum_s = np.zeros(len(gvals), dtype=np.int64)
        cum_s[np.searchsorted(gvals, v)] = c
        cum_s = np.cumsum(cum_s)
        w1 = int(
            np.sum(
                np.abs(n_all * cum_s[:-1] - n_s * gcum[:-1]) * gdv
            )
        )
        return pa.table(
            {
                "source": pa.array([group.column("source")[0].as_py()]),
                "n_s": pa.array([n_s], pa.int64()),
                "n_all": pa.array([n_all], pa.int64()),
                "w1_num": pa.array([w1], pa.int64()),
            }
        )

    return cells.groupby("source").map_groups(
        per_source, batch_format="pyarrow"
    )


MW_VALUE_BUCKETS = 512  # value-range buckets for the rank exchange


def mann_whitney_u(sf_dir: str) -> "ray.data.Dataset":
    """Exact Mann-Whitney U (Wilcoxon rank-sum) statistic of each
    event type's ``value`` sample against the pooled corpus — the
    NONPARAMETRIC two-sample location test next to welch_t2_grid's
    parametric one (Welch assumes finite variance and compares means;
    U compares rank distributions, robust to the heavy-tailed /
    ordinal metrics A/B readouts actually ship). Ties are handled
    exactly through DOUBLE ranks: a tie group with L strictly-smaller
    rows and size t has average rank L + (t+1)/2, so its double rank
    d = 2L + t + 1 is always integer. Output per event_type: n_g,
    r2_sum = Σ d (twice the rank sum) and u2 = r2_sum − n_g·(n_g+1)
    (twice the U statistic vs the rest of the pool), all exact int64
    (inside int64 through ~10^9 rows; beyond, the same plan emits
    hi/lo splits). z-scores need only these plus the global tie term.

    Scale shape — the percentile_rank bucket-grid sort-rank on a
    FLOAT key: rows bucket by value range (equal values always share
    a bucket, so tie groups never straddle the prefix boundary), the
    MW_VALUE_BUCKETS-bounded count grid reaches the driver once and
    exclusive prefix bases broadcast back, and ONE groupby(kb)
    exchange ranks each bucket locally (np.unique + cumsum — no
    global sort barrier). Per-bucket output is the tiny
    (event_type, n, r2) partial, folded by one bounded groupby.
    Rows shuffle once; nothing else moves."""
    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(path, columns=["event_type", "value"])

    def finite(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isfinite(v)))

    ds = ds.map_batches(finite, batch_format="pyarrow")
    lohi = ds.aggregate(_Min("value"), _Max("value"))
    lo, hi = float(lohi["min(value)"]), float(lohi["max(value)"])
    width = (hi - lo) / MW_VALUE_BUCKETS or 1.0

    def keyed(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        kb = np.clip(
            np.floor((v - lo) / width).astype(np.int64),
            0,
            MW_VALUE_BUCKETS - 1,
        )
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "v": pa.array(v, pa.float64()),
                "kb": pa.array(kb, pa.int64()),
            }
        )

    rows = ds.map_batches(keyed, batch_format="pyarrow")

    def kb_partial(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("kb").to_numpy(zero_copy_only=False),
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
        .take_all()  # bounded: <= MW_VALUE_BUCKETS rows
    )
    counts = np.zeros(MW_VALUE_BUCKETS, dtype=np.int64)
    for r in grid:
        counts[int(r["kb"])] = int(r["n"])
    base = np.concatenate(([0], np.cumsum(counts)[:-1]))
    bcast = ray.put(base)

    def rank_part(group: pa.Table) -> pa.Table:
        pre = ray.get(bcast)
        kb = int(group.column("kb")[0].as_py())
        v = group.column("v").to_numpy(zero_copy_only=False)
        uniq, inv, cnt = np.unique(v, return_inverse=True, return_counts=True)
        before = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        d_uniq = 2 * (pre[kb] + before) + cnt + 1
        d = d_uniq[inv]
        part = pa.table(
            {"event_type": group.column("event_type"), "d": pa.array(d, pa.int64())}
        )
        g = part.group_by("event_type").aggregate([("d", "sum"), ([], "count_all")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n_g": g.column("count_all").cast(pa.int64()),
                "r2": g.column("d_sum").cast(pa.int64()),
            }
        )

    partials = rows.groupby("kb").map_groups(rank_part, batch_format="pyarrow")
    folded = partials.groupby("event_type").aggregate(
        _Sum("n_g", alias_name="n_g"), _Sum("r2", alias_name="r2_sum")
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_g").to_numpy(zero_copy_only=False)
        r2 = batch.column("r2_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n_g": pa.array(n, pa.int64()),
                "r2_sum": pa.array(r2, pa.int64()),
                "u2": pa.array(r2 - n * (n + 1), pa.int64()),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")


RFM_BUCKETS = 64  # key-range buckets per metric for the RFM rank passes


def rfm_segments(sf_dir: str) -> "ray.data.Dataset":
    """RFM customer segmentation — the classic marketing/CRM composite
    over the orders fact: per customer, recency_days (days from the
    last order to the corpus max order day), frequency (#orders) and
    monetary_cents (exact integer revenue), each scored into exact
    quintiles 1-5 (5 = most recent / most frequent / highest spend)
    with the deterministic tie-break (metric, custkey), and the packed
    segment code rfm = 100·r + 10·f + m. Quintile score is the pure
    rank arithmetic 1 + ⌊rn0·5/n⌋ over the row_number rn0 (0-based),
    mirrored verbatim by the oracle — never NTILE's
    larger-groups-first quirk.

    Scale shape: the orders fact folds ONCE to the per-customer
    (last_day, frequency, cents) table via per-batch pyarrow partials
    + one groupby(custkey) — the only fact-sized exchange — and that
    slim 4-int-column table is materialized once and re-ranked three
    times with the percentile_rank bucket-grid sort-rank (bounded
    RFM_BUCKETS count grid to the driver, exclusive prefix bases
    broadcast, one groupby(kb) exchange per metric, bucket-local
    lexsort — no global sort barrier). Descending metrics rank on the
    negated key, so one ascending kernel serves all three. Total: one
    fact exchange + three slim-row exchanges; scores ride the row, so
    no join reassembles the output."""
    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    path = f"{sf_dir}/orders.parquet"
    ds = ray.data.read_parquet(
        path, columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )

    mx = ds.aggregate(_Max("o_orderdate"))
    max_day = int(
        np.datetime64(mx["max(o_orderdate)"], "us").astype(np.int64)
        // 86_400_000_000
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        day = pa.array(
            batch.column("o_orderdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            // 86_400_000_000,
            pa.int64(),
        )
        t = pa.table(
            {
                "custkey": batch.column("o_custkey").cast(pa.int64()),
                "day": day,
                "cents": _cents(batch.column("o_totalprice")),
            }
        )
        g = t.group_by("custkey").aggregate(
            [("day", "max"), ("cents", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "custkey": g.column("custkey"),
                "last_day": g.column("day_max").cast(pa.int64()),
                "monetary_cents": g.column("cents_sum").cast(pa.int64()),
                "frequency": g.column("count_all").cast(pa.int64()),
            }
        )

    cust = (
        ds.map_batches(cust_partial, batch_format="pyarrow")
        .groupby("custkey")
        .aggregate(
            _Max("last_day", alias_name="last_day"),
            _Sum("monetary_cents", alias_name="monetary_cents"),
            _Sum("frequency", alias_name="frequency"),
        )
    )

    def with_recency(batch: pa.Table) -> pa.Table:
        last = batch.column("last_day").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "custkey": batch.column("custkey").cast(pa.int64()),
                "recency_days": pa.array(max_day - last, pa.int64()),
                "frequency": batch.column("frequency").cast(pa.int64()),
                "monetary_cents": batch.column("monetary_cents").cast(pa.int64()),
            }
        )

    # slim pre-reduced table (4 int64 cols, one row per customer):
    # materialized ONCE so the three rank passes don't re-fold orders.
    cust = cust.map_batches(with_recency, batch_format="pyarrow").materialize()
    n_total = cust.count()

    def rank_pass(dset, metric: str, score_col: str, descending: bool):
        sign = -1 if descending else 1
        lohi = dset.aggregate(_Min(metric), _Max(metric))
        lo = sign * int(lohi[f"min({metric})"] if sign == 1 else lohi[f"max({metric})"])
        hi = sign * int(lohi[f"max({metric})"] if sign == 1 else lohi[f"min({metric})"])
        width = (hi - lo) // RFM_BUCKETS + 1

        def keyed(batch: pa.Table) -> pa.Table:
            k = sign * batch.column(metric).to_numpy(zero_copy_only=False)
            kb = (k - lo) // width
            return batch.append_column(
                "_k", pa.array(k, pa.int64())
            ).append_column("_kb", pa.array(kb, pa.int64()))

        rows = dset.map_batches(keyed, batch_format="pyarrow")

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
            .take_all()  # bounded: <= RFM_BUCKETS rows
        )
        counts = np.zeros(RFM_BUCKETS, dtype=np.int64)
        for r in grid:
            counts[int(r["kb"])] = int(r["n"])
        base = np.concatenate(([0], np.cumsum(counts)[:-1]))
        bcast = ray.put(base)

        def rank_part(group: pa.Table) -> pa.Table:
            pre = ray.get(bcast)
            kb = int(group.column("_kb")[0].as_py())
            k = group.column("_k").to_numpy(zero_copy_only=False)
            ck = group.column("custkey").to_numpy(zero_copy_only=False)
            order = np.lexsort((ck, k))
            rn0 = np.empty(len(k), dtype=np.int64)
            rn0[order] = pre[kb] + np.arange(len(k), dtype=np.int64)
            score = 1 + rn0 * 5 // n_total
            out = group.drop_columns(["_k", "_kb"])
            return out.append_column(score_col, pa.array(score, pa.int64()))

        return rows.groupby("_kb").map_groups(rank_part, batch_format="pyarrow")

    cust = rank_pass(cust, "recency_days", "r_score", descending=True)
    cust = rank_pass(cust, "frequency", "f_score", descending=False)
    cust = rank_pass(cust, "monetary_cents", "m_score", descending=False)

    def finish(batch: pa.Table) -> pa.Table:
        r = batch.column("r_score").to_numpy(zero_copy_only=False)
        f = batch.column("f_score").to_numpy(zero_copy_only=False)
        m = batch.column("m_score").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "rfm", pa.array(r * 100 + f * 10 + m, pa.int64())
        )

    return cust.map_batches(finish, batch_format="pyarrow")


def t_closeness_audit(sf_dir: str) -> "ray.data.Dataset":
    """t-closeness audit — the third leg of the privacy-release triad
    (k_anonymity_audit gates class SIZE, l_diversity_audit gates
    sensitive-value VARIETY; this gates the sensitive-value
    DISTRIBUTION): with the same quasi-identifiers (nation, $1000
    balance bucket) and market segment as the sensitive attribute, a
    class whose segment mix diverges from the corpus mix leaks
    attribute information even at k ≥ 5 and l ≥ 2 — the skewness
    attack. Per class the exact total-variation distance to the
    global distribution is the integer numerator
    tvd_num = Σ_seg |n_cs·N − g_s·n_c| with t = tvd_num / (2·n_c·N),
    and classes band by t_band = ⌊10·t⌋ = (10·tvd_num) // (2·n_c·N)
    — exact floor arithmetic mirrored verbatim by the oracle. Output
    per band: (t_band, n_classes, n_rows); the high bands are the
    release blockers. Tail-seated by design: l_diversity_audit's fold
    under a distance instead of a distinct count.

    Scale shape: per-batch (QI, seg, n) partials → ONE groupby on
    (QI, seg) → per-class map_groups over its ≤|segments| grid rows
    with the bounded global segment histogram broadcast once (absent
    segments contribute (N − Σ_present g_s)·n_c in closed form, so
    the grid never densifies) → per-batch band partials → a ≤11-row
    band-grid Sum. Rows never shuffle; only grid cells do."""
    import pandas as pd
    from ray.data.aggregate import Sum as _Sum

    path = f"{sf_dir}/customer.parquet"
    ds = ray.data.read_parquet(
        path, columns=["c_nationkey", "c_mktsegment", "c_acctbal"]
    )

    def qi_seg_partials(batch: pa.Table) -> pa.Table:
        nk, bucket, seg = _kanon_qi(batch, with_segment=True)
        g = (
            pd.DataFrame({"nk": nk, "b": bucket, "seg": seg, "n": 1})
            .groupby(["nk", "b", "seg"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "nk": pa.array(g["nk"].to_numpy(), pa.int64()),
                "b": pa.array(g["b"].to_numpy(), pa.int64()),
                "seg": pa.array(g["seg"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(qi_seg_partials, batch_format="pyarrow")
        .groupby(["nk", "b", "seg"])
        .aggregate(_Sum("n", alias_name="n"))
    )

    # bounded global segment histogram (<= #segments rows)
    def seg_partials(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["c_mktsegment"])
            .group_by("c_mktsegment")
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "seg": g.column("c_mktsegment"),
                "g": g.column("count_all").cast(pa.int64()),
            }
        )

    seg_rows = (
        ray.data.read_parquet(path, columns=["c_mktsegment"])
        .map_batches(seg_partials, batch_format="pyarrow")
        .groupby("seg")
        .aggregate(_Sum("g", alias_name="g"))
        .take_all()
    )
    ghist = {r["seg"]: int(r["g"]) for r in seg_rows}
    n_all = sum(ghist.values())
    bcast = ray.put(ghist)

    def per_class(group: pa.Table) -> pa.Table:
        gh = ray.get(bcast)
        segs = group.column("seg").to_pylist()
        n = group.column("n").to_numpy(zero_copy_only=False)
        n_c = int(n.sum())
        gvec = np.array([gh[s] for s in segs], dtype=np.int64)
        present_g = int(gvec.sum())
        tvd = int(np.abs(n * n_all - gvec * n_c).sum()) + (
            n_all - present_g
        ) * n_c
        band = (10 * tvd) // (2 * n_c * n_all)
        return pa.table(
            {
                "t_band": pa.array([band], pa.int64()),
                "n_classes": pa.array([1], pa.int64()),
                "n_rows": pa.array([n_c], pa.int64()),
            }
        )

    return (
        grid.groupby(["nk", "b"])
        .map_groups(per_class, batch_format="pyarrow")
        .groupby("t_band")
        .aggregate(
            _Sum("n_classes", alias_name="n_classes"),
            _Sum("n_rows", alias_name="n_rows"),
        )
    )


SPEAR_BUCKETS = 256  # key-range buckets per axis for the rank passes


def spearman_corr(sf_dir: str) -> "pd.DataFrame":
    """Exact Spearman rank-correlation sufficient statistics between
    an order's price and its customer's account balance — the
    rank-scale companion to corr_moments' Pearson co-moments (Pearson
    moves with outliers and nonlinearity; Spearman is the monotone-
    association readout feature audits want on heavy-tailed money
    columns). Ties are exact through DOUBLE ranks (d = 2L + t + 1,
    integer; mann_whitney_u's convention), and the output is the one
    row of integer sufficient statistics (n, sx, sy, sxy, sxx, syy)
    from which rho = (n·sxy − sx·sy)/√((n·sxx − sx²)(n·syy − sy²)) is
    exact rational arithmetic downstream. int64 headroom: a cross
    term is ≤ (2n)², summed n times → safe through ~10^6 pairs; past
    that the partial splits into (hi, lo) lanes like gini_sources
    documents.

    Scale shape: the (x, y) pair table assembles via ONE
    co-partitioned union join on custkey (customer y-rows and order
    x-rows tagged into the same groupby(custkey) — never a broadcast
    of the customer table), then each axis gets one bucket-grid
    double-rank exchange (bounded SPEAR_BUCKETS count grid to the
    driver, prefix bases broadcast, groupby(kb) bucket-local
    np.unique — equal keys share a bucket, so tie groups never
    straddle bases), and per-batch moment partials fold to the single
    output row. Three exchanges total; money is integer cents
    before anything sums."""
    from ray.data.aggregate import Sum as _Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def cust_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": batch.column("c_custkey").cast(pa.int64()),
                "v": _cents(batch.column("c_acctbal")),
                "side": pa.array(
                    np.zeros(batch.num_rows, np.int64), pa.int64()
                ),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": batch.column("o_custkey").cast(pa.int64()),
                "v": _cents(batch.column("o_totalprice")),
                "side": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        )

    tagged = cust.map_batches(cust_side, batch_format="pyarrow").union(
        orders.map_batches(order_side, batch_format="pyarrow")
    )

    def attach(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        ys = v[side == 0]
        if len(ys) == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        y = int(ys[0])
        x = v[side == 1]
        return pa.table(
            {
                "x": pa.array(x, pa.int64()),
                "y": pa.array(np.full(len(x), y, np.int64), pa.int64()),
            }
        )

    pairs = tagged.groupby("custkey").map_groups(
        attach, batch_format="pyarrow"
    ).materialize()

    # Width-1 escape (the kendall_tau discipline): below the cap the
    # two rank exchanges are pure fixed cost — one vectorized task.
    if pairs.count() < KT_LOCAL_MAX:
        def _spear_local(tbl: pa.Table) -> pa.Table:
            x = tbl.column("x").to_numpy(zero_copy_only=False)
            y = tbl.column("y").to_numpy(zero_copy_only=False)

            def dr(v):
                _, inv, cnt = np.unique(
                    v, return_inverse=True, return_counts=True
                )
                before = np.concatenate(([0], np.cumsum(cnt)[:-1]))
                return (2 * before + cnt + 1)[inv]

            dx, dy = dr(x), dr(y)
            return pa.table(
                {
                    "n": pa.array([len(dx)], pa.int64()),
                    "sx": pa.array([int(dx.sum())], pa.int64()),
                    "sy": pa.array([int(dy.sum())], pa.int64()),
                    "sxy": pa.array([int((dx * dy).sum())], pa.int64()),
                    "sxx": pa.array([int((dx * dx).sum())], pa.int64()),
                    "syy": pa.array([int((dy * dy).sum())], pa.int64()),
                }
            )

        import pandas as pd

        local = pairs.repartition(1).map_batches(
            _spear_local, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        for c in local.columns:
            local[c] = local[c].astype("int64")
        return local[["n", "sx", "sy", "sxy", "sxx", "syy"]]

    def rank_axis(dset, col: str, out: str):
        lohi = dset.aggregate(Min(col), Max(col))
        lo, hi = int(lohi[f"min({col})"]), int(lohi[f"max({col})"])
        width = (hi - lo) // SPEAR_BUCKETS + 1

        def keyed(batch: pa.Table) -> pa.Table:
            k = batch.column(col).to_numpy(zero_copy_only=False)
            return batch.append_column(
                "_kb", pa.array((k - lo) // width, pa.int64())
            )

        rows = dset.map_batches(keyed, batch_format="pyarrow")

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

        g = (
            rows.map_batches(kb_partial, batch_format="pyarrow")
            .groupby("kb")
            .aggregate(_Sum("n", alias_name="n"))
            .take_all()  # bounded: <= SPEAR_BUCKETS rows
        )
        counts = np.zeros(SPEAR_BUCKETS, dtype=np.int64)
        for r in g:
            counts[int(r["kb"])] = int(r["n"])
        base = np.concatenate(([0], np.cumsum(counts)[:-1]))
        bcast = ray.put(base)

        def rank_part(group: pa.Table) -> pa.Table:
            pre = ray.get(bcast)
            kb = int(group.column("_kb")[0].as_py())
            k = group.column(col).to_numpy(zero_copy_only=False)
            uniq, inv, cnt = np.unique(
                k, return_inverse=True, return_counts=True
            )
            before = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            d = (2 * (pre[kb] + before) + cnt + 1)[inv]
            return group.drop_columns(["_kb"]).append_column(
                out, pa.array(d, pa.int64())
            )

        return rows.groupby("_kb").map_groups(rank_part, batch_format="pyarrow")

    ranked = rank_axis(rank_axis(pairs, "x", "dx"), "y", "dy")

    def moment_partials(batch: pa.Table) -> pa.Table:
        dx = batch.column("dx").to_numpy(zero_copy_only=False)
        dy = batch.column("dy").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(dx)], pa.int64()),
                "sx": pa.array([int(dx.sum())], pa.int64()),
                "sy": pa.array([int(dy.sum())], pa.int64()),
                "sxy": pa.array([int((dx * dy).sum())], pa.int64()),
                "sxx": pa.array([int((dx * dx).sum())], pa.int64()),
                "syy": pa.array([int((dy * dy).sum())], pa.int64()),
            }
        )

    folded = ranked.map_batches(
        moment_partials, batch_format="pyarrow"
    ).aggregate(
        _Sum("n", alias_name="n"),
        _Sum("sx", alias_name="sx"),
        _Sum("sy", alias_name="sy"),
        _Sum("sxy", alias_name="sxy"),
        _Sum("sxx", alias_name="sxx"),
        _Sum("syy", alias_name="syy"),
    )
    import pandas as pd

    return pd.DataFrame([{k: int(v) for k, v in folded.items()}])[
        ["n", "sx", "sy", "sxy", "sxx", "syy"]
    ]


def _inv_count(y: "np.ndarray") -> int:
    """Exact inversion count — #pairs i<j with y[i] > y[j] — via
    bottom-up vectorized merge counting: O(log n) numpy passes
    (sort-within-blocks + one global searchsorted per level), never a
    per-row Python loop. Values are densified to ranks so the
    block-offset trick (each block shifted into its own disjoint key
    range, making the concatenated left halves globally sorted for
    ONE searchsorted) stays inside int64; the array pads to a power
    of two with a sentinel LARGER than every rank appended at the
    end, which can never form an inversion (pads always remain a
    global suffix at block granularity, so a left half holds pads
    only when its right half is all pads)."""
    n = len(y)
    if n < 2:
        return 0
    _, r = np.unique(y, return_inverse=True)
    a = r.astype(np.int64)
    m = 1 << int(np.ceil(np.log2(n)))
    big = np.int64(n + 1)
    if m > n:
        a = np.concatenate([a, np.full(m - n, big, np.int64)])
    inv = 0
    width = 1
    idx = np.arange(m)
    while width < m:
        nb2 = 2 * width
        blk = idx // nb2
        keyed = a + blk * (big + 2)
        lmask = (idx % nb2) < width
        cnt_le = np.searchsorted(keyed[lmask], keyed[~lmask], side="right")
        rstart = (idx[~lmask] // nb2) * width
        inv += int((width - (cnt_le - rstart)).sum())
        a = np.sort(a.reshape(-1, nb2), axis=1).ravel()
        width = nb2
    return inv


def _flagged_inv_count(v: "np.ndarray", f: "np.ndarray") -> int:
    """Left-flagged inversion count — #pairs i<j with v[i] > v[j] AND
    f[i] == 1 — the asymmetric variant `harrell_c_index` needs (the
    flag marks an observed event on the earlier element). Same
    bottom-up vectorized merge as `_inv_count`, with a cumulative
    flag prefix over each sorted left half: flagged-greater-than =
    block flagged total − flagged ≤, both read off one global cumsum
    after the same single searchsorted per level; flags travel with
    values through the per-block stable argsort. Pads carry flag 0
    and the max sentinel, so they contribute nothing on either
    side."""
    n = len(v)
    if n < 2:
        return 0
    _, r = np.unique(v, return_inverse=True)
    a = r.astype(np.int64)
    fl = f.astype(np.int64)
    m = 1 << int(np.ceil(np.log2(n)))
    big = np.int64(n + 1)
    if m > n:
        a = np.concatenate([a, np.full(m - n, big, np.int64)])
        fl = np.concatenate([fl, np.zeros(m - n, np.int64)])
    inv = 0
    width = 1
    idx = np.arange(m)
    while width < m:
        nb2 = 2 * width
        blk = idx // nb2
        keyed = a + blk * (big + 2)
        lmask = (idx % nb2) < width
        pos = np.searchsorted(keyed[lmask], keyed[~lmask], side="right")
        pre = np.concatenate(([0], np.cumsum(fl[lmask])))
        rstart = (idx[~lmask] // nb2) * width
        inv += int((pre[rstart + width] - pre[pos]).sum())
        order = np.argsort(a.reshape(-1, nb2), axis=1, kind="stable")
        a = np.take_along_axis(a.reshape(-1, nb2), order, 1).ravel()
        fl = np.take_along_axis(fl.reshape(-1, nb2), order, 1).ravel()
        width = nb2
    return inv


KT_BUCKETS = 128  # per-axis grid for the Kendall discordant exchanges
KT_LOCAL_MAX = 2_000_000  # pair rows below which kendall runs width-1


def _kt_local(tbl: "pa.Table") -> "pa.Table":
    """All Kendall sufficient statistics over the whole pair table in
    one vectorized task — the width-1 leg of kendall_tau's
    size-adaptive plan (below ~2M slim int64 rows the grid plan's
    exchanges are pure fixed cost). Identical semantics: D =
    `_inv_count` of y under (x, y) sort, tie counts from np.unique."""
    x = tbl.column("x").to_numpy(zero_copy_only=False)
    y = tbl.column("y").to_numpy(zero_copy_only=False)
    order = np.lexsort((y, x))
    disc = _inv_count(y[order])
    _, xc = np.unique(x, return_counts=True)
    _, yc = np.unique(y, return_counts=True)
    _, xr = np.unique(x, return_inverse=True)
    _, yr = np.unique(y, return_inverse=True)
    _, jc = np.unique(
        xr.astype(np.int64) * (np.int64(yr.max()) + 1) + yr,
        return_counts=True,
    ) if len(x) else (None, np.array([], np.int64))
    n1 = int((xc.astype(np.int64) * (xc - 1) // 2).sum())
    n2 = int((yc.astype(np.int64) * (yc - 1) // 2).sum())
    n3 = int((jc.astype(np.int64) * (jc - 1) // 2).sum())
    return pa.table(
        {
            "n": pa.array([len(x)], pa.int64()),
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "n3": pa.array([n3], pa.int64()),
            "disc": pa.array([disc], pa.int64()),
        }
    )


def kendall_tau(sf_dir: str) -> "pd.DataFrame":
    """Exact Kendall tau-b sufficient statistics between an order's
    price and its customer's account balance (the mod-4 deterministic
    o_orderkey sample keeps the quadratic oracle honest): ONE integer
    row (n, n1, n2, n3, disc) — pair count, x-tie pairs Σtx(tx−1)/2,
    y-tie pairs, joint-tie pairs, and the exact DISCORDANT pair count
    D — from which tau_b = (S − 2D)/√((n0−n1)(n0−n2)) with
    n0 = n(n−1)/2 and S = n0 − n1 − n2 + n3 is exact rational
    arithmetic downstream. Spearman (rank Pearson) and tau-b (pair
    concordance) disagree exactly when association is driven by a few
    long monotone runs — the pair completes the rank-correlation
    readout.

    Scale shape: D is an inversion count of y under (x, y) sort,
    decomposed exactly over a 2-axis value grid (equal values share a
    bucket on each axis, the SPEAR_BUCKETS discipline): (a) pairs in
    the SAME x-bucket — per-bucket `_inv_count` of y under local
    (x, y) sort, O(b log b) numpy, plus exact x-tie/joint-tie partials
    from the same np.unique; (b) pairs in DIFFERENT x-buckets AND
    different y-cells — read off the bounded KT_BUCKETS² count grid
    (one tiny fold, 2D prefix arithmetic on the driver, E matrix
    broadcast once via ray.put); (c) pairs in different x-buckets but
    the SAME y-cell — per-y-cell `_inv_count` of y under (xb, y) sort
    (same-xb pairs sort y-ascending and contribute zero), which also
    yields the exact y-tie partials. Three int64-only exchanges past
    the co-partitioned spearman union join; the slim 4-column pair
    table is materialized once and feeds all three passes. int64
    headroom: disc ≤ n²/2 — safe through ~10⁹ pairs, then split lanes
    as gini_sources documents."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def cust_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": batch.column("c_custkey").cast(pa.int64()),
                "v": _cents(batch.column("c_acctbal")),
                "side": pa.array(
                    np.zeros(batch.num_rows, np.int64), pa.int64()
                ),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        keep = pc.equal(
            pc.bit_wise_and(batch.column("o_orderkey").cast(pa.int64()), 3), 0
        )
        batch = batch.filter(keep)
        return pa.table(
            {
                "custkey": batch.column("o_custkey").cast(pa.int64()),
                "v": _cents(batch.column("o_totalprice")),
                "side": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        )

    tagged = cust.map_batches(cust_side, batch_format="pyarrow").union(
        orders.map_batches(order_side, batch_format="pyarrow")
    )

    def attach(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        ys = v[side == 0]
        x = v[side == 1]
        if len(ys) == 0 or len(x) == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        y = int(ys[0])
        return pa.table(
            {
                "x": pa.array(x, pa.int64()),
                "y": pa.array(np.full(len(x), y, np.int64), pa.int64()),
            }
        )

    pairs = tagged.groupby("custkey").map_groups(
        attach, batch_format="pyarrow"
    ).materialize()

    # Width-1 escape: below KT_LOCAL_MAX slim pair rows the grid
    # plan's three exchanges are pure fixed cost — one task.
    if pairs.count() < KT_LOCAL_MAX:
        local = pairs.repartition(1).map_batches(
            _kt_local, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        for c in local.columns:
            local[c] = local[c].astype("int64")
        return local[["n", "n1", "n2", "n3", "disc"]]

    lohi = pairs.aggregate(Min("x"), Max("x"), Min("y"), Max("y"))
    xlo, xhi = int(lohi["min(x)"]), int(lohi["max(x)"])
    ylo, yhi = int(lohi["min(y)"]), int(lohi["max(y)"])
    wx = (xhi - xlo) // KT_BUCKETS + 1
    wy = (yhi - ylo) // KT_BUCKETS + 1

    def add_cells(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "x": batch.column("x"),
                "y": batch.column("y"),
                "xb": pa.array((x - xlo) // wx, pa.int64()),
                "yc": pa.array((y - ylo) // wy, pa.int64()),
            }
        )

    keyed = pairs.map_batches(add_cells, batch_format="pyarrow").materialize()

    # bounded KT_BUCKETS^2 count grid -> driver 2D prefix arithmetic
    def cell_partial(batch: pa.Table) -> pa.Table:
        xb = batch.column("xb").to_numpy(zero_copy_only=False)
        yc = batch.column("yc").to_numpy(zero_copy_only=False)
        u, cnt = np.unique(xb * KT_BUCKETS + yc, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    grid_rows = (
        keyed.map_batches(cell_partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= KT_BUCKETS^2 rows
    )
    C = np.zeros((KT_BUCKETS, KT_BUCKETS), np.int64)
    for r in grid_rows:
        C[int(r["cell"]) // KT_BUCKETS, int(r["cell"]) % KT_BUCKETS] = int(
            r["n"]
        )
    # P[xb, yc] = rows in x-buckets < xb at y-cell yc
    P = np.vstack([np.zeros((1, KT_BUCKETS), np.int64), np.cumsum(C, 0)[:-1]])
    # E[xb, yc] = rows in x-buckets < xb with y-cell > yc
    E = np.cumsum(P[:, ::-1], 1)[:, ::-1]
    E = np.hstack([E[:, 1:], np.zeros((KT_BUCKETS, 1), np.int64)])
    e_ref = ray.put(E)

    def xb_stats(group: pa.Table) -> pa.Table:
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        yc = group.column("yc").to_numpy(zero_copy_only=False)
        xb = int(group.column("xb")[0].as_py())
        order = np.lexsort((y, x))
        inv = _inv_count(y[order])
        _, xcnt = np.unique(x, return_counts=True)
        n1 = int((xcnt * (xcnt - 1) // 2).sum())
        _, xr = np.unique(x, return_inverse=True)
        _, yr = np.unique(y, return_inverse=True)
        _, jcnt = np.unique(
            xr.astype(np.int64) * (yr.max() + 1) + yr, return_counts=True
        )
        n3 = int((jcnt * (jcnt - 1) // 2).sum())
        cross = int(ray.get(e_ref)[xb][yc].sum())
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "n1": pa.array([n1], pa.int64()),
                "n2": pa.array([0], pa.int64()),
                "n3": pa.array([n3], pa.int64()),
                "disc": pa.array([inv + cross], pa.int64()),
            }
        )

    def yc_stats(group: pa.Table) -> pa.Table:
        y = group.column("y").to_numpy(zero_copy_only=False)
        xb = group.column("xb").to_numpy(zero_copy_only=False)
        order = np.lexsort((y, xb))
        inv = _inv_count(y[order])
        _, ycnt = np.unique(y, return_counts=True)
        n2 = int((ycnt * (ycnt - 1) // 2).sum())
        return pa.table(
            {
                "n": pa.array([0], pa.int64()),
                "n1": pa.array([0], pa.int64()),
                "n2": pa.array([n2], pa.int64()),
                "n3": pa.array([0], pa.int64()),
                "disc": pa.array([inv], pa.int64()),
            }
        )

    stats = (
        keyed.groupby("xb")
        .map_groups(xb_stats, batch_format="pyarrow")
        .union(
            keyed.groupby("yc").map_groups(yc_stats, batch_format="pyarrow")
        )
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("n1", alias_name="n1"),
            _Sum("n2", alias_name="n2"),
            _Sum("n3", alias_name="n3"),
            _Sum("disc", alias_name="disc"),
        )
    )
    return pd.DataFrame([{k: int(v) for k, v in stats.items()}])[
        ["n", "n1", "n2", "n3", "disc"]
    ]


WINS_BUCKETS = 256  # value grid for the trimmed-aggregate boundary scan
WINS_TRIM_DEN = 20  # two-sided trim fraction denominator (5% each side)


def winsorized_stats(sf_dir: str) -> "pd.DataFrame":
    """Exact two-sided 5%-trimmed aggregates of order value per
    priority class — the robust-location leg beyond mad_outliers
    (MAD flags rows; this produces the outlier-insensitive aggregate
    a pricing dashboard actually reports): per o_orderpriority, with
    k = n//20 rows trimmed from EACH end of the exact cents order,
    the row (priority, n, trim_k, kept_n, kept_sum_cents). The kept
    SUM is tie-break-invariant (dropping either of two equal values
    changes nothing), so the semantics are purely multiset order
    statistics — exact, no quantile interpolation.

    Scale shape (distributed exact order statistics, the
    global_quantiles boundary-refinement discipline generalized to
    per-group two-sided trims): ONE bounded fold builds the
    (priority, value-bucket) count grid (≤ 5·WINS_BUCKETS rows to
    the driver — equal values share a bucket, so a trim boundary
    falls in exactly one bucket per side); the driver locates each
    group's lower/upper boundary bucket and the within-bucket drop
    counts, broadcast once. The second pass streams: rows in fully-
    kept buckets fold as per-batch (n, sum) partials, rows in the
    ≤ 2 boundary buckets per group co-partition on (group, bucket)
    where a local value sort drops exactly the m smallest / largest
    cents — never a global sort, never a per-group shuffle of
    non-boundary rows."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    def keyed_rows(batch: pa.Table) -> pa.Table:
        v = _cents(batch.column("o_totalprice")).to_numpy(zero_copy_only=False)
        pcode = pc.utf8_slice_codeunits(
            batch.column("o_orderpriority"), 0, 1
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p": pa.array(pcode, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "prio": batch.column("o_orderpriority"),
            }
        )

    rows = ds.map_batches(keyed_rows, batch_format="pyarrow").materialize()

    lohi = rows.aggregate(Min("v"), Max("v"))
    vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
    wv = (vhi - vlo) // WINS_BUCKETS + 1

    def grid_partial(batch: pa.Table) -> pa.Table:
        p = batch.column("p").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        cell = p * WINS_BUCKETS + (v - vlo) // wv
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
        .take_all()  # bounded: <= n_priorities * WINS_BUCKETS rows
    )
    counts: dict[int, np.ndarray] = {}
    for r in grid:
        pcode, vb = int(r["cell"]) // WINS_BUCKETS, int(r["cell"]) % WINS_BUCKETS
        counts.setdefault(pcode, np.zeros(WINS_BUCKETS, np.int64))[vb] = int(
            r["n"]
        )
    # per group: boundary buckets + within-bucket drop counts
    plan: dict[int, tuple[int, int, int, int, int, int]] = {}
    for pcode, c in counts.items():
        n = int(c.sum())
        k = n // WINS_TRIM_DEN
        cum = np.cumsum(c)
        lo_b = int(np.searchsorted(cum, k, side="left")) if k else -1
        m_lo = k - int(cum[lo_b - 1] if lo_b > 0 else 0) if k else 0
        cum_hi = np.cumsum(c[::-1])
        hi_rb = int(np.searchsorted(cum_hi, k, side="left")) if k else -1
        hi_b = WINS_BUCKETS - 1 - hi_rb if k else WINS_BUCKETS
        m_hi = (
            k - int(cum_hi[hi_rb - 1] if hi_rb > 0 else 0) if k else 0
        )
        plan[pcode] = (n, k, lo_b, m_lo, hi_b, m_hi)
    plan_ref = ray.put(plan)

    def classify(batch: pa.Table) -> pa.Table:
        pl = ray.get(plan_ref)
        p = batch.column("p").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        vb = (v - vlo) // wv
        lo_b = np.array([pl[int(x)][2] for x in p], np.int64)
        hi_b = np.array([pl[int(x)][4] for x in p], np.int64)
        inner = (vb > lo_b) & (vb < hi_b)
        boundary = (vb == lo_b) | (vb == hi_b)
        # inner partials per group
        ip, iv = p[inner], v[inner]
        u, inv = np.unique(ip, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, iv)
        cnt = np.bincount(inv).astype(np.int64)
        inner_tbl = pa.table(
            {
                "p": pa.array(u, pa.int64()),
                "kept_n": pa.array(cnt, pa.int64()),
                "kept_sum": pa.array(s, pa.int64()),
                "bkey": pa.array(np.full(len(u), -1, np.int64), pa.int64()),
                "v": pa.array(np.zeros(len(u), np.int64), pa.int64()),
            }
        )
        bp, bv = p[boundary], v[boundary]
        bvb = (bv - vlo) // wv
        bound_tbl = pa.table(
            {
                "p": pa.array(bp, pa.int64()),
                "kept_n": pa.array(np.zeros(len(bp), np.int64), pa.int64()),
                "kept_sum": pa.array(np.zeros(len(bp), np.int64), pa.int64()),
                "bkey": pa.array(bp * WINS_BUCKETS + bvb, pa.int64()),
                "v": pa.array(bv, pa.int64()),
            }
        )
        return pa.concat_tables([inner_tbl, bound_tbl])

    def boundary_trim(group: pa.Table) -> pa.Table:
        bkey = int(group.column("bkey")[0].as_py())
        if bkey < 0:  # inner partials pass through, pre-folded per batch
            t = (
                group.select(["p", "kept_n", "kept_sum"])
                .group_by("p")
                .aggregate([("kept_n", "sum"), ("kept_sum", "sum")])
            )
            return pa.table(
                {
                    "p": t.column("p"),
                    "kept_n": t.column("kept_n_sum"),
                    "kept_sum": t.column("kept_sum_sum"),
                }
            )
        pl = ray.get(plan_ref)
        pcode = bkey // WINS_BUCKETS
        vb = bkey % WINS_BUCKETS
        _, _, lo_b, m_lo, hi_b, m_hi = pl[pcode]
        v = np.sort(group.column("v").to_numpy(zero_copy_only=False))
        drop_lo = m_lo if vb == lo_b else 0
        drop_hi = m_hi if vb == hi_b else 0
        kept = v[drop_lo: len(v) - drop_hi]
        return pa.table(
            {
                "p": pa.array([pcode], pa.int64()),
                "kept_n": pa.array([len(kept)], pa.int64()),
                "kept_sum": pa.array([int(kept.sum())], pa.int64()),
            }
        )

    folded = (
        rows.map_batches(classify, batch_format="pyarrow")
        .groupby("bkey")
        .map_groups(boundary_trim, batch_format="pyarrow")
        .groupby("p")
        .aggregate(
            _Sum("kept_n", alias_name="kept_n"),
            _Sum("kept_sum", alias_name="kept_sum_cents"),
        )
        .take_all()  # bounded: one row per priority class
    )
    prio_name = {
        int(r["p"]): None for r in folded
    }
    # recover the display string from a bounded distinct scan
    names = (
        rows.map_batches(
            lambda b: pa.table(
                {
                    "p": b.column("p"),
                    "prio": b.column("prio"),
                }
            ).group_by(["p", "prio"]).aggregate([]),
            batch_format="pyarrow",
        )
        .groupby("p")
        .map_groups(
            lambda g: g.slice(0, 1),
            batch_format="pyarrow",
        )
        .take_all()
    )
    for r in names:
        prio_name[int(r["p"])] = r["prio"]
    out = []
    for r in folded:
        pcode = int(r["p"])
        n, k, *_ = plan[pcode]
        out.append(
            {
                "priority": prio_name[pcode],
                "n": n,
                "trim_k": k,
                "kept_n": int(r["kept_n"]),
                "kept_sum_cents": int(r["kept_sum_cents"]),
            }
        )
    return (
        pd.DataFrame(out)
        .sort_values("priority", ignore_index=True)[
            ["priority", "n", "trim_k", "kept_n", "kept_sum_cents"]
        ]
    )


def mann_kendall_trend(sf_dir: str) -> "pd.DataFrame":
    """Exact Mann-Kendall trend test per event type over the daily
    count series — the NONPARAMETRIC monotone-trend detector
    (monitoring's standard "is this metric drifting" test) that
    trend_slopes' least-squares slope is not: S = Σ_{i<j}
    sign(x_j − x_i) is outlier-immune and needs no linearity. Output
    per type: (event_type, n_days, s_stat, tie_term) with
    tie_term = Σ_g t_g(t_g−1)(2t_g+5), so
    Var(S) = (n(n−1)(2n+5) − tie_term)/18 and the z-statistic are
    exact rational arithmetic downstream.

    Scale shape: one combiner-bounded fold to per-(type, day) counts
    (≤ |types|·day-span rows — days, not events, cross the
    exchange), then per-type map_groups over its bounded series
    computes S WITHOUT the quadratic pair scan: with
    P = n(n−1)/2 total pairs, T tie pairs, and D = `_inv_count`
    (strict decreases) over the day-ordered series,
    S = P − T − 2D — the merge-sort counter again, O(n log n) per
    type."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        et = batch.column("event_type")
        t = pa.table({"event_type": et, "day": pa.array(d, pa.int64())})
        g = t.group_by(["event_type", "day"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "day": g.column("day"),
                "x": g.column("count_all").cast(pa.int64()),
            }
        )

    def per_type(group: pa.Table) -> pa.Table:
        et = group.column("event_type")[0].as_py()
        day = group.column("day").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        order = np.argsort(day, kind="stable")
        xs = x[order]
        n = len(xs)
        p_total = n * (n - 1) // 2
        _, cnt = np.unique(xs, return_counts=True)
        c = cnt.astype(np.int64)
        t_pairs = int((c * (c - 1) // 2).sum())
        dcr = _inv_count(xs)
        s = p_total - t_pairs - 2 * dcr
        tie_term = int((c * (c - 1) * (2 * c + 5)).sum())
        return pa.table(
            {
                "event_type": pa.array([et], pa.string()),
                "n_days": pa.array([n], pa.int64()),
                "s_stat": pa.array([s], pa.int64()),
                "tie_term": pa.array([tie_term], pa.int64()),
            }
        )

    rows = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(_Sum("x", alias_name="x"))
        .groupby("event_type")
        .map_groups(per_type, batch_format="pyarrow")
        .take_all()  # bounded: one row per event type
    )
    df = pd.DataFrame(rows).sort_values("event_type", ignore_index=True)
    for c in ["n_days", "s_stat", "tie_term"]:
        df[c] = df[c].astype("int64")
    return df[["event_type", "n_days", "s_stat", "tie_term"]]


CP_SCALE = 1_000_000  # banding scale for the changepoint score


def changepoint_split(sf_dir: str) -> "pd.DataFrame":
    """Exact single-changepoint detection (binary segmentation, first
    split) per event type over the daily count series — the
    level-shift locator cusum_drift's sequential statistic is not:
    for every candidate boundary s the between-segment sum-of-squares
    gain is proportional to (n_r·S_l − n_l·S_r)² / (n_l·n_r), and the
    reported statistic is the BANDED integer
    score = ⌊num²·CP_SCALE / (n_l·n_r)⌋ (the t_closeness flooring
    discipline: the scaled floor IS the defined statistic, mirrored
    verbatim by the oracle's HUGEINT arithmetic, so no float and no
    rational comparison ambiguity exists). Output per type:
    (event_type, n_days, split_day, score_scaled) with split_day =
    last day of the left segment, ties broken toward the earliest
    day. A zero score means the series is flat; a dominant score at
    the same day across types localizes a global regime change.

    Scale shape: one combiner-bounded fold to per-(type, day) counts
    (days, not events, cross the exchange), then per-type map_groups
    over its bounded series: prefix sums once, then the candidate
    scan runs in PYTHON INTS over at most day-span candidates —
    bounded by the calendar, not the data — because num² · CP_SCALE
    overflows int64 by design (the oracle needs HUGEINT for the same
    reason)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        t = pa.table(
            {"event_type": batch.column("event_type"),
             "day": pa.array(d, pa.int64())}
        )
        g = t.group_by(["event_type", "day"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "day": g.column("day"),
                "x": g.column("count_all").cast(pa.int64()),
            }
        )

    def per_type(group: pa.Table) -> pa.Table:
        et = group.column("event_type")[0].as_py()
        day = group.column("day").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        order = np.argsort(day, kind="stable")
        days, xs = day[order], x[order]
        n = len(xs)
        if n < 2:  # no candidate boundary; mirror the oracle's rn < n
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_days": pa.array([], pa.int64()),
                    "split_day": pa.array([], pa.int64()),
                    "score_scaled": pa.array([], pa.string()),
                }
            )
        total = int(xs.sum())
        best_score, best_day = -1, -1
        run = 0
        for i in range(n - 1):  # bounded by the day span, not rows
            run += int(xs[i])
            nl, nr = i + 1, n - i - 1
            num = nr * run - nl * (total - run)
            score = (num * num * CP_SCALE) // (nl * nr)
            if score > best_score:
                best_score, best_day = score, int(days[i])
        return pa.table(
            {
                "event_type": pa.array([et], pa.string()),
                "n_days": pa.array([n], pa.int64()),
                "split_day": pa.array([best_day], pa.int64()),
                "score_scaled": pa.array([str(best_score)], pa.string()),
            }
        )

    rows = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(_Sum("x", alias_name="x"))
        .groupby("event_type")
        .map_groups(per_type, batch_format="pyarrow")
        .take_all()  # bounded: one row per event type
    )
    df = pd.DataFrame(rows).sort_values("event_type", ignore_index=True)
    df["n_days"] = df["n_days"].astype("int64")
    df["split_day"] = df["split_day"].astype("int64")
    df["score_scaled"] = df["score_scaled"].astype(str)
    return df[["event_type", "n_days", "split_day", "score_scaled"]]


def selectivity_drift(sf_dir: str) -> "pd.DataFrame":
    """Correlated-predicate audit — the optimizer-statistics readout
    behind the classic cardinality-misestimation failure: for every
    pair of the four canonical lineitem predicates (returnflag 'R',
    discount ≥ 5 %, quantity ≥ 25, linestatus 'F'), the exact joint
    count vs the independence assumption, as
    ratio_bp = ⌊10000·n_ab·n / (n_a·n_b)⌋ — 10000 means independent,
    ≫ 10000 positively correlated (the optimizer UNDERestimates the
    conjunction), ≪ 10000 anticorrelated. Output one row per
    unordered pair: (pred_a, pred_b, n, n_a, n_b, n_ab, ratio_bp).
    This is the table a join_strategy_plan-style planner consults
    before multiplying selectivities.

    Scale shape: one streaming pass — per batch the four boolean
    flags vectorize and the 4 single + 6 pairwise counts fold as a
    15-integer row; Sum-fold to one row, driver expands to the six
    output rows. No shuffle at all."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    PREDS = ["disc_hi", "qty_hi", "ret_r", "status_f"]
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_discount", "l_quantity"],
    )

    def flags(batch: pa.Table) -> pa.Table:
        ret = pc.equal(batch.column("l_returnflag"), "R").to_numpy(
            zero_copy_only=False
        )
        st = pc.equal(batch.column("l_linestatus"), "F").to_numpy(
            zero_copy_only=False
        )
        disc = np.floor(
            batch.column("l_discount").to_numpy(zero_copy_only=False) * 100
            + 0.5
        ) >= 5
        qty = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ) >= 25
        f = {"disc_hi": disc, "qty_hi": qty, "ret_r": ret, "status_f": st}
        cols = {"n": pa.array([batch.num_rows], pa.int64())}
        for p in PREDS:
            cols[f"n_{p}"] = pa.array([int(f[p].sum())], pa.int64())
        for i, pi in enumerate(PREDS):
            for pj in PREDS[i + 1:]:
                cols[f"n_{pi}__{pj}"] = pa.array(
                    [int((f[pi] & f[pj]).sum())], pa.int64()
                )
        return pa.table(cols)

    aggs = [_Sum("n", alias_name="n")]
    for p in PREDS:
        aggs.append(_Sum(f"n_{p}", alias_name=f"n_{p}"))
    for i, pi in enumerate(PREDS):
        for pj in PREDS[i + 1:]:
            aggs.append(_Sum(f"n_{pi}__{pj}", alias_name=f"n_{pi}__{pj}"))
    folded = ds.map_batches(flags, batch_format="pyarrow").aggregate(*aggs)
    n = int(folded["n"])
    out = []
    for i, pi in enumerate(PREDS):
        for pj in PREDS[i + 1:]:
            na, nb = int(folded[f"n_{pi}"]), int(folded[f"n_{pj}"])
            nab = int(folded[f"n_{pi}__{pj}"])
            out.append(
                {
                    "pred_a": pi,
                    "pred_b": pj,
                    "n": n,
                    "n_a": na,
                    "n_b": nb,
                    "n_ab": nab,
                    "ratio_bp": (10000 * nab * n) // (na * nb)
                    if na and nb
                    else 0,
                }
            )
    df = pd.DataFrame(out).sort_values(
        ["pred_a", "pred_b"], ignore_index=True
    )
    for c in ["n", "n_a", "n_b", "n_ab", "ratio_bp"]:
        df[c] = df[c].astype("int64")
    return df


CVM_BUCKETS = 256  # value grid for the two-sample CvM pass
CVM_LOCAL_MAX = 2_000_000  # rows below which CvM runs width-1


def _cvm_lanes(m: "np.ndarray", a: "np.ndarray") -> tuple:
    """Σ m·a² decomposed into three int64 lanes with a = q·2²⁰ + r —
    the gini_sources split-lane discipline: a ≤ n1·n2 can reach
    ~5·10⁹, so a² overflows int64; with r < 2²⁰ every lane partial
    (Σm·q², Σm·q·r, Σm·r²) stays comfortably inside int64 and the
    exact total reassembles as 2⁴⁰·L2 + 2²¹·L1 + L0 in Python."""
    aa = np.abs(a)
    q, r = aa >> 20, aa & ((1 << 20) - 1)
    return (
        int((m * q * q).sum()),
        int((m * q * r).sum()),
        int((m * r * r).sum()),
    )


def cramer_von_mises(sf_dir: str) -> "pd.DataFrame":
    """Exact two-sample Cramér-von Mises integer core — urgent
    (1-URGENT) vs non-urgent order values: where ks_drift reads only
    the SUP of the CDF gap, CvM integrates the SQUARED gap over the
    whole pooled sample, T = Σ_{distinct v} m_v·(n₂·C₁(v) −
    n₁·C₂(v))² with inclusive cumulative counts — sensitive to
    distributed small shifts a single-point KS misses. Ties are
    handled at value level (the whole tie group contributes at its
    post-group CDF, deterministically). Output one row:
    (n1, n2, t_stat) with t_stat a decimal string — the classic
    U = T/(n₁n₂n) − (4n₁n₂−1)/(6n) normalization is exact rational
    arithmetic downstream.

    Scale shape: a (value-bucket × group) count grid (equal values
    share a bucket) gives exclusive cumulative bases per bucket
    (bounded fold, broadcast once); each bucket then sorts locally,
    forms per-distinct-value a = n₂C₁ − n₁C₂ (|a| ≤ n₁n₂, int64-
    safe), and folds Σ m·a² through the `_cvm_lanes` three-lane
    split — no HUGEINT ever crosses the exchange; the driver
    reassembles the exact total in Python. Width-1 escape below
    CVM_LOCAL_MAX rows."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    def rows_fn(batch: pa.Table) -> pa.Table:
        g = pc.equal(batch.column("o_orderpriority"), "1-URGENT").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        v = _cents(batch.column("o_totalprice")).to_numpy(zero_copy_only=False)
        return pa.table(
            {"g": pa.array(g, pa.int64()), "v": pa.array(v, pa.int64())}
        )

    rows = ds.map_batches(rows_fn, batch_format="pyarrow").materialize()
    counts = rows.aggregate(_Sum("g", alias_name="n1"))
    n_total = rows.count()
    n1 = int(counts["n1"])
    n2 = n_total - n1

    def lanes_to_row(l2: int, l1: int, l0: int) -> "pd.DataFrame":
        t = (l2 << 40) + (l1 << 21) + l0
        return pd.DataFrame(
            [{"n1": n1, "n2": n2, "t_stat": str(t)}]
        ).astype({"n1": "int64", "n2": "int64", "t_stat": str})

    def local_all(tbl: pa.Table) -> pa.Table:
        g = tbl.column("g").to_numpy(zero_copy_only=False)
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        vs, gs = v[order], g[order]
        uniq, start, m = np.unique(vs, return_index=True, return_counts=True)
        m1 = np.add.reduceat(gs, start)
        c1 = np.cumsum(m1)
        c2 = np.cumsum(m.astype(np.int64) - m1)
        a = n2 * c1 - n1 * c2
        l2, l1, l0 = _cvm_lanes(m.astype(np.int64), a)
        return pa.table(
            {
                "l2": pa.array([l2], pa.int64()),
                "l1": pa.array([l1], pa.int64()),
                "l0": pa.array([l0], pa.int64()),
            }
        )

    if n_total < CVM_LOCAL_MAX:
        out = rows.repartition(1).map_batches(
            local_all, batch_format="pyarrow", batch_size=None
        ).take_all()
        return lanes_to_row(int(out[0]["l2"]), int(out[0]["l1"]),
                            int(out[0]["l0"]))

    lohi = rows.aggregate(Min("v"), Max("v"))
    vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
    wv = (vhi - vlo) // CVM_BUCKETS + 1

    def grid_partial(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        g = batch.column("g").to_numpy(zero_copy_only=False)
        vb = (v - vlo) // wv
        u, inv = np.unique(vb, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        g1 = np.zeros(len(u), np.int64)
        np.add.at(g1, inv, g)
        return pa.table(
            {
                "vb": pa.array(u, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "m1": pa.array(g1, pa.int64()),
            }
        )

    grid = (
        rows.map_batches(grid_partial, batch_format="pyarrow")
        .groupby("vb")
        .aggregate(_Sum("n", alias_name="n"), _Sum("m1", alias_name="m1"))
        .take_all()  # bounded: <= CVM_BUCKETS rows
    )
    cnt1 = np.zeros(CVM_BUCKETS, np.int64)
    cnt2 = np.zeros(CVM_BUCKETS, np.int64)
    for r in grid:
        cnt1[int(r["vb"])] = int(r["m1"])
        cnt2[int(r["vb"])] = int(r["n"]) - int(r["m1"])
    base1 = np.concatenate(([0], np.cumsum(cnt1)[:-1]))
    base2 = np.concatenate(([0], np.cumsum(cnt2)[:-1]))
    b1_ref, b2_ref = ray.put(base1), ray.put(base2)

    def keyed(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "vb", pa.array((v - vlo) // wv, pa.int64())
        )

    def bucket_lanes(group: pa.Table) -> pa.Table:
        vb = int(group.column("vb")[0].as_py())
        g = group.column("g").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        vs, gs = v[order], g[order]
        uniq, start, m = np.unique(vs, return_index=True, return_counts=True)
        m1 = np.add.reduceat(gs, start)
        c1 = ray.get(b1_ref)[vb] + np.cumsum(m1)
        c2 = ray.get(b2_ref)[vb] + np.cumsum(m.astype(np.int64) - m1)
        a = n2 * c1 - n1 * c2
        l2, l1, l0 = _cvm_lanes(m.astype(np.int64), a)
        return pa.table(
            {
                "l2": pa.array([l2], pa.int64()),
                "l1": pa.array([l1], pa.int64()),
                "l0": pa.array([l0], pa.int64()),
            }
        )

    folded = (
        rows.map_batches(keyed, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(bucket_lanes, batch_format="pyarrow")
        .aggregate(
            _Sum("l2", alias_name="l2"),
            _Sum("l1", alias_name="l1"),
            _Sum("l0", alias_name="l0"),
        )
    )
    return lanes_to_row(int(folded["l2"]), int(folded["l1"]),
                        int(folded["l0"]))


def kruskal_wallis(sf_dir: str) -> "pd.DataFrame":
    """Exact Kruskal-Wallis sufficient statistics — the k-sample
    generalization of mann_whitney_u over the five order-priority
    classes on order value: per class the tie-exact double-rank sum
    (d = 2·rank + t − 1, always integer) plus the pooled tie term
    Σ(t³−t), from which H = [12·Σ n_g R̄_g² / (n(n+1)) − 3(n+1)]
    with its tie correction is exact rational arithmetic downstream.
    Output per class: (priority, n_g, d_sum, n_total, tie_term) —
    the last two constant columns ride every row so the statistic
    assembles from any single row subset.

    Scale shape: spearman's single-axis bucket-grid double-rank
    exchange (bounded count grid, broadcast exclusive prefix bases,
    bucket-local np.unique — equal values share a bucket so tie
    groups never straddle bases) with the class label riding each
    row; per-bucket partials fold in a ≤5-row class grid, and the
    tie term folds from the same per-bucket np.unique. int64
    headroom: d ≤ 2n, d_sum ≤ 2n·n_g — safe past 10⁹ rows."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    def rows_fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "priority": batch.column("o_orderpriority"),
                "v": _cents(batch.column("o_totalprice")),
            }
        )

    rows = ds.map_batches(rows_fn, batch_format="pyarrow").materialize()
    n_total = rows.count()

    lohi = rows.aggregate(Min("v"), Max("v"))
    vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
    wv = (vhi - vlo) // SPEAR_BUCKETS + 1

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

    g = (
        rows.map_batches(keyed, batch_format="pyarrow")
        .map_batches(vb_partial, batch_format="pyarrow")
        .groupby("vb")
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= SPEAR_BUCKETS rows
    )
    counts = np.zeros(SPEAR_BUCKETS, np.int64)
    for r in g:
        counts[int(r["vb"])] = int(r["n"])
    base = np.concatenate(([0], np.cumsum(counts)[:-1]))
    bcast = ray.put(base)

    def rank_part(group: pa.Table) -> pa.Table:
        pre = ray.get(bcast)
        vb = int(group.column("vb")[0].as_py())
        v = group.column("v").to_numpy(zero_copy_only=False)
        prio = group.column("priority").to_pandas().to_numpy(dtype=object)
        uniq, inv, cnt = np.unique(v, return_inverse=True, return_counts=True)
        before = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        d = (2 * (pre[vb] + before) + cnt + 1)[inv]
        c = cnt.astype(np.int64)
        tie = int((c * c * c - c).sum())
        import pandas as pd  # noqa: F811

        gdf = (
            pd.DataFrame({"priority": prio, "d": d})
            .groupby("priority", sort=False)["d"]
            .agg(["count", "sum"])
            .reset_index()
        )
        t = pa.table(
            {
                "priority": pa.array(gdf["priority"], pa.string()),
                "n_g": pa.array(
                    gdf["count"].to_numpy().astype(np.int64), pa.int64()
                ),
                "d_sum": pa.array(
                    gdf["sum"].to_numpy().astype(np.int64), pa.int64()
                ),
                "tie_term": pa.array(
                    np.zeros(len(gdf), np.int64), pa.int64()
                ),
            }
        )
        tie_row = pa.table(
            {
                "priority": pa.array([""], pa.string()),
                "n_g": pa.array([0], pa.int64()),
                "d_sum": pa.array([0], pa.int64()),
                "tie_term": pa.array([tie], pa.int64()),
            }
        )
        return pa.concat_tables([t, tie_row])

    folded = (
        rows.map_batches(keyed, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(rank_part, batch_format="pyarrow")
        .groupby("priority")
        .aggregate(
            _Sum("n_g", alias_name="n_g"),
            _Sum("d_sum", alias_name="d_sum"),
            _Sum("tie_term", alias_name="tie_term"),
        )
        .take_all()  # bounded: <= classes + 1 rows
    )
    tie_term = sum(int(r["tie_term"]) for r in folded)
    out = [
        {
            "priority": r["priority"],
            "n_g": int(r["n_g"]),
            "d_sum": int(r["d_sum"]),
            "n_total": n_total,
            "tie_term": tie_term,
        }
        for r in folded
        if r["priority"] != ""
    ]
    df = pd.DataFrame(out).sort_values("priority", ignore_index=True)
    for c in ["n_g", "d_sum", "n_total", "tie_term"]:
        df[c] = df[c].astype("int64")
    return df[["priority", "n_g", "d_sum", "n_total", "tie_term"]]


VARINT_BUCKETS = 256  # value grid for the sorted-delta cost pass
VARINT_LOCAL_MAX = 2_000_000  # rows below which the audit runs width-1


def _bitlen(u: "np.ndarray") -> "np.ndarray":
    """Exact bit length per element via the shift loop (≤64 numpy
    passes) — float log2 misrounds near powers of two."""
    bl = np.zeros(len(u), np.int64)
    uu = u.copy()
    while (uu > 0).any():
        bl[uu > 0] += 1
        uu = uu >> 1
    return bl


def _varint_bytes(u: "np.ndarray") -> "np.ndarray":
    """LEB128 byte cost per non-negative value: 1 for 0, else
    ⌈bit_length/7⌉."""
    return np.where(u == 0, 1, (_bitlen(u) + 6) // 7)


def _zigzag(v: "np.ndarray") -> "np.ndarray":
    return np.where(v >= 0, 2 * v, -2 * v - 1)


def varint_cost_audit(sf_dir: str) -> "pd.DataFrame":
    """Exact varint encoding cost audit — the integer-column member
    of the storage family (rle/dict/front-coding/zonemap price value
    columns; gorilla prices timestamps; this prices the LEB128
    layouts every Parquet/proto writer chooses between): per column
    (order key, customer key, price cents), the exact byte cost of
    (a) zigzag-varint on raw values and (b) varint on SORTED deltas
    (first value zigzag-encoded, each next value as its non-negative
    delta). delta_bytes ≪ raw_bytes is the signal to sort or
    delta-encode that column. Output: (col, n, raw_bytes,
    delta_bytes).

    Scale shape: raw cost is a pure streaming fold (the bit-length
    shift loop is ≤64 vectorized passes). The sorted-delta cost
    needs NO global sort: a (col, value-bucket) grid fold carries
    each bucket's (count, min, max, within-bucket delta bytes —
    computed from a LOCAL sort inside the co-partitioned bucket
    task), and the driver adds the one BOUNDARY delta per non-empty
    bucket pair from the bounded (min, max) grid — exact total,
    exchanges touch only packed int64 rows. Width-1 escape below
    VARINT_LOCAL_MAX rows per column."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def rows_fn(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        pc_ = _cents(batch.column("o_totalprice")).to_numpy(
            zero_copy_only=False
        )
        n = len(ok)
        return pa.table(
            {
                "col": pa.array(
                    np.repeat(np.array([0, 1, 2], np.int64), n), pa.int64()
                ),
                "v": pa.array(np.concatenate([ck, ok, pc_]), pa.int64()),
            }
        )

    COLS = ["o_custkey", "o_orderkey", "price_cents"]
    rows = ds.map_batches(rows_fn, batch_format="pyarrow").materialize()

    def raw_partial(batch: pa.Table) -> pa.Table:
        c = batch.column("col").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        b = _varint_bytes(_zigzag(v))
        out_n = np.zeros(3, np.int64)
        out_b = np.zeros(3, np.int64)
        np.add.at(out_n, c, 1)
        np.add.at(out_b, c, b)
        return pa.table(
            {
                "col": pa.array(np.arange(3), pa.int64()),
                "n": pa.array(out_n, pa.int64()),
                "raw_bytes": pa.array(out_b, pa.int64()),
            }
        )

    raw = (
        rows.map_batches(raw_partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("raw_bytes", alias_name="raw_bytes"),
        )
        .take_all()  # bounded: 3 rows
    )

    def local_delta(tbl: pa.Table) -> pa.Table:
        c = tbl.column("col").to_numpy(zero_copy_only=False)
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        out = np.zeros(3, np.int64)
        for ci in range(3):
            vv = np.sort(v[c == ci])
            if len(vv) == 0:
                continue
            first = int(_varint_bytes(_zigzag(vv[:1]))[0])
            out[ci] = first + int(_varint_bytes(np.diff(vv)).sum())
        return pa.table(
            {
                "col": pa.array(np.arange(3), pa.int64()),
                "delta_bytes": pa.array(out, pa.int64()),
            }
        )

    n_rows = rows.count()
    if n_rows < 3 * VARINT_LOCAL_MAX:
        drows = (
            rows.repartition(1)
            .map_batches(local_delta, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
        dmap = {int(r["col"]): int(r["delta_bytes"]) for r in drows}
    else:
        lohi = rows.aggregate(Min("v"), Max("v"))
        vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
        wv = (vhi - vlo) // VARINT_BUCKETS + 1

        def keyed(batch: pa.Table) -> pa.Table:
            v = batch.column("v").to_numpy(zero_copy_only=False)
            c = batch.column("col").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "cell", pa.array(c * VARINT_BUCKETS + (v - vlo) // wv,
                                 pa.int64())
            )

        def bucket_cost(group: pa.Table) -> pa.Table:
            cell = int(group.column("cell")[0].as_py())
            v = np.sort(group.column("v").to_numpy(zero_copy_only=False))
            inner = int(_varint_bytes(np.diff(v)).sum())
            return pa.table(
                {
                    "cell": pa.array([cell], pa.int64()),
                    "inner_bytes": pa.array([inner], pa.int64()),
                    "vmin": pa.array([int(v[0])], pa.int64()),
                    "vmax": pa.array([int(v[-1])], pa.int64()),
                }
            )

        grid = (
            rows.map_batches(keyed, batch_format="pyarrow")
            .groupby("cell")
            .map_groups(bucket_cost, batch_format="pyarrow")
            .take_all()  # bounded: <= 3 * VARINT_BUCKETS rows
        )
        dmap = {}
        per_col: dict[int, list] = {0: [], 1: [], 2: []}
        for r in grid:
            per_col[int(r["cell"]) // VARINT_BUCKETS].append(
                (int(r["cell"]) % VARINT_BUCKETS, int(r["inner_bytes"]),
                 int(r["vmin"]), int(r["vmax"]))
            )
        for ci, cells in per_col.items():
            cells.sort()
            total, prev_max = 0, None
            for _, inner, vmin, vmax in cells:
                total += inner
                if prev_max is None:
                    total += int(
                        _varint_bytes(_zigzag(np.array([vmin], np.int64)))[0]
                    )
                else:
                    total += int(
                        _varint_bytes(np.array([vmin - prev_max],
                                               np.int64))[0]
                    )
                prev_max = vmax
            dmap[ci] = total

    out = []
    for r in raw:
        ci = int(r["col"])
        out.append(
            {
                "col": COLS[ci],
                "n": int(r["n"]),
                "raw_bytes": int(r["raw_bytes"]),
                "delta_bytes": dmap.get(ci, 0),
            }
        )
    df = pd.DataFrame(out).sort_values("col", ignore_index=True)
    for c in ["n", "raw_bytes", "delta_bytes"]:
        df[c] = df[c].astype("int64")
    return df[["col", "n", "raw_bytes", "delta_bytes"]]


def friedman_test(sf_dir: str) -> "pd.DataFrame":
    """Exact Friedman-test sufficient statistics — the repeated-
    measures rank test that completes the nonparametric family
    (mann_whitney_u: 2 independent samples; kruskal_wallis: k
    independent samples; this: k TREATMENTS ranked within each of b
    BLOCKS, so block-level scale differences cancel): blocks =
    customer nations, treatments = order priorities, measurement =
    the block's total order cents per priority. Per treatment the
    double-rank sum (d = 2L + T + 1 within each block, always
    integer) folds across blocks; output per priority:
    (priority, r2_sum, n_blocks, k_treat), from which the Friedman
    chi-square with tie handling is exact rational arithmetic
    downstream. Blocks missing a treatment rank over their present
    treatments — stated semantics, mirrored by the oracle.

    Scale shape: the spearman co-partitioned union join on custkey
    attaches the nation (never a broadcast of the customer table);
    per-group (nation, priority, cents) partials fold through ONE
    bounded groupby into the ≤ nations×priorities grid, and the
    within-block ranking is driver arithmetic on that grid — bounded
    by the CATEGORY product, never the order count."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
    )

    def cust_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": batch.column("c_custkey").cast(pa.int64()),
                "nation": batch.column("c_nationkey").cast(pa.int64()),
                "priority": pa.array([""] * batch.num_rows, pa.string()),
                "cents": pa.array(np.zeros(batch.num_rows, np.int64),
                                  pa.int64()),
                "side": pa.array(np.zeros(batch.num_rows, np.int64),
                                 pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": batch.column("o_custkey").cast(pa.int64()),
                "nation": pa.array(np.zeros(batch.num_rows, np.int64),
                                   pa.int64()),
                "priority": batch.column("o_orderpriority"),
                "cents": _cents(batch.column("o_totalprice")),
                "side": pa.array(np.ones(batch.num_rows, np.int64),
                                 pa.int64()),
            }
        )

    tagged = cust.map_batches(cust_side, batch_format="pyarrow").union(
        orders.map_batches(order_side, batch_format="pyarrow")
    )

    def attach(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        side = group.column("side").to_numpy(zero_copy_only=False)
        if not (side == 0).any() or not (side == 1).any():
            return pa.table(
                {
                    "nation": pa.array([], pa.int64()),
                    "priority": pa.array([], pa.string()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        nation = int(
            group.column("nation").to_numpy(zero_copy_only=False)[side == 0][0]
        )
        prio = group.column("priority").to_pandas().to_numpy(dtype=object)[
            side == 1
        ]
        cents = group.column("cents").to_numpy(zero_copy_only=False)[side == 1]
        g = (
            pd.DataFrame({"priority": prio, "cents": cents})
            .groupby("priority", sort=False)["cents"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "nation": pa.array(
                    np.full(len(g), nation, np.int64), pa.int64()
                ),
                "priority": pa.array(g["priority"], pa.string()),
                "cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    grid = (
        tagged.groupby("custkey")
        .map_groups(attach, batch_format="pyarrow")
        .groupby(["nation", "priority"])
        .aggregate(_Sum("cents", alias_name="cents"))
        .take_all()  # bounded: <= nations * priorities rows
    )
    df = pd.DataFrame(grid)
    n_blocks = df["nation"].nunique()
    k_treat = df["priority"].nunique()
    out: dict[str, int] = {}
    for _, blk in df.groupby("nation"):
        v = blk["cents"].to_numpy()
        pr = blk["priority"].to_numpy()
        less = (v[:, None] > v[None, :]).sum(axis=1)
        ties = (v[:, None] == v[None, :]).sum(axis=1)  # includes self
        d = 2 * less + ties + 1
        for p, dd in zip(pr, d):
            out[p] = out.get(p, 0) + int(dd)
    res = pd.DataFrame(
        [
            {
                "priority": p,
                "r2_sum": s,
                "n_blocks": n_blocks,
                "k_treat": k_treat,
            }
            for p, s in out.items()
        ]
    ).sort_values("priority", ignore_index=True)
    for c in ["r2_sum", "n_blocks", "k_treat"]:
        res[c] = res[c].astype("int64")
    return res[["priority", "r2_sum", "n_blocks", "k_treat"]]


def ship_lag_profile(sf_dir: str) -> "pd.DataFrame":
    """Order-to-ship lag profile — the operational SLA readout of the
    big-big join: per order priority, the exact distribution of
    DAYS between o_orderdate and each line's l_shipdate, banded into
    the operations ladder (0-7, 8-30, 31-60, 61-90, >90 days) plus
    the exact lag-day sum for the mean. The cross-priority comparison
    is the 'does urgent actually ship faster' audit. Output per
    (priority, band): (priority, band_lo, n_lines, lag_days_sum).

    Scale shape: order_priority_join's co-partitioned equi-join
    verbatim — both sides project to (key, small ints), hash-
    co-partition on the SAME orderkey % P map, one union shuffle;
    inside a partition the probe is a vectorized searchsorted and
    the partition emits only its ≤ priorities×bands partial counts,
    so the final exchange is a handful of rows."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    DAY_US = 86_400_000_000
    BANDS = np.array([0, 8, 31, 61, 91], np.int64)  # band lower edges

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
    )
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def order_side(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        p = pc.utf8_slice_codeunits(
            batch.column("o_orderpriority"), 0, 1
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "day": pa.array(d, pa.int64()),
                "pcode": pa.array(p, pa.int64()),
                "side": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                "part": pa.array(k % N_COARSE_PARTS, pa.int64()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        k = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = (
            batch.column("l_shipdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "day": pa.array(d, pa.int64()),
                "pcode": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                "side": pa.array(np.ones(len(k), np.int64), pa.int64()),
                "part": pa.array(k % N_COARSE_PARTS, pa.int64()),
            }
        )

    def probe(part_tbl: pa.Table) -> pa.Table:
        key = part_tbl.column("key").to_numpy(zero_copy_only=False)
        day = part_tbl.column("day").to_numpy(zero_copy_only=False)
        pcode = part_tbl.column("pcode").to_numpy(zero_copy_only=False)
        side = part_tbl.column("side").to_numpy(zero_copy_only=False)
        ok = side == 0
        okey = key[ok]
        order = np.argsort(okey, kind="stable")
        okey_s = okey[order]
        oday = day[ok][order]
        opc = pcode[ok][order]
        lkey, lday = key[~ok], day[~ok]
        pos = np.searchsorted(okey_s, lkey)
        pos = np.clip(pos, 0, max(len(okey_s) - 1, 0))
        match = okey_s[pos] == lkey if len(okey_s) else np.zeros(
            len(lkey), bool
        )
        lag = lday[match] - oday[pos[match]]
        pc_ = opc[pos[match]]
        band = np.searchsorted(BANDS, np.maximum(lag, 0), side="right") - 1
        cell = pc_ * 8 + band
        u, inv = np.unique(cell, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, lag)
        return pa.table(
            {
                "cell": pa.array(u, pa.int64()),
                "n_lines": pa.array(n, pa.int64()),
                "lag_days_sum": pa.array(s, pa.int64()),
            }
        )

    folded = (
        orders.map_batches(order_side, batch_format="pyarrow")
        .union(lines.map_batches(line_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(probe, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(
            _Sum("n_lines", alias_name="n_lines"),
            _Sum("lag_days_sum", alias_name="lag_days_sum"),
        )
        .take_all()  # bounded: <= priorities * bands rows
    )
    out = []
    for r in folded:
        cell = int(r["cell"])
        out.append(
            {
                "pcode": cell // 8,
                "band_lo": int(BANDS[cell % 8]),
                "n_lines": int(r["n_lines"]),
                "lag_days_sum": int(r["lag_days_sum"]),
            }
        )
    df = pd.DataFrame(out).sort_values(
        ["pcode", "band_lo"], ignore_index=True
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["pcode", "band_lo", "n_lines", "lag_days_sum"]]
